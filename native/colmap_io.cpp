// Native data-loading runtime for triangle_splatting_tpu.
//
// TPU-native replacement for the host-side portion of the reference's IO
// path: COLMAP binary parsing (datasets/colmap_loader.py) and binary-PLY
// vertex loading (plyfile usage in models/point_cloud.py, raw_*.py). The
// Python struct-loop parsers take minutes on MatrixCity-scale inputs
// (20M points, config/MatrixCity_VanillaTS_mesh.yaml:30-34); this module
// streams them in one pass.
//
// Plain C ABI consumed through ctypes (pybind11 is not in the image).
// Two-phase protocol: *_count() to size numpy buffers, *_read() to fill.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// points3D.bin: [num:u64] then per point:
//   id:i64, xyz:3xf64, rgb:3xu8, error:f64, track_len:u64, track: 2xi32 each
// ---------------------------------------------------------------------------

int64_t colmap_points3d_count(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t num = 0;
    if (fread(&num, 8, 1, f) != 1) { fclose(f); return -1; }
    fclose(f);
    return (int64_t)num;
}

// xyz: (n,3) f32, rgb: (n,3) f32 in [0,1], err: (n,) f32
int64_t colmap_points3d_read(const char* path, float* xyz, float* rgb,
                             float* err, int64_t capacity) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t num = 0;
    if (fread(&num, 8, 1, f) != 1) { fclose(f); return -1; }
    if ((int64_t)num > capacity) { fclose(f); return -2; }

    // Buffered reads: the fixed 43-byte head of each record, then skip the
    // variable-length track.
    #pragma pack(push, 1)
    struct Head {
        int64_t id;
        double x, y, z;
        uint8_t r, g, b;
        double error;
        uint64_t track_len;
    };
    #pragma pack(pop)
    static_assert(sizeof(Head) == 8 + 24 + 3 + 8 + 8, "packed");

    std::vector<char> iobuf(1 << 22);
    setvbuf(f, iobuf.data(), _IOFBF, iobuf.size());

    Head h;
    for (uint64_t i = 0; i < num; i++) {
        if (fread(&h, sizeof(Head), 1, f) != 1) { fclose(f); return -3; }
        xyz[i * 3 + 0] = (float)h.x;
        xyz[i * 3 + 1] = (float)h.y;
        xyz[i * 3 + 2] = (float)h.z;
        rgb[i * 3 + 0] = h.r / 255.0f;
        rgb[i * 3 + 1] = h.g / 255.0f;
        rgb[i * 3 + 2] = h.b / 255.0f;
        err[i] = (float)h.error;
        if (fseek(f, (long)(h.track_len * 8), SEEK_CUR) != 0) {
            fclose(f);
            return -3;
        }
    }
    fclose(f);
    return (int64_t)num;
}

// ---------------------------------------------------------------------------
// images.bin: [num:u64] then per image:
//   id:i32, qvec:4xf64, tvec:3xf64, camera_id:i32, name:cstr,
//   npoints2d:u64, points2d: (f64,f64,i64) each
// ---------------------------------------------------------------------------

int64_t colmap_images_count(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t num = 0;
    if (fread(&num, 8, 1, f) != 1) { fclose(f); return -1; }
    fclose(f);
    return (int64_t)num;
}

// qvec (n,4) f64, tvec (n,3) f64, ids (n,) i32, cam_ids (n,) i32,
// names: flat char buffer (name_cap bytes), name_offsets (n+1,) i64
int64_t colmap_images_read(const char* path, double* qvec, double* tvec,
                           int32_t* ids, int32_t* cam_ids, char* names,
                           int64_t name_cap, int64_t* name_offsets,
                           int64_t capacity) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint64_t num = 0;
    if (fread(&num, 8, 1, f) != 1) { fclose(f); return -1; }
    if ((int64_t)num > capacity) { fclose(f); return -2; }

    std::vector<char> iobuf(1 << 20);
    setvbuf(f, iobuf.data(), _IOFBF, iobuf.size());

    int64_t name_pos = 0;
    for (uint64_t i = 0; i < num; i++) {
        int32_t image_id;
        if (fread(&image_id, 4, 1, f) != 1) { fclose(f); return -3; }
        if (fread(qvec + i * 4, 8, 4, f) != 4) { fclose(f); return -3; }
        if (fread(tvec + i * 3, 8, 3, f) != 3) { fclose(f); return -3; }
        int32_t camera_id;
        if (fread(&camera_id, 4, 1, f) != 1) { fclose(f); return -3; }
        ids[i] = image_id;
        cam_ids[i] = camera_id;
        name_offsets[i] = name_pos;
        int c;
        while ((c = fgetc(f)) != 0) {
            if (c == EOF) { fclose(f); return -3; }
            if (name_pos >= name_cap) { fclose(f); return -4; }
            names[name_pos++] = (char)c;
        }
        uint64_t npts = 0;
        if (fread(&npts, 8, 1, f) != 1) { fclose(f); return -3; }
        if (fseek(f, (long)(npts * 24), SEEK_CUR) != 0) { fclose(f); return -3; }
    }
    name_offsets[num] = name_pos;
    fclose(f);
    return (int64_t)num;
}

// ---------------------------------------------------------------------------
// Binary-little-endian PLY vertex element, scalar properties only: returns
// all properties widened to f32 (the schema used by point clouds, raw
// triangles and 3DGS gaussians).
// ---------------------------------------------------------------------------

// Parses the header. Returns vertex count; fills n_props, prop_sizes (bytes
// per property, in order), prop_kinds (0=float, 1=double, 2=uint8, 3=int32,
// 4=other-skip), header_bytes.
int64_t ply_vertex_info(const char* path, int32_t* n_props,
                        int32_t* prop_sizes, int32_t* prop_kinds,
                        int64_t* header_bytes, int32_t max_props) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char line[4096];
    int64_t count = -1;
    int np = 0;
    bool in_vertex = false;
    bool binary_le = false;
    while (fgets(line, sizeof(line), f)) {
        std::string s(line);
        while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
        if (s.rfind("format", 0) == 0) {
            binary_le = s.find("binary_little_endian") != std::string::npos;
        } else if (s.rfind("element vertex", 0) == 0) {
            count = atoll(s.c_str() + 15);
            in_vertex = true;
        } else if (s.rfind("element", 0) == 0) {
            in_vertex = false;
        } else if (in_vertex && s.rfind("property", 0) == 0) {
            if (np >= max_props) { fclose(f); return -5; }
            int size = 0, kind = 4;
            if (s.find(" float ") != std::string::npos ||
                s.find(" float32 ") != std::string::npos) { size = 4; kind = 0; }
            else if (s.find(" double ") != std::string::npos ||
                     s.find(" float64 ") != std::string::npos) { size = 8; kind = 1; }
            else if (s.find(" uchar ") != std::string::npos ||
                     s.find(" uint8 ") != std::string::npos) { size = 1; kind = 2; }
            else if (s.find(" int ") != std::string::npos ||
                     s.find(" int32 ") != std::string::npos) { size = 4; kind = 3; }
            else { fclose(f); return -6; }   // list/unknown: unsupported here
            prop_sizes[np] = size;
            prop_kinds[np] = kind;
            np++;
        } else if (s == "end_header") {
            *header_bytes = ftell(f);
            *n_props = np;
            fclose(f);
            return binary_le ? count : -7;
        }
    }
    fclose(f);
    return -1;
}

// out: (count, n_props) f32 row-major. uchar properties are NOT rescaled.
int64_t ply_vertex_read(const char* path, int64_t header_bytes, int64_t count,
                        const int32_t* prop_sizes, const int32_t* prop_kinds,
                        int32_t n_props, float* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    if (fseek(f, (long)header_bytes, SEEK_SET) != 0) { fclose(f); return -3; }
    int64_t row_bytes = 0;
    for (int p = 0; p < n_props; p++) row_bytes += prop_sizes[p];

    std::vector<char> buf((size_t)row_bytes * 4096);
    int64_t done = 0;
    while (done < count) {
        int64_t todo = std::min<int64_t>(4096, count - done);
        if ((int64_t)fread(buf.data(), row_bytes, todo, f) != todo) {
            fclose(f);
            return -3;
        }
        for (int64_t r = 0; r < todo; r++) {
            const char* row = buf.data() + r * row_bytes;
            float* dst = out + (done + r) * n_props;
            int64_t off = 0;
            for (int p = 0; p < n_props; p++) {
                switch (prop_kinds[p]) {
                    case 0: { float v; memcpy(&v, row + off, 4); dst[p] = v; break; }
                    case 1: { double v; memcpy(&v, row + off, 8); dst[p] = (float)v; break; }
                    case 2: { dst[p] = (float)(uint8_t)row[off]; break; }
                    case 3: { int32_t v; memcpy(&v, row + off, 4); dst[p] = (float)v; break; }
                }
                off += prop_sizes[p];
            }
        }
        done += todo;
    }
    fclose(f);
    return done;
}

}  // extern "C"
