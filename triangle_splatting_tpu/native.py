"""ctypes bridge to the native IO runtime (native/colmap_io.cpp).

Builds the shared library on first use with g++ (cached next to the source,
rebuilt when the source is newer) and exposes numpy-friendly wrappers.
Callers fall back to the pure-Python parsers when the toolchain or binary
is unavailable — behavior is identical, only throughput differs
(~50-100x on MatrixCity-scale points3D.bin).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "colmap_io.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    so_path = _SRC.with_suffix(".so")
    if so_path.exists() and so_path.stat().st_mtime >= _SRC.stat().st_mtime:
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(so_path)],
            check=True, capture_output=True, timeout=120)
        return so_path
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = _build()
    if so_path is None:
        return None
    lib = ctypes.CDLL(str(so_path))
    c_char_p = ctypes.c_char_p
    i64, i32 = ctypes.c_int64, ctypes.c_int32
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.colmap_points3d_count.argtypes = [c_char_p]
    lib.colmap_points3d_count.restype = i64
    lib.colmap_points3d_read.argtypes = [c_char_p, f32p, f32p, f32p, i64]
    lib.colmap_points3d_read.restype = i64
    lib.colmap_images_count.argtypes = [c_char_p]
    lib.colmap_images_count.restype = i64
    lib.colmap_images_read.argtypes = [c_char_p, f64p, f64p, i32p, i32p,
                                       ctypes.c_char_p, i64, i64p, i64]
    lib.colmap_images_read.restype = i64
    lib.ply_vertex_info.argtypes = [c_char_p, ctypes.POINTER(i32), i32p, i32p,
                                    ctypes.POINTER(i64), i32]
    lib.ply_vertex_info.restype = i64
    lib.ply_vertex_read.argtypes = [c_char_p, i64, i64, i32p, i32p, i32, f32p]
    lib.ply_vertex_read.restype = i64
    _LIB = lib
    return lib


def read_points3d_binary(path) -> Optional[tuple]:
    """(xyz (n,3) f32, rgb (n,3) f32 in [0,1], err (n,) f32) or None."""
    lib = get_lib()
    if lib is None:
        return None
    p = str(path).encode()
    n = lib.colmap_points3d_count(p)
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    err = np.empty((n,), np.float32)
    got = lib.colmap_points3d_read(p, xyz, rgb, err, n)
    if got != n:
        return None
    return xyz, rgb, err


def read_images_binary(path) -> Optional[dict]:
    """{id: (qvec, tvec, camera_id, name)} like the Python parser, or None."""
    lib = get_lib()
    if lib is None:
        return None
    p = str(path).encode()
    n = lib.colmap_images_count(p)
    if n < 0:
        return None
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    ids = np.empty((n,), np.int32)
    cam_ids = np.empty((n,), np.int32)
    name_cap = 512 * max(n, 1)
    names = ctypes.create_string_buffer(name_cap)
    offsets = np.empty((n + 1,), np.int64)
    got = lib.colmap_images_read(p, qvec, tvec, ids, cam_ids, names,
                                 name_cap, offsets, n)
    if got != n:
        return None
    raw = names.raw
    out = {}
    for i in range(n):
        name = raw[offsets[i]:offsets[i + 1]].decode("utf-8")
        out[int(ids[i])] = (qvec[i].copy(), tvec[i].copy(), int(cam_ids[i]),
                            name)
    return out


def read_ply_vertex_f32(path) -> Optional[np.ndarray]:
    """All scalar vertex properties of a binary-LE PLY as (n, n_props) f32,
    or None (unsupported layout / no toolchain). Property ORDER matches the
    header; names must be recovered by the caller from the header text."""
    lib = get_lib()
    if lib is None:
        return None
    p = str(path).encode()
    max_props = 256
    sizes = np.zeros((max_props,), np.int32)
    kinds = np.zeros((max_props,), np.int32)
    n_props = ctypes.c_int32(0)
    header_bytes = ctypes.c_int64(0)
    n = lib.ply_vertex_info(p, ctypes.byref(n_props), sizes, kinds,
                            ctypes.byref(header_bytes), max_props)
    if n < 0:
        return None
    np_ = int(n_props.value)
    out = np.empty((n, np_), np.float32)
    got = lib.ply_vertex_read(p, header_bytes.value, n, sizes[:np_],
                              kinds[:np_], np_, out)
    if got != n:
        return None
    return out
