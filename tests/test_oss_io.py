"""OSSIO backend against an in-memory fake oss2 sdk.

The reference's OSS backend (io_utils.py:232-825) ships untested and the
real sdk is not in this image; this fake implements the oss2 API slice the
backend touches (Auth/Bucket/ObjectIterator/exceptions/multipart) over a
process-local dict so every code path runs for real.
"""

import os
import sys
import types

import pytest


# ---------------------------------------------------------------------------
# fake oss2
# ---------------------------------------------------------------------------

class _Exc:
    class RequestError(Exception):
        pass

    class ServerError(Exception):
        pass

    class ClientError(Exception):
        pass

    class NoSuchKey(Exception):
        pass

    class PositionNotEqualToLength(Exception):
        pass

    class ObjectNotAppendable(Exception):
        pass


class _Meta:
    def __init__(self, headers):
        self.headers = headers


class _Head:
    def __init__(self, length):
        self.content_length = length


class _GetResult:
    def __init__(self, data):
        self._data = data
        self.content_length = len(data)

    def read(self):
        return self._data


class _AppendResult:
    def __init__(self, next_position):
        self.next_position = next_position


class _ObjInfo:
    def __init__(self, key):
        self.key = key


class _Location:
    def __init__(self, location):
        self.location = location


class _InitMultipart:
    def __init__(self, upload_id):
        self.upload_id = upload_id


class _PartCopyResult:
    def __init__(self, etag):
        self.etag = etag


class FakeBucket:
    """Dict-backed bucket. ``store`` maps key -> bytes; ``appendable``
    tracks which keys were created via append_object."""

    def __init__(self, auth, host, bucket_name, service):
        self.bucket_name = bucket_name
        self._svc = service
        self.store = service.stores.setdefault(bucket_name, {})
        self.appendable = service.appendable.setdefault(bucket_name, set())
        self._mp = {}

    # --- basic object ops
    def object_exists(self, key):
        return key in self.store

    def head_object(self, key):
        if key not in self.store:
            raise _Exc.NoSuchKey(key)
        return _Head(len(self.store[key]))

    def get_object(self, key):
        if key not in self.store:
            raise _Exc.NoSuchKey(key)
        return _GetResult(self.store[key])

    def get_object_to_file(self, key, filename):
        with open(filename, "wb") as f:
            f.write(self.store[key])

    def put_object(self, key, data, progress_callback=None):
        if isinstance(data, str):
            data = data.encode()
        self.store[key] = bytes(data)
        self.appendable.discard(key)

    def put_object_from_file(self, key, filename):
        with open(filename, "rb") as f:
            self.put_object(key, f.read())

    def append_object(self, key, position, data):
        if isinstance(data, str):
            data = data.encode()
        if key in self.store and key not in self.appendable:
            raise _Exc.ObjectNotAppendable(key)
        cur = self.store.get(key, b"")
        if position != len(cur):
            raise _Exc.PositionNotEqualToLength(
                f"{position} != {len(cur)}")
        self.store[key] = cur + bytes(data)
        self.appendable.add(key)
        return _AppendResult(len(self.store[key]))

    def delete_object(self, key):
        self.store.pop(key, None)
        self.appendable.discard(key)

    def copy_object(self, src_bucket_name, src_key, dst_key):
        self.store[dst_key] = self._svc.stores[src_bucket_name][src_key]

    def get_bucket_location(self):
        return _Location(self._svc.locations.get(self.bucket_name, "zone-a"))

    def get_object_meta(self, key):
        if key not in self.store:
            raise _Exc.NoSuchKey(key)
        return _Meta({"Content-Length": str(len(self.store[key])),
                      "Last-Modified": "Mon, 02 Jan 2006 15:04:05 GMT"})

    def put_object_acl(self, key, acl):
        self._svc.acls[(self.bucket_name, key)] = acl

    # --- multipart copy
    def init_multipart_upload(self, key):
        uid = f"mp{len(self._mp)}"
        self._mp[uid] = {}
        return _InitMultipart(uid)

    def upload_part_copy(self, src_bucket_name, src_key, byte_range,
                         dst_key, upload_id, part_number):
        lo, hi = byte_range
        self._mp[upload_id][part_number] = \
            self._svc.stores[src_bucket_name][src_key][lo:hi + 1]
        return _PartCopyResult(etag=f"etag{part_number}")

    def complete_multipart_upload(self, key, upload_id, parts):
        chunks = self._mp.pop(upload_id)
        self.store[key] = b"".join(
            chunks[p.part_number] for p in sorted(parts,
                                                  key=lambda p: p.part_number))


class FakeService:
    def __init__(self):
        self.stores = {}
        self.appendable = {}
        self.locations = {}
        self.acls = {}


def _iterate(bucket, prefix="", delimiter=""):
    keys = sorted(k for k in bucket.store if k.startswith(prefix))
    if not delimiter:
        for k in keys:
            yield _ObjInfo(k)
        return
    seen = set()
    for k in keys:
        rest = k[len(prefix):]
        if delimiter in rest:
            common = prefix + rest.split(delimiter, 1)[0] + delimiter
            if common not in seen:
                seen.add(common)
                yield _ObjInfo(common)
        else:
            yield _ObjInfo(k)


def _make_fake_oss2(service):
    mod = types.ModuleType("oss2")
    mod.exceptions = _Exc
    mod.Auth = lambda ak, sk: ("auth", ak, sk)
    mod.Bucket = lambda auth, host, name: FakeBucket(auth, host, name,
                                                     service)
    mod.ObjectIterator = _iterate
    mod.OBJECT_ACL_PUBLIC_READ = "public-read"
    mod.determine_part_size = (
        lambda total, preferred_size: max(preferred_size, 1))
    models = types.ModuleType("oss2.models")

    class PartInfo:
        def __init__(self, part_number, etag):
            self.part_number = part_number
            self.etag = etag

    models.PartInfo = PartInfo
    mod.models = models
    return mod


@pytest.fixture()
def oss(monkeypatch):
    """Fresh OSSIO over two fake buckets, plus the fake service handle."""
    service = FakeService()
    fake = _make_fake_oss2(service)
    monkeypatch.setitem(sys.modules, "oss2", fake)
    monkeypatch.setitem(sys.modules, "oss2.models", fake.models)
    from triangle_splatting_tpu.utils.io_utils import make_oss_io
    backend = make_oss_io("ak", "sk", "host.example",
                          ["bucket-a", "bucket-b"])
    return backend, service


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestOpenReadWrite:
    def test_binary_roundtrip(self, oss):
        backend, _ = oss
        with backend.open("oss://bucket-a/dir/x.bin", "wb") as f:
            f.write(b"\x00\x01payload")
        with backend.open("oss://bucket-a/dir/x.bin", "rb") as f:
            assert f.read() == b"\x00\x01payload"

    def test_text_roundtrip_and_overwrite(self, oss):
        backend, _ = oss
        with backend.open("oss://bucket-a/log.txt", "w") as f:
            f.write("first")
        with backend.open("oss://bucket-a/log.txt", "w") as f:
            f.write("second")
        with backend.open("oss://bucket-a/log.txt") as f:
            assert f.read() == "second"

    def test_append_mode_resumes_at_tail(self, oss):
        backend, _ = oss
        with backend.open("oss://bucket-a/a.txt", "w") as f:
            f.write("one,")
        with backend.open("oss://bucket-a/a.txt", "a") as f:
            f.write("two")
        with backend.open("oss://bucket-a/a.txt") as f:
            assert f.read() == "one,two"

    def test_unbuffered_write_positions(self, oss):
        backend, _ = oss
        h = backend.open("oss://bucket-a/pos.txt", "w")
        h.write("abc")
        h.write("def")
        h.close()
        with backend.open("oss://bucket-a/pos.txt") as f:
            assert f.read() == "abcdef"

    def test_append_race_raises(self, oss):
        backend, svc = oss
        h = backend.open("oss://bucket-a/race.txt", "w")
        h.write("mine")
        svc.stores["bucket-a"]["race.txt"] += b"theirs"   # concurrent writer
        with pytest.raises(RuntimeError, match="concurrent writers"):
            h.write("more")

    def test_append_to_put_object_recovers(self, oss):
        backend, _ = oss
        backend._buckets["bucket-a"].put_object("put.txt", "old")
        h = backend.open("oss://bucket-a/put.txt", "a")
        assert h.position == 3
        h.buffer.write("new")
        h.flush()                      # ObjectNotAppendable -> rewrite
        with backend.open("oss://bucket-a/put.txt") as f:
            assert f.read() == "oldnew"

    def test_missing_read_raises(self, oss):
        backend, _ = oss
        with pytest.raises(FileNotFoundError):
            backend.open("oss://bucket-a/nope.txt")

    def test_bad_path_and_unknown_bucket(self, oss):
        backend, _ = oss
        with pytest.raises(IOError):
            backend.open("oss://no-key-part")
        with pytest.raises(IOError, match="not registered"):
            backend.open("oss://other/x")


class TestListingAndDirs:
    def _seed(self, backend):
        for key, data in [("d/a.txt", b"1"), ("d/b.txt", b"2"),
                          ("d/sub/c.txt", b"3"), ("top.txt", b"4")]:
            backend._buckets["bucket-a"].put_object(key, data)

    def test_listdir_flat_collapses_subdirs(self, oss):
        backend, _ = oss
        self._seed(backend)
        assert backend.listdir("oss://bucket-a/d") == \
            ["a.txt", "b.txt", "sub/"]

    def test_listdir_recursive_and_contains(self, oss):
        backend, _ = oss
        self._seed(backend)
        assert backend.listdir("oss://bucket-a/d", recursive=True) == \
            ["a.txt", "b.txt", "sub/c.txt"]
        assert backend.listdir("oss://bucket-a/d", recursive=True,
                               contains=".txt") == \
            ["a.txt", "b.txt", "sub/c.txt"]
        # substring filter (reference io_utils.py:536): "b" also hits "sub/"
        assert backend.listdir("oss://bucket-a/d", contains="b") == \
            ["b.txt", "sub/"]

    def test_listdir_full_path(self, oss):
        backend, _ = oss
        self._seed(backend)
        assert backend.listdir("oss://bucket-a/d", full_path=True)[0] == \
            "oss://bucket-a/d/a.txt"

    def test_listdir_missing_raises(self, oss):
        backend, _ = oss
        with pytest.raises(FileNotFoundError):
            backend.listdir("oss://bucket-a/ghost")

    def test_isdir_isfile_exists(self, oss):
        backend, _ = oss
        self._seed(backend)
        assert backend.isdir("oss://bucket-a/d")
        assert not backend.isdir("oss://bucket-a/top.txt")
        assert backend.isfile("oss://bucket-a/top.txt")
        assert not backend.isfile("oss://bucket-a/d")
        assert backend.exists("oss://bucket-a/d/a.txt")
        assert not backend.exists("oss://bucket-a/zzz")

    def test_makedirs_is_noop(self, oss):
        backend, svc = oss
        backend.makedirs("oss://bucket-a/new/dir")
        assert svc.stores["bucket-a"] == {}


class TestCopyMoveRemove:
    def test_upload_download(self, oss, tmp_path):
        backend, _ = oss
        src = tmp_path / "local.bin"
        src.write_bytes(b"updata")
        backend.copy(str(src), "oss://bucket-a/up.bin")
        dst = tmp_path / "down" / "back.bin"
        backend.copy("oss://bucket-a/up.bin", str(dst))
        assert dst.read_bytes() == b"updata"

    def test_remote_copy_same_region(self, oss):
        backend, _ = oss
        backend._buckets["bucket-a"].put_object("s.txt", b"xyz")
        backend.copy("oss://bucket-a/s.txt", "oss://bucket-b/t.txt")
        with backend.open("oss://bucket-b/t.txt", "rb") as f:
            assert f.read() == b"xyz"

    def test_remote_copy_cross_region_bounces_local(self, oss):
        backend, svc = oss
        svc.locations.update({"bucket-a": "east", "bucket-b": "west"})
        backend._buckets["bucket-a"].put_object("s.txt", b"far")
        backend.copy("oss://bucket-a/s.txt", "oss://bucket-b/t.txt")
        with backend.open("oss://bucket-b/t.txt", "rb") as f:
            assert f.read() == b"far"

    def test_multipart_same_bucket_big_object(self, oss, monkeypatch):
        backend, _ = oss
        import triangle_splatting_tpu.utils.io_utils as iomod
        monkeypatch.setattr(iomod, "_MULTIPART_MIN", 4)
        monkeypatch.setattr(iomod, "_BIG", 3)      # -> 3-byte parts
        backend._buckets["bucket-a"].put_object("big", b"0123456789")
        backend.copy("oss://bucket-a/big", "oss://bucket-a/big2")
        assert backend._buckets["bucket-a"].store["big2"] == b"0123456789"

    def test_copytree_download_and_upload(self, oss, tmp_path):
        backend, _ = oss
        for key in ("t/a.txt", "t/s/b.txt"):
            backend._buckets["bucket-a"].put_object(key, key.encode())
        local = tmp_path / "tree"
        backend.copytree("oss://bucket-a/t", str(local))
        assert (local / "s" / "b.txt").read_bytes() == b"t/s/b.txt"
        backend.copytree(str(local), "oss://bucket-b/t2")
        assert backend._buckets["bucket-b"].store["t2/a.txt"] == b"t/a.txt"

    def test_move_and_remove(self, oss):
        backend, _ = oss
        backend._buckets["bucket-a"].put_object("m.txt", b"mv")
        backend.move("oss://bucket-a/m.txt", "oss://bucket-a/n.txt")
        assert not backend.exists("oss://bucket-a/m.txt")
        assert backend.exists("oss://bucket-a/n.txt")
        backend.remove("oss://bucket-a/n.txt")
        assert not backend.exists("oss://bucket-a/n.txt")

    def test_rmtree(self, oss):
        backend, svc = oss
        for key in ("r/a", "r/s/b", "keep"):
            backend._buckets["bucket-a"].put_object(key, b"x")
        backend.rmtree("oss://bucket-a/r")
        assert sorted(svc.stores["bucket-a"]) == ["keep"]

    def test_remove_dispatches_on_isdir(self, oss):
        backend, svc = oss
        for key in ("r2/a", "r2/b"):
            backend._buckets["bucket-a"].put_object(key, b"x")
        backend.remove("oss://bucket-a/r2")
        assert svc.stores["bucket-a"] == {}

    def test_upload_size_limit(self, oss, tmp_path, monkeypatch):
        backend, _ = oss
        import triangle_splatting_tpu.utils.io_utils as iomod
        monkeypatch.setattr(iomod, "_UPLOAD_LIMIT", 2)
        src = tmp_path / "big.bin"
        src.write_bytes(b"abc")
        with pytest.raises(RuntimeError, match="5 GB"):
            backend.copy(str(src), "oss://bucket-a/big.bin")

    def test_safe_copy_swallows_failures(self, oss):
        backend, _ = oss
        backend.safe_copy("oss://bucket-a/ghost", "oss://bucket-a/d")
        assert not backend.exists("oss://bucket-a/d")


class TestMetadata:
    def test_size_md5_last_modified(self, oss):
        backend, _ = oss
        backend._buckets["bucket-a"].put_object("m.bin", b"abcd")
        assert backend.size("oss://bucket-a/m.bin") == 4
        import hashlib
        assert backend.md5("oss://bucket-a/m.bin") == \
            hashlib.md5(b"abcd").hexdigest()
        dt = backend.last_modified("oss://bucket-a/m.bin")
        assert (dt.year, dt.hour) == (2006, 23)    # GMT + 8h

    def test_authorize(self, oss):
        backend, svc = oss
        backend._buckets["bucket-a"].put_object("pub", b"x")
        backend.authorize("oss://bucket-a/pub")
        assert svc.acls[("bucket-a", "pub")] == "public-read"
        with pytest.raises(ValueError):
            backend.authorize("/local/path")


class TestFacadeIntegration:
    def test_set_oss_io_routes_prefix_and_two_path(self, oss, tmp_path,
                                                   monkeypatch):
        backend, _ = oss
        from triangle_splatting_tpu.utils import io_utils
        monkeypatch.setattr(io_utils.io, "_backends", [])
        io_utils.io.register("oss://", backend)
        # one-path dispatch
        with io_utils.io.open("oss://bucket-a/f.txt", "w") as f:
            f.write("via facade")
        assert not io_utils.io.islocal("oss://bucket-a/f.txt")
        # two-path dispatch on the SECOND argument (local -> remote upload)
        src = tmp_path / "u.txt"
        src.write_text("up")
        io_utils.io.copy(str(src), "oss://bucket-a/u.txt")
        with backend.open("oss://bucket-a/u.txt") as f:
            assert f.read() == "up"
        # local paths still served by DefaultIO
        assert io_utils.io.islocal(str(tmp_path))
        assert io_utils.io.exists(str(src))

    def test_set_oss_io_from_mapping(self, oss, monkeypatch):
        _, svc = oss
        from triangle_splatting_tpu.utils import io_utils
        monkeypatch.setattr(io_utils.io, "_backends", [])
        b = io_utils.set_oss_io({"ak_id": "a", "ak_secret": "s",
                                 "hosts": "h", "buckets": "bucket-a"})
        assert io_utils.io._match("oss://bucket-a/x") is b
        with pytest.raises(ValueError):
            io_utils.set_oss_io({"ak_id": "a"})

    def test_backend_replacement(self, oss, monkeypatch):
        backend, _ = oss
        from triangle_splatting_tpu.utils import io_utils
        monkeypatch.setattr(io_utils.io, "_backends", [])
        io_utils.io.register("oss://", backend)
        io_utils.io.register("oss://", backend)
        assert len(io_utils.io._backends) == 1


class TestOSSStoreAndHandler:
    """file_handler's OSSStore + MirrorHandler end-to-end over the fake
    bucket (reference pairs OSSHandler with the OSS io backend)."""

    def test_store_roundtrip(self, oss, tmp_path):
        backend, svc = oss
        from triangle_splatting_tpu.utils.file_handler import OSSStore
        store = OSSStore("oss://bucket-a/runs", backend=backend)
        assert store.listdir("") == []
        local = tmp_path / "ckpt.bin"
        local.write_bytes(b"state")
        store.put(str(local), "exp1/ckpt.bin")
        assert store.exists("exp1/ckpt.bin")
        assert store.listdir("") == ["exp1"]
        back = tmp_path / "fetch" / "ckpt.bin"
        store.get("exp1/ckpt.bin", str(back))
        assert back.read_bytes() == b"state"
        # directory get
        tree = tmp_path / "tree"
        store.get("exp1", str(tree))
        assert (tree / "ckpt.bin").read_bytes() == b"state"
        store.touch("exp1/.done")
        assert store.exists("exp1/.done")
        store.remove("exp1")
        assert not store.exists("exp1/ckpt.bin")

    def test_mirror_handler_routes_oss_root(self, oss, tmp_path,
                                            monkeypatch):
        backend, svc = oss
        from triangle_splatting_tpu.utils import io_utils
        monkeypatch.setattr(io_utils.io, "_backends", [])
        io_utils.io.register("oss://", backend)
        from triangle_splatting_tpu.utils.file_handler import (MirrorHandler,
                                                               OSSStore)
        h = MirrorHandler("oss://bucket-a/share", str(tmp_path / "cache"),
                          upload_lock=False)
        assert isinstance(h.remote, OSSStore)
        p = h.getLocalPath("out.txt")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write("result")
        h.putFile(p, "out.txt", upload=True)
        assert svc.stores["bucket-a"]["share/out.txt"] == b"result"
        # a second handler with a cold cache pulls from the bucket
        h2 = MirrorHandler("oss://bucket-a/share", str(tmp_path / "c2"),
                           upload_lock=False)
        with open(h2.getFilePath("out.txt")) as f:
            assert f.read() == "result"

    def test_make_oss_store_requires_backend(self, monkeypatch):
        from triangle_splatting_tpu.utils import io_utils
        from triangle_splatting_tpu.utils.file_handler import make_oss_store
        monkeypatch.setattr(io_utils.io, "_backends", [])
        with pytest.raises(RuntimeError, match="set_oss_io"):
            make_oss_store("oss://bucket-a/x")
