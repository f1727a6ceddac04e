"""Pluggable IO abstraction (reference utils/io_utils.py).

``DefaultIO`` covers the local filesystem with the reference's full method
surface (open/exists/move/copy/copytree/makedirs/remove/rmtree/listdir/
isdir/isfile/abspath/last_modified/size/md5). Remote backends register via
``IO.register``; the Alibaba-OSS backend (io_utils.py:232-825) is gated on
the ``oss2`` sdk, which is not in the TPU image — on TPU pods remote
storage is a fuse-mounted bucket, which DefaultIO already handles. The
module-level singleton ``io`` dispatches by path prefix.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from datetime import datetime
from pathlib import Path


class IO:
    """Dispatching facade: backends register with a path prefix."""

    def __init__(self):
        self._backends: list[tuple[str, "DefaultIO"]] = []
        self._default = DefaultIO()

    def register(self, prefix: str, backend: "DefaultIO") -> None:
        self._backends.append((prefix, backend))

    def _for(self, path: str) -> "DefaultIO":
        path = str(path)
        for prefix, backend in self._backends:
            if path.startswith(prefix):
                return backend
        return self._default

    def islocal(self, path) -> bool:
        return self._for(path) is self._default

    def __getattr__(self, name):
        def dispatch(path, *args, **kwargs):
            return getattr(self._for(path), name)(path, *args, **kwargs)
        return dispatch


class DefaultIO:
    """Local-filesystem IO (reference io_utils.py:120-229)."""

    def open(self, path, mode="r"):
        if "w" in mode or "a" in mode:
            Path(path).parent.mkdir(parents=True, exist_ok=True)
        return open(path, mode)

    def exists(self, path) -> bool:
        return os.path.exists(path)

    def move(self, src, dst):
        Path(dst).parent.mkdir(parents=True, exist_ok=True)
        shutil.move(src, dst)

    def copy(self, src, dst):
        Path(dst).parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)

    def copytree(self, src, dst):
        shutil.copytree(src, dst, dirs_exist_ok=True)

    def makedirs(self, path, exist_ok=True):
        os.makedirs(path, exist_ok=exist_ok)

    def remove(self, path):
        if os.path.isfile(path):
            os.remove(path)

    def rmtree(self, path):
        shutil.rmtree(path, ignore_errors=True)

    def listdir(self, path, recursive=False, full_path=False, contains=None):
        if recursive:
            names = [os.path.join(r, f) for r, _, fs in os.walk(path)
                     for f in fs]
            names = [os.path.relpath(n, path) for n in names]
        else:
            names = sorted(os.listdir(path))
        if contains is not None:
            pats = [contains] if isinstance(contains, str) else list(contains)
            names = [n for n in names if any(p in n for p in pats)]
        if full_path:
            names = [os.path.join(path, n) for n in names]
        return names

    def isdir(self, path) -> bool:
        return os.path.isdir(path)

    def isfile(self, path) -> bool:
        return os.path.isfile(path)

    def abspath(self, path) -> str:
        return os.path.abspath(path)

    def last_modified(self, path) -> datetime:
        return datetime.fromtimestamp(os.path.getmtime(path))

    def last_modified_str(self, path) -> str:
        return self.last_modified(path).strftime("%Y-%m-%d %H:%M:%S")

    def size(self, path) -> int:
        return os.path.getsize(path)

    def md5(self, path) -> str:
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()


def make_oss_io(*args, **kwargs):
    """OSS backend factory — requires the (non-baked) oss2 sdk. Use a fuse
    mount + DefaultIO on TPU pods instead."""
    import oss2  # noqa: F401
    raise NotImplementedError(
        "oss2 present but the OSS IO backend is not wired; mount the bucket "
        "(ossfs/gcsfuse) and use DefaultIO paths instead")


io = IO()
