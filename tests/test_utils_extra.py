"""vis_utils / render_utils / Logger_MP / file_handler coverage."""

import json
import os
import time

import numpy as np
import pytest

from triangle_splatting_tpu.utils import vis_utils
from triangle_splatting_tpu.utils.file_handler import (
    FilesystemStore, LocalHandler, MirrorHandler)
from triangle_splatting_tpu.utils.ply import read_ply


class TestVisUtils:
    def test_depth_to_image(self):
        d = np.linspace(0, 10, 64 * 64, dtype=np.float32).reshape(64, 64)
        img = vis_utils.depth_to_image(d)
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        # JET: near (small depth) maps to blue-ish, far to red-ish (BGR order)
        assert img[0, 0, 0] > img[0, 0, 2]      # blue channel dominates near
        assert img[-1, -1, 2] > img[-1, -1, 0]  # red dominates far

    def test_normal_to_image(self):
        n = np.random.default_rng(0).uniform(-1, 1, (16, 16, 3))
        img = vis_utils.normal_to_image(n)
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8

    def test_save_image_tensor(self, tmp_path):
        img = np.random.default_rng(1).uniform(size=(3, 8, 8)).astype(np.float32)
        path = tmp_path / "sub" / "img.png"
        vis_utils.save_image_tensor(img, str(path))
        assert path.exists() and path.stat().st_size > 0

    def test_plot_camera(self, tmp_path):
        proj = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float64)
        tile = proj * 0.5 + 0.25
        out = vis_utils.plot_camera(proj, tile, cam_center=np.array([1.0, -1.0]),
                                    name="t", out_dir=str(tmp_path))
        assert os.path.exists(out)

    def test_camera_to_mesh(self, tmp_path):
        rng = np.random.default_rng(2)
        n = 4
        w2cs = np.tile(np.eye(4), (n, 1, 1))
        w2cs[:, :3, 3] = rng.normal(size=(n, 3))
        out = vis_utils.camera_to_mesh(w2cs, np.full(n, 1.0), np.full(n, 0.8),
                                       name="cams", out_dir=str(tmp_path))
        data = read_ply(out)
        assert len(data["vertex"]) == n * 6 * 3        # 6 faces x 3 verts each
        assert data["face"].shape == (n * 6, 3)
        reds = data["vertex"]["red"]
        assert (reds == 255).any() and (reds == 0).any()   # colored faces


class TestRenderUtils:
    def test_pos_target_to_RT(self):
        from triangle_splatting_tpu.utils.render_utils import pos_target_to_RT
        pos = np.array([3.0, 4.0, 5.0])
        target = np.array([0.0, 1.0, 0.0])
        R, T = pos_target_to_RT(pos, target)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        # camera forward (3rd column) points at the target
        fwd = (target - pos) / np.linalg.norm(target - pos)
        np.testing.assert_allclose(R[:, 2], fwd, atol=1e-12)
        np.testing.assert_allclose(R.T @ -pos, T)

    def test_bev_and_tour(self, tmp_path):
        from triangle_splatting_tpu.models import triangle as M
        from triangle_splatting_tpu.utils.render_utils import (
            make_render_fn, render_BEV_image, render_tour)
        rng = np.random.default_rng(3)
        n, cap = 40, 256
        verts = np.zeros((cap, 3, 3), np.float32)
        verts[:n] = rng.normal(size=(n, 1, 3)) * 30 + rng.normal(size=(n, 3, 3)) * 5
        params = M.TriangleParams(
            vertex=np.asarray(verts),
            opacity=np.full((cap, 1), 2.0, np.float32),
            f_dc=rng.uniform(-1, 1, (cap, 1, 3)).astype(np.float32),
            f_rest=np.zeros((cap, 0, 3), np.float32))
        import dataclasses
        import jax.numpy as jnp
        state = dataclasses.replace(M.TriangleState.create(cap),
                                    alive=jnp.asarray(np.arange(cap) < n))
        cfg = M.ModelConfig(max_sh_degree=0, rasterizer_type="2D")
        fn = make_render_fn(params, state, cfg)
        assert np.isfinite(fn.center).all()

        img = render_BEV_image(fn, save_path=str(tmp_path / "bev.png"),
                               img_size=(128, 96), center=np.zeros(3))
        assert img.shape == (3, 96, 128)
        assert (tmp_path / "bev.png").exists()

        render_tour(fn, str(tmp_path / "tour.mp4"), img_size=(128, 96),
                    fps=2, duration=1)
        vids = list(tmp_path.glob("tour.*"))
        assert vids and vids[0].stat().st_size > 0


class TestLoggerMP:
    def test_roundtrip(self, tmp_path):
        from triangle_splatting_tpu.utils.logger import Logger_MP
        lg = Logger_MP("t", tmp_path, use_tensorboard=False)
        lg.info("hello from the queue")
        lg.warnOnce("once")
        lg.warnOnce("once")
        lg.add_scalar("loss", 0.5, 10)
        lg.add_histogram("h", np.arange(100.0), 10)
        lg.close()
        events = (tmp_path / "log" / "events.jsonl").read_text().splitlines()
        kinds = [json.loads(e)["kind"] for e in events]
        assert "scalar" in kinds and "histogram" in kinds
        logs = list((tmp_path / "log").glob("*_outputs.log"))
        assert logs and "hello from the queue" in logs[0].read_text()
        assert logs[0].read_text().count("once") == 1


class TestFileHandler:
    def test_local_handler(self, tmp_path):
        (tmp_path / "a.txt").write_text("x")
        h = LocalHandler(str(tmp_path))
        assert h.hasFile("a.txt") and not h.hasFile("b.txt")
        assert h.getFilePath("a.txt") == str(tmp_path / "a.txt")
        with pytest.raises(FileNotFoundError):
            h.getFilePath("b.txt")

    def test_mirror_get_put(self, tmp_path):
        remote = tmp_path / "remote"
        local = tmp_path / "cache"
        remote.mkdir()
        (remote / "data").mkdir()
        (remote / "data" / "f.bin").write_bytes(b"\x01\x02")

        h = MirrorHandler(str(remote), str(local))
        p = h.getFilePath("data/f.bin")
        assert open(p, "rb").read() == b"\x01\x02"
        # cached copy survives remote deletion when skip_exist
        h.remoteRemove("data/f.bin")
        assert h.getFilePath("data/f.bin") == p
        # put + upload
        (tmp_path / "new.txt").write_text("up")
        assert h.putFile(str(tmp_path / "new.txt"), "out/new.txt", upload=True)
        assert (remote / "out" / "new.txt").read_text() == "up"

    def test_done_flags_and_lock(self, tmp_path):
        remote = tmp_path / "remote"
        h = MirrorHandler(str(remote), str(tmp_path / "c1"))
        assert h._can_upload                      # first claims the lock
        h2 = MirrorHandler(str(remote), str(tmp_path / "c2"))
        assert not h2._can_upload                 # second is read-only
        assert h.remoteNoDoneFlag("run1")
        h.remoteSetDoneFlag("run1", done_flag=True)
        assert h.remoteDone("run1") and not h.remoteFail("run1")
        h.remoteSetDoneFlag("run2", done_flag=False)
        assert h.remoteFail("run2")

    def test_lock_release_and_stale_break(self, tmp_path):
        remote = tmp_path / "remote"
        h = MirrorHandler(str(remote), str(tmp_path / "c1"))
        assert h._can_upload
        # released lock frees upload rights for the next process
        h.release_upload_lock()
        assert not h._can_upload
        h2 = MirrorHandler(str(remote), str(tmp_path / "c2"))
        assert h2._can_upload

        # a lock whose timestamp is ancient is broken by a newcomer
        import time
        (remote / "upload.lock").write_text(f"99999 {time.time() - 7200}\n")
        h2._can_upload = False                    # drop without removing
        h3 = MirrorHandler(str(remote), str(tmp_path / "c3"))
        assert h3._can_upload                     # stale lock was broken

        # a FRESH foreign lock is respected
        h3.release_upload_lock()
        (remote / "upload.lock").write_text(f"99999 {time.time()}\n")
        h4 = MirrorHandler(str(remote), str(tmp_path / "c4"))
        assert not h4._can_upload

    def test_corrupt_lock_respected_with_warning(self, tmp_path, monkeypatch):
        """A persistently-unreadable lock meta is NEVER stolen (a read
        error must not put two uploaders on one root) — the handler stays
        read-only and tells the operator to delete the lock."""
        from triangle_splatting_tpu.utils import file_handler as FH
        monkeypatch.setattr(FH.MirrorHandler, "UNREADABLE_RECHECK_S", 0.05)
        remote = tmp_path / "remote"
        remote.mkdir()
        (remote / "upload.lock").write_text("")          # truncated meta
        h = MirrorHandler(str(remote), str(tmp_path / "c1"))
        assert not h._can_upload
        # operator deletes the corrupt lock -> next handler uploads again
        (remote / "upload.lock").unlink()
        h2 = MirrorHandler(str(remote), str(tmp_path / "c2"))
        assert h2._can_upload

    def test_upload_lock_disabled_bypasses_election(self, tmp_path):
        """upload_lock=False must always upload: no lock file, no heartbeat
        demotion even when another process holds the lock."""
        import time
        remote = tmp_path / "remote"
        remote.mkdir()
        (remote / "upload.lock").write_text(f"other {time.time()}\n")
        h = MirrorHandler(str(remote), str(tmp_path / "c1"), upload_lock=False)
        assert h._can_upload
        h._lock_refreshed = 0.0                          # would force heartbeat
        (tmp_path / "c1" / "f.txt").write_text("x")
        assert h.putFile(str(tmp_path / "c1" / "f.txt"), "f.txt", upload=True)
        assert (remote / "f.txt").read_text() == "x"
        assert h._can_upload

    def test_lost_lock_demotes_uploader(self, tmp_path):
        """A holder whose lock was broken and re-acquired must not silently
        reclaim it on the next upload."""
        import time
        remote = tmp_path / "remote"
        h = MirrorHandler(str(remote), str(tmp_path / "c1"))
        assert h._can_upload
        # someone else broke + re-acquired the lock
        (remote / "upload.lock").write_text(f"other-token {time.time()}\n")
        h._lock_refreshed = 0.0                          # force heartbeat
        (tmp_path / "c1" / "f.txt").write_text("x")
        assert not h.putFile(str(tmp_path / "c1" / "f.txt"), "f.txt",
                             upload=True)
        assert not h._can_upload


# --- pipeline fan-out (reference utils/pipeline_utils.py:6-64) -------------

def _touch_job(out_dir, name):
    """Top-level so mp spawn can pickle it."""
    import pathlib
    import time as _t
    pathlib.Path(out_dir, name).write_text(str(_t.time()))


def _failing_job(out_dir, name):
    raise SystemExit(3)


class TestPipelineFanOut:
    def test_sequential_path(self, tmp_path):
        from triangle_splatting_tpu.utils.pipeline_utils import run_exp
        jobs = [(str(tmp_path), f"j{i}") for i in range(3)]
        run_exp(_touch_job, jobs, num_workers=1)
        assert all((tmp_path / f"j{i}").exists() for i in range(3))

    def test_process_batches(self, tmp_path):
        """num_workers=2 over 4 jobs: two spawn batches, all complete."""
        from triangle_splatting_tpu.utils.pipeline_utils import run_exp
        jobs = [(str(tmp_path), f"p{i}") for i in range(4)]
        run_exp(_touch_job, jobs, num_workers=2)
        assert all((tmp_path / f"p{i}").exists() for i in range(4))
        # batch boundary: p0/p1 started before p2/p3 finished writing
        t = [float((tmp_path / f"p{i}").read_text()) for i in range(4)]
        assert max(t[0], t[1]) <= max(t[2], t[3]) + 1e-6

    def test_child_failure_raises(self, tmp_path):
        from triangle_splatting_tpu.utils.pipeline_utils import run_exp
        with pytest.raises(RuntimeError, match="exit 3"):
            run_exp(_failing_job, [(str(tmp_path), "x")], num_workers=2)
