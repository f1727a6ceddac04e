"""HTTP roundtrip test for the interactive viewer (viewer.py).

Mirrors the reference viewer's render loop (viser_viewer.py:17-254) but
through our stdlib HTTP server: start on an ephemeral port, list models,
POST camera poses, decode the returned JPEGs.
"""

import json
import urllib.request

import numpy as np
import pytest

from triangle_splatting_tpu.models.raw_triangle import RawTriangle

pytest.importorskip("PIL")


@pytest.fixture(scope="module")
def viewer_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("viewer_model")
    rng = np.random.default_rng(3)
    n = 64
    centers = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.5
    verts = centers + rng.normal(size=(n, 3, 3)).astype(np.float32) * 0.25
    raw = RawTriangle(
        vertex=verts,
        opacity=np.full((n, 1), 2.0, np.float32),
        shs=np.concatenate([rng.uniform(-1, 1, (n, 3)).astype(np.float32),
                            np.zeros((n, 45), np.float32)], axis=1))
    raw.savePLY(root / "point_cloud" / "7000.ply")
    raw.saveGLB(root / "glb" / "7000.glb", save_back=True)

    from triangle_splatting_tpu.viewer import run_viewer
    server = run_viewer(str(root), host="127.0.0.1", port=0, block=False)
    port = server.server_address[1]
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _render(base, **overrides):
    req = {"pose": {"eye": [0, 0, -4], "target": [0, 0, 0], "up": [0, -1, 0]},
           "mode": "color", "bg": "white", "res": 128, "gamma": 1.0, "sh": 0}
    req.update(overrides)
    r = urllib.request.urlopen(urllib.request.Request(
        f"{base}/render", data=json.dumps(req).encode(), method="POST"),
        timeout=120)
    assert r.status == 200
    assert r.headers["Content-Type"] == "image/jpeg"
    return r.read(), r.headers.get("X-Info", "")


class TestViewerHTTP:
    def test_models_listing(self, viewer_server):
        with urllib.request.urlopen(f"{viewer_server}/models", timeout=30) as r:
            models = json.loads(r.read())
        assert "point_cloud/7000.ply" in models
        assert "glb/7000.glb" in models

    def test_index_page(self, viewer_server):
        with urllib.request.urlopen(viewer_server, timeout=30) as r:
            assert b"2DTS viewer" in r.read()

    def test_render_modes(self, viewer_server):
        import io
        from PIL import Image
        for mode in ("color", "depth", "normal"):
            data, info = _render(viewer_server, mode=mode)
            img = np.asarray(Image.open(io.BytesIO(data)))
            assert img.shape == (128, 128, 3), mode
            assert "tris" in info
        # white bg color render should not be all-white (something visible)
        data, _ = _render(viewer_server, mode="color")
        img = np.asarray(Image.open(io.BytesIO(data)))
        assert img.min() < 200

    def test_gamma_and_glb_model(self, viewer_server):
        soft, _ = _render(viewer_server, gamma=1.0)
        hard, _ = _render(viewer_server, gamma=30.0)
        assert soft != hard                      # solidify changes the frame
        glb, info = _render(viewer_server, model="glb/7000.glb", bg="black")
        assert len(glb) > 500 and "64 tris" in info
