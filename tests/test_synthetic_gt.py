"""Ground-truth integrity of the synthetic dataset builder.

The r5 oracle-GT de-circularization exposed that the builder's fixed
default pair budget silently overflowed at full-run scale, so every GT
frame dropped a suffix of the pair stream (~1/3 of the scene content at
800²/100k). The builder now grows its budget until the frame fits; these
tests pin that and the pallas-vs-oracle GT agreement.
"""

import json

import numpy as np
import pytest
from PIL import Image

from triangle_splatting_tpu.utils.testing import build_synthetic_nerf_dataset


def _load(root, split, i):
    return np.asarray(Image.open(root / split / f"r_{i}.png"),
                      np.float32)[..., :3] / 255.0


@pytest.mark.slow
def test_builder_grows_budget_and_matches_oracle(tmp_path):
    """A scene dense enough to overflow the default 6-pairs/triangle budget
    must still render COMPLETE pallas GT — and agree with the oracle-built
    GT per pixel (boundary flips only)."""
    kw = dict(res=128, n_tri=60, n_train=1, n_test=1, seed=11,
              size_range=(0.5, 0.8))
    rp = build_synthetic_nerf_dataset(tmp_path / "pallas", impl="pallas",
                                      **kw)
    ro = build_synthetic_nerf_dataset(tmp_path / "oracle", impl="oracle",
                                      **kw)
    for split in ("train", "test"):
        a = _load(rp, split, 0)
        b = _load(ro, split, 0)
        d = np.abs(a - b)
        # uint8 quantization + contributor boundary flips only
        assert d.mean() < 2e-3, (split, d.mean())
        assert (d.max(-1) > 0.05).mean() < 0.01, split
    # gt_scene.npz ships the exact soup for geometry metrics
    gt = np.load(rp / "gt_scene.npz")
    assert gt["vertex"].shape == (60, 3, 3)


def test_surface_scene_is_closed_and_opaque(tmp_path):
    """The 'surface' scene kind: a watertight-ish UV-sphere triangulation
    with uniform high opacity — the realistic mesh/solidify target."""
    from triangle_splatting_tpu.utils.testing import make_surface_scene
    s = make_surface_scene(5000, seed=1)
    v = s["vertex"]
    assert 4000 <= v.shape[0] <= 5000
    r = np.linalg.norm(v.reshape(-1, 3), axis=1)
    assert 0.5 < r.min() and r.max() < 1.2       # bumpy unit-ish sphere
    assert (s["opacity"] == 0.95).all()
    # builder integration: dataset renders + gt_scene.npz round-trips
    root = build_synthetic_nerf_dataset(tmp_path / "s", res=48, n_tri=500,
                                        n_train=1, n_test=1, impl="oracle",
                                        scene_kind="surface")
    img = _load(root, "train", 0)
    assert img.std() > 0.05                      # something rendered
    gt = np.load(root / "gt_scene.npz")
    assert gt["vertex"].shape[0] == np.asarray(gt["rgb"]).shape[0]


@pytest.mark.slow
def test_surface_solidify_end_to_end(tmp_path):
    """The opaque-surface mesh benchmark end to end at smoke scale: train
    the solidify pipeline on a surface dataset, export the GLB, and score
    it geometrically against the exact GT soup — the full_run --mesh
    --scene surface path, in-suite."""
    from triangle_splatting_tpu.models.mesh_metrics import mesh_geometry_scores
    from triangle_splatting_tpu.models.raw_triangle import RawTriangle
    from triangle_splatting_tpu.trainers.smoke import make_smoke_config
    from triangle_splatting_tpu.trainers.vanilla_ts import VanillaTSTrainer

    root = build_synthetic_nerf_dataset(
        tmp_path / "data", res=48, n_tri=400, n_train=6, n_test=2,
        impl="oracle", scene_kind="surface", pcd_points=300, pcd_noise=0.05)
    cfg = make_smoke_config(root, tmp_path / "out", 60, densify=False,
                            mesh=True)
    cfg.trainer.save_glb_iterations = [60]
    trainer = VanillaTSTrainer(cfg, impl="oracle", log_file=False)
    trainer._init_model()
    p0 = float(trainer._evaluate(0))
    trainer.train()
    p1 = float(trainer._evaluate(60))
    assert p1 > p0 + 1.0, (p0, p1)          # solidify training improves
    glb = tmp_path / "out" / "glb" / "60.glb"
    assert glb.exists()
    raw = RawTriangle(glb_path=str(glb))
    assert len(raw) > 0
    gt = np.load(root / "gt_scene.npz")
    geo = mesh_geometry_scores(raw.vertex, gt["vertex"], n_samples=2000,
                               tau=0.2)
    # 60 iters from a noisy point init: only sanity bounds — finite
    # chamfer on the right scale and some GT coverage
    assert np.isfinite(geo["chamfer"]) and geo["chamfer"] < 1.5, geo
    assert geo["recall"] > 0.3, geo


def test_builder_writes_gt_scene(tmp_path):
    root = build_synthetic_nerf_dataset(tmp_path / "d", res=48, n_tri=40,
                                        n_train=2, n_test=1, impl="oracle")
    gt = np.load(root / "gt_scene.npz")
    assert gt["vertex"].shape == (40, 3, 3)
    assert gt["rgb"].shape == (40, 3)
    with open(root / "transforms_train.json") as f:
        assert len(json.load(f)["frames"]) == 2
