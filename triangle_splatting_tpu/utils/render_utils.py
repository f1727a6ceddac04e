"""Offline BEV / tour / comparison video rendering
(reference renderer/render_utils.py:16-114).

The reference renders through a stateful ``model.forward(cam, ...)``; our
models are functional, so these helpers take a ``render_fn(camera) -> dict``
closure. ``make_render_fn`` builds one (jitted, background black to match
the reference) from triangle or gaussian params.
"""

from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

from .camera import Camera


def image_to_cv(image) -> np.ndarray:
    """(3, H, W) float RGB in [0,1] -> HWC uint8 BGR
    (render_utils.py:10-13)."""
    img = np.asarray(image).transpose(1, 2, 0)[..., ::-1]
    return np.ascontiguousarray(np.clip(img * 255, 0, 255)).astype(np.uint8)


def make_render_fn(params, state, cfg, rasterizer_type: str | None = None):
    """Jitted closure camera -> forward package for Triangle or Gaussian
    params (retraces once per output resolution)."""
    import jax
    import jax.numpy as jnp
    from ..ops.projection import RasterSettings
    from ..models import triangle as MT
    from ..models import gaussian_model as MG

    is_tri = isinstance(params, MT.TriangleParams)
    mod = MT if is_tri else MG
    rtype = rasterizer_type or getattr(cfg, "rasterizer_type", "2D") or "2D"

    @functools.partial(jax.jit, static_argnums=(0,))
    def _fwd(settings, p, s, cam, bg):
        return mod.forward(p, s, cam, bg, cfg, settings, is_training=False,
                           apply_color_affine=False)

    def render_fn(camera: Camera, background: str = "black"):
        settings = RasterSettings(
            image_width=int(camera.image_width),
            image_height=int(camera.image_height),
            max_sh_degree=cfg.max_sh_degree,
            rasterizer_type=rtype)
        bg = jnp.ones(3) if background == "white" else jnp.zeros(3)
        return _fwd(settings, params, state, camera.strip_static(), bg)

    render_fn.center = np.asarray(
        MT.get_xyz(params) if is_tri else params.xyz
    )[np.asarray(state.alive)].mean(axis=0)
    return render_fn


def render_BEV_image(render_fn, save_path: str | None = None,
                     img_size=(2160, 1440), center=None) -> np.ndarray:
    """Top-down orthographic-ish bird's-eye render (render_utils.py:16-33)."""
    R = np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1]], np.float64)
    fovx, fovy = 0.610, 0.414
    elevation = 1200

    center = render_fn.center if center is None else np.asarray(center)
    cam_pos = center + np.array([0, 0, elevation])
    T = R.T @ -cam_pos
    cam = Camera.create(R=R, T=T, fovx=fovx, fovy=fovy,
                        image_width=img_size[0], image_height=img_size[1])
    image = render_fn(cam)["render"]
    if save_path is not None:
        import cv2
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(save_path), image_to_cv(image))
    return np.asarray(image)


def pos_target_to_RT(pos: np.ndarray, target: np.ndarray):
    """Look-at extrinsics with world +z as up (render_utils.py:36-45)."""
    z = target - pos
    z = z / np.linalg.norm(z)
    x = np.cross(z, [0, 0, 1.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    y = y / np.linalg.norm(y)
    R = np.array([x, y, z]).T
    return R, R.T @ -pos


def _open_video(save_path: str, fps: int, img_size):
    import cv2
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    video = cv2.VideoWriter(str(save_path),
                            cv2.VideoWriter_fourcc(*"mp4v"), fps, img_size)
    if not video.isOpened():    # codec fallback
        alt = str(Path(save_path).with_suffix(".avi"))
        video = cv2.VideoWriter(alt, cv2.VideoWriter_fourcc(*"MJPG"),
                                fps, img_size)
    return video


def _tour_cameras(center, num_cams):
    """Elliptical orbit poses shared by the tour renderers
    (render_utils.py:50-66)."""
    theta = np.linspace(0, 2 * np.pi, num_cams, endpoint=False)
    coord = np.array([np.cos(theta), np.sin(theta),
                      np.zeros_like(theta)]).T
    cam_pos = coord * np.array([800, 400, 0]) + center + np.array([0, 0, 400])
    target_pos = coord * np.array([200, 100, 0]) + center
    return cam_pos, target_pos


def render_tour(render_fn, save_path: str, img_size=(2160, 1440),
                fps: int = 30, duration: int = 10) -> None:
    """Orbit-tour video around the scene center (render_utils.py:48-75)."""
    num_cams = fps * duration
    cam_pos, target_pos = _tour_cameras(render_fn.center, num_cams)
    video = _open_video(save_path, fps, img_size)
    for i in range(num_cams):
        R, T = pos_target_to_RT(cam_pos[i], target_pos[i])
        cam = Camera.create(R=R, T=T, fovx=0.610, fovy=0.414,
                            image_width=img_size[0], image_height=img_size[1])
        video.write(image_to_cv(render_fn(cam)["render"]))
    video.release()


def render_tour_compare(render_fn1, render_fn2, save_path: str,
                        img_size=(2160, 1440), name1="model1",
                        name2="model2", fps: int = 30,
                        duration: int = 10) -> None:
    """Side-by-side split-screen tour of two models
    (render_utils.py:78-114)."""
    import cv2
    num_cams = fps * duration
    cam_pos, target_pos = _tour_cameras(render_fn1.center, num_cams)
    video = _open_video(save_path, fps, img_size)
    half = img_size[0] // 2
    for i in range(num_cams):
        R, T = pos_target_to_RT(cam_pos[i], target_pos[i])
        cam = Camera.create(R=R, T=T, fovx=0.610, fovy=0.414,
                            image_width=img_size[0], image_height=img_size[1])
        im1 = np.asarray(render_fn1(cam)["render"])
        im2 = np.asarray(render_fn2(cam)["render"])
        image = image_to_cv(np.concatenate(
            [im1[..., :half], im2[..., half:]], axis=2))
        cv2.putText(image, name1, (img_size[0] // 20, img_size[1] // 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 0, 255), 2)
        cv2.putText(image, name2,
                    (half + img_size[0] // 20, img_size[1] // 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 0, 255), 2)
        cv2.line(image, (half, 0), (half, img_size[1]), (255, 255, 255), 2)
        video.write(image)
    video.release()
