"""Camera model as a JAX pytree.

Conventions follow the reference (``utils/camera.py:70-136``):
- ``R`` is the camera-to-world rotation (3x3), ``T`` the world-to-view
  translation, so the world-to-view matrix is ``[[R^T, T], [0, 1]]``.
- The projection matrix maps view space to NDC with z in [0, 1]
  (``utils/camera.py:15-35``), znear=1, zfar=1000.
- ``full_proj = proj @ world_view`` (we use column-vector convention
  throughout; the reference stores transposed matrices for row-vector
  multiplication — the math is identical).
- ``camera_center = -R @ T``.

The pytree splits into traced array leaves (matrices, image) and static
fields (image size, names) so a single jitted render function serves every
camera of a dataset with one compilation per image resolution.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def world_to_view_matrix(R: np.ndarray, T: np.ndarray) -> np.ndarray:
    """4x4 world->view matrix from c2w rotation R and translation T."""
    M = np.zeros((4, 4), dtype=np.float32)
    M[:3, :3] = np.asarray(R, np.float32).T
    M[:3, 3] = np.asarray(T, np.float32)
    M[3, 3] = 1.0
    return M


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style projection with z mapped to [0, 1] (reference utils/camera.py:15-35)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    """Quaternion (wxyz) to rotation matrix (reference utils/camera.py:38-46)."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
    ])


def rotmat2qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix to quaternion (wxyz), reference utils/camera.py:49-67."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
    ]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    """A single view: pose + intrinsics + (optionally) ground-truth image.

    Array leaves are traced; ``image_width``/``image_height``/names are static
    metadata. ``gt_image`` is (3, H, W) float32 in [0,1]; ``alpha_mask`` is
    (1, H, W) or None.
    """

    world_view: jax.Array          # (4, 4) world -> view
    full_proj: jax.Array           # (4, 4) world -> clip
    camera_center: jax.Array       # (3,)
    tan_fovx: jax.Array            # () f32
    tan_fovy: jax.Array            # () f32
    uid: jax.Array                 # () int32 — index into per-view tables (color affine)
    gt_image: Optional[jax.Array] = None     # (3, H, W) or None
    alpha_mask: Optional[jax.Array] = None   # (1, H, W) or None

    image_width: int = field(metadata=dict(static=True), default=0)
    image_height: int = field(metadata=dict(static=True), default=0)
    image_name: str = field(metadata=dict(static=True), default="")
    camera_id: int = field(metadata=dict(static=True), default=0)

    @staticmethod
    def create(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float | None = None,
               image_width: int | None = None, image_height: int | None = None,
               gt_image: np.ndarray | None = None, gt_alpha_mask: np.ndarray | None = None,
               image_name: str = "", camera_id: int = 0, uid: int = 0,
               znear: float = 1.0, zfar: float = 1000.0) -> "Camera":
        if gt_image is None and (image_width is None or image_height is None):
            raise ValueError("Either gt_image or image_width/image_height must be provided")
        if gt_image is not None:
            gt_image = np.clip(np.asarray(gt_image, np.float32), 0.0, 1.0)
            if image_width is None:
                image_width = gt_image.shape[2]
            if image_height is None:
                image_height = gt_image.shape[1]
        if fovy is None:
            fovy = math.atan(math.tan(fovx / 2) * (image_height / image_width)) * 2

        w2v = world_to_view_matrix(R, T)
        proj = projection_matrix(znear, zfar, fovx, fovy)
        full = (proj @ w2v).astype(np.float32)
        cam_center = (-np.asarray(R, np.float64) @ np.asarray(T, np.float64)).astype(np.float32)

        return Camera(
            world_view=jnp.asarray(w2v),
            full_proj=jnp.asarray(full),
            camera_center=jnp.asarray(cam_center),
            tan_fovx=jnp.float32(math.tan(fovx / 2)),
            tan_fovy=jnp.float32(math.tan(fovy / 2)),
            uid=jnp.int32(uid),
            gt_image=None if gt_image is None else jnp.asarray(gt_image),
            alpha_mask=None if gt_alpha_mask is None else jnp.asarray(gt_alpha_mask, jnp.float32),
            image_width=int(image_width),
            image_height=int(image_height),
            image_name=image_name,
            camera_id=int(camera_id),
        )

    def with_resolution(self, width: int, height: int) -> "Camera":
        """Same pose/FoV at a different raster resolution (supersampling path)."""
        from dataclasses import replace
        return replace(self, image_width=int(width), image_height=int(height))

    def without_image(self) -> "Camera":
        from dataclasses import replace
        return replace(self, gt_image=None, alpha_mask=None)

    def strip_static(self) -> "Camera":
        """Clear per-camera static metadata (image_name, camera_id) so every
        same-resolution camera shares one jit trace — static dataclass fields
        are hashed into the treedef and would otherwise retrace per view."""
        from dataclasses import replace
        return replace(self, image_name="", camera_id=0)
