"""Camera models and ray generation.

Capability parity with reference ray generation (``trainer.py:271-292``,
``base_renderer.py:223-258``) and benchmark test poses
(``benchmark_suite.py:132-149``): OpenGL-style camera (x right, y up, camera
looks down -z), pixel (i, j) maps to direction
``((i - W/2)/f, -(j - H/2)/f, -1)`` rotated by the camera-to-world matrix.

Focal length comes from the Blender ``camera_angle_x``
(``focal = 0.5 * W / tan(0.5 * angle)``, ``loader.py:36``); the reference
benchmark instead hardcodes ``focal=800.0`` (``base_renderer.py:224``) — we
keep that as the default for benchmark parity but make it explicit.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

# The reference benchmark's hardcoded focal (``base_renderer.py:224``).
BENCHMARK_FOCAL = 800.0


def focal_from_angle(width: int, camera_angle_x: float) -> float:
    """Blender-synthetic focal length (reference ``loader.py:36``)."""
    return 0.5 * width / float(np.tan(0.5 * camera_angle_x))


def generate_rays(
    pose: jnp.ndarray, width: int, height: int, focal: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel rays for a camera-to-world ``pose [4, 4]`` (or [3, 4]).

    Returns ``(rays_o [H, W, 3], rays_d [H, W, 3])`` — row-major (height
    first), matching the reference's transposed-meshgrid layout
    (``base_renderer.py:239-245``). Directions are NOT normalized (the
    compositor scales distances by ||d||, reference ``rendering.py:120-121``).
    """
    i = jnp.arange(width, dtype=jnp.float32)[None, :]    # [1, W]
    j = jnp.arange(height, dtype=jnp.float32)[:, None]   # [H, 1]
    dirs = jnp.stack(
        [
            jnp.broadcast_to((i - width * 0.5) / focal, (height, width)),
            jnp.broadcast_to(-(j - height * 0.5) / focal, (height, width)),
            -jnp.ones((height, width), jnp.float32),
        ],
        axis=-1,
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, pose[:3, :3])
    rays_o = jnp.broadcast_to(pose[:3, -1], rays_d.shape)
    return rays_o, rays_d


def orbit_poses(n_views: int, radius: float = 4.0) -> np.ndarray:
    """Benchmark test poses: rotation about the +Y axis at distance ``radius``
    on the z-axis (reference ``benchmark_suite.py:132-149``). Returns
    ``[n_views, 4, 4]`` float32 camera-to-world matrices.
    """
    poses = np.zeros((n_views, 4, 4), np.float32)
    for k in range(n_views):
        a = 2.0 * np.pi * k / n_views
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 0] = np.cos(a)
        c2w[0, 2] = np.sin(a)
        c2w[2, 0] = -np.sin(a)
        c2w[2, 2] = np.cos(a)
        c2w[2, 3] = radius
        poses[k] = c2w
    return poses


def gate_poses(
    n_views: int, radius: float = 4.0, phi_deg: float = -30.0
) -> np.ndarray:
    """Quality-gate poses: a ``spherical_pose`` azimuth orbit LOOKING AT the
    origin from elevation ``phi_deg`` — every view sees the object, unlike
    ``orbit_poses`` whose outward-facing cameras waste ~half the views on
    empty space (they exist for reference benchmark parity,
    ``benchmark_suite.py:132-149``; the round-4 gates had to exclude those
    views as degenerate, leaving single-view aggregates). Azimuths avoid 0/90
    multiples so no view is axis-aligned. Returns ``[n_views, 4, 4]``."""
    return np.stack([
        spherical_pose(30.0 + 360.0 * k / max(n_views, 1), phi_deg, radius)
        for k in range(n_views)
    ])


def spherical_pose(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Blender-style look-at-origin spherical pose (azimuth ``theta``,
    elevation ``phi``, distance ``radius``) — the pose family the lego
    dataset's cameras live on; used for novel-view renders of the bundled
    example weights."""
    th, ph = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rot_phi = np.eye(4, dtype=np.float32)
    rot_phi[1, 1] = np.cos(ph); rot_phi[1, 2] = -np.sin(ph)
    rot_phi[2, 1] = np.sin(ph); rot_phi[2, 2] = np.cos(ph)
    rot_th = np.eye(4, dtype=np.float32)
    rot_th[0, 0] = np.cos(th); rot_th[0, 2] = -np.sin(th)
    rot_th[2, 0] = np.sin(th); rot_th[2, 2] = np.cos(th)
    c2w = rot_th @ rot_phi @ trans
    # blender world: flip to match nerf_synthetic convention
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    return flip @ c2w
