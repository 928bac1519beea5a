"""Perspective camera with GLM semantics + scripted trajectories.

Reference: Camera.cpp:164-173 builds projView = perspective * lookAt and its
inverse; rays are reconstructed per pixel from invProjView
(nrc-train.comp:1228-1246). Fly controls (Input.cpp:50-98, Camera.cpp:181-198)
and the orbit mode (Camera.cpp:175-179) become pure trajectory functions --
no GLFW, the "input" is a frame index.

GLM conventions: right-handed view space, depth in [-1, 1]
(GLM_DEPTH_NEGATIVE_ONE_TO_ONE), column vectors.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import CameraConfig


class Camera(NamedTuple):
    """Camera state pytree (the set-0 descriptor set: matrices + pos)."""

    position: jnp.ndarray       # (3,)
    inv_proj_view: jnp.ndarray  # (4, 4)
    proj_view: jnp.ndarray      # (4, 4)


def perspective(fov_y: float, aspect: float, near: float,
                far: float) -> np.ndarray:
    """glm::perspective (RH, depth -1..1)."""
    f = 1.0 / math.tan(fov_y / 2.0)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = -(far + near) / (far - near)
    m[2, 3] = -(2.0 * far * near) / (far - near)
    m[3, 2] = -1.0
    return m


def look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    """glm::lookAt (RH)."""
    eye = np.asarray(eye, dtype=np.float32)
    f = np.asarray(center, dtype=np.float32) - eye
    f = f / np.linalg.norm(f)
    up = np.asarray(up, dtype=np.float32)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def make_camera(cfg: CameraConfig,
                position: Tuple[float, float, float] | None = None,
                view_dir: Tuple[float, float, float] | None = None) -> Camera:
    """Build the camera pytree (Camera::UpdateUniformBuffer equivalent)."""
    pos = np.asarray(position if position is not None else cfg.position,
                     dtype=np.float32)
    vdir = np.asarray(view_dir if view_dir is not None else cfg.view_dir,
                      dtype=np.float32)
    vdir = vdir / np.linalg.norm(vdir)
    proj = perspective(math.radians(cfg.fov_deg), cfg.aspect, cfg.near,
                       cfg.far)
    view = look_at(pos, pos + vdir, np.asarray(cfg.up, dtype=np.float32))
    proj_view = proj @ view
    inv = np.linalg.inv(proj_view)
    return Camera(position=jnp.asarray(pos),
                  inv_proj_view=jnp.asarray(inv),
                  proj_view=jnp.asarray(proj_view))


def pixel_rays(camera: Camera, width: int, height: int,
               dtype=jnp.float32, jitter_key=None):
    """Primary rays for every pixel, matching the shaders' reconstruction.

    nrc-train.comp:1228-1246: fragUV = pixel * (1/W, 1/H);
    screen = (2 uv - 1, 0, 1); world = invProjView @ screen; world /= w;
    rd = normalize(world - camera.pos).

    jitter_key: when given, offsets each pixel uniformly within its
    footprint (stratified sampling). The TRAIN grid uses this: a fixed
    100x100 grid re-samples the SAME 10k beams every step, so hash-grid
    cells between beams never receive gradients -- jitter makes the
    vertex coverage continuous across steps.

    Returns (ro (H*W, 3) broadcastable origin, rd (H*W, 3)).
    """
    xs = (jnp.arange(width, dtype=dtype)) / width
    ys = (jnp.arange(height, dtype=dtype)) / height
    u, v = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)
    if jitter_key is not None:
        ju, jv = jax.random.uniform(jitter_key, (2, height, width),
                                    dtype=dtype)
        u = u + ju / width
        v = v + jv / height
    ndc = jnp.stack([u * 2.0 - 1.0, v * 2.0 - 1.0,
                     jnp.zeros_like(u), jnp.ones_like(u)], axis=-1)
    # HIGHEST precision: TPU matmuls default to bf16 inputs, which is far
    # too coarse for the projective divide (w ~ 5, z ~ 320)
    world = jnp.dot(ndc.reshape(-1, 4), camera.inv_proj_view.T,
                    precision=jax.lax.Precision.HIGHEST)  # (H*W, 4)
    world = world[:, :3] / world[:, 3:4]
    rd = world - camera.position
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(camera.position, rd.shape)
    return ro, rd


# ---------------------------------------------------------------------------
# Scripted trajectories (replace interactive fly/orbit controls)
# ---------------------------------------------------------------------------

def orbit_position(frame: int, n_frames: int, radius: float = 64.0,
                   height: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Camera::RotateAroundOrigin (Camera.cpp:175-179) as a trajectory:
    returns (position, view_dir) looking at the origin."""
    angle = 2.0 * math.pi * frame / max(n_frames, 1)
    pos = np.array([radius * math.sin(angle), height,
                    -radius * math.cos(angle)], dtype=np.float32)
    vdir = -pos / np.linalg.norm(pos)
    return pos, vdir


def fly_through_position(frame: int, n_frames: int,
                         start=(0.0, 0.0, -64.0), end=(0.0, 0.0, -20.0)
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """A straight fly toward the volume (the WASD path, Input.cpp:50-98,
    scripted): lerp position, keep looking +z."""
    t = frame / max(n_frames - 1, 1)
    pos = (1 - t) * np.asarray(start, np.float32) + t * np.asarray(end,
                                                                   np.float32)
    return pos, np.array([0.0, 0.0, 1.0], dtype=np.float32)
