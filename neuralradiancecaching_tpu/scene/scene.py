"""Scene pytree: volume grid + lights + env map + camera.

The reference binds these as 7 descriptor sets (NrcHpmRenderer.cpp:144-166);
here they are one NamedTuple passed to jitted step functions. Light direction
from zenith/azimuth mirrors DirLight.cpp:5-14.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import (DirLightConfig, EnvMapConfig,
                                              NRCConfig, PointLightConfig,
                                              QuirkFlags)
from neuralradiancecaching_tpu.ops import volume as volume_ops
from neuralradiancecaching_tpu.ops.envmap import EnvMap, make_envmap
from neuralradiancecaching_tpu.scene.camera import Camera, make_camera


class DirLight(NamedTuple):
    direction: jnp.ndarray  # (3,) unit
    color: jnp.ndarray      # (3,)
    strength: jnp.ndarray   # scalar


class PointLight(NamedTuple):
    position: jnp.ndarray  # (3,)
    color: jnp.ndarray     # (3,)
    strength: jnp.ndarray  # scalar


class Scene(NamedTuple):
    # corner table (P, 8) from volume_ops.build_corner_table -- the fast
    # TPU sampling representation (one row gather per trilinear fetch)
    density: jnp.ndarray
    # raw (Nx, Ny, Nz) fp32 grid, kept for golden tests / exports
    density_grid: jnp.ndarray
    camera: Camera
    dir_light: DirLight
    point_light: PointLight
    env: EnvMap
    # precomputed exit-transmittance tau field (ops/lightfield.py), used when
    # env/path transmittance_mode == 'field'; placeholder row otherwise
    env_t_field: jnp.ndarray
    # premultiplied T*Env radiance field, used when
    # EnvMapConfig.transmittance_mode == 'premultiplied'; placeholder row
    # otherwise
    env_l_field: jnp.ndarray
    # HG-convolved in-scatter field, used when
    # EnvMapConfig.in_scatter_mode == 'field'; placeholder row otherwise
    env_s_field: jnp.ndarray
    # collision field (ops/collision.py): baked free-flight inverse-CDF rows
    # for PathTraceConfig.sampler == 'collision'; placeholder row otherwise
    coll_field: jnp.ndarray


def lightfield_row_width() -> int:
    return 4  # corner-packed tau rows (ops/lightfield.py)


def dir_from_zenith_azimuth(zenith: float, azimuth: float) -> np.ndarray:
    """DirLight.cpp:5-14: direction the light TRAVELS (pointing down for
    zenith=-pi/2)."""
    d = np.array([
        math.cos(zenith) * math.cos(azimuth),
        math.sin(zenith),
        math.cos(zenith) * math.sin(azimuth),
    ], dtype=np.float32)
    return d / np.linalg.norm(d)


def make_dir_light(cfg: DirLightConfig) -> DirLight:
    return DirLight(
        direction=jnp.asarray(dir_from_zenith_azimuth(cfg.zenith,
                                                      cfg.azimuth)),
        color=jnp.asarray(cfg.color, dtype=jnp.float32),
        strength=jnp.float32(cfg.strength),
    )


def make_point_light(cfg: PointLightConfig) -> PointLight:
    return PointLight(
        position=jnp.asarray(cfg.position, dtype=jnp.float32),
        color=jnp.asarray(cfg.color, dtype=jnp.float32),
        strength=jnp.float32(cfg.strength),
    )


def make_scene(cfg: NRCConfig, density: jnp.ndarray,
               env_image: jnp.ndarray) -> Scene:
    """Assemble the full scene pytree from config + loaded assets."""
    density = jnp.asarray(density, dtype=jnp.float32)
    if cfg.quirks.quantize_density_8bit:
        density = volume_ops.quantize_8bit(density)
    assert tuple(density.shape) == tuple(cfg.volume.grid_shape), (
        density.shape, cfg.volume.grid_shape)
    corner_table = volume_ops.build_corner_table(density)
    env_image = jnp.asarray(env_image, dtype=jnp.float32)
    from neuralradiancecaching_tpu.ops import lightfield
    if (cfg.env_map.transmittance_mode == "field"
            or cfg.path.transmittance_mode == "field"):
        env_t_field = lightfield.build_transmittance_field(
            corner_table, cfg.volume, steps=cfg.env_map.transmittance_steps)
    else:
        env_t_field = jnp.zeros((1, lightfield_row_width()), jnp.float32)
    if cfg.env_map.transmittance_mode == "premultiplied":
        env_l_field = lightfield.build_radiance_field(
            corner_table, env_image, cfg.volume,
            steps=cfg.env_map.transmittance_steps)
    else:
        env_l_field = jnp.zeros((1, 12), jnp.float32)
    if cfg.env_map.in_scatter_mode == "field":
        env_s_field = lightfield.build_scatter_field(
            corner_table, env_image, cfg.volume, hg_g=cfg.volume.hg_g,
            steps=(cfg.env_map.scatter_bake_steps
                   or cfg.env_map.transmittance_steps),
            quad_dirs=cfg.env_map.scatter_quad_dirs)
    else:
        env_s_field = jnp.zeros((1, 12), jnp.float32)
    if cfg.path.sampler == "collision":
        from neuralradiancecaching_tpu.ops import collision
        coll_field = collision.build_collision_field(
            corner_table, cfg.volume, steps=cfg.path.collision_field_steps)
    else:
        from neuralradiancecaching_tpu.ops.collision import ROW_WIDTH
        coll_field = jnp.zeros((1, ROW_WIDTH), jnp.float32)
    if cfg.volume.field_dtype == "bfloat16":
        # halve the gathered bytes of the HBM-latency-bound field lookups;
        # every query upcasts after its gather (ops/lightfield, ops/collision)
        env_t_field = env_t_field.astype(jnp.bfloat16)
        env_l_field = env_l_field.astype(jnp.bfloat16)
        env_s_field = env_s_field.astype(jnp.bfloat16)
        coll_field = coll_field.astype(jnp.bfloat16)
    return Scene(
        density=corner_table,
        density_grid=density,
        env_t_field=env_t_field,
        env_l_field=env_l_field,
        env_s_field=env_s_field,
        coll_field=coll_field,
        camera=make_camera(cfg.camera),
        dir_light=make_dir_light(cfg.dir_light),
        point_light=make_point_light(cfg.point_light),
        env=make_envmap(jnp.asarray(env_image, dtype=jnp.float32),
                        cfg.env_map),
    )
