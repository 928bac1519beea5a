"""March-design microbenchmarks on the live chip.

Answers, with measured numbers:
  1. row-gather rate vs table size (53 MB corner table vs small coarse
     majorant tables) -- is the gather latency-bound on table size?
  2. cost decomposition of one march scan step (gather vs ray_aabb vs
     state selects) at band width;
  3. optical-depth statistics of the scene (to size empty-space skipping
     and delta tracking: tight support box, per-super-voxel majorants,
     expected tentative-collision counts).

Run alone (never concurrently with another TPU process).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.ops import volume as vol_ops
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene

N = 1920 * 54  # one band


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1000:9.2f} ms", flush=True)
    return dt


def main():
    cfg = cfg_mod.progressive_1080p_config()
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    vol = cfg.volume
    key = jax.random.PRNGKey(0)

    # ---- 3. optical-depth statistics (host-side, once) ----
    grid = np.asarray(density) * cfg.volume.density_factor
    nz = np.argwhere(grid > 0)
    print(f"grid {grid.shape}, nonzero {(grid > 0).mean():.3f}, "
          f"max sigma {grid.max():.4f}, mean nonzero sigma "
          f"{grid[grid > 0].mean():.4f}")
    print(f"support box voxels: {nz.min(0)} .. {nz.max(0)}")
    # super-voxel majorants at 8^3
    sx, sy, sz = [int(np.ceil(s / 8)) for s in grid.shape]
    pad = [(0, sx * 8 - grid.shape[0]), (0, sy * 8 - grid.shape[1]),
           (0, sz * 8 - grid.shape[2])]
    g8 = np.pad(grid, pad).reshape(sx, 8, sy, 8, sz, 8).max((1, 3, 5))
    print(f"super8 grid {g8.shape} occupied {(g8 > 0).mean():.3f}")
    # world-units per voxel
    vox_w = np.asarray(cfg.volume.box_size) / np.asarray(grid.shape)
    print(f"box_size {cfg.volume.box_size} voxel {vox_w}")
    # camera-ray tau via brute quadrature on a subsample
    ro, rd = pixel_rays(scene.camera, 480, 270)
    e, x, hit = vol_ops.entry_exit_points(ro, rd, vol.box_size,
                                          vol.box_center)
    tau = -jnp.log(jnp.maximum(vol_ops.transmittance(
        scene.density, e, x, 256, vol), 1e-30))
    tau = np.asarray(jnp.where(hit, tau, 0.0))
    print(f"camera tau: mean {tau.mean():.3f} p50 {np.percentile(tau,50):.3f}"
          f" p90 {np.percentile(tau, 90):.3f} max {tau.max():.3f}")
    # majorant tau along rays (expected tentative collisions, global vs s8)
    seg = np.asarray(x - e)
    L = np.linalg.norm(seg, axis=-1) * np.asarray(hit)
    print(f"chord len: mean {L.mean():.1f} max {L.max():.1f}; "
          f"global-majorant tau mean {grid.max()*L.mean():.1f}")
    # per-ray majorant tau via s8 quadrature
    s8 = jnp.asarray(np.repeat(np.repeat(np.repeat(
        g8, 8, 0), 8, 1), 8, 2)[:grid.shape[0], :grid.shape[1],
                                :grid.shape[2]])
    tau8 = -jnp.log(jnp.maximum(vol_ops.transmittance(
        s8 / cfg.volume.density_factor, e, x, 256, vol), 1e-30))
    tau8 = np.asarray(jnp.where(hit, tau8, 0.0))
    print(f"s8-majorant tau: mean {tau8.mean():.3f} "
          f"p90 {np.percentile(tau8, 90):.3f} max {tau8.max():.3f}")

    # ---- 1. gather rate vs table size ----
    ro, rd = pixel_rays(scene.camera, 1920, 54)
    pos = ro + rd * 80.0
    uvw = vol_ops.world_to_uvw(pos, vol.box_size, vol.box_center)

    table = scene.density  # (P, 8) corner table, ~53 MB
    print(f"corner table {table.shape} "
          f"{table.size * table.dtype.itemsize / 2**20:.1f} MiB")
    flat_idx = jax.random.randint(key, (N,), 0, table.shape[0])

    @jax.jit
    def g_big(idx):
        return jnp.take(table, idx, axis=0).sum(-1)

    small = jnp.asarray(g8.reshape(-1))  # ~4k entries
    small_idx = jax.random.randint(key, (N,), 0, small.shape[0])

    @jax.jit
    def g_small(idx):
        return jnp.take(small, idx, axis=0)

    med = jnp.zeros((65536, 8), jnp.float32)
    med_idx = jax.random.randint(key, (N,), 0, 65536)

    @jax.jit
    def g_med(idx):
        return jnp.take(med, idx, axis=0).sum(-1)

    dt = timeit("gather 1.7M-row (P,8) corner table", g_big, flat_idx)
    print(f"    -> {N/dt/1e6:.1f} M rows/s")
    dt = timeit("gather 64k-row (P,8) table", g_med, med_idx)
    print(f"    -> {N/dt/1e6:.1f} M rows/s")
    dt = timeit("gather 4k-entry scalar table", g_small, small_idx)
    print(f"    -> {N/dt/1e6:.1f} M rows/s")

    # chained (scan of 8 dependent gathers) vs independent batch
    @jax.jit
    def g_chain(idx):
        def body(c, _):
            v = jnp.take(table, c, axis=0).sum(-1)
            c2 = (c + v.astype(jnp.int32) + 1) % table.shape[0]
            return c2, None
        c, _ = jax.lax.scan(body, idx, None, length=8)
        return c

    @jax.jit
    def g_batch8(idx):
        idx8 = (idx[None, :] + jnp.arange(8)[:, None] * 977) % table.shape[0]
        return jnp.take(table, idx8.reshape(-1), axis=0).sum(-1)

    dt = timeit("8 chained dependent gathers (scan)", g_chain, flat_idx)
    print(f"    -> {8*N/dt/1e6:.1f} M rows/s")
    dt = timeit("8x batched independent gather", g_batch8, flat_idx)
    print(f"    -> {8*N/dt/1e6:.1f} M rows/s")

    # ---- 2. march-step decomposition ----
    @jax.jit
    def step_density_only(p):
        def body(c, _):
            d = vol_ops.density_at(scene.density, c, vol)
            return c + d[:, None] * 0.01, None
        c, _ = jax.lax.scan(body, p, None, length=8)
        return c

    @jax.jit
    def step_aabb_only(p):
        def body(c, _):
            _, t_exit, _ = vol_ops.ray_aabb(c, rd, vol.box_size,
                                            vol.box_center)
            return c + t_exit[:, None] * 1e-6, None
        c, _ = jax.lax.scan(body, p, None, length=8)
        return c

    dt = timeit("8-step scan: density_at only", step_density_only, pos)
    print(f"    -> {8*N/dt/1e6:.1f} M rows/s")
    timeit("8-step scan: ray_aabb only", step_aabb_only, pos)


if __name__ == "__main__":
    main()
