"""Decompose the env in-scatter SCATTER-FIELD bias (the -3.2% shading leg
of profile_gt_bias.py) into its three approximation legs, measured directly
at density-weighted sample points -- no renders needed.

The shipped field (ops/lightfield.py build_scatter_field +
query_radiance_field) approximates

    S(pos, dir) = int HG(dir . w) T(pos -> exit along w) Env(w) dw

with (1) a coarse out-direction bucket grid (L_N_THETA x L_N_PHI = 8x16,
bilinear at query), (2) NEAREST-voxel spatial lookup at vol.field_shape,
and (3) a bake whose transmittance quadrature uses
env_map.transmittance_steps (16) over qdirs = vol.field_dir_buckets.

Telescoping legs at each sample (pos, dir):
    F     = query_radiance_field(shipped field)          [what shading uses]
    B_c   = exact-dir bake math at the containing-voxel center, bake params
    B_p   = same at the exact pos
    B_p64 = same at exact pos, 64-step quadrature
    O_p   = oracle at exact pos (fine qdirs + fine steps)

    F - O_p = [F - B_c]   out-dir bucketing error
            + [B_c - B_p] spatial nearest-voxel error
            + [B_p - B_p64] bake quadrature error (16 vs 64 steps)
            + [B_p64 - O_p] residual (env-integral dir resolution + steps)

Env: PTS (1024), ORACLE_DIRS "48,96", ORACLE_STEPS 96, DIR_BUCKETS "32,64".
"""

import dataclasses
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("NRC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NRC_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.ops import envmap as envmap_ops
from neuralradiancecaching_tpu.ops import lightfield
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.ops import volume as volume_ops
from neuralradiancecaching_tpu.scene.scene import make_scene

PTS = int(os.environ.get("PTS", 1024))
ORACLE_DIRS = tuple(int(x) for x in
                    os.environ.get("ORACLE_DIRS", "64,128").split(","))
ORACLE_STEPS = int(os.environ.get("ORACLE_STEPS", 96))
DIR_BUCKETS = tuple(int(x) for x in
                    os.environ.get("DIR_BUCKETS", "32,64").split(","))


def sphere_grid(nt, np_):
    th = (jnp.arange(nt, dtype=jnp.float32) + 0.5) / nt * math.pi
    ph = ((jnp.arange(np_, dtype=jnp.float32) + 0.5) / np_ * 2.0
          - 1.0) * math.pi
    tt, pp = jnp.meshgrid(th, ph, indexing="ij")
    dirs = lightfield._dir_from_theta_phi(tt, pp).reshape(-1, 3)
    d_omega = (jnp.sin(tt) * (math.pi / nt)
               * (2.0 * math.pi / np_)).reshape(-1)
    return dirs, d_omega


def convolved(scene, vol, pts, sdirs, qdirs, d_omega, env_rgb, steps, hg_g):
    """Exact-out-dir HG convolution with the bake's own T quadrature:
    value[s] = sum_q w[s,q] T(pts[s] -> exit along qdirs[q]) env[q]."""
    def per_dir(d):
        dn = jnp.broadcast_to(d, pts.shape)
        _, exit_p, _ = volume_ops.entry_exit_points(pts, dn, vol.box_size,
                                                    vol.box_center)
        return volume_ops.transmittance(scene.density, pts, exit_p, steps,
                                        vol)
    t = jax.lax.map(per_dir, qdirs)                       # (Q, S)
    w = phase_ops.hg_phase(sdirs @ qdirs.T, hg_g) * d_omega[None, :]
    w = w / jnp.sum(w, axis=1, keepdims=True)             # (S, Q)
    return jnp.einsum("sq,qs,qc->sc", w, t, env_rgb)


def convolved_cell(scene, vol, pts, sdirs, env_img, cells, steps, hg_g):
    """The NEW bake math at exact positions/out-dirs: exact per-cell env
    power + power-centroid dirs (lightfield.env_cell_integrals), HG
    unnormalized. value[s] = sum_q HG(sdirs[s] . c_q) T(pts[s], c_q) P_q."""
    power, qdirs = lightfield.env_cell_integrals(env_img, *cells)
    def per_dir(d):
        dn = jnp.broadcast_to(d, pts.shape)
        _, exit_p, _ = volume_ops.entry_exit_points(pts, dn, vol.box_size,
                                                    vol.box_center)
        return volume_ops.transmittance(scene.density, pts, exit_p, steps,
                                        vol)
    t = jax.lax.map(per_dir, qdirs)                       # (Q, S)
    w = phase_ops.hg_phase(sdirs @ qdirs.T, hg_g) / (2.0 * math.pi)
    return jnp.einsum("sq,qs,qc->sc", w, t, power)


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base, volume=dataclasses.replace(base.volume,
                                         field_dir_buckets=DIR_BUCKETS,
                                         field_dtype="float32"))
    vol = base.volume
    density = assets.load_cloud()
    env_img = jnp.asarray(assets.load_env_map(), jnp.float32)
    scene = make_scene(base, density, env_img)
    np.asarray(scene.env_s_field.sum())
    print(f"field baked: shape {scene.env_s_field.shape}", flush=True)

    # density-weighted sample positions (host-side multinomial over voxels
    # + in-voxel jitter) -- where scatter events actually happen
    rng = np.random.default_rng(7)
    dgrid = np.asarray(density, np.float64)
    p = dgrid.reshape(-1) / dgrid.sum()
    vox = rng.choice(p.size, size=PTS, p=p)
    gz, gy, gx = dgrid.shape[2], dgrid.shape[1], dgrid.shape[0]
    ii = vox // (gy * gz)
    jj = (vox // gz) % gy
    kk = vox % gz
    u = (np.stack([ii, jj, kk], -1) + rng.random((PTS, 3))) \
        / np.array([gx, gy, gz])
    size = np.asarray(vol.box_size, np.float64)
    center = np.asarray(vol.box_center, np.float64)
    pts = jnp.asarray((u - 0.5) * size + center, jnp.float32)
    # uniform-sphere event in-directions
    v = rng.normal(size=(PTS, 3))
    sdirs = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True),
                        jnp.float32)

    # containing-voxel centers at the FIELD's spatial grid
    fs = np.asarray(vol.field_shape)
    uvw = (np.asarray(pts) - center) / size + 0.5
    ijk = np.clip((uvw * fs).astype(np.int64), 0, fs - 1)
    cpts = jnp.asarray(((ijk + 0.5) / fs - 0.5) * size + center, jnp.float32)

    F = lightfield.query_radiance_field(scene.env_s_field, pts, sdirs, vol)

    steps_b = (base.env_map.scatter_bake_steps
               or base.env_map.transmittance_steps)
    cells_b = base.env_map.scatter_quad_dirs or DIR_BUCKETS
    legs = {}
    t0 = time.perf_counter()
    legs["B_c"] = convolved_cell(scene, vol, cpts, sdirs, env_img, cells_b,
                                 steps_b, vol.hg_g)
    legs["B_p"] = convolved_cell(scene, vol, pts, sdirs, env_img, cells_b,
                                 steps_b, vol.hg_g)
    legs["B_p64"] = convolved_cell(scene, vol, pts, sdirs, env_img, cells_b,
                                   max(64, steps_b), vol.hg_g)
    # oracle: cell-integrated env at ORACLE_DIRS cells (point-sampled env
    # quadrature aliases the sun region non-monotonically -- unusable as a
    # reference), ORACLE_STEPS transmittance
    legs["O_p"] = convolved_cell(scene, vol, pts, sdirs, env_img,
                                 ORACLE_DIRS, ORACLE_STEPS, vol.hg_g)
    O = np.asarray(legs["O_p"], np.float64)
    print(f"legs done ({time.perf_counter() - t0:.0f}s); "
          f"oracle mean {O.mean():.5f}", flush=True)

    Fn = np.asarray(F, np.float64)
    Bc = np.asarray(legs["B_c"], np.float64)
    Bp = np.asarray(legs["B_p"], np.float64)
    B64 = np.asarray(legs["B_p64"], np.float64)
    om = O.mean()

    def rep(name, a, b):
        d = a - b
        print(f"{name:22s} mean {d.mean() / om:+.5f}  "
              f"rel_rmse {np.sqrt((d ** 2).mean()) / om:.5f}")

    rep("outdir (F-B_c)", Fn, Bc)
    rep("spatial (B_c-B_p)", Bc, Bp)
    rep("quad16v64 (B_p-B_p64)", Bp, B64)
    rep("residual (B_p64-O_p)", B64, O)
    rep("TOTAL (F-O_p)", Fn, O)


if __name__ == "__main__":
    main()
