"""Sub-decompose the deferred event SHADE at the shipped 1080p operating
point (the ~55 ms half of the packed finish, profile_finish2): compact
prefix pack vs event-row gather vs radiance-field gather vs segment_sum.
Pipelined timings (dispatch F, sync once)."""

import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.ops import compact, lightfield
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render import pathtrace, tiled
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H, BAND, FRAMES = 1920, 1080, 54, 8


def main():
    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(
            cfg.render, width=W, height=H, use_nn=True,
            query_cap_fraction=0.171875, shade_cap_fraction=0.328125,
            live_pack_fraction=0.21875),
    )
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    np.asarray(scene.env_t_field.sum())

    state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    for i in range(3):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(100 + i),
                                             cfg)
    np.asarray(state.hash_table.sum())

    baked = nrc.bake(state, cfg)
    pack = tiled.frame_live_pack(scene, cfg, BAND)
    inv, rgb_p, trans_p, qp, qd, qw, ev = tiled._packed_bands_program(
        scene, jax.random.PRNGKey(0), cfg, BAND, pack=pack)
    np.asarray(rgb_p.sum())
    n = rgb_p.shape[0]
    k = ev.shape[1]
    base = W * H
    cap_e = min(n * k, max(1024, int(base * cfg.render.shade_cap_fraction)))
    print(f"packed n={n} k={k} cap_e={cap_e}", flush=True)

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
        t0 = time.perf_counter()
        for _ in range(FRAMES):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
        print(f"{name:28s} {(time.perf_counter()-t0)/FRAMES*1000:8.1f} ms",
              flush=True)
        return out

    @jax.jit
    def step1_pack(ev):
        w_nk = ev[:, :, 6]
        counts = jnp.sum((w_nk > 0.0).astype(jnp.int32), axis=1)
        row, slot, val_e = compact.compact_prefix(counts, cap_e)
        return row, slot, val_e

    row, slot, val_e = timeit("pack (compact_prefix)", step1_pack, ev)

    @jax.jit
    def step2_rows(ev, row, slot):
        flat = ev.reshape(n * k, 7)
        idx = row * k + jnp.minimum(slot, k - 1)
        return jnp.take(flat, idx, axis=0).astype(jnp.float32)

    rows = timeit("event-row gather", step2_rows, ev, row, slot)

    @jax.jit
    def step3_light(rows):
        return pathtrace.trace_scene(scene, cfg, rows[:, 0:3], rows[:, 3:6],
                                     jax.random.PRNGKey(0),
                                     cfg.env_map.n_samples)

    light = timeit("radiance-field light", step3_light, rows)

    # split step3: index math only vs the raw field gather
    @jax.jit
    def step3a_index(rows):
        pos, d = rows[:, 0:3], rows[:, 3:6]
        vol = cfg.volume
        from neuralradiancecaching_tpu.ops import volume as volume_ops
        nx, ny, nz = vol.field_shape
        uvw = volume_ops.world_to_uvw(pos, vol.box_size, vol.box_center)
        ijk = jnp.clip((uvw * jnp.asarray(vol.field_shape, uvw.dtype))
                       .astype(jnp.int32), 0,
                       jnp.asarray(vol.field_shape, jnp.int32) - 1)
        vox = ijk[..., 0] * (ny * nz) + ijk[..., 1] * nz + ijk[..., 2]
        return vox

    vox = timeit("  index math only", step3a_index, rows)

    @jax.jit
    def step3b_gather(vox):
        row_idx = vox * (lightfield.L_N_THETA * lightfield.L_N_PHI)
        return jnp.take(scene.env_s_field, row_idx, axis=0)

    timeit("  raw field gather", step3b_gather, vox)

    @jax.jit
    def step4_scatter(rows, light, row, val_e):
        contrib = jnp.where(val_e[:, None], rows[:, 6:7] * light, 0.0)
        seg = jnp.where(val_e, row, n)
        return jax.ops.segment_sum(contrib, seg, num_segments=n + 1,
                                   indices_are_sorted=True)[:n]

    timeit("sorted segment_sum", step4_scatter, rows, light, row, val_e)

    # --- segment_sum alternatives (unique sorted (row, slot) pairs) ---
    @jax.jit
    def alt_segscan(ev, rows, light, row, slot, val_e):
        w_nk = ev[:, :, 6]
        counts = jnp.sum((w_nk > 0.0).astype(jnp.int32), axis=1)
        cum = jnp.cumsum(counts)
        offs = cum - counts
        contrib = jnp.where(val_e[:, None], rows[:, 6:7] * light, 0.0)
        start = (slot == 0)

        def seg_op(a, b):
            va, fa = a
            vb, fb = b
            return jnp.where(fb, vb, va + vb), fa | fb

        vals, _ = jax.lax.associative_scan(
            seg_op, (contrib, jnp.broadcast_to(start[:, None], contrib.shape)))
        idx = jnp.clip(jnp.minimum(cum, cap_e) - 1, 0, cap_e - 1)
        out = jnp.take(vals, idx, axis=0)
        return jnp.where(((counts > 0) & (offs < cap_e))[:, None], out, 0.0)

    seg_ref = timeit("alt: segmented scan", alt_segscan, ev, rows, light,
                     row, slot, val_e)

    @jax.jit
    def alt_scatter_set(rows, light, row, slot, val_e):
        contrib = jnp.where(val_e[:, None], rows[:, 6:7] * light, 0.0)
        r = jnp.where(val_e, row, n)
        out_nk = jnp.zeros((n + 1, k, 3), contrib.dtype).at[r, slot].set(
            contrib, mode="drop")
        return jnp.sum(out_nk[:n], axis=1)

    set_ref = timeit("alt: scatter-set (n,k)", alt_scatter_set, rows, light,
                     row, slot, val_e)

    @jax.jit
    def alt_cumsum_diff(ev, rows, light, val_e):
        w_nk = ev[:, :, 6]
        counts = jnp.sum((w_nk > 0.0).astype(jnp.int32), axis=1)
        cum = jnp.cumsum(counts)
        offs = cum - counts
        contrib = jnp.where(val_e[:, None], rows[:, 6:7] * light, 0.0)
        c = jnp.cumsum(contrib, axis=0)
        hi = jnp.take(c, jnp.clip(jnp.minimum(cum, cap_e) - 1, 0, cap_e - 1),
                      axis=0)
        lo_idx = jnp.clip(offs - 1, 0, cap_e - 1)
        lo = jnp.where((offs > 0)[:, None], jnp.take(c, lo_idx, axis=0), 0.0)
        return jnp.where(((counts > 0) & (offs < cap_e))[:, None],
                         hi - lo, 0.0)

    timeit("alt: cumsum + boundary diff", alt_cumsum_diff, ev, rows, light,
           val_e)

    base_ref = step4_scatter(rows, light, row, val_e)
    for nm, r in (("segscan", seg_ref), ("scatter-set", set_ref)):
        err = float(jnp.max(jnp.abs(jnp.asarray(r)
                                    - jnp.asarray(base_ref[:n]))))
        print(f"  {nm} max abs err vs segment_sum: {err:.2e}", flush=True)

    @partial(jax.jit, static_argnames=())
    def full(ev, rgb):
        def qf(p, d):
            return jnp.zeros((p.shape[0], 3), p.dtype)
        c = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render,
                                            query_cap_fraction=1e-9))
        return pathtrace.shade_and_query(scene, c, rgb, qp, qd,
                                         jnp.zeros_like(qw), qf,
                                         events=ev, cap_n=base)

    timeit("full shade (query off)", full, ev, rgb_p)


if __name__ == "__main__":
    main()
