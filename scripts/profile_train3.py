"""r4 train-step levers: A/B the two-phase no-NN march split
(coll_nonn_live_fraction, shading phase-2 events at packed width) on the
full benched train step, and decompose grads+step (encode fwd, MLP-only
grads, hash-table-only grads = the scatter-add, optimizer apply).

LEGS env: comma list from {split, nosplit}. GRADS=0 skips the grads
decomposition.
"""

import dataclasses
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
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.ops import mlp as mlp_ops
from neuralradiancecaching_tpu.ops import mrhe as mrhe_ops
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render import targets
from neuralradiancecaching_tpu.scene.scene import make_scene

RUNS = int(os.environ.get("RUNS", 10))


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())  # hard sync
    t0 = time.perf_counter()
    for _ in range(RUNS):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / RUNS * 1000
    print(f"{name:18s} {dt:8.2f} ms", flush=True)
    return out


def main():
    cfg = cfg_mod.progressive_1080p_config()
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    print("scene + state ready", flush=True)
    key = jax.random.PRNGKey(7)

    legs = os.environ.get("LEGS", "split,nosplit").split(",")
    mse_by = {}
    for name in legs:
        lf = 0.0 if name == "nosplit" else cfg.path.coll_nonn_live_fraction
        c = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, coll_nonn_live_fraction=lf))

        def tstep(st, k, c=c):
            return frame_mod.train_only_step(st, scene, k, c)

        st, mse = timeit(f"train[{name}]", tstep, state, key)
        mse_by[name] = float(np.asarray(mse))
    for k, v in mse_by.items():
        print(f"  mse[{k}] = {v:.6f}", flush=True)

    if os.environ.get("GRADS", "1") == "0":
        return

    # --- grads+step decomposition on a FIXED batch ---
    batch = jax.jit(targets.generate_train_batch,
                    static_argnums=(1,))(scene, cfg, key)
    pos, d, target = batch.pos, batch.dir, batch.target
    np.asarray(target.sum())

    @jax.jit
    def enc_fwd(st, pos, d):
        return nrc.encode(st.hash_table, pos, d, cfg)

    timeit("encode fwd", enc_fwd, state, pos, d)

    @jax.jit
    def grads_mlp_only(st, pos, d, target):
        x = nrc.encode(jax.lax.stop_gradient(st.hash_table), pos, d, cfg)
        valid = jnp.all(jnp.isfinite(x), axis=-1)
        x = jnp.where(valid[:, None], x, 0.0)

        def loss_fn(p):
            return mlp_ops.nrc_loss(p, x, target, cfg.mlp, valid=valid,
                                    kind=cfg.train.loss)

        (_, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
            st.mlp_params)
        return g

    timeit("grads: mlp only", grads_mlp_only, state, pos, d, target)

    @jax.jit
    def grads_hash_only(st, pos, d, target):
        def loss_fn(tbl):
            x = nrc.encode(tbl, pos, d, cfg)
            valid = jnp.all(jnp.isfinite(x), axis=-1)
            x = jnp.where(valid[:, None], x, 0.0)
            return mlp_ops.nrc_loss(
                jax.tree_util.tree_map(jax.lax.stop_gradient,
                                       st.mlp_params),
                x, target, cfg.mlp, valid=valid, kind=cfg.train.loss)

        (_, mse), g = jax.value_and_grad(loss_fn, has_aux=True)(
            st.hash_table)
        return g

    timeit("grads: hash only", grads_hash_only, state, pos, d, target)

    @jax.jit
    def grads_full(st, pos, d, target):
        g, mse = nrc.compute_grads(st, pos, d, target, cfg)
        return g

    g = timeit("grads: full", grads_full, state, pos, d, target)

    @jax.jit
    def apply_only(st, g):
        return nrc.apply_grads(st, g, cfg)

    timeit("apply_grads", apply_only, state, g)

    @jax.jit
    def full(st, pos, d, target):
        return nrc.train_step(st, pos, d, target, cfg)

    timeit("train_step(batch)", full, state, pos, d, target)


if __name__ == "__main__":
    main()
