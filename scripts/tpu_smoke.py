"""Single-process TPU validation + cache warmer.

Runs the correctness checks that the CPU test suite can't cover (compiled
Pallas kernels, real-gather perf) on the live chip, and populates the
persistent compilation cache so bench.py and CLI runs start fast.

Usage: python scripts/tpu_smoke.py [--quick]
"""

import argparse
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    from neuralradiancecaching_tpu.utils import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    failures = []

    def check(name, cond, detail=""):
        status = "OK" if cond else "FAIL"
        print(f"[{status}] {name} {detail}", flush=True)
        if not cond:
            failures.append(name)

    # --- fused Pallas MLP vs jnp ---
    from neuralradiancecaching_tpu.config import MLPConfig
    from neuralradiancecaching_tpu.ops import mlp, pallas_mlp
    cfg = MLPConfig()
    params = mlp.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4096, 64)) * 0.5
    t0 = time.time()
    ref = np.asarray(mlp.apply(params, x, cfg))
    out = np.asarray(pallas_mlp.apply_fused(params, x, cfg))
    diff = np.abs(ref - out).max()
    check("pallas_mlp matches jnp", diff < 1e-4, f"maxdiff={diff:.2e} "
          f"({time.time()-t0:.0f}s)")

    # MLP throughput
    f = jax.jit(lambda p, xx: pallas_mlp.apply_fused(p, xx, cfg).sum())
    big = jax.random.normal(jax.random.PRNGKey(2), (1 << 20, 64))
    np.asarray(f(params, big))
    t0 = time.time()
    for _ in range(5):
        r = f(params, big)
    np.asarray(r)
    dt = (time.time() - t0) / 5
    print(f"  fused MLP: {dt*1000:.1f} ms / 1M queries "
          f"({1.048/dt:.0f} Mq/s)", flush=True)

    # --- render + train on the real cloud scene ---
    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.io import assets
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import frame as frame_mod
    from neuralradiancecaching_tpu.scene.scene import make_scene

    size = 128 if args.quick else 256
    ncfg = cfg_mod.nrc_online_config(width=size, height=size)
    t0 = time.time()
    scene = make_scene(ncfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.env_t_field.sum())
    print(f"scene build: {time.time()-t0:.1f}s", flush=True)

    state = nrc.init_state(jax.random.PRNGKey(0), ncfg)
    t0 = time.time()
    img = frame_mod.render_only_step(state, scene, jax.random.PRNGKey(1),
                                     ncfg)
    img_np = np.asarray(img)
    print(f"render compile+run: {time.time()-t0:.1f}s", flush=True)
    check("render finite", np.isfinite(img_np).all(),
          f"mean={img_np.mean():.3f}")

    t0 = time.time()
    img2 = frame_mod.render_only_step(state, scene, jax.random.PRNGKey(2),
                                      ncfg)
    np.asarray(img2)
    dt = time.time() - t0
    print(f"render steady: {dt*1000:.0f} ms = "
          f"{size*size/dt/1e6:.3f} Mrays/s", flush=True)

    t0 = time.time()
    state, mse = frame_mod.train_only_step(state, scene,
                                           jax.random.PRNGKey(3), ncfg)
    mse = float(np.asarray(mse))
    print(f"train compile+run: {time.time()-t0:.1f}s mse={mse:.4f}",
          flush=True)
    check("train mse finite", np.isfinite(mse))

    t0 = time.time()
    state, mse = frame_mod.train_only_step(state, scene,
                                           jax.random.PRNGKey(4), ncfg)
    np.asarray(mse)
    print(f"train steady: {time.time()-t0:.2f}s", flush=True)

    print("FAILURES:" if failures else "ALL OK", failures, flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
