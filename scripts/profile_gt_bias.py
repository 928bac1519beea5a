"""Decompose the shipped pipeline's image bias against the FULL unbiased
oracle (VERDICT r3 item 1).

The r3 numbers (profile_delta_bias / profile_bias_knobs) compared
collision-vs-delta with BOTH legs sharing the baked 'field' shading
(tau-field NEE + HG-convolved env in-scatter bake), so they isolate the
SAMPLER bias only. The north star's oracle is the fully unbiased
configuration: sampler='delta' + path.transmittance_mode='ratio' +
env_map.in_scatter_mode='mc' + env_map.transmittance_mode='ratio'
(every leg of the estimator unbiased; reference analogue: the no-cache
path tracer, path-tracer.frag:38-40).

Legs (all cache-off, fixed camera, twin pairs with disjoint key ranges):
  A 'shipped'  -- collision sampler + field NEE/in-scatter (the bench
                  render path)
  B 'coll+mc'  -- collision sampler + mc in-scatter + ratio transmittance
                  (isolates sampler bias under unbiased shading)
  C 'delta+f'  -- delta sampler + field shading (isolates shading-field
                  bias under an unbiased sampler)
  D 'oracle'   -- delta + ratio + mc (ground truth)

Reported: noise-subtracted rel RMSE + mean delta of every leg vs D.

Env: SIDE (default 256), SPP (default 64), LEGS (comma list, default all),
DIR_BUCKETS (default the shipped (32,64)).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("NRC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NRC_PLATFORM"])

import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.scene.scene import make_scene
from neuralradiancecaching_tpu.utils.metrics import noise_subtracted_bias

SIDE = int(os.environ.get("SIDE", 256))
SPP = int(os.environ.get("SPP", 64))
DIR_BUCKETS = tuple(int(x) for x in
                    os.environ.get("DIR_BUCKETS", "32,64").split(","))
# ASPECT=1.7778 reproduces the bench quality view (bench.py renders its
# quality legs through the scene built at the 16:9 bench camera); 1.0 is
# the r4 square view. The GT bias is VIEW-DEPENDENT (r5 finding: a
# lateral sun-side gradient dominates at 16:9), so decompositions must
# run at the view whose number they explain.
ASPECT = float(os.environ.get("ASPECT", 1.0))
MAXB = int(os.environ.get("MAXB", 16))


def leg_cfg(base, name):
    p, e = base.path, base.env_map
    if name == "shipped":
        p = dataclasses.replace(p, sampler="collision")
    elif name == "coll+mc":
        p = dataclasses.replace(p, sampler="collision",
                                transmittance_mode="ratio")
        e = dataclasses.replace(e, in_scatter_mode="mc",
                                transmittance_mode="ratio")
    elif name == "delta+f":
        p = dataclasses.replace(p, sampler="delta")
    elif name == "oracle":
        p = dataclasses.replace(p, sampler="delta",
                                transmittance_mode="ratio")
        e = dataclasses.replace(e, in_scatter_mode="mc",
                                transmittance_mode="ratio")
    else:
        raise SystemExit(f"unknown leg {name}")
    return dataclasses.replace(base, path=p, env_map=e)


def accum(cfg, scene, st, spp, key0):
    acc = None
    for i in range(spp):
        img = frame_mod.render_only_step(st, scene,
                                         jax.random.PRNGKey(key0 + i), cfg)
        acc = img if acc is None else acc + img
    return np.asarray(acc / spp)


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=ASPECT),
        render=dataclasses.replace(base.render,
                                   width=int(round(SIDE * ASPECT)),
                                   height=SIDE, use_nn=False),
        volume=dataclasses.replace(base.volume,
                                   field_dir_buckets=DIR_BUCKETS),
        # MAXB=16 matches the r3 bias protocol (profile_bias_knobs);
        # MAXB=32 matches the bench quality legs
        path=dataclasses.replace(base.path, max_bounces=MAXB))
    density, env = assets.load_cloud(), assets.load_env_map()

    legs = os.environ.get("LEGS", "shipped,coll+mc,delta+f,oracle").split(",")
    if "oracle" not in legs:
        legs.append("oracle")
    cache_dir = os.environ.get("LEG_CACHE", "/tmp/gt_legs")
    os.makedirs(cache_dir, exist_ok=True)
    imgs = {}
    for name in legs:
        cfg = leg_cfg(base, name)
        # fixed-seed legs are deterministic given the full config: cache on
        # its hash so field-knob iterations skip the unchanged legs
        # (oracle 231 s, coll+mc 187 s per run)
        import hashlib
        # repr(cfg) is deterministic across processes (hash(cfg) is NOT:
        # str field hashes are salted per interpreter)
        digest = hashlib.sha1(repr(cfg).encode()).hexdigest()[:12]
        tag = f"{name.replace('+', '_')}_{SIDE}_{SPP}_{digest}"
        path = os.path.join(cache_dir, tag + ".npz")
        if os.path.exists(path):
            z = np.load(path)
            imgs[name] = (z["a"], z["b"])
            print(f"{name:9s} mean={z['a'].mean():.5f}/{z['b'].mean():.5f} "
                  f"(cached)", flush=True)
            continue
        scene = make_scene(cfg, density, env)
        np.asarray(scene.coll_field.sum())
        st = nrc.init_state(jax.random.PRNGKey(0), cfg)
        t0 = time.perf_counter()
        a = accum(cfg, scene, st, SPP, 1000)
        b = accum(cfg, scene, st, SPP, 9000)
        print(f"{name:9s} mean={a.mean():.5f}/{b.mean():.5f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        imgs[name] = (a, b)
        np.savez(path, a=a, b=b)

    da, db = imgs["oracle"]
    d_bar = (da + db) / 2
    for name in legs:
        if name == "oracle":
            continue
        ca, cb = imgs[name]
        bias, floor = noise_subtracted_bias(ca, cb, da, db)
        c_bar = (ca + cb) / 2
        print(f"{name:9s} vs oracle: bias rel_rmse={bias:.5f} "
              f"mean_delta={(c_bar.mean() - d_bar.mean()) / d_bar.mean():+.5f}"
              f" floor={floor:.5f}")


if __name__ == "__main__":
    main()
