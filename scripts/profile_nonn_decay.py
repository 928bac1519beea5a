import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from neuralradiancecaching_tpu.utils import setup_cache
setup_cache()
from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.render import pathtrace, targets
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.scene.scene import make_scene

cfg = cfg_mod.progressive_1080p_config()
scene = make_scene(cfg, assets.load_cloud(), assets.load_env_map())
tcfg = targets._train_walk_cfg(cfg)
key = jax.random.PRNGKey(7)

@jax.jit
def live_decay(sc, key):
    k_v, k_t = jax.random.split(key)
    ro, rd = targets.train_ray_pool(sc, cfg, k_v)
    res = pathtrace.trace_path_collision(sc, tcfg, ro, rd, k_v,
                                         use_nn=True, env_samples=0)
    n = ro.shape[0] // max(1, cfg.train.vertex_oversample)
    pos, d = res.query_pos[:n], res.query_dir[:n]
    s = cfg.train.target_samples
    pos_t = jnp.tile(pos, (s, 1))
    d_t = phase_ops.sample_hg_direction(k_t, jnp.tile(d, (s, 1)),
                                        cfg.volume.hg_g)
    _, ev = pathtrace.trace_path_collision(
        sc, tcfg, pos_t, d_t, k_t, use_nn=False,
        env_samples=cfg.train.env_samples,
        max_bounces=cfg.train.target_bounces, collect_events=True)
    alive = (ev[..., 6].astype(jnp.float32) > 0.0)
    return alive.mean(axis=0)

for k in (7, 8, 9):
    frac = np.asarray(live_decay(scene, jax.random.PRNGKey(k)))
    print("key", k, " ".join(f"s{s}={frac[s]:.4f}" for s in (2, 3, 4, 5, 6, 8)),
          flush=True)
