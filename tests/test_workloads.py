"""BASELINE workload tests: MNIST classification + 2D image fit +
checkpoint round-trip + metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import (MLPConfig, MRHEConfig,
                                              OptimizerConfig)
from neuralradiancecaching_tpu.io import assets, checkpoint
from neuralradiancecaching_tpu.models import image_fit, mnist_mlp
from neuralradiancecaching_tpu.utils import metrics


def test_mnist_trains_above_chance():
    """Config 1 sanity loop: tiny MLP must beat chance clearly on the
    (synthesized-images) MNIST data using the guarded momentum-SGD."""
    from neuralradiancecaching_tpu.config import mnist_config
    x, y = assets.load_mnist("train", limit=2048)
    preset = mnist_config()
    state, loss, acc = mnist_mlp.train(x, y, preset.mlp, preset.mlp_opt,
                                       steps=300, batch_size=256)
    assert acc > 0.8, (loss, acc)


def test_image_fit_psnr_improves():
    """Config 2: MRHE-2D + MLP regression on a small synthetic image."""
    img = jnp.asarray(assets.synthesize_sky(32, 64))
    img = img / img.max()
    mrhe_cfg = MRHEConfig(n_dims=2, n_levels=8, table_size=1024,
                          min_res=2, max_res=64, learning_rate=0.05)
    mlp_cfg = MLPConfig(in_features=16, hidden=32, out_features=3,
                        n_layers=3, output_relu=True, weight_init_std=0.05)
    opt = OptimizerConfig(learning_rate=0.01)
    state, psnr = image_fit.fit_image(img, steps=300, batch_size=2048,
                                      mrhe_cfg=mrhe_cfg, mlp_cfg=mlp_cfg,
                                      opt=opt)
    assert psnr > 18.0, psnr


def test_checkpoint_roundtrip(tmp_path):
    from neuralradiancecaching_tpu.models import nrc
    from tests.test_render_nrc import tiny_config

    cfg = tiny_config()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, state, metadata={"frames": 3})
    state2 = checkpoint.load(path, state)
    np.testing.assert_array_equal(np.asarray(state.hash_table),
                                  np.asarray(state2.hash_table))
    np.testing.assert_array_equal(np.asarray(state.mlp_params["w0"]),
                                  np.asarray(state2.mlp_params["w0"]))
    assert checkpoint.load_metadata(path) == {"frames": 3}


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = metrics.MetricsLogger(p)
    log.log(0, mse=1.0)
    log.log(1, mse=0.5, extra="x")
    log.write_csv(str(tmp_path / "m.csv"))
    log.close()
    import json
    rows = [json.loads(l) for l in open(p)]
    assert rows[0]["mse"] == 1.0 and rows[1]["step"] == 1


def test_quality_metrics():
    a = np.ones((4, 4, 3))
    b = np.zeros((4, 4, 3))
    assert metrics.rmse(a, a) == 0.0
    assert abs(metrics.rmse(a, b) - 1.0) < 1e-9
    assert metrics.relative_rmse(a, a) < 1e-9
    assert metrics.psnr(a, a) > 100


def test_checkpoint_rejects_dtype_and_config_mismatch(tmp_path):
    import jax
    import jax.numpy as jnp
    import pytest
    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.io import checkpoint as ck

    cfg = cfg_mod.nrc_online_config(16, 16)
    from neuralradiancecaching_tpu.models import nrc
    st = nrc.init_state(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    ck.save(path, st, metadata={"config_hash": ck.config_hash(cfg)})
    ck.load(path, st, expect_config_hash=ck.config_hash(cfg))  # ok
    with pytest.raises(ValueError, match="config hash"):
        ck.load(path, st, expect_config_hash="0" * 16)
    flat, treedef = jax.tree_util.tree_flatten(st)
    bad = jax.tree_util.tree_unflatten(
        treedef, [x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
                  for x in flat])
    with pytest.raises(ValueError, match="dtype"):
        ck.load(path, bad)


def test_compaction_cap_validated_against_rr_decay():
    import pytest
    from neuralradiancecaching_tpu import config as cfg_mod

    cfg_mod.PathTraceConfig()  # default rr_decay=0.5, cap 2.6: fine
    cfg_mod.PathTraceConfig(rr_decay=0.8, compact_events=0.0)  # disabled: ok
    with pytest.raises(ValueError, match="compact_events"):
        cfg_mod.PathTraceConfig(rr_decay=0.8)  # cap 2.6 below implied mean


def test_reference_exact_preset():
    from neuralradiancecaching_tpu import config as cfg_mod

    cfg = cfg_mod.reference_exact(64, 64)
    q = cfg.quirks
    assert all([q.world_space_lerp, q.duplicated_feature_grad, q.raw_oneblob,
                q.quantize_density_8bit, q.raw_envmap_dir, q.query_dir_phase])
    assert cfg.path.transmittance_mode == "quadrature"
    assert cfg.env_map.transmittance_mode == "quadrature"
    assert cfg.train.env_samples == 0
    assert cfg.path.compact_events == 0.0


def test_checkpoint_roundtrip_adam_state(tmp_path):
    """Adam optimizer state (second moments, hash moments, step counter)
    survives the checkpoint format; a momentum-SGD template refuses an
    Adam checkpoint (different tree)."""
    import dataclasses

    import pytest

    from neuralradiancecaching_tpu.models import nrc
    from tests.test_render_nrc import tiny_config

    cfg = tiny_config()
    acfg = dataclasses.replace(
        cfg,
        mlp_opt=dataclasses.replace(cfg.mlp_opt, kind="adam", beta1=0.9),
        mrhe=dataclasses.replace(cfg.mrhe, optimizer="adam"))
    state = nrc.init_state(jax.random.PRNGKey(0), acfg)
    # one real step so moments/counter are nonzero
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-4,
                             maxval=4)
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tgt = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (64, 3)))
    state, _ = nrc.train_step(state, pos, d, tgt, acfg)

    path = str(tmp_path / "ckpt_adam")
    checkpoint.save(path, state, metadata={
        "config_hash": checkpoint.config_hash(acfg)})
    state2 = checkpoint.load(path, state)
    assert int(state2.opt_step) == 1
    np.testing.assert_array_equal(np.asarray(state.hash_second),
                                  np.asarray(state2.hash_second))
    np.testing.assert_array_equal(np.asarray(state.mlp_second["w0"]),
                                  np.asarray(state2.mlp_second["w0"]))

    # warm-start semantics: an SGD-template load takes the shared leaves
    # (params) and drops the Adam moments -- config mismatch is guarded by
    # expect_config_hash, not the tree shape
    sgd_state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    state3 = checkpoint.load(path, sgd_state)
    np.testing.assert_array_equal(np.asarray(state.mlp_params["w0"]),
                                  np.asarray(state3.mlp_params["w0"]))
    assert state3.mlp_second is None
    with pytest.raises(ValueError):
        checkpoint.load(path, sgd_state,
                        expect_config_hash=checkpoint.config_hash(cfg))


def test_noise_subtracted_bias_recovers_known_bias():
    """The twin-pair protocol (metrics.noise_subtracted_bias) recovers a
    planted bias through much larger iid noise, and reports ~zero bias
    when there is none."""
    rng = np.random.default_rng(0)
    shape = (256, 256, 3)
    truth = 2.0 + rng.random(shape)
    bias_field = 0.02 * truth  # 2% relative bias
    sigma = 0.5

    def noisy(base):
        return base + rng.normal(0, sigma, shape)

    a1, a2 = noisy(truth + bias_field), noisy(truth + bias_field)
    r1, r2 = noisy(truth), noisy(truth)
    bias, floor = metrics.noise_subtracted_bias(a1, a2, r1, r2)
    rms = np.sqrt(np.mean(truth ** 2))
    true_bias = np.sqrt(np.mean(bias_field ** 2)) / rms
    assert abs(bias - true_bias) < 0.4 * true_bias, (bias, true_bias)
    assert floor > 5 * true_bias  # the raw comparison would be useless

    b0, _ = metrics.noise_subtracted_bias(noisy(truth), noisy(truth),
                                          noisy(truth), noisy(truth))
    assert b0 < 0.5 * true_bias, b0


def test_noise_subtracted_bias_err_interval_covers_truth():
    """noise_subtracted_bias_err's +-2 sigma interval covers the planted
    bias, agrees with noise_subtracted_bias on the point estimate, and the
    interval width matches the empirical run-to-run spread (the r5 GT
    protocol's statistical-safety claim)."""
    rng = np.random.default_rng(1)
    shape = (128, 128, 3)
    truth = 2.0 + rng.random(shape)
    bias_field = 0.02 * truth
    sigma = 0.25
    rms = np.sqrt(np.mean(truth ** 2))
    true_bias = np.sqrt(np.mean(bias_field ** 2)) / rms

    def run(seed):
        r = np.random.default_rng(seed)

        def noisy(base):
            return base + r.normal(0, sigma, shape)

        return metrics.noise_subtracted_bias_err(
            noisy(truth + bias_field), noisy(truth + bias_field),
            noisy(truth), noisy(truth))

    results = [run(s) for s in range(12)]
    covered = sum(lo <= true_bias <= hi for _, _, lo, hi in results)
    assert covered >= 10, (covered, true_bias, results)
    for b, _, lo, hi in results:
        assert lo <= b <= hi
