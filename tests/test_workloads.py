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
