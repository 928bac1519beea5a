"""IO (HDR/EXR/PNG/assets) + scene/camera tests."""

import os

import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import (CameraConfig, DirLightConfig,
                                              EnvMapConfig)
from neuralradiancecaching_tpu.io import assets, exr
from neuralradiancecaching_tpu.io.hdr import read_hdr
from neuralradiancecaching_tpu.ops import envmap as envmap_ops
from neuralradiancecaching_tpu.scene import camera as cam
from neuralradiancecaching_tpu.scene import scene as scene_mod


def test_read_reference_hdr():
    path = "/root/reference/data/image/photostudio.hdr"
    if not os.path.exists(path):
        return
    img = read_hdr(path)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 0 and img.shape[1] == 2 * img.shape[0]  # equirect
    assert np.isfinite(img).all()
    assert img.max() > 0.1


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, img, half=False)
    back = exr.read_exr(p)
    np.testing.assert_allclose(back, img, atol=1e-6)
    exr.write_exr(p, img, half=True)
    back = exr.read_exr(p)
    np.testing.assert_allclose(back, img, atol=2e-3)


def test_png_write(tmp_path):
    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "t.png")
    exr.write_png(p, img)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_cloud_synthesis_shape_and_determinism():
    a = assets.synthesize_cloud()
    b = assets.synthesize_cloud()
    assert a.shape == (125, 85, 153)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert a.max() > 0.1  # nonempty cloud
    np.testing.assert_array_equal(a, b)
    # edges empty (falloff) so clamp-to-border is consistent
    assert a[0].max() == 0.0 and a[-1].max() == 0.0


def test_mnist_loader():
    x, y = assets.load_mnist("train", limit=256)
    assert x.shape == (256, 784)
    assert y.shape == (256,)
    assert set(np.unique(y)).issubset(set(range(10)))
    assert 0.0 <= x.min() and x.max() <= 1.0


def test_camera_rays_center_pixel():
    cfg = CameraConfig()
    c = cam.make_camera(cfg)
    ro, rd = cam.pixel_rays(c, 4, 4)
    assert ro.shape == (16, 3) and rd.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(ro[0]), [0, 0, -64])
    # all rays unit length, pointing roughly +z (camera looks at +z)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rd), axis=1), 1.0,
                               rtol=1e-5)
    assert np.all(np.asarray(rd)[:, 2] > 0.5)


def test_camera_fov():
    # corner ray angle vs fov: for 60deg fov the half-angle to the image
    # edge (y direction) is 30 deg
    cfg = CameraConfig()
    c = cam.make_camera(cfg)
    ro, rd = cam.pixel_rays(c, 1001, 1001)
    mid = 1001 // 2
    edge_ray = np.asarray(rd).reshape(1001, 1001, 3)[0, mid]  # top edge
    angle = np.degrees(np.arccos(edge_ray @ np.array([0, 0, 1.0])))
    assert abs(angle - 30.0) < 0.15


def test_dir_light_from_zenith():
    d = scene_mod.dir_from_zenith_azimuth(-1.57, 0.0)
    # points almost straight down
    assert d[1] < -0.999


def test_invert_cdf_golden():
    # cdf of uniform pdf over 4 bins: [0.25, 0.5, 0.75, 1.0]
    cdf = jnp.array([[0.25, 0.5, 0.75, 1.0]])
    inv = np.asarray(envmap_ops.invert_cdf(cdf))[0]
    # reference InvertCdf: first p with cdf[p] >= i/4, over i=0..3 -> p/4
    np.testing.assert_allclose(inv, [0.0, 0.0, 0.25, 0.5])


def test_envmap_importance_sampling_prefers_bright_rows():
    import jax
    from neuralradiancecaching_tpu.config import QuirkFlags
    img = np.ones((16, 32, 3), dtype=np.float32) * 0.01
    img[4] = 10.0  # one bright row
    env = envmap_ops.make_envmap(jnp.asarray(img), EnvMapConfig())
    d, rad = envmap_ops.importance_sample(env, jax.random.PRNGKey(0),
                                          (4096,), QuirkFlags())
    # most samples should land on the bright row (theta_norm ~ 4/16)
    frac_bright = float((rad[:, 0] > 1.0).mean())
    assert frac_bright > 0.8
    # directions unit-normalized in the fixed path
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               rtol=1e-5)


def test_envmap_direct_lookup():
    img = np.zeros((8, 16, 3), dtype=np.float32)
    img[:, :, 0] = 1.0
    env = envmap_ops.make_envmap(jnp.asarray(img), EnvMapConfig())
    rgb = envmap_ops.sample_direct(env, jnp.array([0.0, 0.0, 1.0]), hpm=False)
    np.testing.assert_allclose(np.asarray(rgb), [1.0, 0.0, 0.0], atol=1e-6)
    rgb = envmap_ops.sample_direct(env, jnp.array([0.0, 0.0, 1.0]), hpm=True)
    np.testing.assert_allclose(np.asarray(rgb), [8.0, 0.0, 0.0], atol=1e-5)


def test_env_corner_lookup_matches_4gather():
    import jax
    img = np.random.default_rng(5).random((16, 32, 3)).astype(np.float32)
    env = envmap_ops.make_envmap(jnp.asarray(img), EnvMapConfig())
    uv = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (2048, 2))
                     .astype(np.float32))
    a = envmap_ops._bilinear_wrap_u(env.image, uv)
    b = envmap_ops.bilinear_lookup(env, uv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)
