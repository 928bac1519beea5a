"""Native IO library (csrc/nrcio.cpp) parity tests vs the Python
implementations. Skipped when the library isn't built (run `make`)."""

import os

import numpy as np
import pytest

from neuralradiancecaching_tpu.io import exr, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libnrcio.so not built (run make)")


def test_hdr_decode_matches_python():
    path = "/root/reference/data/image/photostudio.hdr"
    if not os.path.exists(path):
        pytest.skip("reference hdr not present")
    from neuralradiancecaching_tpu.io import hdr as hdr_mod
    # python path: force by decoding payload manually
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while True:
        end = data.index(b"\n", pos)
        line = data[pos:end]
        pos = end + 1
        if line == b"":
            break
    end = data.index(b"\n", pos)
    res = data[pos:end].split()
    pos = end + 1
    h, w = int(res[1]), int(res[3])
    img_native = native.hdr_decode(data[pos:], w, h)
    img_loader = hdr_mod.read_hdr(path)  # goes through native too
    np.testing.assert_array_equal(img_native, img_loader)
    assert img_native.shape == (h, w, 3)
    assert np.isfinite(img_native).all()


def test_inv_cdfs_match_jax():
    import jax.numpy as jnp
    from neuralradiancecaching_tpu.ops import envmap
    rgb = np.random.default_rng(0).random((32, 64, 3)).astype(np.float32)
    ix_c, iy_c = native.build_inv_cdfs(rgb)
    ix_j, iy_j = envmap.build_inverse_cdfs(jnp.asarray(rgb))
    np.testing.assert_allclose(ix_c, np.asarray(ix_j), atol=1e-6)
    np.testing.assert_allclose(iy_c, np.asarray(iy_j), atol=1e-6)


def test_native_exr_readable():
    img = np.random.default_rng(1).random((12, 20, 3)).astype(np.float32)
    path = "/tmp/nrc_native_test.exr"
    native.write_exr(path, img)
    back = exr.read_exr(path)
    np.testing.assert_allclose(back, img, atol=2e-3)  # half precision


def test_native_cloud_deterministic():
    a = native.synthesize_cloud((32, 24, 40), seed=7)
    b = native.synthesize_cloud((32, 24, 40), seed=7)
    np.testing.assert_array_equal(a, b)
    assert 0.0 <= a.min() and a.max() <= 1.0
    c = native.synthesize_cloud((32, 24, 40), seed=8)
    assert np.abs(a - c).max() > 0.0


def test_native_density_roundtrip(tmp_path):
    vol = np.random.default_rng(2).random((5, 6, 7)).astype(np.float32)
    p = str(tmp_path / "vol.raw")
    vol.tofile(p)
    back = native.read_density(p, (5, 6, 7))
    np.testing.assert_array_equal(back, vol)


def test_native_idx1():
    path = "/root/reference/data/mnist/train-labels-idx1-ubyte"
    if not os.path.exists(path):
        pytest.skip("mnist labels not present")
    from neuralradiancecaching_tpu.io import assets
    lbl_c = native.read_idx1(path, 500)
    lbl_py = assets.read_idx_labels(path)[:500]
    np.testing.assert_array_equal(lbl_c, lbl_py)


def test_hdr_zero_count_packet_is_error(tmp_path):
    # a literal RLE packet with count==0 never advances x; both decoders
    # must reject it instead of spinning/scanning forever (ADVICE r1)
    w, h = 16, 1
    payload = bytes([2, 2, w >> 8, w & 0xFF, 0])  # scanline header + count=0
    with pytest.raises(ValueError):
        native.hdr_decode(payload + b"\x00" * 64, w, h)

    from neuralradiancecaching_tpu.io import hdr as hdr_mod
    path = tmp_path / "corrupt.hdr"
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + \
        f"-Y {h} +X {w}\n".encode()
    path.write_bytes(header + payload + b"\x00" * 64)
    import unittest.mock
    with unittest.mock.patch.object(native, "available", lambda: False):
        with pytest.raises(ValueError):
            hdr_mod.read_hdr(str(path))
