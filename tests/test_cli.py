"""CLI smoke tests (fast subcommands only; the render subcommands are
covered at module level -- building the full cloud tau-field on the CPU
test runner is too slow for CI)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_mnist(tmp_path):
    # --platform cpu goes through jax.config (env vars are ignored in
    # containers where jax is pre-imported with a different platform)
    env = dict(os.environ, NRC_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "neuralradiancecaching_tpu.cli",
         "--platform", "cpu", "mnist",
         "--steps", "60", "--limit", "1024",
         "--metrics", str(tmp_path / "m.jsonl")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mnist:" in r.stdout
    assert (tmp_path / "m.jsonl").exists()


def test_band_rows_mesh_divisibility():
    """--mesh band selection must satisfy dp_render_banded's
    height % (n_dev * rows) == 0 at the advertised default sizes
    (review r3: 1080p/8 and 800px/8 crashed before)."""
    from neuralradiancecaching_tpu.cli import _band_rows

    for w, h, n in [(1920, 1080, 1), (1920, 1080, 8), (800, 800, 8),
                    (800, 800, 4), (1920, 1080, 4), (864, 432, 8)]:
        rows = _band_rows(w, h, n)
        assert rows is not None, (w, h, n)
        assert h % (n * rows) == 0, (w, h, n, rows)
    # small frames stay unbanded
    assert _band_rows(64, 64, 8) is None


def test_progressive_mesh_probe_caps_drop_free(tmp_path):
    """`progressive --mesh 8 --probe-caps auto` (VERDICT r4 item 4): the
    per-shard tightened caps must produce a bit-identical image to the
    uncapped drop-free oracle. 128x64 with 8-row bands = exactly one band
    per device, so per-shard query/event fractions span the full
    sky-vs-cloud skew (the worst case for frame-mean cap sizing). Caps
    change no RNG stream, so any image difference would be a drop."""
    import numpy as np

    env = dict(os.environ, NRC_PLATFORM="cpu",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8")
    out = {}
    for mode in ("auto", "uncapped"):
        d = tmp_path / mode
        r = subprocess.run(
            [sys.executable, "-m", "neuralradiancecaching_tpu.cli",
             "--platform", "cpu", "progressive",
             "--width", "128", "--height", "64", "--frames", "2",
             "--move-every", "4", "--band-rows", "8",
             "--mesh", "8", "--probe-caps", mode, "--out", str(d)],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, (r.stderr[-3000:], r.stdout[-500:])
        if mode == "auto":
            # the probe ran and actually tightened below the 1.0 default
            assert "probe-caps: query_cap=" in r.stdout, r.stdout
            qc = float(r.stdout.split("query_cap=")[1].split()[0])
            assert qc < 1.0, r.stdout
        from neuralradiancecaching_tpu.io import exr
        out[mode] = exr.read_exr(str(d / "progressive.exr"))
    np.testing.assert_array_equal(out["auto"], out["uncapped"])
