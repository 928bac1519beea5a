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
