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
