"""Utilities: runtime setup, metrics logging, timing, checkpoints."""

from neuralradiancecaching_tpu.utils.runtime import setup_cache  # noqa: F401
