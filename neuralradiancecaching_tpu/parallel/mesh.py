"""Device-mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1D data-parallel mesh over the first n devices (v5e-8 style: a single
    ring; ray/pixel sharding only needs the one axis)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def default_mesh() -> Mesh:
    return make_mesh()
