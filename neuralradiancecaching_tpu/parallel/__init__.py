"""Multi-device scale-out: mesh construction + data-parallel frame steps.

The reference is strictly single-GPU (SURVEY.md §2: no DP/TP/PP, the only
cross-invocation reduction is float atomicAdd). The TPU framework makes the
communication story first-class: pixels/rays are sharded across an ICI mesh
with ``shard_map``, parameters are replicated, and gradient/loss reduction is
a ``psum`` over the mesh -- exactly replacing the single-GPU global atomic
reduction.
"""

from neuralradiancecaching_tpu.parallel.mesh import (  # noqa: F401
    default_mesh, make_mesh)
from neuralradiancecaching_tpu.parallel.data_parallel import (  # noqa: F401
    DPCapReport, dp_frame_step, dp_render, dp_render_banded,
    dp_render_banded_packed, dp_train_banded_frame, dp_train_step,
    probe_dp_caps)
