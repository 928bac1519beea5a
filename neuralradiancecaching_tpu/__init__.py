"""nrc-tpu: TPU-native neural radiance caching volume renderer.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
Vulkan-compute reference ``MichalSzczekocki/NeuralRadianceCaching``: a
Monte-Carlo volumetric path tracer over a 3D density grid whose radiance is
cached by a tiny 6-layer ReLU MLP over a multiresolution hash encoding plus a
one-blob direction encoding, trained online inside the render loop.

Layer map (TPU-native equivalents of the reference layers, see SURVEY.md):
  L0 utils   -> :mod:`neuralradiancecaching_tpu.utils`, :mod:`...io`
  L1 RHI     -> JAX device runtime / XLA (jax.Array, jit)
  L2 scene   -> :mod:`neuralradiancecaching_tpu.scene` (frozen pytrees)
  L3 renderer-> :mod:`neuralradiancecaching_tpu.render` (jitted step fns)
  L4 kernels -> :mod:`neuralradiancecaching_tpu.ops` (jnp + Pallas)
  L5 app     -> :mod:`neuralradiancecaching_tpu.cli`
  parallel   -> :mod:`neuralradiancecaching_tpu.parallel` (mesh/shard_map DP)
"""

__version__ = "0.1.0"

from neuralradiancecaching_tpu import config  # noqa: F401
