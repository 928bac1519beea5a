"""Device kernels: the TPU equivalents of the reference's GLSL shaders.

Every GLSL kernel from SURVEY.md §2 maps here:
  nrc-train.comp  -> mrhe.py + oneblob.py + mlp.py (+ render/targets.py)
  nrc-step.comp   -> optimizers.py (guarded momentum SGD)
  mrhe-step.comp  -> optimizers.py (guarded plain SGD)
  nrc-forward     -> mlp.py / pallas_mlp.py + render/pathtrace.py
  shared helpers  -> volume.py (AABB/transmittance), phase.py (HG), envmap.py
"""
