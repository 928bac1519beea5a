"""Renderers: the reference's L3/L4 render + train passes as jitted step
functions (the per-frame Vulkan command buffer becomes one XLA program)."""
