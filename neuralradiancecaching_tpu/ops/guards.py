"""NaN/Inf containment, matching the reference optimizer kernels.

The reference clamps bad gradients instead of preventing them
(nrc-step.comp:200-218, mrhe-step.comp:27-45): a value that is NaN, Inf or
has magnitude > 1000 is replaced by ``border * sign(x)``, and any parameter
that ends up non-finite (or > 1000 in magnitude) is reset to zero
(nrc-step.comp:231-234, mrhe-step.comp:52-55).

On TPU there are no device atomics or UB to contain, but the guards are kept
as a jnp ``where``-based gradient sanitizer so that training dynamics match
and online training can never be poisoned by a single NaN target.
"""

from __future__ import annotations

import jax.numpy as jnp

# magnitude beyond which a value counts as "bad" (nrc-step.comp:202)
BAD_MAGNITUDE = 1000.0


def is_bad(x: jnp.ndarray, magnitude: float = BAD_MAGNITUDE) -> jnp.ndarray:
    """NaN, Inf, or |x| > magnitude (IsNanOrInf, nrc-step.comp:200-203)."""
    return ~jnp.isfinite(x) | (jnp.abs(x) > magnitude)


def guard_delta(delta: jnp.ndarray, border: float) -> jnp.ndarray:
    """Replace bad gradient entries with ``border * sign``.

    NaNs map to 0 (GLSL sign(NaN) is undefined; 0 is the safe fix -- the
    reference would propagate the NaN into the weight and then zero the
    weight, net effect comparable).
    """
    sign = jnp.where(jnp.isnan(delta), 0.0, jnp.sign(delta))
    return jnp.where(is_bad(delta), border * sign, delta)


def reset_bad_params(w: jnp.ndarray,
                     magnitude: float = BAD_MAGNITUDE) -> jnp.ndarray:
    """Zero any parameter that went non-finite or exploded
    (nrc-step.comp:231-234)."""
    return jnp.where(is_bad(w, magnitude), 0.0, w)
