"""Fused tiny-MLP forward as a single Pallas TPU kernel.

The reference's signature trick is the "fully-fused" MLP: all six layers of
the 64-wide network evaluated in registers per GPU thread with zero global
traffic for activations (nrc-forward.frag ApplyWeights0-5). The TPU
equivalent is batch-tiled: a (TB, 64) activation block stays in VMEM across
ALL six matmuls while every weight matrix is VMEM-resident (~83 KB total),
so the only HBM traffic per tile is the input block in and the output block
out. XLA's unfused path would round-trip five (B, 64) activation tensors
through HBM.

Used for the inference/query path; training gradients go through the plain
jnp forward (ops/mlp.py) via a custom_vjp so `jax.grad` works unchanged.
Falls back to interpreter mode off-TPU (tests on the CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralradiancecaching_tpu.config import MLPConfig
from neuralradiancecaching_tpu.ops import mlp as mlp_ops

TILE_B = 512
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fused_kernel(n_layers: int, output_relu: bool, activation: str):
    def act(h):
        if activation == "sigmoid":
            return jax.nn.sigmoid(h)
        return jnp.maximum(h, 0.0)

    def kernel(x_ref, *refs):
        # refs: w0, b0, w1, b1, ..., out_ref
        out_ref = refs[-1]
        h = x_ref[:]
        for i in range(n_layers):
            w = refs[2 * i][:]
            b = refs[2 * i + 1][:]
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < n_layers - 1 or output_relu:
                h = act(h)
        out_ref[:] = h

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def apply_fused(params, x: jnp.ndarray, cfg: MLPConfig,
                interpret: bool = False) -> jnp.ndarray:
    """Fused forward: (B, in_features) -> (B, out_features).

    Matches ops.mlp.apply bit-for-bit up to matmul accumulation order.
    """
    b_total, d_in = x.shape
    assert d_in == cfg.in_features
    d_out = cfg.out_features
    d_out_pad = _round_up(d_out, _LANE)

    # pad batch to the tile size and the final layer to lane width
    b_pad = _round_up(max(b_total, 1), TILE_B)
    if b_pad != b_total:
        x = jnp.pad(x, ((0, b_pad - b_total), (0, 0)))

    dims = mlp_ops.layer_dims(cfg)
    inputs = [x]
    for i in range(cfg.n_layers):
        w = params[f"w{i}"]
        b = params[f"b{i}"].reshape(1, -1)
        if i == cfg.n_layers - 1 and dims[i + 1] != d_out_pad:
            w = jnp.pad(w, ((0, 0), (0, d_out_pad - dims[i + 1])))
            b = jnp.pad(b, ((0, 0), (0, d_out_pad - dims[i + 1])))
        inputs.append(w)
        inputs.append(b)

    grid = (b_pad // TILE_B,)
    in_specs = [pl.BlockSpec((TILE_B, d_in), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for i in range(cfg.n_layers):
        w_shape = inputs[1 + 2 * i].shape
        b_shape = inputs[2 + 2 * i].shape
        in_specs.append(pl.BlockSpec(w_shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b_shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _fused_kernel(cfg.n_layers, cfg.output_relu, cfg.activation),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_B, d_out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, d_out_pad), jnp.float32),
        interpret=interpret,
    )(*inputs)
    return out[:b_total, :d_out]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def apply(params, x: jnp.ndarray, cfg: MLPConfig) -> jnp.ndarray:
    """Fused forward with jnp-autodiff backward: drop-in for ops.mlp.apply
    on 2D inputs. On non-TPU backends uses the plain jnp forward."""
    if _on_tpu():
        return apply_fused(params, x, cfg)
    return mlp_ops.apply(params, x, cfg)


def _apply_fwd(params, x, cfg):
    return apply(params, x, cfg), (params, x)


def _apply_bwd(cfg, res, g):
    params, x = res
    _, vjp = jax.vjp(lambda p, xx: mlp_ops.apply(p, xx, cfg), params, x)
    return vjp(g)


apply.defvjp(_apply_fwd, _apply_bwd)
