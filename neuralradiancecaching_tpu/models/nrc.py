"""The neural radiance cache: MRHE + one-blob encoding into the tiny MLP,
with guarded online training.

This is the TPU equivalent of the reference's NeuralRadianceCache + MRHE
state objects (SURVEY.md §2) plus the NN math of nrc-train.comp /
nrc-forward.frag: parameters and optimizer state live in one pytree
(:class:`NRCState`); `query` is the inference path (fragment Forward,
nrc-forward.frag:503-534); `train_step` is the fused backward + both
optimizer steps (nrc-train.comp Backprop + nrc-step + mrhe-step) as one
jit-able function. Gradients come from `jax.grad` through the custom-VJP
hash encode, so the reference's hand-written layer-by-layer backprop with
atomicAdd reduction is replaced by batched matmuls + scatter-add.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import NRCConfig
from neuralradiancecaching_tpu.ops import mlp as mlp_ops
from neuralradiancecaching_tpu.ops import mrhe as mrhe_ops
from neuralradiancecaching_tpu.ops import oneblob as oneblob_ops
from neuralradiancecaching_tpu.ops import optimizers


class NRCState(NamedTuple):
    """All trainable state + optimizer state (the 36 weight/delta/momentum
    SSBOs + hash/delta tables of the reference, as a single pytree).

    The optional fields exist only when the corresponding Adam optimizer
    is configured (OptimizerConfig.kind / MRHEConfig.optimizer) -- `None`
    is an empty pytree subtree, so momentum-SGD states keep the r1/r2
    checkpoint layout bit-for-bit."""

    mlp_params: dict       # w0..w5 / b0..b5
    mlp_momentum: dict     # momentum-SGD momentum, or Adam first moment
    hash_table: jnp.ndarray
    mlp_second: dict | None = None      # Adam second moment (MLP)
    hash_momentum: jnp.ndarray | None = None  # Adam first moment (hash)
    hash_second: jnp.ndarray | None = None    # Adam second moment (hash)
    opt_step: jnp.ndarray | None = None  # Adam bias-correction counter  # (L, T, F)


def input_features(cfg: NRCConfig) -> int:
    """Encoded ray width: L*F MRHE features + 2*bins one-blob features
    (64 = 32 + 32 at reference settings, nrc-train.comp:703-713)."""
    return cfg.mrhe.n_outputs + cfg.oneblob.n_outputs


def init_state(key: jax.Array, cfg: NRCConfig) -> NRCState:
    expected = input_features(cfg)
    if cfg.mlp.in_features != expected:
        raise ValueError(
            f"MLPConfig.in_features={cfg.mlp.in_features} must equal the "
            f"encoded width {expected} (= mrhe {cfg.mrhe.n_outputs} + "
            f"oneblob {cfg.oneblob.n_outputs})")
    k_mlp, k_hash = jax.random.split(key)
    mlp_params = mlp_ops.init_params(k_mlp, cfg.mlp)
    hash_table = mrhe_ops.init_table(k_hash, cfg.mrhe)
    adam_mlp = cfg.mlp_opt.kind == "adam"
    adam_hash = cfg.mrhe.optimizer == "adam"
    return NRCState(
        mlp_params=mlp_params,
        mlp_momentum=optimizers.init_momentum(mlp_params),
        hash_table=hash_table,
        mlp_second=(optimizers.init_momentum(mlp_params) if adam_mlp
                    else None),
        hash_momentum=jnp.zeros_like(hash_table) if adam_hash else None,
        hash_second=jnp.zeros_like(hash_table) if adam_hash else None,
        opt_step=(jnp.zeros((), jnp.int32) if (adam_mlp or adam_hash)
                  else None),
    )


def encode(hash_table: jnp.ndarray, pos: jnp.ndarray, direction: jnp.ndarray,
           cfg: NRCConfig) -> jnp.ndarray:
    """EncodeRay (nrc-train.comp:703-713): [32 MRHE | 32 one-blob]."""
    pos_norm = mrhe_ops.normalize_pos(pos, cfg.volume.box_size,
                                      cfg.volume.box_center)
    if (cfg.mrhe.train_encode == "oct"
            and mrhe_ops.oct_supported(cfg.mrhe)):
        # one corner-packed row gather per level + oct-layout backward
        # (8x fewer gather/scatter ops; MRHEConfig.train_encode)
        mrhe_feats = mrhe_ops.encode_oct_train(hash_table, pos_norm,
                                               cfg.mrhe, cfg.quirks,
                                               pos_raw=pos)
    else:
        mrhe_feats = mrhe_ops.encode(hash_table, pos_norm, cfg.mrhe,
                                     cfg.quirks, pos_raw=pos)
    blob_feats = oneblob_ops.encode_dir(direction, cfg.oneblob, cfg.quirks)
    return jnp.concatenate([mrhe_feats, blob_feats], axis=-1)


def _inference_mlp(params, x: jnp.ndarray, cfg: NRCConfig) -> jnp.ndarray:
    """Query-path MLP forward: fused Pallas kernel (the reference's
    fully-fused ApplyWeights0-5, nrc-forward.frag:503-534) when enabled and
    the input is a flat batch; plain jnp otherwise."""
    if cfg.mlp.fused_inference and x.ndim == 2:
        from neuralradiancecaching_tpu.ops import pallas_mlp
        return pallas_mlp.apply(params, x, cfg.mlp)
    return mlp_ops.apply(params, x, cfg.mlp)


def query(state: NRCState, pos: jnp.ndarray, direction: jnp.ndarray,
          cfg: NRCConfig) -> jnp.ndarray:
    """Cache inference (the fragment Forward): (N,3),(N,3) -> (N,3)."""
    x = encode(state.hash_table, pos, direction, cfg)
    return _inference_mlp(state.mlp_params, x, cfg)


def bake(state: NRCState, cfg: NRCConfig) -> jnp.ndarray:
    """Bake the MRHE inference representation (ops/mrhe.py); call after each
    optimizer step. Default 'oct': corner-packed hash rows, ONE row gather
    per level per query, bit-exact vs the hash path. 'dense' keeps the r2
    dense-grid bake. Stored bf16 when the scene fields are (halves the
    query-gather bytes; the encode upcasts after its gather)."""
    mode = cfg.mrhe.inference_bake
    if mode == "oct":
        baked = mrhe_ops.bake_oct(state.hash_table, cfg.mrhe)
    elif mode == "dense":
        baked = mrhe_ops.bake_dense(state.hash_table, cfg.mrhe)
    else:
        return jnp.zeros((0,), dtype=state.hash_table.dtype)
    if cfg.volume.field_dtype == "bfloat16":
        baked = baked.astype(jnp.bfloat16)
    return baked


def encode_baked(state: NRCState, baked: jnp.ndarray, pos: jnp.ndarray,
                 direction: jnp.ndarray, cfg: NRCConfig) -> jnp.ndarray:
    """The gather half of query_baked: [32 MRHE via baked rows | 32 blob]
    feature rows (bf16 when MLPConfig.inference_dtype is bf16 and the
    'oct' bake ships). Split out so chunked query paths can run the
    gathers per chunk and the MLP ONCE over the whole frame
    (pathtrace.shade_and_query; a 32k-chunk MLP uses ~1% of the MXU)."""
    pos_norm = mrhe_ops.normalize_pos(pos, cfg.volume.box_size,
                                      cfg.volume.box_center)
    mode = cfg.mrhe.inference_bake
    # bf16 query compute (MLPConfig.inference_dtype): lerp weights, blob
    # encode and MLP matmuls in bf16; index math/fractions stay f32.
    # Only the shipped 'oct' bake supports it; output upcasts to f32.
    bf16 = (cfg.mlp.inference_dtype == "bfloat16" and mode == "oct")
    if mode == "oct":
        mrhe_feats = mrhe_ops.encode_with_oct(
            baked, pos_norm, cfg.mrhe, cfg.quirks, pos_raw=pos,
            compute_dtype=jnp.bfloat16 if bf16 else None)
    elif mode == "dense":
        mrhe_feats = mrhe_ops.encode_with_baked(state.hash_table, baked,
                                                pos_norm, cfg.mrhe,
                                                cfg.quirks)
    else:
        mrhe_feats = mrhe_ops.encode(state.hash_table, pos_norm, cfg.mrhe,
                                     cfg.quirks, pos_raw=pos)
    blob_feats = oneblob_ops.encode_dir(direction, cfg.oneblob, cfg.quirks)
    if bf16:
        blob_feats = blob_feats.astype(jnp.bfloat16)
    return jnp.concatenate([mrhe_feats, blob_feats], axis=-1)


def query_mlp(state: NRCState, x: jnp.ndarray, cfg: NRCConfig) -> jnp.ndarray:
    """The matmul half of query_baked: encode_baked rows -> (N, 3) f32."""
    if x.dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda w: w.astype(jnp.bfloat16), state.mlp_params)
        return _inference_mlp(params, x, cfg).astype(jnp.float32)
    return _inference_mlp(state.mlp_params, x, cfg)


def query_baked(state: NRCState, baked: jnp.ndarray, pos: jnp.ndarray,
                direction: jnp.ndarray, cfg: NRCConfig) -> jnp.ndarray:
    """Cache inference via the baked MRHE rows: 16 gathered rows per query
    ('oct') vs 128 for the pure hash path; numerically identical (exactly
    for 'oct'; for in-box positions with 'dense')."""
    return query_mlp(state, encode_baked(state, baked, pos, direction, cfg),
                     cfg)


def make_baked_query_fn(state: NRCState, baked: jnp.ndarray, cfg: NRCConfig):
    """query_fn closure for the render finish paths, carrying the
    encode/MLP split as attributes (shade_and_query hoists the MLP out of
    its lax.map chunks when these are present -- one big matmul instead of
    one 32k-row matmul per chunk)."""
    def query_fn(qpos, qdir):
        return query_baked(state, baked, qpos, qdir, cfg)

    query_fn.encode_fn = lambda qpos, qdir: encode_baked(state, baked, qpos,
                                                         qdir, cfg)
    query_fn.mlp_fn = lambda x: query_mlp(state, x, cfg)
    return query_fn


def compute_grads(state: NRCState, pos: jnp.ndarray, direction: jnp.ndarray,
                  target: jnp.ndarray, cfg: NRCConfig):
    """Batch-mean gradients + MSE stat (the nrc-train.comp Backprop pass,
    :985-1028, with the NaN-encoding early-out :993-999).

    Returns ((mlp_grads, hash_grad), mse). Gradients are means over the
    LOCAL batch; data-parallel callers pmean them across the mesh before
    applying (the TPU replacement for the reference's global atomicAdd
    reduction, SURVEY.md §2)."""

    def loss_fn(mlp_params, hash_table):
        x = encode(hash_table, pos, direction, cfg)
        valid = jnp.all(jnp.isfinite(x), axis=-1)
        x = jnp.where(valid[:, None], x, 0.0)
        return mlp_ops.nrc_loss(mlp_params, x, target, cfg.mlp, valid=valid,
                                kind=cfg.train.loss)

    (_, mse), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                         has_aux=True)(
        state.mlp_params, state.hash_table)
    return grads, mse


def apply_grads(state: NRCState, grads, cfg: NRCConfig) -> NRCState:
    """Both optimizer dispatches (nrc-step.comp + mrhe-step.comp), or the
    configured Adam extensions (OptimizerConfig.kind/MRHEConfig.optimizer)."""
    mlp_grads, hash_grad = grads
    opt_step = state.opt_step
    if opt_step is not None:
        opt_step = opt_step + 1

    def lr_scale(decay_steps, factor):
        # exponential lr decay (OptimizerConfig.lr_decay_steps); smooth in
        # the traced opt_step so the jitted program is step-agnostic
        if decay_steps <= 0 or opt_step is None:
            return None
        return factor ** (opt_step.astype(jnp.float32) / decay_steps)

    mlp_second = state.mlp_second
    if cfg.mlp_opt.kind == "adam":
        mlp_params, mlp_momentum, mlp_second = optimizers.adam_step(
            state.mlp_params, state.mlp_momentum, mlp_second, mlp_grads,
            opt_step, cfg.mlp_opt,
            lr_scale=lr_scale(cfg.mlp_opt.lr_decay_steps,
                              cfg.mlp_opt.lr_decay_factor))
    else:
        mlp_params, mlp_momentum = optimizers.momentum_sgd_step(
            state.mlp_params, state.mlp_momentum, mlp_grads, cfg.mlp_opt)

    hash_momentum, hash_second = state.hash_momentum, state.hash_second
    if cfg.mrhe.optimizer == "adam":
        from neuralradiancecaching_tpu.config import OptimizerConfig
        hcfg = OptimizerConfig(
            learning_rate=cfg.mrhe.learning_rate,
            weight_decay=cfg.mrhe.weight_decay,
            beta1=cfg.mrhe.beta1, beta2=cfg.mrhe.beta2, eps=cfg.mrhe.eps,
            clip_border=cfg.mrhe.clip_border,
            reset_border=cfg.mrhe.reset_border, kind="adam")
        hash_table, hash_momentum, hash_second = optimizers.adam_step(
            state.hash_table, hash_momentum, hash_second, hash_grad,
            opt_step, hcfg, skip_zero_grad=True,
            lr_scale=lr_scale(cfg.mrhe.lr_decay_steps,
                              cfg.mrhe.lr_decay_factor))
    else:
        hash_table = optimizers.hash_sgd_step(state.hash_table, hash_grad,
                                              cfg.mrhe)
    return NRCState(mlp_params, mlp_momentum, hash_table, mlp_second,
                    hash_momentum, hash_second, opt_step)


def dump_weights(state: NRCState, max_per_layer: int = 8) -> str:
    """Human-readable weight summary -- the debug equivalent of
    NeuralRadianceCache::PrintWeights (NeuralRadianceCache.cpp:558-594),
    with per-layer stats instead of a raw 20k-float dump."""
    lines = []
    for name in sorted(state.mlp_params):
        w = state.mlp_params[name]
        head = ", ".join(f"{float(v):+.4f}"
                         for v in jnp.ravel(w)[:max_per_layer])
        lines.append(f"{name} {tuple(w.shape)}: mean={float(w.mean()):+.5f} "
                     f"std={float(w.std()):.5f} absmax={float(jnp.abs(w).max()):.5f}"
                     f" head=[{head}]")
    h = state.hash_table
    lines.append(f"hash {tuple(h.shape)}: mean={float(h.mean()):+.5f} "
                 f"std={float(h.std()):.5f} absmax={float(jnp.abs(h).max()):.5f}")
    return "\n".join(lines)


def train_step(state: NRCState, pos: jnp.ndarray, direction: jnp.ndarray,
               target: jnp.ndarray, cfg: NRCConfig
               ) -> Tuple[NRCState, jnp.ndarray]:
    """One fused train+step pass over a batch of (pos, dir, target).

    Matches nrc-train.comp Backprop + nrc-step + mrhe-step:
      * targets clamped upstream (targets.py);
      * loss gradient = 2*(pred-target)/batch per channel;
      * guarded momentum-SGD on the MLP, guarded plain SGD on the tables.

    Returns (new_state, mse_stat).
    """
    grads, mse = compute_grads(state, pos, direction, target, cfg)
    return apply_grads(state, grads, cfg), mse
