"""MS-TCN: multi-stage temporal convolutional network.

Reference: ``networks.py:298-347``.  Stage 1 runs on raw features; 3
refinement stages run on the softmaxed predictions of the previous stage; the
final output is the **element-wise max of logits across stages**
(``networks.py:317-319`` — a deviation from canonical MS-TCN, preserved).
Each stage: 1x1 conv -> 20 dilated residual layers (dilation 2^i) -> 1x1 conv,
all frame-masked.  Returns raw logits (trained with CE, ``train.py:266-267``).

TPU design: convs run in ``[B, T, C]`` (NWC) layout via
``lax.conv_general_dilated`` so the K*Cin x Cout contraction lands on the MXU;
a Pallas fused residual-layer kernel (ops/conv_pallas.py) can replace the
dilated conv + relu + 1x1 + dropout + residual + mask chain to cut HBM
round-trips across the 80 layers.
"""

from __future__ import annotations

import os as _os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

# Rematerialization policy for the training backward, read at TRACE time
# (inside apply, so setting PVA_MSTCN_REMAT after import still takes effect
# on the next compile).  'layer': jax.checkpoint around each dilated
# residual layer; 'stage': per stage; 'none' (default): let XLA save
# linearization points.  MEASURED: both remat variants LOSE on the
# B=8,T=4096 bf16 step (none 6.40 ms vs layer 7.26 / stage 9.91 —
# tools/ab_mstcn_bwd.py, docs/PERF_NOTES.md): recompute cost exceeds the
# saved-intermediate traffic at C=64.  Kept for memory-constrained shapes
# (T >> 4096) where remat trades speed for HBM.
def _remat() -> str:
    return _os.environ.get("PVA_MSTCN_REMAT", "none")

from ..ops.conv import conv1d, dilated_residual_layer, init_conv1d
from ..ops.masking import length_mask
from .common import split_rng


@dataclass(frozen=True)
class MSTCNConfig:
    dim: int = 400
    num_stages: int = 4
    num_layers: int = 20
    num_f_maps: int = 64
    n_class: int = 48
    dropout_rate: float = 0.5
    use_pallas: bool = False


def _init_stage(rng, num_layers, num_f_maps, dim, n_class) -> dict:
    keys = jax.random.split(rng, 2 * num_layers + 2)
    return {
        "conv_in": init_conv1d(keys[0], dim, num_f_maps, 1),
        "layers": [
            {
                "conv_dilated": init_conv1d(keys[2 * i + 1], num_f_maps, num_f_maps, 3),
                "conv_1x1": init_conv1d(keys[2 * i + 2], num_f_maps, num_f_maps, 1),
            }
            for i in range(num_layers)
        ],
        "conv_out": init_conv1d(keys[-1], num_f_maps, n_class, 1),
    }


def init(rng, cfg: MSTCNConfig) -> dict:
    keys = jax.random.split(rng, cfg.num_stages)
    stages = [_init_stage(keys[0], cfg.num_layers, cfg.num_f_maps, cfg.dim, cfg.n_class)]
    for s in range(1, cfg.num_stages):
        stages.append(
            _init_stage(keys[s], cfg.num_layers, cfg.num_f_maps, cfg.n_class, cfg.n_class)
        )
    return {"stages": stages}


def _pack2_eligible(x, cfg) -> bool:
    """Frame-pair packing (ops/conv.py PACK2) applies when the tap
    formulation is on, T is even, and no escape-hatch layer impl
    (fused-bwd / packed-bwd / explicit Pallas stage) was requested."""
    from ..ops import conv as _conv

    return (
        _conv.PACK2
        and _conv.CONV_TAPS
        and not _conv.PACK_BWD
        and not _conv._fused_bwd_enabled()
        and not cfg.use_pallas
        and x.shape[1] % 2 == 0
    )


def _apply_stage_pack2(stage, x, mask, cfg, train, rng):
    """Packed stage: one contiguous reshape in, one out; every conv in the
    stage runs as a 2C-wide dot (bit-identical to the unpacked stage —
    see ops/conv.py pack2 notes).  Reference stage: networks.py:323-334."""
    from ..ops.conv import (
        conv1x1_pack2, dilated_residual_layer_pack2, pack2, unpack2,
    )

    b, t, _ = x.shape
    c = cfg.num_f_maps
    out = conv1x1_pack2(stage["conv_in"], pack2(x))
    maskp = jnp.repeat(mask.reshape(b, t // 2, 2), c, axis=-1)
    rngs = split_rng(rng, len(stage["layers"]))
    remat_layer = _remat() == "layer" and train
    for i, layer in enumerate(stage["layers"]):
        fn = partial(
            dilated_residual_layer_pack2, dilation=2 ** i,
            dropout_rate=cfg.dropout_rate, train=train,
        )
        if remat_layer:
            fn = jax.checkpoint(
                lambda lyr, o, m, r, _f=fn: _f(lyr, o, m, rng=r))
            out = fn(layer, out, maskp, rngs[i])
        else:
            out = fn(layer, out, maskp, rng=rngs[i])
    return unpack2(conv1x1_pack2(stage["conv_out"], out)) * mask


def _apply_stage(stage, x, mask, cfg, train, rng):
    if _pack2_eligible(x, cfg):
        return _apply_stage_pack2(stage, x, mask, cfg, train, rng)
    out = conv1d(stage["conv_in"], x)
    # eval fast paths, fastest first: with tap-formulated convs (default,
    # ops/conv.py CONV_TAPS) the plain XLA stage is the fastest measured
    # eval path (4.17 ms vs 4.34 ms fused-Pallas vs 6.41 ms conv-op at B=8,
    # T=4096 — docs/PERF_NOTES.md), so the fused whole-stage Pallas kernel
    # auto-enables only when taps are disabled (it still beats the conv-op
    # formulation by +16%); explicit use_pallas always opts in.  Train keeps
    # the per-layer path: the stage kernel's VJP recomputes a full stage
    # forward, which loses more than the fused forward saves.
    from ..ops.conv import CONV_TAPS
    from ..ops.rnn import _pallas_enabled

    if (cfg.use_pallas or (_pallas_enabled() and not CONV_TAPS)) and not train:
        from ..ops.conv_pallas import fused_stage

        fused = fused_stage(stage["layers"], out, mask)
        if fused is not None:
            return conv1d(stage["conv_out"], fused) * mask
    rngs = split_rng(rng, len(stage["layers"]))
    remat_layer = _remat() == "layer" and train
    for i, layer in enumerate(stage["layers"]):
        fn = partial(
            dilated_residual_layer, dilation=2 ** i,
            dropout_rate=cfg.dropout_rate, train=train,
            use_pallas=cfg.use_pallas,
        )
        if remat_layer:
            fn = jax.checkpoint(
                lambda lyr, o, m, r, _f=fn: _f(lyr, o, m, rng=r))
            out = fn(layer, out, mask, rngs[i])
        else:
            out = fn(layer, out, mask, rng=rngs[i])
    return conv1d(stage["conv_out"], out) * mask


def apply(params, cfg: MSTCNConfig, x, lengths, *, train=False, rng=None):
    """x: [B, T, 400] -> logits [B, T, C] (stage-max)."""
    mask = length_mask(lengths, x.shape[1]).astype(x.dtype)[:, :, None]
    rngs = split_rng(rng, cfg.num_stages)
    stage_fn = _apply_stage
    if _remat() == "stage" and train:
        stage_fn = jax.checkpoint(
            lambda st, xx, mk, rr: _apply_stage(st, xx, mk, cfg, train, rr))
        stage_fn = lambda st, xx, mk, c, t, rr, _f=stage_fn: _f(st, xx, mk, rr)
    out = stage_fn(params["stages"][0], x, mask, cfg, train, rngs[0])
    acc = out
    for s in range(1, cfg.num_stages):
        out = stage_fn(
            params["stages"][s], jax.nn.softmax(out, axis=-1) * mask, mask, cfg, train, rngs[s]
        )
        acc = jnp.maximum(acc, out)  # stage-max (networks.py:317-319)
    return acc
