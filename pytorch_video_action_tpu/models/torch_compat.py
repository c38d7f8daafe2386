"""Torch state-dict <-> pytree parameter conversion.

Used by the numerical-parity test suite (SURVEY.md §4: "each JAX model vs. a
scripted PyTorch oracle on fixed random weights") and by users migrating
reference ``.pth`` checkpoints.  Tensor-layout conventions:

* Linear: torch ``weight [out, in]``  -> ours ``w [in, out]`` (transposed)
* RNN: torch ``weight_ih_l{k}[_reverse] [gH, D]`` -> ``wi [D, gH]`` etc.
* MHA: packed ``in_proj_weight [3E, E]`` -> ``in_proj_w [E, 3E]``
* Conv1d: torch ``weight [out, in, K]`` -> ``w [K, in, out]``
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _t(a):
    return jnp.asarray(np.asarray(a).T)


def _lin(sd, prefix):
    return {"w": _t(sd[f"{prefix}.weight"]), "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}


def _conv(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])  # [out, in, K]
    return {
        "w": jnp.asarray(w.transpose(2, 1, 0)),
        "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
    }


def _rnn(sd, prefix, num_layers, bidirectional):
    layers = []
    for l in range(num_layers):
        layer = {}
        for key, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if key == "bwd" and not bidirectional:
                continue
            layer[key] = {
                "wi": _t(sd[f"{prefix}.weight_ih_l{l}{suffix}"]),
                "wh": _t(sd[f"{prefix}.weight_hh_l{l}{suffix}"]),
                "bi": jnp.asarray(np.asarray(sd[f"{prefix}.bias_ih_l{l}{suffix}"])),
                "bh": jnp.asarray(np.asarray(sd[f"{prefix}.bias_hh_l{l}{suffix}"])),
            }
        layers.append(layer)
    return layers


def _mha(sd, prefix):
    return {
        "in_proj_w": _t(sd[f"{prefix}.in_proj_weight"]),
        "in_proj_b": jnp.asarray(np.asarray(sd[f"{prefix}.in_proj_bias"])),
        "out_proj_w": _t(sd[f"{prefix}.out_proj.weight"]),
        "out_proj_b": jnp.asarray(np.asarray(sd[f"{prefix}.out_proj.bias"])),
    }


def import_torch_state_dict(model_name: str, cfg, sd: dict) -> dict:
    """Convert a reference-model state_dict (tensors or ndarrays) to params."""
    # copy=True: np.asarray over a torch tensor SHARES memory, and jnp.asarray
    # on CPU can be zero-copy too — without the copy, imported buffers would
    # alias the live torch module (its in-place BatchNorm running-stat updates
    # would silently mutate our state trees)
    sd = {k: np.array(v, copy=True) for k, v in sd.items()}
    if model_name == "simple_fc":
        return {f"fc{i}": _lin(sd, f"fc{i}") for i in range(1, 5)}
    if model_name == "vanilla_lstm":
        return {
            "rnn": _rnn(sd, "rnn", cfg.lstm_layer, False),
            "linear": _lin(sd, "linear"),
        }
    if model_name == "bilstm":
        return {
            "rnn": _rnn(sd, "rnn", cfg.lstm_layer, True),
            "linear": _lin(sd, "linear"),
            "output": _lin(sd, "output"),
        }
    if model_name == "bilstm_lm":
        # stateful: BatchNorm running stats live in a separate state tree
        # (reference networks.py:103-105 registers them in the state_dict)
        def _bn(prefix):
            return (
                {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                 "bias": jnp.asarray(sd[f"{prefix}.bias"])},
                {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
                 "var": jnp.asarray(sd[f"{prefix}.running_var"])},
            )

        bn1_p, bn1_s = _bn("batch_norm_1")
        bn2_p, bn2_s = _bn("batch_norm_2")
        params = {
            "rnn": _rnn(sd, "rnn", cfg.lstm_layer, True),
            "linear": _lin(sd, "linear"),
            "output": _lin(sd, "output"),
            "bn1": bn1_p,
            "bn2": bn2_p,
        }
        return params, {"bn1": bn1_s, "bn2": bn2_s}
    if model_name in ("bigru", "ctcloss"):
        return {
            "rnn": _rnn(sd, "rnn", cfg.gru_layer, True),
            "output": _lin(sd, "output"),
        }
    if model_name == "attn":
        return {
            "attention": _mha(sd, "attention"),
            "rnn": _rnn(sd, "rnn", 1, True),
            "output": _lin(sd, "output"),
        }
    if model_name == "win_attn":
        return {
            "attention": _mha(sd, "attention"),
            "output": _lin(sd, "output"),
            "combine_output": _lin(sd, "combine_output"),
        }
    if model_name in ("ms_tcn", "mstcn"):
        stages = []
        stage_prefixes = ["stage1"] + [
            f"stages.{s}" for s in range(cfg.num_stages - 1)
        ]
        for sp in stage_prefixes:
            stages.append(
                {
                    "conv_in": _conv(sd, f"{sp}.conv_1x1"),
                    "layers": [
                        {
                            "conv_dilated": _conv(sd, f"{sp}.layers.{i}.conv_dilated"),
                            "conv_1x1": _conv(sd, f"{sp}.layers.{i}.conv_1x1"),
                        }
                        for i in range(cfg.num_layers)
                    ],
                    "conv_out": _conv(sd, f"{sp}.conv_out"),
                }
            )
        return {"stages": stages}
    raise NotImplementedError(model_name)
