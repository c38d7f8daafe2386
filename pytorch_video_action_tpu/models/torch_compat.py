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


def _np32(a):
    return np.asarray(a, dtype=np.float32)


def _lin_out(params, prefix):
    return {f"{prefix}.weight": _np32(params["w"]).T,
            f"{prefix}.bias": _np32(params["b"])}


def _conv_out(params, prefix):
    # ours [K, in, out] -> torch [out, in, K]
    return {f"{prefix}.weight": _np32(params["w"]).transpose(2, 1, 0),
            f"{prefix}.bias": _np32(params["b"])}


def _rnn_out(layers, prefix):
    sd = {}
    for l, layer in enumerate(layers):
        for key, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if key not in layer:
                continue
            d = layer[key]
            sd[f"{prefix}.weight_ih_l{l}{suffix}"] = _np32(d["wi"]).T
            sd[f"{prefix}.weight_hh_l{l}{suffix}"] = _np32(d["wh"]).T
            sd[f"{prefix}.bias_ih_l{l}{suffix}"] = _np32(d["bi"])
            sd[f"{prefix}.bias_hh_l{l}{suffix}"] = _np32(d["bh"])
    return sd


def _mha_out(params, prefix):
    return {
        f"{prefix}.in_proj_weight": _np32(params["in_proj_w"]).T,
        f"{prefix}.in_proj_bias": _np32(params["in_proj_b"]),
        f"{prefix}.out_proj.weight": _np32(params["out_proj_w"]).T,
        f"{prefix}.out_proj.bias": _np32(params["out_proj_b"]),
    }


def _bn_defaults(prefix, dim):
    """torch ``nn.BatchNorm1d`` init-state tensors (weight 1, bias 0,
    running_mean 0, running_var 1, num_batches_tracked 0)."""
    return {
        f"{prefix}.weight": np.ones(dim, np.float32),
        f"{prefix}.bias": np.zeros(dim, np.float32),
        f"{prefix}.running_mean": np.zeros(dim, np.float32),
        f"{prefix}.running_var": np.ones(dim, np.float32),
        f"{prefix}.num_batches_tracked": np.asarray(0, dtype=np.int64),
    }


def export_torch_state_dict(model_name: str, params, state=None,
                            cfg=None) -> dict:
    """Convert our params pytree back to a reference-layout state_dict of
    numpy arrays — the exact inverse of :func:`import_torch_state_dict`, so
    a TPU-trained checkpoint can be handed to the reference's torch scripts
    (``torch.save`` the result; the reference loads it with
    ``net.load_state_dict`` at ``train.py:263-264`` / ``inference.py:97-98``).

    Shapes/keys match ``load_state_dict(strict=True)`` on the reference
    ``networks.py`` modules (tested against every family in
    ``tests/test_torch_export.py``).  ``state`` carries the BatchNorm
    running stats for ``bilstm_lm`` (the tuple returned next to its params);
    ``num_batches_tracked`` is emitted as 0 — torch only reads it for
    cumulative-momentum averaging, which the reference never enables.

    The reference modules register tensors their forwards never read —
    ``BiGRU.linear`` (networks.py:155), ``BiLSTM.batch_norm`` (:65, its use
    commented out at :83) and the ``BiLSTMWithLM.class_context`` buffer
    (:108, reset to zeros at eval entry, :127) — which our functional models
    deliberately don't carry.  Strict loading still requires them, so they
    are emitted at their torch initialization defaults (zeros for the dead
    linear and the context buffer, BatchNorm identity stats); ``cfg`` (our
    config dataclass) supplies ``hidden_dim_2`` for the dead BiGRU linear
    whose shape is underivable from the live tree (defaults to the
    reference's 64 when omitted).
    """
    if model_name == "simple_fc":
        sd = {}
        for i in range(1, 5):
            sd.update(_lin_out(params[f"fc{i}"], f"fc{i}"))
        return sd
    if model_name == "vanilla_lstm":
        return {**_rnn_out(params["rnn"], "rnn"),
                **_lin_out(params["linear"], "linear")}
    if model_name == "bilstm":
        hidden_dim_1 = np.asarray(params["linear"]["w"]).shape[0]
        return {**_rnn_out(params["rnn"], "rnn"),
                **_lin_out(params["linear"], "linear"),
                **_lin_out(params["output"], "output"),
                **_bn_defaults("batch_norm", hidden_dim_1)}
    if model_name == "bilstm_lm":
        if state is None:
            raise ValueError(
                "bilstm_lm export needs the BatchNorm state tree "
                "(pass state={'bn1': {...}, 'bn2': {...}})"
            )
        sd = {**_rnn_out(params["rnn"], "rnn"),
              **_lin_out(params["linear"], "linear"),
              **_lin_out(params["output"], "output")}
        for ours, theirs in (("bn1", "batch_norm_1"), ("bn2", "batch_norm_2")):
            sd[f"{theirs}.weight"] = _np32(params[ours]["scale"])
            sd[f"{theirs}.bias"] = _np32(params[ours]["bias"])
            sd[f"{theirs}.running_mean"] = _np32(state[ours]["mean"])
            sd[f"{theirs}.running_var"] = _np32(state[ours]["var"])
            sd[f"{theirs}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
        # context buffer length = output in_dim - hidden_dim_2
        ctx = (np.asarray(params["output"]["w"]).shape[0]
               - np.asarray(params["linear"]["w"]).shape[1])
        sd["class_context"] = np.zeros(ctx, np.float32)
        return sd
    if model_name in ("bigru", "ctcloss"):
        hidden_dim_1 = np.asarray(params["output"]["w"]).shape[0]
        hidden_dim_2 = getattr(cfg, "hidden_dim_2", 64) if cfg is not None else 64
        return {**_rnn_out(params["rnn"], "rnn"),
                **_lin_out(params["output"], "output"),
                "linear.weight": np.zeros((hidden_dim_2, hidden_dim_1),
                                          np.float32),
                "linear.bias": np.zeros(hidden_dim_2, np.float32)}
    if model_name == "attn":
        return {**_mha_out(params["attention"], "attention"),
                **_rnn_out(params["rnn"], "rnn"),
                **_lin_out(params["output"], "output")}
    if model_name == "win_attn":
        return {**_mha_out(params["attention"], "attention"),
                **_lin_out(params["output"], "output"),
                **_lin_out(params["combine_output"], "combine_output")}
    if model_name in ("ms_tcn", "mstcn"):
        sd = {}
        stages = params["stages"]
        prefixes = ["stage1"] + [f"stages.{s}" for s in range(len(stages) - 1)]
        for sp, stage in zip(prefixes, stages):
            sd.update(_conv_out(stage["conv_in"], f"{sp}.conv_1x1"))
            for i, layer in enumerate(stage["layers"]):
                sd.update(_conv_out(layer["conv_dilated"],
                                    f"{sp}.layers.{i}.conv_dilated"))
                sd.update(_conv_out(layer["conv_1x1"],
                                    f"{sp}.layers.{i}.conv_1x1"))
            sd.update(_conv_out(stage["conv_out"], f"{sp}.conv_out"))
        return sd
    raise NotImplementedError(model_name)


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
