"""Model zoo registry and factory.

The factory mirrors the reference CLI-name -> class mapping and hyperparameter
plumbing of ``train.py:218-259`` (training construction) and
``inference.py:83-94`` (default-hyperparameter reconstruction at load time —
part of the checkpoint-name contract).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax

from . import attention, gru, lstm, mstcn, simple_fc

MODEL_NAMES = [
    "simple_fc",
    "vanilla_lstm",
    "bilstm",
    "bilstm_lm",
    "attn",
    "win_attn",
    "bigru",
    "ms_tcn",
    "ctcloss",
]

# names accepted by the inference drivers' checkpoint-filename parsing
# (inference.py:82-94; note 'mstcn' there vs 'ms_tcn' in train.py)
INFERENCE_NAMES = ["simple_fc", "vanilla_lstm", "bilstm", "bigru", "attn", "mstcn"]


@dataclass
class ModelDef:
    name: str
    config: Any
    init: Callable          # (rng) -> params  (or (params, state) if stateful)
    apply: Callable         # (params, x, lengths, *, train, rng[, state]) -> out
    output_kind: str        # 'log_probs' | 'logits'
    stateful: bool = False

    def init_params(self, rng):
        return self.init(rng)


def build_model(
    name: str,
    n_class: int,
    *,
    pred_mode: str = "cont",
    lstm_layer: int = 2,
    lstm_dropout: float = 0.5,
    lstm_hidden1: int = 256,
    lstm_hidden2: int = 64,
    attn_head: int = 4,
    use_pallas: bool = False,
    defaults: bool = False,
    cfg_overrides: dict | None = None,
) -> ModelDef:
    """Build a ModelDef.

    ``defaults=True`` reproduces the inference drivers' construction with
    class-default hyperparameters (``inference.py:83-94``), which is the
    published checkpoint contract; otherwise the train-CLI plumbing of
    ``train.py:218-259`` applies.  ``cfg_overrides`` replaces fields on the
    model's config dataclass (parity-test hook, e.g. win_attn's
    ``mask_padding=False`` to reproduce the reference's attend-padding
    behavior).
    """
    import dataclasses as _dc

    def _override(cfg):
        return _dc.replace(cfg, **cfg_overrides) if cfg_overrides else cfg
    if name == "simple_fc":
        cfg = simple_fc.SimpleFCConfig(n_class=n_class)
        return ModelDef(
            name, cfg,
            lambda rng: simple_fc.init(rng, cfg),
            lambda p, x, l, **kw: simple_fc.apply(p, cfg, x, l, **kw),
            "logits",
        )
    if name == "vanilla_lstm":
        cfg = (
            lstm.VanillaLSTMConfig(n_class=n_class)
            if defaults
            else lstm.VanillaLSTMConfig(
                lstm_layer=lstm_layer,
                hidden_dim=lstm_hidden1,
                dropout_rate=lstm_dropout,
                n_class=n_class,
                mode=pred_mode,
            )
        )
        return ModelDef(
            name, cfg,
            lambda rng: lstm.init_vanilla_lstm(rng, cfg),
            lambda p, x, l, **kw: lstm.apply_vanilla_lstm(p, cfg, x, l, **kw),
            "log_probs",
        )
    if name == "bilstm":
        cfg = (
            lstm.BiLSTMConfig(n_class=n_class)
            if defaults
            else lstm.BiLSTMConfig(
                lstm_layer=lstm_layer,
                hidden_dim_1=lstm_hidden1,
                dropout_rate=lstm_dropout,
                hidden_dim_2=lstm_hidden2,
                n_class=n_class,
                mode=pred_mode,
            )
        )
        return ModelDef(
            name, cfg,
            lambda rng: lstm.init_bilstm(rng, cfg),
            lambda p, x, l, **kw: lstm.apply_bilstm(p, cfg, x, l, **kw),
            "log_probs",
        )
    if name == "bilstm_lm":
        cfg = lstm.BiLSTMWithLMConfig(
            lstm_layer=lstm_layer,
            hidden_dim_1=lstm_hidden1,
            dropout_rate=lstm_dropout,
            hidden_dim_2=lstm_hidden2,
            n_class=n_class,
        )
        return ModelDef(
            name, cfg,
            lambda rng: lstm.init_bilstm_lm(rng, cfg),
            lambda p, x, l, **kw: lstm.apply_bilstm_lm(p, cfg, x, l, **kw),
            "log_probs",
            stateful=True,
        )
    if name in ("attn",):
        cfg = (
            attention.AttnConfig(n_class=n_class)
            if defaults
            else attention.AttnConfig(
                num_heads=attn_head, n_class=n_class, mode=pred_mode
            )
        )
        return ModelDef(
            name, cfg,
            lambda rng: attention.init_attn(rng, cfg),
            lambda p, x, l, **kw: attention.apply_attn(p, cfg, x, l, **kw),
            "log_probs",
        )
    if name == "win_attn":
        cfg = _override(
            attention.WinAttnConfig(num_heads=attn_head, n_class=n_class))
        return ModelDef(
            name, cfg,
            lambda rng: attention.init_win_attn(rng, cfg),
            lambda p, x, l, **kw: attention.apply_win_attn(p, cfg, x, l, **kw),
            "log_probs",
        )
    if name == "bigru":
        cfg = gru.BiGRUConfig(n_class=n_class)
        return ModelDef(
            name, cfg,
            lambda rng: gru.init(rng, cfg),
            lambda p, x, l, **kw: gru.apply(p, cfg, x, l, **kw),
            "log_probs",
        )
    if name in ("ms_tcn", "mstcn"):
        cfg = mstcn.MSTCNConfig(n_class=n_class, use_pallas=use_pallas)
        return ModelDef(
            name, cfg,
            lambda rng: mstcn.init(rng, cfg),
            lambda p, x, l, **kw: mstcn.apply(p, cfg, x, l, **kw),
            "logits",
        )
    if name == "ctcloss":
        cfg = gru.BiGRUConfig(n_class=n_class + 1)  # blank = n_class
        return ModelDef(
            name, cfg,
            lambda rng: gru.init(rng, cfg),
            lambda p, x, l, **kw: gru.apply(p, cfg, x, l, **kw),
            "log_probs",
        )
    raise NotImplementedError(f"unknown model: {name}")


def init_model(model: ModelDef, seed: int = 0):
    return model.init(jax.random.PRNGKey(seed))
