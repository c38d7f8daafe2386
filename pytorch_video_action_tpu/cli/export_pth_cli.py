"""Export a TPU-trained checkpoint to a reference-loadable torch ``.pth``.

The reverse bridge to ``torch_compat.import_torch_state_dict``: our training
CLI saves flat ``.npz`` pytrees (``train/checkpoint.py``), the reference's
drivers load ``torch.save``'d state_dicts (``/root/reference/train.py:263-264``,
``inference.py:97-98``, ``inference-lm.py:103-104``).  This tool converts the
former into the latter so a model trained here can be evaluated or ensembled
with the upstream scripts unchanged::

    python export_pth.py models/bigru_0.74_dev.npz            # -> .pth sibling
    python export_pth.py ckpt.npz --model ms_tcn --out m.pth

The produced state_dict strict-loads into the reference ``networks.py``
modules (key/shape coverage tested per family in
``tests/test_torch_export.py``).
"""

from __future__ import annotations

import argparse
import os


def _force_cpu():
    """This is a pure host-side conversion: never initialize the TPU backend
    (the sandbox's sitecustomize pins the single-chip axon platform, whose
    init would block on — or contend with — a concurrently running TPU job).
    Must run before the package imports below pull in jax."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


_force_cpu()

from ..infer.loader import parse_model_type  # noqa: E402
from ..models.torch_compat import export_torch_state_dict  # noqa: E402
from ..train.checkpoint import load_params  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert a .npz checkpoint to a reference-layout .pth"
    )
    ap.add_argument("ckpt", help="path to a save_params .npz checkpoint")
    ap.add_argument(
        "--model",
        default=None,
        help="model family (default: parsed from the checkpoint filename, "
        "e.g. bigru_0.74_dev.npz -> bigru)",
    )
    ap.add_argument(
        "--out",
        default=None,
        help="output .pth path (default: checkpoint path with .pth suffix)",
    )
    ap.add_argument(
        "--hidden_dim_2",
        type=int,
        default=64,
        help="hidden_dim_2 the reference net will be constructed with — only "
        "shapes bigru's dead `linear` layer (networks.py:155); the reference "
        "default is 64",
    )
    args = ap.parse_args(argv)

    import torch  # deferred: only this CLI needs it

    model_name = args.model or parse_model_type(
        os.path.basename(args.ckpt).removesuffix(".npz")
    )
    if not model_name:
        raise SystemExit(
            f"cannot parse a model family from {args.ckpt!r}; pass --model"
        )
    import types

    params, state = load_params(args.ckpt, with_state=True)
    cfg = types.SimpleNamespace(hidden_dim_2=args.hidden_dim_2)
    sd = export_torch_state_dict(model_name, params, state=state, cfg=cfg)
    out = args.out or (
        args.ckpt.removesuffix(".npz").removesuffix(".pth") + ".pth"
    )
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, out)
    print(f"Exported {model_name} ({len(sd)} tensors) -> {out}")
    return out


if __name__ == "__main__":
    main()
