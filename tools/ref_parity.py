"""End-to-end accuracy parity vs the LITERAL reference scripts.

Runs ``/root/reference/train.py`` (torch, CPU) and our ``train.py`` on the
same synthetic Breakfast-shaped dataset (``tools/scale_smoke.py`` writes the
reference's exact on-disk contracts, including the ``data-comp`` pickle
cache, ``data_utils.py:162-163``) **from a shared initialization** — the
torch net's init is saved as ``models/shared_init.pth`` for the reference
and converted to ``models/shared_init.npz`` for us via
``models/torch_compat.py`` — and compares the per-epoch dev frame/segment
accuracy trajectories.  Real Breakfast data cannot be mounted in this
environment (BASELINE.md), so this is the closest achievable analog of the
reference's Kaggle score (``/root/reference/README.md:129-130``): same
scripts, same data, same init, same hyperparameters.

Dropout is active in both trainers (reference ``net.train()``) with
independent RNG streams, so trajectories agree within a band, not
bit-exactly.  Usage::

    python tools/ref_parity.py --root /tmp/pva_refpar --model bigru --epoch 3
    python tools/ref_parity.py ... --band 10 --final_band 5  # assert & exit 1

Numbers from the canonical run are recorded in PARITY.md.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

ACC_RE = re.compile(
    r"Dev accuracy by (frame|segment): ([0-9.]+)"
)


def parse_trajectory(stdout: str) -> list[tuple[float, float]]:
    """[(frame_acc, segment_acc)] per epoch, from either trainer's prints
    (both use the reference's exact format, ``train.py:340-343``)."""
    frames, segs = [], []
    for kind, val in ACC_RE.findall(stdout):
        (frames if kind == "frame" else segs).append(float(val))
    return list(zip(frames, segs))


def shared_init(root: str, model: str, n_class: int, args) -> None:
    """Write the same initial weights for both trainers."""
    sys.path.insert(0, REF)
    sys.path.insert(0, REPO)
    import torch

    import networks as ref_nets  # noqa: E402 (reference module)
    from pytorch_video_action_tpu.models import build_model
    from pytorch_video_action_tpu.models.torch_compat import (
        import_torch_state_dict,
    )
    from pytorch_video_action_tpu.train.checkpoint import save_params

    torch.manual_seed(args.seed)
    # Construction mirrors the literal factory (/root/reference/train.py:
    # 218-259) at its CLI defaults: lstm_layer=2, lstm_hidden1=256,
    # lstm_hidden2=64, lstm_dropout=0.5, attn_head=4, pred_mode='cont'
    # (train.py:57-66) — the same defaults build_model uses.
    if model == "bigru":
        net = ref_nets.BiGRU(400, n_class=n_class)
        jd = build_model("bigru", n_class)
    elif model == "ms_tcn":
        net = ref_nets.MultiStageModel(400, n_class=n_class)
        jd = build_model("ms_tcn", n_class)
    elif model == "simple_fc":
        net = ref_nets.SimpleFC(400, n_class)
        jd = build_model("simple_fc", n_class)
    elif model == "vanilla_lstm":
        net = ref_nets.vanillaLSTM(400, lstm_layer=2, hidden_dim=256,
                                   dropout_rate=0.5, n_class=n_class,
                                   mode="cont")
        jd = build_model("vanilla_lstm", n_class)
    elif model == "bilstm":
        net = ref_nets.BiLSTM(input_dim=400, lstm_layer=2, hidden_dim_1=256,
                              dropout_rate=0.5, hidden_dim_2=64,
                              n_class=n_class, mode="cont")
        jd = build_model("bilstm", n_class)
    elif model == "attn":
        net = ref_nets.MultiHeadAttention(400, 4, n_class=n_class,
                                          mode="cont")
        jd = build_model("attn", n_class)
    elif model == "ctcloss":
        # the reference builds a BiGRU with n_class+1 outputs (blank=n_class)
        net = ref_nets.BiGRU(400, n_class=n_class + 1)
        jd = build_model("ctcloss", n_class)
    else:
        raise SystemExit(f"unsupported shared-init model: {model}")
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    torch.save(net.state_dict(), os.path.join(root, "models", "shared_init.pth"))
    params = import_torch_state_dict(model, jd.config, net.state_dict())
    save_params(os.path.join(root, "models", "shared_init.npz"), params)


def run_trainer(script: str, root: str, model: str, epochs: int,
                batchsize: int, extra: list[str]) -> str:
    cmd = [
        sys.executable, script,
        "--model", model, "--epoch", str(epochs),
        "--batchsize", str(batchsize),
        "--pretrained_model", "shared_init",
    ] + extra
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    print(f"[ref_parity] running: {' '.join(cmd)} (cwd={root})")
    proc = subprocess.run(
        cmd, cwd=root, env=env, capture_output=True, text=True, timeout=7200
    )
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise SystemExit(f"{script} failed ({proc.returncode})")
    return proc.stdout


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--model", default="bigru",
                    choices=["bigru", "ms_tcn", "simple_fc", "vanilla_lstm",
                             "bilstm", "attn", "ctcloss"])
    ap.add_argument("--epoch", type=int, default=3)
    ap.add_argument("--batchsize", type=int, default=8)
    ap.add_argument("--n_train", type=int, default=60)
    ap.add_argument("--n_dev", type=int, default=16)
    ap.add_argument("--t_min", type=int, default=300)
    ap.add_argument("--t_max", type=int, default=900)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--band", type=float, default=None,
                    help="max per-epoch |segment-acc delta| to assert")
    ap.add_argument("--final_band", type=float, default=None,
                    help="max final-epoch |segment-acc delta| to assert")
    ap.add_argument("--skip_dataset", action="store_true")
    args = ap.parse_args(argv)

    root = os.path.abspath(args.root)
    if not args.skip_dataset:
        subprocess.run([
            sys.executable, os.path.join(REPO, "tools", "scale_smoke.py"),
            "--root", root, "--n_train", str(args.n_train),
            "--n_dev", str(args.n_dev), "--n_test", "4",
            "--t_min", str(args.t_min), "--t_max", str(args.t_max),
            "--seed", str(args.seed),
        ], check=True)

    # n_class from the dataset's mapping file (scale_smoke default 48)
    with open(os.path.join(root, "splits", "splits", "mapping_bf.txt")) as f:
        n_class = sum(1 for line in f if line.strip())
    shared_init(root, args.model, n_class, args)

    # _ref_shim runs the literal reference train.py with a numpy>=1.24
    # ragged-array compat proxy (the reference predates the inhomogeneous-
    # shape ValueError); reference behavior is unchanged.
    ref_out = run_trainer(os.path.join(REPO, "tools", "_ref_shim.py"), root,
                          args.model, args.epoch, args.batchsize, [])
    our_out = run_trainer(os.path.join(REPO, "train.py"), root, args.model,
                          args.epoch, args.batchsize,
                          ["--annot_path", ".", "--data_dir", "./data",
                           "--bucket_multiple", "128"])

    ref_traj = parse_trajectory(ref_out)
    our_traj = parse_trajectory(our_out)
    print("\n[ref_parity] epoch  ref(frame,seg)    ours(frame,seg)   dseg")
    n = min(len(ref_traj), len(our_traj), args.epoch)
    deltas = []
    for e in range(n):
        rf, rs = ref_traj[e]
        of, osg = our_traj[e]
        deltas.append(abs(rs - osg))
        print(f"[ref_parity] {e + 1:5d}  {rf:6.2f} {rs:6.2f}    "
              f"{of:6.2f} {osg:6.2f}   {rs - osg:+6.2f}")
    if args.band is not None:
        assert all(d <= args.band for d in deltas), (deltas, args.band)
        print(f"[ref_parity] per-epoch segment deltas within band "
              f"{args.band}: OK")
    if args.final_band is not None:
        assert deltas[-1] <= args.final_band, (deltas[-1], args.final_band)
        print(f"[ref_parity] final delta {deltas[-1]:.2f} <= "
              f"{args.final_band}: OK")
    return deltas


if __name__ == "__main__":
    main()
