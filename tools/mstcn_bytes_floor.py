"""HBM bytes-floor model for the MS-TCN train step (VERDICT r4 item 3).

Counts the mandatory HBM traffic of one B x T bf16 train step of the
reference workload (``/root/reference/networks.py:322-347``: 4 stages x 20
dilated residual layers at C=64, stage-boundary 1x1 convs + softmax, CE
loss) under the implementation's actual structure (``models/mstcn.py`` +
``ops/conv.py`` tap formulation, hash dropout, no remat) and divides by the
measured HBM bandwidth to get the bandwidth floor in ms/step.  FLOPs and the
MXU roofline are printed for comparison — whichever floor is higher binds.

Traffic accounting per dilated residual layer (all planes are [B, T, C]):
  forward: read x (1), write y (1), save relu activation for the backward
    (1: conv_1x1's dW and relu's VJP both consume it), save-or-recompute the
    dropout keep mask (0 planes with counter-hash recompute, 0.5 byte-plane
    if XLA saves the i1 mask — both scenarios reported).
  backward: read dy (1), read saved act (1), read x (1: tap dW + the
    residual pass-through makes x live), write dx (1).
Weight/bias traffic (3*C*C + C*C per layer + Adam moments) is counted once
per step but is ~1000x smaller than the activation planes at T=4096.

Usage: python tools/mstcn_bytes_floor.py [--b 8 --t 4096 --c 64]
       [--ms_step 5.81] [--bw_gbs 629] [--mxu_tfs 182]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--dim", type=int, default=400)
    ap.add_argument("--n_class", type=int, default=48)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--layers", type=int, default=20)
    ap.add_argument("--itemsize", type=int, default=2, help="bf16")
    ap.add_argument("--ms_step", type=float, default=None,
                    help="measured ms/step to compare against the floor")
    ap.add_argument("--bw_gbs", type=float, default=629.0,
                    help="measured HBM GB/s (tools/mxu_probe.py, round 3)")
    ap.add_argument("--mxu_tfs", type=float, default=182.0,
                    help="measured bf16 TF/s (tools/mxu_probe.py)")
    args = ap.parse_args(argv)

    b, t, c, sz = args.b, args.t, args.c, args.itemsize
    plane = b * t * c * sz                      # one [B, T, C] bf16 plane
    n_res = args.stages * args.layers           # 80 dilated residual layers

    # --- residual layers: planes of HBM traffic per layer ---------------
    fwd_planes = 1 + 1 + 1                      # read x, write y, save act
    bwd_planes = 1 + 1 + 1 + 1                  # dy, act, x, dx
    per_layer = (fwd_planes + bwd_planes) * plane
    mask_saved_extra = b * t * c * 1            # i1 keep-mask, if saved

    # --- stage boundaries -----------------------------------------------
    # stage 1 conv_in reads [B,T,dim] f32 input once (fwd) + once (bwd dW)
    io = 2 * b * t * args.dim * 4
    # per stage: conv_in/out planes + softmax of [B,T,n_class] between
    # stages + stage-max combine; ~6 planes of C/n_class width per stage
    # fwd+bwd — small next to 80 residual layers but counted
    per_stage = 6 * (plane + b * t * args.n_class * sz)
    boundaries = io + args.stages * per_stage

    # --- weights + Adam ---------------------------------------------------
    w_per_layer = (3 * c * c + c * c + 2 * c) * 4
    w_stage = (args.dim * c + 3 * (args.n_class * c) * 2) * 4
    weights = n_res * w_per_layer + args.stages * w_stage
    adam = 4 * weights                           # read m,v + write m,v (f32)

    lo = n_res * per_layer + boundaries + weights * 2 + adam
    hi = lo + n_res * 2 * mask_saved_extra       # mask saved: write + read

    # --- FLOP floor -------------------------------------------------------
    # per residual layer fwd: tap3 matmul 3*C*C + 1x1 C*C MACs per frame;
    # bwd ~2x fwd (dx + dW)
    macs = n_res * b * t * (3 * c * c + c * c) * 3
    macs += b * t * (args.dim * c + 2 * args.stages * args.n_class * c) * 3
    flops = 2 * macs

    bw = args.bw_gbs * 1e9
    t_bw_lo, t_bw_hi = lo / bw * 1e3, hi / bw * 1e3
    t_mxu = flops / (args.mxu_tfs * 1e12) * 1e3
    print(f"planes: {plane / 1e6:.2f} MB each; {n_res} residual layers")
    print(f"HBM bytes/step: {lo / 1e9:.2f} GB (mask recomputed) .. "
          f"{hi / 1e9:.2f} GB (i1 mask saved)")
    print(f"bandwidth floor @ {args.bw_gbs:.0f} GB/s: "
          f"{t_bw_lo:.2f} .. {t_bw_hi:.2f} ms/step")
    print(f"FLOPs/step: {flops / 1e12:.2f} TF -> MXU floor @ "
          f"{args.mxu_tfs:.0f} TF/s: {t_mxu:.2f} ms/step")
    floor = max(t_bw_lo, t_mxu)
    print(f"binding floor: {floor:.2f} ms/step "
          f"({'bandwidth' if t_bw_lo > t_mxu else 'MXU'})")
    if args.ms_step:
        print(f"measured: {args.ms_step:.2f} ms/step = "
              f"{args.ms_step / floor:.2f}x the binding floor "
              f"({args.ms_step / t_bw_hi:.2f}x the mask-saved floor)")


if __name__ == "__main__":
    main()
