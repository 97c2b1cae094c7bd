"""Roofline accounting for the SAM2 device step (VERDICT r4 #6).

Decomposes the counted matmul/conv FLOPs of one SAM2.1-L@1024 forward
into kernel classes (analytic formulas from the architecture config,
cross-checked against the jaxpr-walk total from models/flops.py), pairs
them with the measured per-class times from the round-3 line-aware trace
(scripts/profile_trace_lines.py), and states each class's achieved
throughput vs its ROOF:

  * compute roof: v5e bf16 peak 197 TFLOP/s;
  * structural roof for attention score/AV contractions: head_dim 72
    occupies 72/128 MXU lanes -> 0.5625 x peak is the best ANY schedule
    can do without head-dim padding (padding was measured SLOWER,
    PERF.md round-3 flash-attention experiment);
  * memory roof: v5e HBM ~819 GB/s for the IO-bound tails.

Output: the markdown table PERF.md embeds + the attainable-MFU bound.
Pass --measured "mlp=68.2,win=51.4,flash=11.2,refine=9.6,xla=11.9" to
re-derive with fresh trace numbers.
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK = 197e12  # v5e bf16 FLOP/s
HBM_BW = 819e9  # bytes/s
LANE_FRAC = 72 / 128  # head_dim-72 structural MXU lane occupancy


def sam2_l_flop_split(batch: int = 8) -> dict:
    """Analytic per-class matmul FLOPs of one SAM2.1-L@1024 forward.

    Architecture constants from core/config.SAM2Config (the reference's
    sam2.1_hiera_l.yaml): embed 144, stages (2,6,36,4), dims doubling,
    tokens 256²/128²/64²/32², window spec (8,4,16,8), 3 global blocks
    in stage 3 (yaml indices 23/33/43)."""
    stages = (2, 6, 36, 4)
    dims = (144, 288, 576, 1152)
    tokens = (256 ** 2, 128 ** 2, 64 ** 2, 32 ** 2)
    windows = (8, 4, 16, 8)
    n_global = 3  # all in stage index 2

    mlp = attn_mm = scores_win = scores_global = 0.0
    for s, (nb, c, n, w) in enumerate(zip(stages, dims, tokens, windows)):
        per_qkv = 2 * n * 3 * c * c
        per_proj = 2 * n * c * c
        per_mlp = 16 * n * c * c  # two matmuls, hidden = 4C
        per_win = 4 * n * (w * w) * c  # QK^T + AV over w² window tokens
        per_glob = 4 * n * n * c
        g = n_global if s == 2 else 0
        mlp += nb * per_mlp
        attn_mm += nb * (per_qkv + per_proj)
        scores_win += (nb - g) * per_win
        scores_global += g * per_glob
    # patch embed + FPN neck 1x1s + decoder + refinement (small convs)
    convs = 2.77e9 + 9.1e9 + 5e9 + 1e9
    split = {
        "mlp": mlp, "attn_mm": attn_mm, "scores_win": scores_win,
        "scores_global": scores_global, "convs": convs,
    }
    return {k: v * batch for k, v in split.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--measured",
        default="mlp=68.2,win=51.4,flash=11.2,refine=9.6,xla=11.9",
        help="per-class measured ms at batch 8 (round-3 line trace: "
        "mlp_block 68.2, window+qpool attn 40.2+11.2, flash 11.2, "
        "refinement 9.6, XLA shell fusions+copies 6.7+5.2)",
    )
    ap.add_argument("--step-ms", type=float, default=162.0,
                    help="measured whole-step ms at batch 8 (bench)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    meas = dict(kv.split("=") for kv in args.measured.split(","))
    meas = {k: float(v) for k, v in meas.items()}

    f = sam2_l_flop_split(args.batch)
    total_f = sum(f.values())

    # cross-check vs the jaxpr-walk count when cached
    try:
        from circuitvision_tpu.core.config import SAM2Config
        from circuitvision_tpu.models.flops import cached_flops

        import json

        with open(os.path.join(REPO, ".jax_cache", "flops_cache.json")) as fh:
            cache = json.load(fh)
        walked = next(
            (v for k, v in cache.items() if k.endswith("sam2:1024:144:(2, 6, 36, 4):1")),
            None,
        )
        if walked:
            ratio = total_f / (walked * args.batch)
            print(f"# analytic/jaxpr-walk total: {ratio:.3f} "
                  f"(analytic {total_f / args.batch / 1e9:.0f} GFLOP/img, "
                  f"walked {walked / 1e9:.0f})")
    except Exception as e:  # cross-check is advisory
        print(f"# (no jaxpr cross-check: {e})")

    # class → (flops, measured ms, roof fraction, bound kind)
    rows = [
        ("MLP blocks (fused Pallas)", f["mlp"], meas["mlp"], 1.0,
         "compute"),
        ("attention qkv/proj + windowed scores (fused Pallas)",
         f["attn_mm"] + f["scores_win"], meas["win"], LANE_FRAC,
         "head_dim-72 lanes"),
        ("global-block flash attention", f["scores_global"], meas["flash"],
         LANE_FRAC, "head_dim-72 lanes"),
        ("refinement head (fused)", f["convs"] * 0.1, meas["refine"],
         None, "HBM (1024² mask IO)"),
        ("XLA shell (neck/decoder/patch/copies)", f["convs"] * 0.9,
         meas["xla"], None, "HBM / small convs"),
    ]
    print("\n| kernel class | GFLOP (b8) | measured ms | achieved TF/s | "
          "roof | % of roof | bound |")
    print("|---|---|---|---|---|---|---|")
    attainable_ms = 0.0
    for name, fl, ms, roof_frac, kind in rows:
        tf = fl / (ms / 1e3) / 1e12
        if roof_frac is not None:
            roof_tf = PEAK * roof_frac / 1e12
            best_ms = fl / (PEAK * roof_frac) * 1e3
            pct = tf / roof_tf * 100
        else:
            # memory-bound tails: take measured as at-roof (they move
            # 1024²-scale buffers; see PERF refinement-head analysis)
            roof_tf, best_ms, pct = float("nan"), ms, 100.0
        attainable_ms += best_ms
        print(f"| {name} | {fl / 1e9:.0f} | {ms:.1f} | {tf:.1f} | "
              f"{roof_tf:.1f} | {pct:.0f}% | {kind} |")

    # Practical bound: no real kernel reaches 100% of its roof — large
    # bf16 GEMM kernels on v5e top out ~75% (the repo's own standalone
    # MLP kernels measure 71%, PERF.md), and well-tuned attention
    # kernels ~90% of their structural lane bound.
    practical_ms = 0.0
    for name, fl, ms, roof_frac, kind in rows:
        if roof_frac == 1.0:
            practical_ms += fl / (PEAK * 0.75) * 1e3
        elif roof_frac is not None:
            practical_ms += fl / (PEAK * roof_frac * 0.90) * 1e3
        else:
            practical_ms += ms
    mfu_now = total_f / (args.step_ms / 1e3) / PEAK
    mfu_attain = total_f / (attainable_ms / 1e3) / PEAK
    mfu_prac = total_f / (practical_ms / 1e3) / PEAK
    print(f"\nstep: measured {args.step_ms:.1f} ms (MFU {mfu_now:.3f})")
    print(f"ideal roofline (100% of each roof): {attainable_ms:.1f} ms "
          f"(MFU {mfu_attain:.3f}); gap "
          f"{(args.step_ms / attainable_ms - 1) * 100:.0f}%")
    print(f"practical roofline (75% compute / 90% structural): "
          f"{practical_ms:.1f} ms (MFU {mfu_prac:.3f}); gap "
          f"{(args.step_ms / practical_ms - 1) * 100:.0f}%")
    acc = sum(meas.values())
    print(f"accounted kernel time {acc:.1f} ms of {args.step_ms:.1f} "
          f"step ms ({args.step_ms - acc:.1f} ms dispatch/DMA gaps)")


if __name__ == "__main__":
    main()
