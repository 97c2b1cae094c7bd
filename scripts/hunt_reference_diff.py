"""Long-running reference-differential hunt over randomized topologies.

Same harness as tests/test_reference_diff.py (reference host chain
in-process vs the repo's topology→netlist chain on identical inputs;
byte-identical text required) but over an arbitrary seed range, for
background fidelity hunts far larger than the CI budget. Prints a
progress line every 100 cases and any divergence immediately.

Surfaces (--surface):
  netlist     topology→netlist chain text (default)
  crop        crop_image_and_adjust_bboxes pixels/boxes/decision
  fixed       full crop → topology → enumerate → fix_netlist joint text
  reclassify  reclassify_terminals per-uid outcomes

Usage: python scripts/hunt_reference_diff.py [--n 2000] [--seed0 50000]
       [--surface netlist]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed0", type=int, default=50000)
    ap.add_argument(
        "--surface", default="netlist",
        choices=("netlist", "crop", "fixed", "reclassify"),
    )
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from circuitvision_tpu.eval.randomized import (
        random_circuits,
        random_reclassify_scene,
    )
    from tests import test_reference_diff as td
    from tests.ref_loader import load_reference_analyzer

    ref = load_reference_analyzer()

    def diff_netlist(name, mask, boxes):
        return td._diff_case(ref, name, mask, boxes)

    def diff_crop(name, mask, boxes):
        image = np.dstack([mask] * 3)
        want = td._crop_fingerprint_ref(ref, image, boxes)
        got = td._crop_fingerprint_repo(image, boxes)
        if want != got:
            return (
                f"--- {name} ---\nref:  shape={want[0]} applied={want[3]} "
                f"boxes={want[2]}\nrepo: shape={got[0]} applied={got[3]} "
                f"boxes={got[2]}"
            )
        return None

    def diff_fixed(name, mask, boxes):
        image = np.dstack([mask] * 3)
        want = td._fixed_netlist_ref(ref, image, mask, boxes)
        got = td._fixed_netlist_repo(image, mask, boxes)
        if want != got:
            return f"--- {name} ---\nreference:\n{want}\nrepo:\n{got}"
        return None

    diff = {"netlist": diff_netlist, "crop": diff_crop, "fixed": diff_fixed}.get(
        args.surface
    )
    t0 = time.time()
    failures = 0
    if args.surface == "reclassify":
        for i in range(args.n):
            image, boxes = random_reclassify_scene(args.seed0 + i)
            want = td._reclassify_fingerprint_ref(ref, image, boxes)
            got = td._reclassify_fingerprint_repo(image, boxes)
            if want != got:
                failures += 1
                print(
                    f"--- scene-{args.seed0 + i} ---\nref:  {want}\nrepo: {got}",
                    flush=True,
                )
            if (i + 1) % 100 == 0:
                print(
                    f"[{i + 1}/{args.n}] {failures} divergences "
                    f"({(time.time() - t0) / (i + 1) * 1000:.0f} ms/case)",
                    flush=True,
                )
    else:
        chunk = 100  # random_circuits materializes its whole list; bound RSS
        for base in range(0, args.n, chunk):
            cases = random_circuits(
                min(chunk, args.n - base), seed0=args.seed0 + base
            )
            for j, (mask, boxes) in enumerate(cases):
                i = base + j
                d = diff(f"hunt-{args.seed0 + i}", mask, boxes)
                if d:
                    failures += 1
                    print(d, flush=True)
            done = base + len(cases)
            print(
                f"[{done}/{args.n}] {failures} divergences "
                f"({(time.time() - t0) / done * 1000:.0f} ms/case)",
                flush=True,
            )
    print(f"DONE: {args.n} {args.surface} cases, {failures} divergences", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
