"""Long-running reference-differential hunt over randomized topologies.

Same harness as tests/test_reference_diff.py (reference host chain
in-process vs the repo's topology→netlist chain on identical inputs;
byte-identical text required) but over an arbitrary seed range, for
background fidelity hunts far larger than the CI budget. Prints a
progress line every 100 cases and any divergence immediately.

Usage: python scripts/hunt_reference_diff.py [--n 2000] [--seed0 50000]
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
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from circuitvision_tpu.eval.randomized import random_circuits
    from tests.ref_loader import load_reference_analyzer
    from tests.test_reference_diff import _diff_case

    ref = load_reference_analyzer()
    t0 = time.time()
    failures = 0
    chunk = 100  # random_circuits materializes its whole list; bound RSS
    for base in range(0, args.n, chunk):
        cases = random_circuits(min(chunk, args.n - base), seed0=args.seed0 + base)
        for j, (mask, boxes) in enumerate(cases):
            i = base + j
            d = _diff_case(ref, f"hunt-{args.seed0 + i}", mask, boxes)
            if d:
                failures += 1
                print(d, flush=True)
        done = base + len(cases)
        print(
            f"[{done}/{args.n}] {failures} divergences "
            f"({(time.time() - t0) / done * 1000:.0f} ms/case)",
            flush=True,
        )
    print(f"DONE: {args.n} cases, {failures} divergences", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
