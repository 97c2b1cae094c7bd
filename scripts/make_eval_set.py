"""Render the synthetic eval set into eval_data/ (images, GT boxes, GT
wire masks, canned VLM labels, pinned reference netlists).

Usage: python scripts/make_eval_set.py [--out eval_data]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from circuitvision_tpu.eval.synth import make_all_circuits, write_eval_set


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="eval_data")
    args = parser.parse_args()
    circuits = make_all_circuits()
    write_eval_set(args.out, circuits)
    print(f"wrote {len(circuits)} circuits to {args.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
