"""Build the native contour tracer:
`python -m circuitvision_tpu.topology.build_native`."""
from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    src = os.path.join(here, "contours.cpp")
    out = os.path.join(here, "libcvcontours.so")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
