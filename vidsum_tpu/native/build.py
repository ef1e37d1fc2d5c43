"""Build the native eval runtime: ``python -m vidsum_tpu.native.build``.

Compiles ``src/eval_runtime.cc`` into ``libvidsum_native.so`` next to this
module with g++ (no pybind11 in this image — the library exposes a plain C
ABI consumed via ctypes in ``vidsum_tpu/native/__init__.py``).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src", "eval_runtime.cc")
OUT = os.path.join(HERE, "libvidsum_native.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", OUT, SRC]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
