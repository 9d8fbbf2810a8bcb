"""Build the native loader: python -m rap_tpu.native.build"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "loader.cpp"
LIB = HERE / "librap_loader.so"


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(SRC), "-o", str(LIB),
    ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build()
