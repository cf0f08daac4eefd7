#!/usr/bin/env python
"""Build the native runtime shared library (g++)."""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
SRC = ROOT / "native" / "mlprobs_native.cpp"
OUT = ROOT / "mlprobs_tpu" / "_native.so"


def build(force: bool = False) -> Path:
    if OUT.exists() and not force:
        if OUT.stat().st_mtime >= SRC.stat().st_mtime:
            return OUT
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", str(SRC), "-o", str(OUT),
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
