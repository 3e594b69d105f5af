"""Build the native host library: python -m unicore_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys


def build() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "fastio.cpp")
    out = os.path.join(here, "libufio.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", out]
    print(" ".join(cmd))
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(build())
