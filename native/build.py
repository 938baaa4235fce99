#!/usr/bin/env python
"""Build the native library (g++ -O3 -shared).

Produces ``native/libtpuseg_native.so``; ``tpuseg.nn.native`` loads it via
ctypes with a pure-python fallback when absent.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["sru_cpu.cpp", "records_io.cpp"]
OUT = os.path.join(HERE, "libtpuseg_native.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", OUT,
    ] + [os.path.join(HERE, s) for s in SOURCES] + ["-lpthread"]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
