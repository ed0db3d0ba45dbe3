"""Build the native construction library: python ds2i_tpu/native/build.py"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ds2i_native.cpp")
OUT = os.path.join(HERE, "libds2i_native.so")


def build(verbose=True):
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
