"""Build the native construction library: python ds2i_tpu/native/build.py"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ds2i_native.cpp")
OUT = os.path.join(HERE, "libds2i_native.so")


def build(verbose=True, sanitize=None):
    """DS2I_SANITIZE=1 (or sanitize=True) adds AddressSanitizer +
    frame pointers, mirroring the reference's -DUSE_SANITIZERS build
    (CMakeLists.txt:28-30). Run tests with
    LD_PRELOAD=$(g++ -print-file-name=libasan.so)."""
    if sanitize is None:
        sanitize = os.environ.get("DS2I_SANITIZE") == "1"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", "-ggdb"]
    if sanitize:
        cmd += ["-fsanitize=address", "-fno-omit-frame-pointer"]
    cmd += [SRC, "-o", OUT]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build()
