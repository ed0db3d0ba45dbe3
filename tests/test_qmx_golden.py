"""Golden byte-compatibility test for QMX against the reference codec.

Compiles tests/qmx_golden/harness.cpp against the IN-TREE reference
header (/root/reference/qmx_codec.hpp, via -I; never copied) and checks,
over randomized 128-int blocks spanning every width class:

  1. our encoder's bytes == the reference encoder's bytes,
  2. our decoder recovers the values from the reference's bytes,
  3. the reference decoder recovers the values from our bytes.

Skips cleanly when g++ or the reference mount is unavailable.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

REF_DIR = "/root/reference"
HARNESS_SRC = os.path.join(os.path.dirname(__file__), "qmx_golden", "harness.cpp")


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    if not os.path.exists(os.path.join(REF_DIR, "qmx_codec.hpp")):
        pytest.skip("reference mount not available")
    exe = str(tmp_path_factory.mktemp("qmx") / "harness")
    r = subprocess.run(
        ["g++", "-O2", "-msse4.1", f"-I{REF_DIR}", "-o", exe, HARNESS_SRC],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        pytest.skip(f"harness failed to compile: {r.stderr[-400:]}")
    return exe


def _blocks(seed=7, count=256):
    rng = np.random.RandomState(seed)
    out = []
    for trial in range(count):
        kind = trial % 8
        if kind == 0:
            v = np.ones(128, dtype=np.uint32)  # 0-bit class (runs of 1)
        elif kind == 1:
            v = rng.randint(0, 2, 128).astype(np.uint32)
        elif kind == 2:
            v = rng.randint(0, 16, 128).astype(np.uint32)
        elif kind == 3:
            v = rng.randint(0, 1 << 20, 128).astype(np.uint32)
        elif kind == 4:
            v = rng.randint(0, 1 << 31, 128).astype(np.uint32)
        elif kind == 5:  # runs of mixed widths -> exercises run merging
            v = np.concatenate([
                rng.randint(0, 1 << rng.randint(1, 22), rng.randint(4, 40))
                for _ in range(20)
            ])[:128].astype(np.uint32)
            if len(v) < 128:
                v = np.pad(v, (0, 128 - len(v)))
        elif kind == 6:  # mostly ones with wide spikes
            v = np.ones(128, dtype=np.uint32)
            v[rng.choice(128, 5, replace=False)] = rng.randint(1 << 16, 1 << 30, 5)
        else:
            v = (rng.zipf(1.3, 128) % (1 << 28)).astype(np.uint32)
        out.append(v)
    return out


def _ref_encode(exe, blocks):
    payload = struct.pack("<I", len(blocks)) + b"".join(v.tobytes() for v in blocks)
    r = subprocess.run([exe, "encode"], input=payload, capture_output=True)
    assert r.returncode == 0, r.stderr
    buf, off, out = r.stdout, 0, []
    for _ in blocks:
        (ln,) = struct.unpack_from("<I", buf, off)
        off += 4
        out.append(buf[off:off + ln])
        off += ln
    return out


def _ref_decode(exe, encs):
    payload = struct.pack("<I", len(encs)) + b"".join(
        struct.pack("<I", len(e)) + e for e in encs
    )
    r = subprocess.run([exe, "decode"], input=payload, capture_output=True)
    assert r.returncode == 0, r.stderr
    return np.frombuffer(r.stdout, dtype=np.uint32).reshape(len(encs), 128)


def test_qmx_byte_identity_and_cross_decode(harness):
    from ds2i_tpu.codecs.qmx import qmx_decode_block, qmx_encode_block

    blocks = _blocks()
    ref_encs = _ref_encode(harness, blocks)
    mine_encs = [qmx_encode_block(v) for v in blocks]

    for i, (v, re, me) in enumerate(zip(blocks, ref_encs, mine_encs)):
        assert me == re, f"block {i}: encoder bytes differ"
        dec = qmx_decode_block(np.frombuffer(re, dtype=np.uint8), 0, len(re), 128)
        assert np.array_equal(dec, v), f"block {i}: our decode of ref bytes"

    ref_dec = _ref_decode(harness, mine_encs)
    for i, v in enumerate(blocks):
        assert np.array_equal(ref_dec[i], v), f"block {i}: ref decode of our bytes"


# The native C++ batched writer is byte-identical to the Python writer
# (tests/test_native.py), and the Python writer is byte-identical to the
# reference here — closing the native->reference chain transitively.
