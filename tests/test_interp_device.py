"""The vectorized stack-machine interpolative decoder must reproduce the
sequential reference decoder bit-for-bit, at arbitrary stream offsets."""

import numpy as np
import pytest

from ds2i_tpu.codecs.interpolative import BitReader32, BitWriter32
from ds2i_tpu.ops.interp_device import interp_decode_np


def _encode_block(rng, n, universe):
    vals = np.sort(rng.randint(0, universe, size=n)).astype(np.int64)
    s = int(vals[-1])
    bw = BitWriter32()
    bw.write_interpolative(vals, 0, n - 1, 0, s)
    return vals, s, np.asarray(bw.words, dtype=np.uint32), bw.size


@pytest.mark.parametrize("universe", [10, 1000, 2**20, 2**30])
def test_interp_device_matches_reference(universe):
    rng = np.random.RandomState(42)
    R, NC = 24, 128
    wins, rel0s, ns, sums, expect = [], [], [], [], []
    maxw = 1
    for r in range(R):
        n = int(rng.randint(1, NC + 1))
        vals, s, words, nbits = _encode_block(rng, n, universe)
        # place at a random bit offset (mimics byte-misaligned streams)
        off = int(rng.randint(0, 32))
        shifted = np.zeros(len(words) + 2, dtype=np.uint64)
        w64 = words.astype(np.uint64)
        shifted[: len(words)] |= (w64 << off) & 0xFFFFFFFF
        shifted[1 : len(words) + 1] |= w64 >> (32 - off) if off else 0
        win = shifted.astype(np.uint32)
        maxw = max(maxw, len(win))
        wins.append(win)
        rel0s.append(off)
        ns.append(n)
        sums.append(s)
        expect.append(vals)
    W = maxw
    winm = np.zeros((R, W), dtype=np.uint32)
    for r, w in enumerate(wins):
        winm[r, : len(w)] = w
    cum = interp_decode_np(winm, np.array(rel0s), np.array(ns), np.array(sums), NC=NC, W=W, steps=NC - 1)
    for r in range(R):
        np.testing.assert_array_equal(cum[r, : ns[r]], expect[r], err_msg=f"row {r} n={ns[r]}")
        # sequential reference for good measure
        buf = winm[r].view(np.uint8)
        out = np.empty(ns[r], dtype=np.int64)
        out[ns[r] - 1] = sums[r]
        if ns[r] > 1:
            br = BitReader32(buf, 0)
            br.read(rel0s[r])
            br.read_interpolative(out, 0, ns[r] - 1, 0, sums[r])
        np.testing.assert_array_equal(cum[r, : ns[r]], out)


def test_interp_device_single_value():
    cum = interp_decode_np(np.zeros((2, 2), np.uint32), np.zeros(2, int),
                           np.array([1, 1]), np.array([7, 0]), NC=4, W=2, steps=3)
    assert cum[0, 0] == 7 and cum[1, 0] == 0
