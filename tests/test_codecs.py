"""Block codec tests (mirrors test_block_codecs.cpp:9-46): round-trip at
sizes {1,16,127,128} x magnitudes 2^k x {known, unknown sum_of_values},
asserting the decoder consumes exactly the encoded bytes."""

import numpy as np
import pytest

from ds2i_tpu.codecs import (
    BLOCK_CODECS,
    InterpolativeBlock,
    MixedBlock,
    OptPForBlock,
    QMXBlock,
    TightVariableByte,
    VarintG8IUBlock,
    simple16_decode,
    simple16_encode,
)
from ds2i_tpu.codecs.interpolative import UNKNOWN_SUM
from ds2i_tpu.codecs.mixed import BLOCK_TYPES, INTERPOLATIVE, PFOR, VARINT, compr_params
from ds2i_tpu.codecs.time_prediction import FeatureVector, Predictor, values_statistics


def cat(out_list):
    return np.concatenate([np.asarray(o, dtype=np.uint8).reshape(-1) for o in out_list])


def test_vbyte_roundtrip():
    vals = [0, 1, 127, 128, 16383, 16384, 2**28 - 1, 2**28, 2**32 - 1]
    buf = TightVariableByte.encode(vals)
    got, pos = TightVariableByte.decode(buf, 0, len(vals))
    np.testing.assert_array_equal(got, np.array(vals, dtype=np.uint32))
    assert pos == len(buf)


def test_simple16_roundtrip():
    rng = np.random.RandomState(0)
    for mag in [1, 3, 8, 15, 27]:
        vals = rng.randint(0, 2**mag, size=100).astype(np.uint32)
        words = simple16_encode(vals)
        got, used = simple16_decode(words, len(vals))
        np.testing.assert_array_equal(got, vals)
        assert used == len(words)


CODECS = [InterpolativeBlock, OptPForBlock, VarintG8IUBlock, QMXBlock]


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("n", [1, 16, 127, 128])
@pytest.mark.parametrize("mag", [1, 6, 13, 25])
def test_block_codec_roundtrip(codec, n, mag):
    rng = np.random.RandomState(n * 100 + mag)
    values = rng.randint(0, 2**mag, size=n).astype(np.uint32)
    for known_sum in (True, False):
        sum_of_values = int(values.sum()) if known_sum else UNKNOWN_SUM
        out = []
        codec.encode(values, sum_of_values, n, out)
        buf = cat(out)
        got, pos = codec.decode(buf, 0, sum_of_values, n)
        np.testing.assert_array_equal(got[:n], values, err_msg=f"{codec.__name__} n={n} mag={mag} known={known_sum}")
        assert pos == len(buf), f"{codec.__name__} consumed {pos} != {len(buf)}"


def test_block_codec_skewed_values():
    # pfor exception path: mostly small values with a few huge ones
    rng = np.random.RandomState(7)
    values = rng.randint(0, 16, size=128).astype(np.uint32)
    values[[3, 77, 120]] = [2**20, 2**27, 2**31]
    out = []
    OptPForBlock.encode(values, int(values.sum()), 128, out)
    buf = cat(out)
    got, pos = OptPForBlock.decode(buf, 0, int(values.sum()), 128)
    np.testing.assert_array_equal(got, values)
    assert pos == len(buf)
    # should be far smaller than 4 bytes/int thanks to exceptions
    assert len(buf) < 128 * 2


def test_mixed_block_roundtrip():
    rng = np.random.RandomState(3)
    values = rng.randint(0, 1000, size=128).astype(np.uint32)
    for t, param in [(PFOR, 5), (VARINT, 0), (INTERPOLATIVE, 0)]:
        out = []
        MixedBlock.encode_type(t, param, values, int(values.sum()), 128, out)
        buf = cat(out)
        got, pos = MixedBlock.decode(buf, 0, int(values.sum()), 128)
        np.testing.assert_array_equal(got, values)
        assert pos == len(buf)
    # partial block: always interpolative, no type byte
    part = values[:50]
    out = []
    MixedBlock.encode_type(INTERPOLATIVE, 0, part, int(part.sum()), 50, out)
    buf = cat(out)
    got, pos = MixedBlock.decode(buf, 0, int(part.sum()), 50)
    np.testing.assert_array_equal(got, part)


def test_compute_space_time():
    rng = np.random.RandomState(5)
    values = rng.randint(0, 256, size=128).astype(np.uint32)
    predictors = [Predictor([("bias", 1.0), ("size", 0.01)]) for _ in range(BLOCK_TYPES)]
    points = MixedBlock.compute_space_time(values, int(values.sum()), predictors, access_count=10)
    assert len(points) >= 3
    types = {p.type for p in points}
    assert VARINT in types and INTERPOLATIVE in types and PFOR in types
    for p in points:
        assert p.space > 0 and p.time > 0


def test_values_statistics():
    fv = FeatureVector()
    values_statistics([1, 1, 2, 4, 0, 0], fv)
    assert fv["n"] == 6
    assert fv["nonzeros"] == 4
    assert fv["max_b"] == 3  # msb(4)+1
    assert fv["entropy"] > 0
