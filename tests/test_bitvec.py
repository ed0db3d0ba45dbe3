import numpy as np
import pytest

from ds2i_tpu.bitvec import (
    BitReader,
    BitVector,
    BitVectorBuilder,
    read_delta,
    read_gamma,
    read_gamma_nonzero,
    write_delta,
    write_gamma,
    write_gamma_nonzero,
)
from ds2i_tpu.bitvec.bitvector import ceil_log2, msb


def test_msb_ceil_log2():
    assert msb(1) == 0
    assert msb(2) == 1
    assert msb(3) == 1
    assert msb(1 << 40) == 40
    assert ceil_log2(1) == 0
    assert ceil_log2(2) == 1
    assert ceil_log2(3) == 2
    assert ceil_log2(1024) == 10
    assert ceil_log2(1025) == 11


def test_builder_scalar_bits():
    rng = np.random.RandomState(42)
    ref_bits = rng.randint(0, 2, size=1000)
    b = BitVectorBuilder()
    for bit in ref_bits:
        b.push_back(int(bit))
    bv = b.build()
    assert len(bv) == 1000
    np.testing.assert_array_equal(bv.bits(), ref_bits.astype(np.uint8))


def test_append_bits_roundtrip():
    rng = np.random.RandomState(7)
    fields = []
    b = BitVectorBuilder()
    for _ in range(500):
        w = int(rng.randint(0, 65))
        v = int(rng.randint(0, 1 << 62)) & ((1 << w) - 1) if w else 0
        fields.append((v, w))
        b.append_bits(v, w)
    bv = b.build()
    r = BitReader(bv)
    for v, w in fields:
        assert r.take(w) == v


def test_set_fields_get_fields_vectorized():
    rng = np.random.RandomState(3)
    for width in [1, 3, 7, 13, 31, 33, 56, 63, 64]:
        n = 200
        vals = rng.randint(0, 1 << 62, size=n, dtype=np.uint64)
        if width < 64:
            vals &= np.uint64((1 << width) - 1)
        # random non-overlapping offsets: cumulative with gaps
        gaps = rng.randint(0, 9, size=n).astype(np.uint64)
        offs = np.cumsum(gaps + np.uint64(width)) - np.uint64(width)
        total = int(offs[-1]) + width
        b = BitVectorBuilder()
        b.zero_extend(total)
        b.set_fields(offs, vals, width)
        bv = b.build()
        got = bv.get_fields(offs, width)
        np.testing.assert_array_equal(got, vals)
        # scalar read agrees
        for i in range(0, n, 37):
            assert bv.get_bits(offs[i], width) == int(vals[i])


def test_set_ones_select_ones():
    rng = np.random.RandomState(11)
    positions = np.unique(rng.randint(0, 10000, size=600))
    b = BitVectorBuilder()
    b.zero_extend(10000)
    b.set_ones(positions)
    bv = b.build()
    np.testing.assert_array_equal(bv.select_ones(0, 10000), positions)
    # ranged select
    lo, hi = 1234, 8000
    expect = positions[(positions >= lo) & (positions < hi)]
    np.testing.assert_array_equal(bv.select_ones(lo, hi), expect)
    assert bv.rank1(5000) == int((positions < 5000).sum())


def test_predecessor1():
    b = BitVectorBuilder()
    b.zero_extend(300)
    b.set_ones(np.array([5, 64, 130, 131, 299]))
    bv = b.build()
    assert bv.predecessor1(299) == 299
    assert bv.predecessor1(298) == 131
    assert bv.predecessor1(131) == 131
    assert bv.predecessor1(130) == 130
    assert bv.predecessor1(129) == 64
    assert bv.predecessor1(63) == 5


def test_append_builder_alignment():
    rng = np.random.RandomState(5)
    for trial in range(20):
        a_bits = rng.randint(0, 2, size=int(rng.randint(1, 200)))
        b_bits = rng.randint(0, 2, size=int(rng.randint(1, 200)))
        a = BitVectorBuilder()
        for bit in a_bits:
            a.push_back(int(bit))
        b = BitVectorBuilder()
        for bit in b_bits:
            b.push_back(int(bit))
        a.append_builder(b)
        bv = a.build()
        expect = np.concatenate([a_bits, b_bits]).astype(np.uint8)
        np.testing.assert_array_equal(bv.bits(), expect)


def test_gamma_delta_roundtrip():
    values = [0, 1, 2, 3, 4, 5, 63, 64, 65, 1000, (1 << 30) + 12345, (1 << 50) + 7]
    b = BitVectorBuilder()
    for v in values:
        write_gamma(b, v)
    for v in values:
        write_delta(b, v)
    write_gamma_nonzero(b, 1)
    write_gamma_nonzero(b, 77)
    bv = b.build()
    r = BitReader(bv)
    for v in values:
        assert read_gamma(r) == v
    for v in values:
        assert read_delta(r) == v
    assert read_gamma_nonzero(r) == 1
    assert read_gamma_nonzero(r) == 77
    assert r.position() == len(bv)


def test_gamma_bit_layout():
    # gamma(0): nn=1, l=0 -> single 1 bit
    b = BitVectorBuilder()
    write_gamma(b, 0)
    bv = b.build()
    assert len(bv) == 1 and bv[0] == 1
    # gamma(2): nn=3, l=1 -> bits: field(hb=2, 2 bits) LSB-first = 0,1 then field(1,1 bit)=1
    b = BitVectorBuilder()
    write_gamma(b, 2)
    bv = b.build()
    assert list(bv.bits()) == [0, 1, 1]


def test_bitvector_tree_roundtrip():
    b = BitVectorBuilder()
    b.append_bits(0xDEADBEEF, 37)
    bv = b.build()
    bv2 = BitVector.from_tree(bv.tree())
    assert len(bv2) == len(bv)
    assert bv2.get_bits(0, 37) == bv.get_bits(0, 37)
