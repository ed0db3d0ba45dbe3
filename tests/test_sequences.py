"""Sequence-layer tests, modeled on the reference test strategy
(test_generic_sequence.hpp, test_compact_elias_fano.cpp,
test_partitioned_sequence.cpp — see SURVEY.md §4)."""

import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.bitvec import BitVectorBuilder
from ds2i_tpu.sequences import (
    AllOnesSequence,
    CompactEliasFano,
    CompactRankedBitvector,
    IndexedSequence,
    PartitionedSequence,
    PartitionedSequenceStrict,
    StrictEliasFano,
    StrictSequence,
    UniformPartitionedSequence,
    make_positive_sequence,
    optimal_partition,
)
from ds2i_tpu.sequences.selectors import PositiveSequence


def random_sequence(universe, n, strict, seed=42):
    rng = np.random.RandomState(seed)
    if strict:
        return np.sort(rng.choice(universe, size=n, replace=False)).astype(np.uint64)
    return np.sort(rng.randint(0, universe, size=n)).astype(np.uint64)


def roundtrip(seq_type, values, universe, n, params=None, offset_pad=0):
    params = params or GlobalParameters()
    b = BitVectorBuilder()
    if offset_pad:
        b.append_bits(0x55555 & ((1 << offset_pad) - 1), offset_pad)
    seq_type.write(b, values, universe, n, params)
    bv = b.build()
    return bv, seq_type.decode(bv, offset_pad, universe, n, params)


def check_sequence(seq_type, values, universe, params=None, with_next_geq=True, seed=1):
    """The generic harness: decode equality, enumerator move/next/next_geq/
    prev_value semantics (test_generic_sequence.hpp:28-164)."""
    params = params or GlobalParameters()
    n = len(values)
    bv, decoded = roundtrip(seq_type, values, universe, n, params, offset_pad=13)
    np.testing.assert_array_equal(decoded, values)

    e = seq_type.enumerator(bv, 13, universe, n, params)
    assert e.size() == n
    # random access + prev_value
    rng = np.random.RandomState(seed)
    for pos in rng.randint(0, n, size=min(50, n)):
        pos = int(pos)
        assert e.move(pos) == (pos, int(values[pos]))
        assert e.prev_value() == (int(values[pos - 1]) if pos else 0)
    # sequential re-enumeration
    e.move(0)
    for i in range(1, min(n, 300)):
        assert e.next() == (i, int(values[i]))
    # move to end sentinel
    assert e.move(n) == (n, universe)
    assert e.prev_value() == int(values[n - 1])

    if with_next_geq:
        probes = rng.randint(0, int(universe * 1.05) + 2, size=200)
        for lb in probes:
            lb = int(lb)
            e2 = seq_type.enumerator(bv, 13, universe, n, params)
            pos, val = e2.next_geq(lb)
            expect_pos = int(np.searchsorted(values, lb, side="left"))
            assert pos == expect_pos
            assert val == (int(values[pos]) if pos < n else universe)
        # beyond 2x universe
        assert seq_type.enumerator(bv, 13, universe, n, params).next_geq(2 * universe) == (n, universe)
        # stay-put on equal current value
        e3 = seq_type.enumerator(bv, 13, universe, n, params)
        p, v = e3.move(n // 2)
        assert e3.next_geq(v) == (p, v)


AVG_GAPS = [1.1, 1.9, 2.5, 3.0, 4.0, 5.0, 10.0]


@pytest.mark.parametrize("avg_gap", AVG_GAPS)
def test_compact_elias_fano(avg_gap):
    n = 2000
    universe = int(n * avg_gap) + 1
    values = random_sequence(universe, n, strict=False, seed=int(avg_gap * 10))
    check_sequence(CompactEliasFano, values, universe)


def test_compact_elias_fano_singleton():
    for v in [0, 1, 999]:
        check_sequence(
            CompactEliasFano, np.array([v], dtype=np.uint64), 1000, with_next_geq=True
        )


def test_compact_elias_fano_high_sampling_granularity():
    # deliberately aggressive sampling to hit pointer paths
    params = GlobalParameters(ef_log_sampling0=4, ef_log_sampling1=5)
    values = random_sequence(10000, 3000, strict=False, seed=9)
    check_sequence(CompactEliasFano, values, 10000, params=params)


def test_compact_elias_fano_bit_layout():
    """Recompute every high bit, low bits and both pointer arrays from the raw
    bitvector (mirrors test_compact_elias_fano.cpp:45-82)."""
    params = GlobalParameters(ef_log_sampling0=4, ef_log_sampling1=5)
    universe, n = 3000, 900
    values = random_sequence(universe, n, strict=False, seed=4)
    b = BitVectorBuilder()
    CompactEliasFano.write(b, values, universe, n, params)
    bv = b.build()
    of = CompactEliasFano.offsets(0, universe, n, params)

    # high bits: bit set exactly at (v >> l) + i + 1
    expected_high = set(int(v >> np.uint64(of.lower_bits)) + i + 1 for i, v in enumerate(values))
    got_high = set(int(p) - of.higher_bits_offset for p in bv.select_ones(
        of.higher_bits_offset, of.higher_bits_offset + of.higher_bits_length))
    assert got_high == expected_high

    # low bits
    if of.lower_bits:
        offs = of.lower_bits_offset + np.arange(n, dtype=np.uint64) * np.uint64(of.lower_bits)
        lows = bv.get_fields(offs, of.lower_bits)
        np.testing.assert_array_equal(lows, values & np.uint64(of.mask))

    # pointers
    p0, p1 = CompactEliasFano.read_pointers(bv, 0, universe, n, params)
    highs = np.sort(np.array(sorted(expected_high)))
    bits = np.zeros(of.higher_bits_length, dtype=bool)
    bits[highs] = True
    zeros = np.nonzero(~bits)[0]
    for k in range(1, of.pointers0 + 1):
        idx = k << of.log_sampling0
        expect = zeros[idx] if idx < len(zeros) else 0
        assert int(p0[k - 1]) == expect
    for k in range(1, of.pointers1 + 1):
        idx = k << of.log_sampling1
        expect = highs[idx] if idx < n else 0
        assert int(p1[k - 1]) == expect


@pytest.mark.parametrize("avg_gap", AVG_GAPS)
def test_compact_ranked_bitvector(avg_gap):
    n = 1500
    universe = int(n * avg_gap) + 1
    values = random_sequence(universe, n, strict=True, seed=int(avg_gap * 7))
    params = GlobalParameters(rb_log_rank1_sampling=6, rb_log_sampling1=5)
    check_sequence(CompactRankedBitvector, values, universe, params=params)


def test_ranked_bitvector_rejects_duplicates():
    b = BitVectorBuilder()
    with pytest.raises(ValueError):
        CompactRankedBitvector.write(
            b, np.array([1, 5, 5, 9], dtype=np.uint64), 20, 4, GlobalParameters()
        )


def test_all_ones():
    n = 100
    values = np.arange(n, dtype=np.uint64)
    check_sequence(AllOnesSequence, values, n)
    assert AllOnesSequence.bitsize(GlobalParameters(), n, n) == 0


@pytest.mark.parametrize("avg_gap", AVG_GAPS)
def test_indexed_sequence(avg_gap):
    n = 1000
    universe = int(n * avg_gap) + 1
    values = random_sequence(universe, n, strict=True, seed=int(avg_gap * 3))
    check_sequence(IndexedSequence, values, universe)


def test_indexed_sequence_all_ones_case():
    n = 128
    values = np.arange(n, dtype=np.uint64)
    params = GlobalParameters()
    assert IndexedSequence.bitsize(params, n, n) == 0
    bv, decoded = roundtrip(IndexedSequence, values, n, n)
    np.testing.assert_array_equal(decoded, values)
    assert len(bv) == 0  # all_ones is fully implicit: zero bits written
    b = BitVectorBuilder()
    IndexedSequence.write(b, values, n, n, params)
    assert b.size == 0


@pytest.mark.parametrize("avg_gap", AVG_GAPS)
def test_strict_elias_fano(avg_gap):
    n = 1000
    universe = int(n * avg_gap) + 1
    values = random_sequence(universe, n, strict=True, seed=int(avg_gap * 13))
    check_sequence(StrictEliasFano, values, universe, with_next_geq=False)


@pytest.mark.parametrize("avg_gap", AVG_GAPS)
def test_strict_sequence(avg_gap):
    n = 800
    universe = int(n * avg_gap) + 1
    values = random_sequence(universe, n, strict=True, seed=int(avg_gap * 17))
    check_sequence(StrictSequence, values, universe, with_next_geq=False)


def test_positive_sequence():
    rng = np.random.RandomState(8)
    for base in [None, StrictEliasFano]:
        seq = PositiveSequence if base is None else make_positive_sequence(base)
        n = 500
        freqs = rng.randint(1, 50, size=n).astype(np.uint64)
        universe = int(freqs.sum()) + 1
        params = GlobalParameters()
        b = BitVectorBuilder()
        seq.write(b, freqs, universe, n, params)
        bv = b.build()
        np.testing.assert_array_equal(seq.decode(bv, 0, universe, n, params), freqs)
        e = seq.enumerator(bv, 0, universe, n, params)
        for pos in rng.randint(0, n, size=60):
            assert e.move(int(pos)) == (int(pos), int(freqs[pos]))
        # base() exposes the prefix-sum sequence
        cum = np.cumsum(freqs)
        assert e.base().move(n - 1) == (n - 1, int(cum[-1]))


def test_optimal_partition_basic():
    values = np.concatenate([
        np.arange(100, dtype=np.uint64),             # dense run -> all_ones-ish
        np.uint64(100000) + np.arange(100, dtype=np.uint64) * np.uint64(97),
    ])
    def cost(u, n):
        return IndexedSequence.bitsize(GlobalParameters(), u, n) + 64
    op = optimal_partition(values, int(values[-1]) + 1, len(values), cost, 0.03, 0.3)
    assert op.partition[-1] == len(values)
    assert all(b > a for a, b in zip(op.partition, op.partition[1:]))
    # partitioning must beat the single-block cost
    assert op.cost_opt <= cost(int(values[-1]) + 1, len(values))


@pytest.mark.parametrize("seq_type", [PartitionedSequence, UniformPartitionedSequence])
@pytest.mark.parametrize("avg_gap", [1.1, 2.5, 10.0])
def test_partitioned_sequences(seq_type, avg_gap):
    n = 3000
    universe = int(n * avg_gap) + 1
    values = random_sequence(universe, n, strict=True, seed=int(avg_gap * 11))
    check_sequence(seq_type, values, universe)


def test_partitioned_singleton_partition():
    # small clustered sequence that fits one partition
    values = np.uint64(5000) + np.arange(40, dtype=np.uint64)
    universe = 100000
    check_sequence(PartitionedSequence, values, universe)
    # n == 1
    check_sequence(PartitionedSequence, np.array([777], dtype=np.uint64), 100000)


def test_partitioned_white_box():
    """Check every partition's base/upper-bound/contents via parse()
    (mirrors test_partitioned_sequence.cpp:10-48)."""
    params = GlobalParameters()
    n = 5000
    universe = 60000
    values = random_sequence(universe, n, strict=True, seed=21)
    b = BitVectorBuilder()
    PartitionedSequence.write(b, values, universe, n, params)
    bv = b.build()
    meta = PartitionedSequence.parse(bv, 0, universe, n, params)
    assert meta.partitions >= 1
    assert meta.ends[-1] == n
    for p in range(meta.partitions):
        lo, hi = meta.begins[p], meta.ends[p]
        assert meta.upper_bounds[p] == int(values[hi - 1])
        if p > 0:
            assert meta.bases[p] == int(values[meta.begins[p] - 1]) + 1 or meta.bases[p] <= int(values[lo])
        rel = IndexedSequence.decode(bv, meta.data_offsets[p], meta.rel_universes[p], hi - lo, params)
        np.testing.assert_array_equal(rel + np.uint64(meta.bases[p]), values[lo:hi])


def test_partitioned_strict_base():
    n = 2000
    values = random_sequence(12000, n, strict=True, seed=33)
    for seq in (PartitionedSequenceStrict,):
        check_sequence(seq, values, 12000, with_next_geq=False)


def test_space_sanity_vs_plain():
    """Partitioned EF should not be larger than plain EF on clustered data."""
    params = GlobalParameters()
    rng = np.random.RandomState(3)
    clusters = []
    base = 0
    for _ in range(30):
        base += int(rng.randint(1000, 20000))
        run = int(rng.randint(50, 200))
        clusters.append(base + np.arange(run))
        base += run
    values = np.concatenate(clusters).astype(np.uint64)
    universe = int(values[-1]) + 1000
    n = len(values)
    b1 = BitVectorBuilder()
    CompactEliasFano.write(b1, values, universe, n, params)
    b2 = BitVectorBuilder()
    PartitionedSequence.write(b2, values, universe, n, params)
    assert b2.size < b1.size
