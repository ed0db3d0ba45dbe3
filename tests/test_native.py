"""Native (C++) construction kernels must agree exactly with the Python
reference implementations."""

import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.native import available, optimal_partition_native
from ds2i_tpu.sequences import IndexedSequence, StrictSequence, optimal_partition
from ds2i_tpu.sequences.selectors import strict_params


def _require_native():
    if not available():
        import subprocess
        import sys

        from ds2i_tpu.native import build as _b  # noqa

        subprocess.check_call([sys.executable, "ds2i_tpu/native/build.py"])
        import ds2i_tpu.native as native

        native._TRIED = False
        assert native.available(), "native build failed"


@pytest.mark.parametrize("cost_kind", [0, 1])
def test_native_partition_matches_python(cost_kind):
    _require_native()
    params = GlobalParameters()
    rng = np.random.RandomState(99)
    base_cls = IndexedSequence if cost_kind == 0 else StrictSequence
    for trial in range(6):
        n = int(rng.randint(50, 4000))
        universe = int(n * rng.uniform(1.05, 20)) + 2
        values = np.sort(rng.choice(universe - 1, size=n, replace=False)).astype(np.uint64)

        def cost_fun(u, m):
            return base_cls.bitsize(params, u, m) + 64

        expect = optimal_partition(values, universe, n, cost_fun, 0.03, 0.3).partition
        got = optimal_partition_native(values, universe, n, params, 0.03, 0.3, 64, cost_kind)
        assert got == expect, f"trial {trial}: {got[:5]}... vs {expect[:5]}..."


def test_native_used_by_partitioned_write(tmp_path):
    _require_native()
    from ds2i_tpu.bitvec import BitVectorBuilder
    from ds2i_tpu.sequences import PartitionedSequence

    params = GlobalParameters()
    rng = np.random.RandomState(5)
    values = np.sort(rng.choice(50_000, size=3000, replace=False)).astype(np.uint64)
    b = BitVectorBuilder()
    PartitionedSequence.write(b, values, 50_000, 3000, params)
    bv = b.build()
    np.testing.assert_array_equal(
        PartitionedSequence.decode(bv, 0, 50_000, 3000, params), values
    )


def test_native_ef_batch_bit_identical(monkeypatch):
    """The batched native EF writer must produce byte-identical docs/freqs
    collections to the pure-Python encoder, headers included."""
    from ds2i_tpu import GlobalParameters
    from ds2i_tpu.index.types import make_index_type
    from ds2i_tpu.native import available

    if not available():
        pytest.skip("native library not built")

    rng = np.random.RandomState(7)
    num_docs = 5000
    lists = []
    for i in range(300):
        n = int(rng.randint(1, 700))
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.uint64)
        freqs = rng.randint(1, 30, size=n).astype(np.uint64)
        lists.append((n, docs, freqs, int(freqs.sum())))
    # include single-posting and occurrences==1 edge cases
    lists.append((1, np.array([0], np.uint64), np.array([1], np.uint64), 1))
    lists.append((1, np.array([num_docs - 1], np.uint64), np.array([7], np.uint64), 7))

    def build(fast):
        if not fast:
            monkeypatch.setenv("DS2I_NATIVE", "0")
        else:
            monkeypatch.delenv("DS2I_NATIVE", raising=False)
        cls = make_index_type("ef")
        b = cls.builder(num_docs, GlobalParameters())
        for n, d, f, occ in lists:
            b.add_posting_list(n, d, f, occ)
        return b.build()

    slow = build(False)
    fast = build(True)
    for name in ("docs_sequences", "freqs_sequences"):
        sb, fb = getattr(slow, name), getattr(fast, name)
        assert sb.bits_bv.nbits == fb.bits_bv.nbits, name
        nw = (sb.bits_bv.nbits + 63) // 64
        np.testing.assert_array_equal(sb.bits_bv.words[:nw], fb.bits_bv.words[:nw], err_msg=name)
        np.testing.assert_array_equal(sb.endpoints(), fb.endpoints(), err_msg=name)


@pytest.mark.parametrize("name", ["block_optpfor", "block_varint", "block_interpolative", "block_qmx"])
def test_native_block_writer_bit_identical(name, monkeypatch):
    """The native batched block encoder must reproduce the Python
    BlockPostingList.write bytes exactly (every codec, full + partial
    blocks, exception-heavy and dense gap distributions)."""
    from ds2i_tpu.native import available

    if not available():
        pytest.skip("native library not built")
    from ds2i_tpu import GlobalParameters
    from ds2i_tpu.index.types import make_index_type

    rng = np.random.RandomState(99)
    num_docs = 60_000
    lists = []
    for i in range(40):
        # mix of lengths: partial-only, exact multiple of 128, long
        n = int(rng.choice([1, 2, 17, 127, 128, 129, 256, 300, 1000, 4000]))
        # occasional huge gaps to force exceptions / wide widths
        gaps = rng.zipf(1.3, size=n).astype(np.int64)
        if rng.rand() < 0.3:
            gaps[rng.randint(0, n, size=max(n // 50, 1))] += 1 << rng.randint(8, 20)
        docs = np.cumsum(gaps) - 1
        docs = np.minimum(docs, num_docs - 1)
        docs = np.unique(docs)
        n = len(docs)
        freqs = rng.randint(1, 300, size=n).astype(np.uint32)
        lists.append((docs.astype(np.uint32), freqs))

    cls = make_index_type(name)

    def build(native):
        monkeypatch.setenv("DS2I_NATIVE", "1" if native else "0")
        b = cls.builder(num_docs, GlobalParameters())
        assert bool(b._native_codec) == native
        for docs, freqs in lists:
            b.add_posting_list(len(docs), docs, freqs)
        return b.build()

    a = build(True)
    c = build(False)
    np.testing.assert_array_equal(a.lists, c.lists)
    np.testing.assert_array_equal(a.endpoints(), c.endpoints())
    # decoded parity for good measure
    for i in (0, 7, 39):
        da, fa = a.decode_list(i)
        dc, fc = c.decode_list(i)
        np.testing.assert_array_equal(da, dc)
        np.testing.assert_array_equal(fa, fc)


@pytest.mark.parametrize("name", ["single", "uniform", "opt"])
def test_native_seq_writer_bit_identical(name, monkeypatch):
    """The native single/uniform/opt builder must reproduce the Python
    sequence writers bit-for-bit: selector choices (EF / ranked bitvector
    / all-ones), strict freq streams, partition DP + metadata streams,
    singleton fast paths, dense lists, and n=1 lists."""
    from ds2i_tpu.native import available

    if not available():
        pytest.skip("native library not built")
    from ds2i_tpu import GlobalParameters
    from ds2i_tpu.index.types import make_index_type

    rng = np.random.RandomState(7)
    num_docs = 5000
    lists = []
    # >= 128 lists so the native writer's MULTI-THREADED path (per-thread
    # builders + cross-thread bit-blit at unaligned offsets) is exercised
    for i in range(200):
        kind = i % 5
        if kind == 0:  # sparse
            n = int(rng.randint(1, 40))
            docs = np.sort(rng.choice(num_docs, size=n, replace=False))
        elif kind == 1:  # dense range (forces RB / all-ones paths)
            lo = int(rng.randint(0, num_docs - 600))
            n = int(rng.randint(300, 600))
            docs = lo + np.sort(rng.choice(600, size=n, replace=False))
        elif kind == 2:  # long clustered (forces multi-partition opt)
            n = int(rng.randint(400, 1200))
            gaps = rng.choice([1, 1, 1, 2, 40], size=n)
            docs = np.minimum(np.cumsum(gaps) + int(rng.randint(0, 100)), num_docs - 1)
            docs = np.unique(docs)
            n = len(docs)
        elif kind == 3:  # singleton
            docs = np.array([int(rng.randint(0, num_docs))])
            n = 1
        else:  # everything-doc list (all_ones docs candidate)
            docs = np.arange(num_docs)
            n = num_docs
        freqs = rng.randint(1, 4, size=len(docs)).astype(np.uint64)
        if kind == 4:
            freqs[:] = 1  # freq prefix sums == positions + 1 (all_ones case)
        lists.append((docs.astype(np.uint64), freqs))

    cls = make_index_type(name)

    def build(native):
        monkeypatch.setenv("DS2I_NATIVE", "1" if native else "0")
        b = cls.builder(num_docs, GlobalParameters())
        assert bool(b._fast_mode) == native
        for docs, freqs in lists:
            b.add_posting_list(len(docs), docs, freqs, int(freqs.sum()))
        return b.build()

    a = build(True)
    c = build(False)
    for coll_a, coll_c in ((a.docs_sequences, c.docs_sequences), (a.freqs_sequences, c.freqs_sequences)):
        assert coll_a.bits_bv.nbits == coll_c.bits_bv.nbits
        np.testing.assert_array_equal(
            np.asarray(coll_a.bits_bv.words), np.asarray(coll_c.bits_bv.words)
        )
    # decoded parity too
    for i in (0, 3, 4, 17, 49):
        da, fa = a.decode_list(i)
        dc, fc = c.decode_list(i)
        np.testing.assert_array_equal(da, dc)
        np.testing.assert_array_equal(fa, fc)


@pytest.mark.parametrize("type_name", ["ef", "opt"])
def test_native_batch_rejects_excess_freq_sum(type_name):
    """The fast path must raise (like the Python writers) when a list's
    freq sum exceeds its declared occurrences, instead of doing unchecked
    native bit writes at value-derived positions."""
    from ds2i_tpu import GlobalParameters
    from ds2i_tpu.index.types import make_index_type
    from ds2i_tpu.native import available

    if not available():
        pytest.skip("native library not built")

    cls = make_index_type(type_name)
    b = cls.builder(100, GlobalParameters())
    docs = np.array([1, 5, 9], np.uint64)
    freqs = np.array([3, 4, 5], np.uint64)
    # declared occurrences (6) < sum(freqs) (12)
    b.add_posting_list(3, docs, freqs, 6)
    with pytest.raises(ValueError):
        b.build()


def test_native_cpu_query_engine_matches_oracle():
    """ds2i_cpu_block_query (the C++ cursor engine / measured CPU
    baseline) must match the Python cursor ops on all four operators."""
    from ds2i_tpu import GlobalParameters
    from ds2i_tpu.index.types import make_index_type
    from ds2i_tpu.native import available, cpu_block_query_native
    from ds2i_tpu.queries import QUERY_OPS
    from ds2i_tpu.queries.bm25 import BM25
    from ds2i_tpu.queries.parsing import query_freqs
    from ds2i_tpu.queries.wand_data import WandData

    if not available():
        pytest.skip("native library not built")

    rng = np.random.RandomState(3)
    num_docs = 4000
    sizes = rng.randint(50, 400, num_docs).astype(np.int64)
    cls = make_index_type("block_optpfor")
    b = cls.builder(num_docs, GlobalParameters())
    lists = []
    for i in range(50):
        n = int(rng.randint(1, 1200))
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = (1 + rng.zipf(1.5, n) % 40).astype(np.int64)
        lists.append((docs, freqs))
        b.add_posting_list(n, docs, freqs, int(freqs.sum()))
    idx = b.build()
    wd = WandData.build(sizes, lists)
    qs = [list(rng.choice(50, size=rng.randint(1, 5), replace=False)) for _ in range(40)]

    list_n = np.array([len(d) for d, _ in lists], dtype=np.float64)
    terms, qws, offs = [], [], [0]
    for q in qs:
        for t, m in query_freqs(q):
            terms.append(t)
            idf = np.log((num_docs - list_n[t] + 0.5) / (list_n[t] + 0.5))
            qws.append(m * max(1e-6, idf) * (1 + BM25.k1))
        offs.append(len(terms))

    data = np.asarray(idx.lists, np.uint8)
    eps = np.asarray(idx.endpoints(), np.int64)
    for opname, opcode in (("and", 0), ("or", 1), ("ranked_and", 2), ("ranked_or", 3)):
        out = cpu_block_query_native(
            data, eps, idx.size(), wd.norm_lens, num_docs, terms, qws, offs, opcode, 10
        )
        assert out is not None
        scores, counts, qus = out
        ref_op = QUERY_OPS[opname](idx, wd, 10)
        for qi, q in enumerate(qs):
            ref = ref_op(q)
            if opcode < 2:
                assert int(counts[qi]) == int(ref), (opname, qi)
            else:
                rs = np.asarray(ref, dtype=np.float32)
                ms = scores[qi][np.isfinite(scores[qi])]
                assert len(rs) == len(ms), (opname, qi)
                np.testing.assert_allclose(ms, rs, rtol=1e-4, err_msg=f"{opname} q{qi}")
