"""Index-level integration tests (mirrors test_freq_index.cpp:17-72):
build random posting lists -> freeze -> load -> full equality scan."""

import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.index import INDEX_TYPES, freeze, load, size_tree
from ds2i_tpu.index.types import make_index_type


def make_lists(num_docs=8192, n_lists=30, seed=42):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_lists):
        n = int(rng.randint(1, 1000))
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.uint64)
        freqs = rng.randint(1, 256, size=n).astype(np.uint64)
        out.append((docs, freqs))
    return out


LISTS = make_lists()


@pytest.mark.parametrize("name", ["ef", "single", "uniform", "opt"])
def test_freq_index_roundtrip(name, tmp_path):
    num_docs = 8192
    cls = make_index_type(name)
    b = cls.builder(num_docs, GlobalParameters())
    for docs, freqs in LISTS:
        b.add_posting_list(len(docs), docs, freqs, int(freqs.sum()))
    index = b.build()
    assert index.size() == len(LISTS)
    assert index.num_docs() == num_docs

    # freeze + mmap back
    path = tmp_path / f"{name}.bin"
    freeze(index.tree(), path)
    index2 = cls.from_tree(load(path))

    for i, (docs, freqs) in enumerate(LISTS):
        # vectorized full decode
        d, f = index2.decode_list(i)
        np.testing.assert_array_equal(d, docs)
        np.testing.assert_array_equal(f, freqs)
        # cursor scan (document_enumerator semantics)
        if i % 7 == 0:
            e = index2[i]
            assert e.size() == len(docs)
            for j in range(len(docs)):
                assert e.docid() == docs[j]
                assert e.freq() == freqs[j]
                if j + 1 < len(docs):
                    e.next()
            # next_geq across the list
            e2 = index2[i]
            mid = int(docs[len(docs) // 2])
            e2.next_geq(mid)
            assert e2.docid() == mid
            e2.next_geq(int(docs[-1]) + 1)
            assert e2.docid() == num_docs  # universe sentinel

    st = size_tree(str(path))
    assert st["__total__"] > 0
    assert "m_docs_sequences" in st


def test_builder_rejects_empty_list():
    cls = INDEX_TYPES["ef"]
    b = cls.builder(100, GlobalParameters())
    with pytest.raises(ValueError):
        b.add_posting_list(0, np.array([]), np.array([]), 0)


def test_parallel_build_matches_serial():
    cls = INDEX_TYPES["opt"]
    bs = cls.builder(8192, GlobalParameters(), workers=1)
    bp = cls.builder(8192, GlobalParameters(), workers=4)
    for docs, freqs in LISTS:
        bs.add_posting_list(len(docs), docs, freqs, int(freqs.sum()))
        bp.add_posting_list(len(docs), docs, freqs, int(freqs.sum()))
    i1, i2 = bs.build(), bp.build()
    # deterministic output: identical bit streams regardless of thread count
    np.testing.assert_array_equal(i1.docs_sequences.bits_bv.words, i2.docs_sequences.bits_bv.words)
    np.testing.assert_array_equal(i1.freqs_sequences.bits_bv.words, i2.freqs_sequences.bits_bv.words)
