"""Query-layer tests, modeled on test_ranked_queries.cpp: build an index
from a generated collection + query log; pruned algorithms (wand, maxscore)
must match exhaustive ranked_or top-10 within 0.1% relative."""

import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.index.types import make_index_type
from ds2i_tpu.index.verify import verify_collection
from ds2i_tpu.io import BinaryFreqCollection, generate_collection, read_sizes
from ds2i_tpu.queries import (
    WandData,
    and_query,
    maxscore_query,
    or_query,
    ranked_and_query,
    ranked_or_query,
    read_queries,
    wand_query,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("coll") / "test_collection")
    generate_collection(base, num_docs=2000, num_terms=8000, postings_target=150_000, num_queries=200, max_query_len=3)
    coll = BinaryFreqCollection(base)
    cls = make_index_type("single")
    b = cls.builder(coll.num_docs, GlobalParameters())
    for docs, freqs in coll:
        b.add_posting_list(len(docs), docs, freqs, int(np.asarray(freqs).sum()))
    index = b.build()
    wdata = WandData.build(read_sizes(base), coll)
    queries = read_queries(base + ".queries")
    return coll, index, wdata, queries


def test_verify_collection(setup):
    coll, index, _, _ = setup
    assert verify_collection(coll, index) > 0


def brute_force_sets(coll, terms):
    sets = [set(np.asarray(coll[t][0]).tolist()) for t in set(terms)]
    inter = set.intersection(*sets)
    union = set.union(*sets)
    return inter, union


def test_boolean_queries_exact(setup):
    coll, index, _, queries = setup
    for terms in queries[:40]:
        inter, union = brute_force_sets(coll, terms)
        assert and_query(index, terms) == len(inter)
        assert or_query(index, terms) == len(union)


def test_ranked_and_subset_of_ranked_or(setup):
    _, index, wdata, queries = setup
    for terms in queries[:30]:
        ra = ranked_and_query(index, wdata, terms, k=10)
        ro = ranked_or_query(index, wdata, terms, k=10)
        assert len(ra) <= len(ro)
        # every AND-matched doc appears in the FULL OR ranking with an
        # identical score (top-10 OR alone can omit an AND doc: ten
        # partial matches may legitimately outrank it)
        ro_full = ranked_or_query(index, wdata, terms, k=index.num_docs())
        for s in ra:
            assert any(abs(s - o) <= 1e-6 * max(1.0, abs(o)) for o in ro_full)


@pytest.mark.parametrize("pruned", [wand_query, maxscore_query])
def test_pruned_matches_exhaustive(setup, pruned):
    """The reference oracle test: top-10 scores equal ranked_or within 0.1%
    relative (test_ranked_queries.cpp:52)."""
    _, index, wdata, queries = setup
    checked = 0
    for terms in queries[:60]:
        expected = ranked_or_query(index, wdata, terms, k=10)
        got = pruned(index, wdata, terms, k=10)
        assert len(got) == len(expected), f"terms={terms}"
        for g, e in zip(got, expected):
            assert abs(g - e) <= 0.001 * max(abs(e), 1e-9), f"terms={terms}: {g} vs {e}"
        checked += 1
    assert checked == 60


def test_single_term_query(setup):
    _, index, wdata, _ = setup
    r = ranked_or_query(index, wdata, [5], k=10)
    w = wand_query(index, wdata, [5], k=10)
    np.testing.assert_allclose(w, r, rtol=1e-3)


def test_empty_and_duplicate_terms(setup):
    _, index, wdata, _ = setup
    assert and_query(index, []) == 0
    assert or_query(index, []) == 0
    assert ranked_or_query(index, wdata, [], k=10) == []
    # duplicate terms: boolean dedups; ranked keeps multiplicity (higher q_weight)
    assert and_query(index, [7, 7]) == and_query(index, [7])
    r1 = ranked_or_query(index, wdata, [7], k=10)
    r2 = ranked_or_query(index, wdata, [7, 7], k=10)
    assert all(b >= a for a, b in zip(r1, r2))
