"""Engine-state persistence: a second engine start from the cache must
produce identical results to a fresh build (the queries.cpp:76-77
mmap-attach analogue for derived tables)."""

import numpy as np

from ds2i_tpu import GlobalParameters
from ds2i_tpu.engine import ResidentEngine
from ds2i_tpu.index.types import make_index_type
from ds2i_tpu.queries.wand_data import WandData


def _build(tname, seed=6, num_docs=3000, nlists=60):
    rng = np.random.RandomState(seed)
    sizes = rng.randint(50, 300, num_docs).astype(np.int64)
    cls = make_index_type(tname)
    b = cls.builder(num_docs, GlobalParameters())
    lists = []
    for i in range(nlists):
        n = int(rng.randint(1, 800))
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = (1 + rng.zipf(1.5, n) % 40).astype(np.int64)
        lists.append((docs, freqs))
        b.add_posting_list(n, docs, freqs, int(freqs.sum()))
    return b.build(), WandData.build(sizes, lists), rng


def _check(tname, tmp_path):
    idx, wd, rng = _build(tname)
    qs = [list(rng.choice(60, size=rng.randint(1, 4), replace=False)) for _ in range(32)]

    cold = ResidentEngine(idx, wd, pallas=0, cache_dir=str(tmp_path))
    r_cold = cold.ranked_or(qs, k=10)
    w_cold = cold.wand(qs, k=10)  # populates norm + blockmax caches
    c_cold = cold.and_counts(qs)

    warm = ResidentEngine(idx, wd, pallas=0, cache_dir=str(tmp_path))
    # all three cache files must hit
    assert warm._cache_load("tables") is not None
    assert warm._cache_load("norms", with_norms=True) is not None
    assert warm._cache_load("blockmax", with_norms=True) is not None
    np.testing.assert_array_equal(warm.and_counts(qs), c_cold)
    for a, b in zip(warm.ranked_or(qs, k=10), r_cold):
        np.testing.assert_allclose(b, a, rtol=1e-6)
    for a, b in zip(warm.wand(qs, k=10), w_cold):
        np.testing.assert_allclose(b, a, rtol=1e-6)

    # tile tables must be byte-identical to a cacheless build
    plain = ResidentEngine(idx, wd, pallas=0, cache_dir=None)
    np.testing.assert_array_equal(
        np.asarray(warm.tiles_docs), np.asarray(plain.tiles_docs)
    )
    np.testing.assert_array_equal(
        np.asarray(warm.tiles_freqs), np.asarray(plain.tiles_freqs)
    )


def test_cache_roundtrip_block(tmp_path):
    _check("block_optpfor", tmp_path)


def test_cache_roundtrip_ef(tmp_path):
    _check("ef", tmp_path)


def test_cache_distinguishes_norm_lens(tmp_path):
    idx, wd, rng = _build("ef")
    e1 = ResidentEngine(idx, wd, pallas=0, cache_dir=str(tmp_path))
    e1.wand([[0, 1]], k=5)
    # different norm lens -> different with_norms cache key (no stale hit)
    e2 = ResidentEngine(idx, None, pallas=0, cache_dir=str(tmp_path))
    assert e2._cache_load("blockmax", with_norms=True) is None
