"""DS2I_OPT_DYNB=1 merges the exact-b OptPFor decode classes into
(slot-window, exception) classes decoded with per-row dynamic b
(block_tiles.remap_dynb + ops/optpfor_device b_static=None). Results
must be bit-equal to the default exact-b grouping, and the pruning
metadata must be identical (the remap is a pure regrouping)."""

import gc

import jax
import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.engine import ResidentEngine
from ds2i_tpu.index.types import make_index_type
from ds2i_tpu.queries import ranked_and_query, ranked_or_query
from ds2i_tpu.queries.wand_data import WandData

BLOCKMAX_FIELDS = ("wmax_blk", "dmax_blk", "dmin_blk", "gblk0",
                   "tile_of_gblk", "list_gblk0", "list_wmax",
                   "_kth_vals", "_kth_start", "rank_blk", "_blk_dlo")


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    yield
    jax.clear_caches()
    gc.collect()


def _build(seed=17, num_docs=2500, nterms=90):
    rng = np.random.RandomState(seed)
    sizes = rng.randint(40, 300, num_docs).astype(np.int64)
    lens = np.maximum(
        np.minimum(rng.zipf(1.3, nterms) * 4, num_docs // 2), 1
    ).astype(np.int64)
    b = make_index_type("block_optpfor").builder(num_docs, GlobalParameters())
    lists = []
    for i in range(nterms):
        n = int(lens[i])
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        # wide freq spread exercises many bit widths b (and exceptions)
        freqs = rng.randint(1, 200, n).astype(np.int64)
        lists.append((docs, freqs))
        b.add_posting_list(n, docs, freqs, int(freqs.sum()))
    idx = b.build()
    wd = WandData.build(sizes, lists)
    p = np.sqrt(lens.astype(float))
    p /= p.sum()
    qs = [sorted(set(rng.choice(nterms, size=rng.randint(1, 6), p=p)))
          for _ in range(32)]
    return idx, wd, qs


def test_dynb_merges_groups_and_matches_oracle(monkeypatch):
    idx, wd, qs = _build()
    e0 = ResidentEngine(idx, wd, pallas=0)
    n0 = len(e0.group_statics_d)
    a0 = e0.ranked_and(qs, k=10)
    monkeypatch.setenv("DS2I_OPT_DYNB", "1")
    e1 = ResidentEngine(idx, wd, pallas=0)
    n1 = len(e1.group_statics_d)
    assert n1 < n0, (n0, n1)  # classes actually merged
    assert any(st[0] == "optd" for st in e1.group_statics_d)
    a1 = e1.ranked_and(qs, k=10)
    p1 = e1.ranked_and(qs, k=10, prune=True)
    o1 = e1.ranked_or(qs, k=10)
    w1 = e1.wand(qs, k=10)
    for i, q in enumerate(qs):
        oa = ranked_and_query(idx, wd, q, k=10)
        oo = ranked_or_query(idx, wd, q, k=10)
        for name, got, ref in (("and", a1[i], oa), ("and_pruned", p1[i], oa),
                               ("or", o1[i], oo), ("wand", w1[i], oo)):
            assert len(got) == len(ref), (name, i)
            np.testing.assert_allclose(got, ref, rtol=1e-3, err_msg=f"{name} q{i}")
        # decode itself is bit-equal, so scores match the default grouping
        # to f32 exactness, not just oracle tolerance
        np.testing.assert_allclose(a1[i], a0[i], rtol=1e-6, err_msg=f"q{i}")


def test_r_fine_ladder_bit_identical(monkeypatch):
    """The quarter-pow2 decode-row ladder (default since round 4;
    DS2I_R_FINE=0 restores pow2) must be bit-equal to pow2 padding —
    pad rows decode garbage that is masked either way."""
    idx, wd, qs = _build(seed=31)
    monkeypatch.setenv("DS2I_R_FINE", "0")
    e0 = ResidentEngine(idx, wd, pallas=0)
    a0 = e0.ranked_and(qs, k=10)
    p0 = e0.ranked_and(qs, k=10, prune=True)
    jax.clear_caches()
    monkeypatch.setenv("DS2I_R_FINE", "1")
    e1 = ResidentEngine(idx, wd, pallas=0)
    a1 = e1.ranked_and(qs, k=10)
    p1 = e1.ranked_and(qs, k=10, prune=True)
    for i in range(len(qs)):
        np.testing.assert_array_equal(a1[i], a0[i], err_msg=f"and q{i}")
        np.testing.assert_array_equal(p1[i], p0[i], err_msg=f"pruned q{i}")


def test_dynb_blockmax_metadata_identical(monkeypatch):
    idx, wd, _ = _build(seed=23, num_docs=1500, nterms=50)
    e0 = ResidentEngine(idx, wd, pallas=0)
    e0._ensure_blockmax()
    monkeypatch.setenv("DS2I_OPT_DYNB", "1")
    e1 = ResidentEngine(idx, wd, pallas=0)
    e1._ensure_blockmax()
    for f in BLOCKMAX_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(e0, f)), np.asarray(getattr(e1, f)), err_msg=f
        )
