"""Device WAND/MaxScore (block-max pruned top-k OR) must match the
exhaustive ranked_or within the reference's own tolerance
(test_ranked_queries.cpp:14-75 pattern: pruned vs exhaustive, 0.1%)."""

import gc

import jax
import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.engine import ResidentEngine
from ds2i_tpu.index.types import make_index_type
from ds2i_tpu.queries.wand_data import WandData


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    """This module sits near the end of the alphabetical suite order and
    compiles the largest XLA-CPU programs; both recorded full-suite
    SIGSEGVs (round 2 :76, round 3/4 :201/:223) happened inside
    backend_compile_and_load DURING one of its tests, after ~250 tests'
    compile churn, and never when the module runs alone. The
    module-scope clearing in conftest bounds state BETWEEN modules;
    this bounds it between tests of the module where the crash lands,
    keeping the live-executable population minimal exactly where the
    compiler is under the most pressure. Cross-test cache reuse here is
    near zero (every test builds its own index shapes), so the cost is
    noise."""
    yield
    jax.clear_caches()
    gc.collect()


def _build(tname, seed=5, num_docs=4000, nterms=150, return_lists=False):
    rng = np.random.RandomState(seed)
    sizes = rng.randint(50, 400, num_docs).astype(np.int64)
    lens = np.maximum(
        np.minimum(rng.zipf(1.25, nterms) * 3, num_docs // 2), 1
    ).astype(np.int64)
    cls = make_index_type(tname)
    b = cls.builder(num_docs, GlobalParameters())
    lists = []
    for i in range(nterms):
        n = int(lens[i])
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = np.ones(n, dtype=np.int64)
        spikes = rng.rand(n) < 0.05
        freqs[spikes] = rng.randint(5, 60, max(int(spikes.sum()), 0))
        lists.append((docs, freqs))
        b.add_posting_list(n, docs, freqs, int(freqs.sum()))
    idx = b.build()
    wd = WandData.build(sizes, lists)
    # rare+common query mix (the discriminative WAND case) + edge shapes
    p = np.sqrt(lens.astype(float))
    p /= p.sum()
    qs = [list(np.unique(rng.choice(nterms, size=rng.randint(1, 6), p=p)))
          for _ in range(48)]
    qs += [[int(np.argmin(lens)), int(np.argmax(lens))], [0], [1, 1, 2]]
    if return_lists:
        return idx, wd, qs, lists
    return idx, wd, qs


@pytest.mark.parametrize("tname", ["ef", "opt", "block_optpfor", "block_qmx"])
def test_wand_matches_exhaustive(tname):
    idx, wd, qs = _build(tname)
    eng = ResidentEngine(idx, wd, pallas=0)
    for k in (1, 10):
        exact = eng.ranked_or(qs, k=k)
        for name in ("wand", "maxscore"):
            pruned = getattr(eng, name)(qs, k=k)
            for i, (a, p) in enumerate(zip(exact, pruned)):
                assert len(a) == len(p), f"{name} k={k} q{i}: result count"
                np.testing.assert_allclose(
                    p, a, rtol=1e-3, err_msg=f"{name} k={k} q{i}"
                )


def test_maxscore_essential_restriction_prunes_and_is_exact():
    """The device maxscore (essential/non-essential candidate
    restriction layered on the block-max directory,
    ResidentEngine._essential_restrict) must keep a directory no larger
    than wand's, drop at least one non-essential block somewhere on
    skewed data, and stay exact vs the exhaustive oracle — already
    asserted result-wise by test_wand_matches_exhaustive; this pins the
    ALGORITHM difference."""
    idx, wd, qs = _build("block_optpfor", seed=21)
    eng = ResidentEngine(idx, wd, pallas=0)

    def dir_blocks(plan):
        return sum(
            int((b["dir"] != p["sent_dir"]).sum())
            for p in plan["plans"] for b in p["buckets"]
        )

    pw = eng.prepare(qs, k=10, ops=("or",), prune=True)
    pm = eng.prepare(qs, k=10, ops=("or",), prune="maxscore")
    bw, bm = dir_blocks(pw), dir_blocks(pm)
    assert bm <= bw, (bm, bw)
    assert bm < bw, "essential restriction never dropped a block on skewed data"


def test_wand_actually_prunes():
    """On skewed data the pruned plan must be materially smaller."""
    idx, wd, qs = _build("block_optpfor", seed=9)
    eng = ResidentEngine(idx, wd, pallas=0)
    pe = eng.prepare(qs, k=10, ops=("or",))
    pp = eng.prepare(qs, k=10, ops=("or",), prune=True)

    def slots(plan):
        return sum(b["Bb"] * b["L"] for p in plan["plans"] for b in p["buckets"])

    assert slots(pp) < slots(pe) * 0.9, (slots(pp), slots(pe))


@pytest.mark.parametrize("tname", ["ef", "block_optpfor"])
def test_ranked_and_skip_matches_exhaustive(tname):
    """Intersection block skipping (device leapfrog analogue) must keep
    ranked_and results exact."""
    idx, wd, qs = _build(tname, seed=11)
    eng = ResidentEngine(idx, wd, pallas=0)
    exact = eng.ranked_and(qs, k=10)
    pruned = eng.ranked_and(qs, k=10, prune=True)
    for i, (a, p) in enumerate(zip(exact, pruned)):
        assert len(a) == len(p), f"q{i}: result count"
        np.testing.assert_allclose(p, a, rtol=1e-3, err_msg=f"q{i}")


def test_overlap_and_pyramid_against_bruteforce():
    """_blk_overlap must return the exact block range intersecting a
    docid interval, and _range_ub must upper-bound (within its stated
    outward rounding, i.e. >=) the true range max."""
    idx, wd, _ = _build("block_optpfor", seed=3)
    eng = ResidentEngine(idx, wd, pallas=0)
    eng._ensure_blockmax()
    rng = np.random.RandomState(0)
    nl = len(eng.list_gblk0) - 1
    lists, dlos, dhis = [], [], []
    for _ in range(500):
        l = rng.randint(nl)
        a, b = sorted(rng.randint(0, eng.num_docs, 2))
        lists.append(l), dlos.append(a), dhis.append(b)
    lists = np.array(lists, dtype=np.int64)
    dlos = np.array(dlos, dtype=np.int64)
    dhis = np.array(dhis, dtype=np.int64)
    bf, bl = eng._blk_overlap(lists, dlos, dhis)
    has = bf <= bl
    ub = np.zeros(len(lists), dtype=np.float32)
    if np.any(has):
        ub[has] = eng._range_ub(lists[has], bf[has], bl[has])
    for i in range(len(lists)):
        l0, l1 = eng.list_gblk0[lists[i]], eng.list_gblk0[lists[i] + 1]
        inter = [
            b for b in range(l0, l1)
            if eng._blk_dlo[b] <= dhis[i] and eng.dmax_blk[b] >= dlos[i]
        ]
        if inter:
            assert has[i] and bf[i] == inter[0] and bl[i] == inter[-1], i
            true_max = eng.wmax_blk[inter[0]:inter[-1] + 1].max()
            assert ub[i] >= true_max - 1e-7, (i, ub[i], true_max)
        else:
            assert not has[i], i


def test_prune_rejects_unsupported_ops():
    idx, wd, qs = _build("ef")
    eng = ResidentEngine(idx, wd, pallas=0)
    with pytest.raises(ValueError):
        eng.prepare(qs, k=10, ops=("or", "and"), prune=True)
    with pytest.raises(ValueError):
        eng.prepare(qs, k=10, ops=("counts",), ranked=False, prune=True)


def test_blockmax_chunked_build_identical():
    """The chunked metadata pass (bounded-slot decode runs, assembled on
    host — the 50x OOM fix) must produce byte-identical pruning metadata
    to a single-call build."""
    idx, wd, qs = _build("block_optpfor", seed=11, num_docs=1200, nterms=40)
    one = ResidentEngine(idx, wd, pallas=0)  # default budget: one chunk
    one._ensure_blockmax()
    # tiny slot budget forces several chunks (floor-clamped to 1<<12)
    many = ResidentEngine(idx, wd, pallas=0, max_part_slots=1 << 10)
    many._ensure_blockmax()
    for name in ("wmax_blk", "dmax_blk", "dmin_blk", "gblk0", "tile_of_gblk", "list_gblk0",
                 "list_wmax", "_kth_vals", "_kth_start", "rank_blk", "_blk_dlo",
                 "_dmax_keys", "_dlo_keys", "_pyr", "_pyr_off", "_pyr_q",
                 "is_short", "_short_keys", "_short_w"):
        np.testing.assert_array_equal(
            np.asarray(getattr(one, name)), np.asarray(getattr(many, name)),
            err_msg=name,
        )
    exact = one.ranked_or(qs, k=10)
    pruned = many.wand(qs, k=10)
    for a, p in zip(exact, pruned):
        assert len(a) == len(p)
        np.testing.assert_allclose(p, a, rtol=1e-3)


BLOCKMAX_FIELDS = (
    "wmax_blk", "dmax_blk", "dmin_blk", "gblk0", "tile_of_gblk", "list_gblk0",
    "list_wmax", "_kth_vals", "_kth_start", "rank_blk", "_blk_dlo",
    "_dmax_keys", "_dlo_keys", "_pyr", "_pyr_off", "_pyr_q",
    "is_short", "_short_keys", "_short_w",
)


@pytest.mark.parametrize("tname", ["ef", "opt", "block_optpfor"])
def test_blockmax_host_build_identical(tname):
    """The build-time artifact pass (build_blockmax: per-block maxes
    derived from the original collection on host, create_wand_data.cpp
    analogue) must produce byte-identical pruning metadata to the device
    decode pass, and identical pruned results."""
    idx, wd, qs, lists = _build(tname, seed=7, num_docs=1500, nterms=60,
                                return_lists=True)
    dev = ResidentEngine(idx, wd, pallas=0)
    dev._ensure_blockmax()
    host = ResidentEngine(idx, wd, pallas=0)
    host.build_blockmax(lists)
    for name in BLOCKMAX_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(dev, name)), np.asarray(getattr(host, name)),
            err_msg=name,
        )
    exact = dev.ranked_or(qs, k=10)
    pruned = host.wand(qs, k=10)
    for a, p in zip(exact, pruned):
        assert len(a) == len(p)
        np.testing.assert_allclose(p, a, rtol=1e-3)


def test_blockmax_host_build_rejects_wrong_collection():
    idx, wd, qs, lists = _build("ef", seed=3, num_docs=800, nterms=30,
                                return_lists=True)
    eng = ResidentEngine(idx, wd, pallas=0)
    with pytest.raises(ValueError):
        eng.build_blockmax(lists[:-1])
