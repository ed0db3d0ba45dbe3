"""Device engine tests (run on the CPU backend via conftest): batched
segment decode and query ops must match the oracle layer exactly /
within float tolerance, across all four EF-family index types."""

import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.engine import (
    DeviceIndex,
    FlatQueryEngine,
    QueryEngine,
    ResidentEngine,
    TileQueryEngine,
)
from ds2i_tpu.index.types import make_index_type
from ds2i_tpu.io import BinaryFreqCollection, generate_collection, read_sizes
from ds2i_tpu.queries import (
    WandData,
    and_query,
    or_query,
    ranked_and_query,
    ranked_or_query,
    read_queries,
)


@pytest.fixture(scope="module")
def coll(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("coll") / "c")
    generate_collection(base, num_docs=1500, num_terms=4000, postings_target=80_000,
                        num_queries=80, max_query_len=3)
    return base


def build(coll_base, name):
    c = BinaryFreqCollection(coll_base)
    cls = make_index_type(name)
    b = cls.builder(c.num_docs, GlobalParameters())
    for docs, freqs in c:
        b.add_posting_list(len(docs), docs, freqs, int(np.asarray(freqs).sum()))
    return c, b.build()


@pytest.mark.parametrize("name", ["ef", "single", "uniform", "opt"])
def test_device_decode_matches_host(coll, name):
    c, index = build(coll, name)
    dindex = DeviceIndex(index)
    rng = np.random.RandomState(0)
    term_ids = rng.randint(0, index.size(), size=24)
    L = 1 << int(np.ceil(np.log2(max(2, dindex.max_list_len(term_ids)))))
    docs = np.asarray(dindex.decode_docs(term_ids, L))
    cums = np.asarray(dindex.decode_freq_cums(term_ids, L))
    for row, t in enumerate(term_ids):
        hd, hf = index.decode_list(int(t))
        n = len(hd)
        np.testing.assert_array_equal(docs[row, :n], hd.astype(np.int64))
        assert np.all(docs[row, n:] == index.num_docs())
        np.testing.assert_array_equal(
            np.diff(cums[row, :n], prepend=0), hf.astype(np.int64)
        )


@pytest.mark.parametrize("engine_cls", [QueryEngine, FlatQueryEngine, TileQueryEngine, ResidentEngine])
@pytest.mark.parametrize("name", ["ef", "opt", "single", "uniform"])
def test_engine_boolean_matches_oracle(coll, name, engine_cls):
    c, index = build(coll, name)
    engine = engine_cls(index)
    queries = read_queries(coll + ".queries")[:40]
    got_and = engine.and_counts(queries)
    got_or = engine.or_counts(queries)
    for i, terms in enumerate(queries):
        assert got_and[i] == and_query(index, terms), f"AND mismatch q={terms}"
        assert got_or[i] == or_query(index, terms), f"OR mismatch q={terms}"


@pytest.mark.parametrize("engine_cls", [QueryEngine, FlatQueryEngine, TileQueryEngine, ResidentEngine])
@pytest.mark.parametrize("name", ["ef", "opt"])
def test_engine_ranked_matches_oracle(coll, name, engine_cls):
    c, index = build(coll, name)
    wdata = WandData.build(read_sizes(coll), c)
    engine = engine_cls(index, wdata)
    queries = read_queries(coll + ".queries")[:30]
    got_or = engine.ranked_or(queries, k=10)
    got_and = engine.ranked_and(queries, k=10)
    for i, terms in enumerate(queries):
        exp_or = ranked_or_query(index, wdata, terms, k=10)
        exp_and = ranked_and_query(index, wdata, terms, k=10)
        assert len(got_or[i]) == len(exp_or)
        np.testing.assert_allclose(got_or[i], exp_or, rtol=1e-3, err_msg=f"q={terms}")
        assert len(got_and[i]) == len(exp_and)
        if exp_and:
            np.testing.assert_allclose(got_and[i], exp_and, rtol=1e-3, err_msg=f"q={terms}")


@pytest.mark.parametrize("engine_cls", [QueryEngine, FlatQueryEngine, TileQueryEngine, ResidentEngine])
def test_engine_duplicate_terms(coll, engine_cls):
    c, index = build(coll, "ef")
    wdata = WandData.build(read_sizes(coll), c)
    engine = engine_cls(index, wdata)
    (r1,) = engine.ranked_or([[5, 5]], k=10)
    exp = ranked_or_query(index, wdata, [5, 5], k=10)
    np.testing.assert_allclose(r1, exp, rtol=1e-3)


def test_pallas_decode_matches_xla(coll):
    """The fused Pallas tile-decode kernel (interpret mode on CPU) must
    reproduce the XLA comparison-reduce decode bit-for-bit."""
    c, index = build(coll, "ef")
    engine = ResidentEngine(index, pallas=0)
    engine_p = ResidentEngine(index, pallas=2)
    queries = read_queries(coll + ".queries")[:20]
    a = engine.and_counts(queries)
    b = engine_p.and_counts(queries)
    np.testing.assert_array_equal(a, b)


def test_resident_pallas_ranked(coll):
    c, index = build(coll, "ef")
    wdata = WandData.build(read_sizes(coll), c)
    engine = ResidentEngine(index, wdata, pallas=2)
    queries = read_queries(coll + ".queries")[:15]
    got = engine.ranked_and(queries, k=10)
    for i, terms in enumerate(queries):
        exp = ranked_and_query(index, wdata, terms, k=10)
        assert len(got[i]) == len(exp)
        if exp:
            np.testing.assert_allclose(got[i], exp, rtol=1e-3, err_msg=f"q={terms}")


def test_fast_tile_tables_match_generic(coll):
    """The vectorized ef tile-table builder must equal the generic walk."""
    from ds2i_tpu.engine.tiles_fast import build_tile_tables_ef
    from ds2i_tpu.engine.tiles import build_tile_tables as generic
    import ds2i_tpu.engine.tiles as tiles_mod

    c, index = build(coll, "ef")
    fast = build_tile_tables_ef(index)
    # force the generic path by bypassing the dispatch
    import ds2i_tpu.index.types as types_mod
    orig = types_mod.is_plain_ef_index
    types_mod.is_plain_ef_index = lambda i: False
    try:
        slow = generic(index)
    finally:
        types_mod.is_plain_ef_index = orig
    np.testing.assert_array_equal(fast.docs, slow.docs)
    np.testing.assert_array_equal(fast.freqs, slow.freqs)
    np.testing.assert_array_equal(fast.tile_list, slow.tile_list)
    np.testing.assert_array_equal(fast.list_tile_start, slow.list_tile_start)
    np.testing.assert_array_equal(fast.win_words, slow.win_words)
    np.testing.assert_array_equal(fast.lb_words, slow.lb_words)


def test_resident_multi_device(coll):
    """Parts round-robin across devices (query data parallelism); results
    must equal the single-device engine."""
    import jax

    cpus = jax.local_devices(backend="cpu")
    if len(cpus) < 4:
        pytest.skip("needs multi-device CPU mesh")
    c, index = build(coll, "ef")
    wdata = WandData.build(read_sizes(coll), c)
    queries = read_queries(coll + ".queries")[:40]
    single = ResidentEngine(index, wdata)
    multi = ResidentEngine(index, wdata, devices=cpus[:4],
                           max_part_queries=8, max_part_slots=1 << 14)
    a = single.ranked_and(queries, k=10)
    b = multi.ranked_and(queries, k=10)
    assert len(multi.prepare(queries)["plans"]) >= 4
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-6)


@pytest.mark.parametrize("name", ["block_optpfor", "block_interpolative", "block_varint", "block_qmx"])
def test_resident_block_index(coll, name):
    """The device block engine (OptPFor + interpolative kernels) must match
    the oracle on boolean counts and ranked top-k."""
    c, index = build(coll, name)
    wdata = WandData.build(read_sizes(coll), c)
    engine = ResidentEngine(index, wdata)
    queries = read_queries(coll + ".queries")[:30]
    got_and = engine.and_counts(queries)
    got_or = engine.or_counts(queries)
    got_rand = engine.ranked_and(queries, k=10)
    got_ror = engine.ranked_or(queries, k=10)
    for i, terms in enumerate(queries):
        assert got_and[i] == and_query(index, terms), f"AND q={terms}"
        assert got_or[i] == or_query(index, terms), f"OR q={terms}"
        exp_a = ranked_and_query(index, wdata, terms, k=10)
        exp_o = ranked_or_query(index, wdata, terms, k=10)
        assert len(got_rand[i]) == len(exp_a)
        if exp_a:
            np.testing.assert_allclose(got_rand[i], exp_a, rtol=1e-3, err_msg=f"q={terms}")
        np.testing.assert_allclose(got_ror[i], exp_o, rtol=1e-3, err_msg=f"q={terms}")


def test_resident_block_mixed(coll):
    """block_mixed (per-block codec choice) through the device engine."""
    from ds2i_tpu.index.hybrid import rebuild_mixed

    c, index = build(coll, "block_optpfor")
    wdata = WandData.build(read_sizes(coll), c)
    nblocks = sum(len(index.get_blocks(l)) for l in range(index.size()))
    rng = np.random.RandomState(2)
    types = rng.choice([0, 1, 2], size=2 * nblocks)  # pfor / varint / interp
    params_arr = np.where(types == 0, 10, 0)  # pfor b = POSS_LOGS[10] = 10
    mixed = rebuild_mixed(index, types, params_arr)
    engine = ResidentEngine(mixed, wdata)
    queries = read_queries(coll + ".queries")[:20]
    got_and = engine.and_counts(queries)
    got_rand = engine.ranked_and(queries, k=10)
    for i, terms in enumerate(queries):
        assert got_and[i] == and_query(mixed, terms), f"AND q={terms}"
        exp = ranked_and_query(mixed, wdata, terms, k=10)
        assert len(got_rand[i]) == len(exp)
        if exp:
            np.testing.assert_allclose(got_rand[i], exp, rtol=1e-3, err_msg=f"q={terms}")


@pytest.mark.parametrize("name", ["ef", "block_optpfor"])
def test_norm_cache_matches_gather(coll, name, monkeypatch):
    """The init-time norm-length cache (default) must reproduce the
    per-posting gather path bit-for-bit: the cache stores the same f32
    values the gather would load."""
    c, index = build(coll, name)
    wdata = WandData.build(read_sizes(coll), c)
    queries = read_queries(coll + ".queries")[:25]

    cached = ResidentEngine(index, wdata)
    assert cached.normcache == 1
    got = cached.ranked_and(queries, k=10)
    assert cached.den_blocks is not None  # ranked run built the cache

    monkeypatch.setenv("DS2I_NORM_CACHE", "0")
    gathered = ResidentEngine(index, wdata)
    assert gathered.normcache == 0
    want = gathered.ranked_and(queries, k=10)
    assert gathered.den_blocks is None

    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plan_reexecution_identical(coll):
    """execute(plan) pins layout arrays on device; re-executions of the
    same plan must return identical results (and a fresh plan for the
    same queries must agree)."""
    c, index = build(coll, "ef")
    wdata = WandData.build(read_sizes(coll), c)
    engine = ResidentEngine(index, wdata)
    queries = read_queries(coll + ".queries")[:20]
    plan = engine.prepare(queries, k=10, ops=("and", "or"))
    r1 = engine.execute(plan)
    assert plan["plans"] and all("_dev" in p and p["_dev"] for p in plan["plans"])
    r2 = engine.execute(plan)
    r3 = engine.execute(engine.prepare(queries, k=10, ops=("and", "or")))
    for a, b, c3 in zip(r1, r2, r3):
        for x, y, z in zip(a[2:], b[2:], c3[2:]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            np.testing.assert_array_equal(np.asarray(x), np.asarray(z))


@pytest.mark.parametrize("name", ["block_optpfor"])  # ef sharding runs in dryrun_multichip
def test_doc_sharded_engine_matches_single(coll, name):
    """Doc-range sharding (the beyond-one-chip scale path) must agree
    with the single-engine results exactly: counts by sum, top-k by
    merge, bm25 idf from collection-level dfs."""
    from ds2i_tpu.parallel import DocShardedEngine

    c, index = build(coll, name)
    wdata = WandData.build(read_sizes(coll), c)
    queries = read_queries(coll + ".queries")[:15]

    single = ResidentEngine(index, wdata)
    sharded = DocShardedEngine(index, wdata, num_shards=3)
    # shards omit term lists empty in their range
    assert any((r.term_remap < 0).any() for r in sharded.engines)

    np.testing.assert_array_equal(sharded.and_counts(queries), single.and_counts(queries))
    np.testing.assert_array_equal(sharded.or_counts(queries), single.or_counts(queries))
    got = sharded.ranked_and(queries, k=10)
    want = single.ranked_and(queries, k=10)
    for g, w in zip(got, want):
        assert len(g) == len(w)
        np.testing.assert_allclose(g, w, rtol=1e-3)
    got_or = sharded.ranked_or(queries, k=10)
    want_or = single.ranked_or(queries, k=10)
    for g, w in zip(got_or, want_or):
        np.testing.assert_allclose(g, w, rtol=1e-3)

    # pruned ops: per-shard block-max pruning must merge to the exact
    # single-engine results (disjoint doc ranges => per-shard thresholds
    # are valid and each shard's pruned top-k is exact for its range)
    got_w = sharded.wand(queries, k=10)
    want_w = single.wand(queries, k=10)
    for g, w, e in zip(got_w, want_w, want_or):
        assert len(g) == len(e)
        np.testing.assert_allclose(g, e, rtol=1e-3)
        np.testing.assert_allclose(g, w, rtol=1e-3)
    got_as = sharded.ranked_and(queries, k=10, prune=True)
    for g, w in zip(got_as, want):
        assert len(g) == len(w)
        np.testing.assert_allclose(g, w, rtol=1e-3)
    # round-5 device maxscore (essential restriction) per shard
    got_ms = sharded.maxscore(queries, k=10)
    for g, e in zip(got_ms, want_or):
        assert len(g) == len(e)
        np.testing.assert_allclose(g, e, rtol=1e-3)


@pytest.mark.parametrize("name", ["block_optpfor", "block_varint", "block_interpolative", "block_qmx", "block_mixed"])
def test_native_block_tables_match_python(coll, name, monkeypatch):
    """The native tile-table walk must produce the same field tables and
    equivalent group statics as the Python walk, for every block codec."""
    from ds2i_tpu.native import available

    if not available():
        pytest.skip("native library not built")
    from ds2i_tpu.engine.block_tiles import build_block_tables
    from ds2i_tpu.index.hybrid import rebuild_mixed

    c, index = build(coll, "block_optpfor" if name == "block_mixed" else name)
    if name == "block_mixed":
        nb = sum(-(-index.list_length(l) // 128) for l in range(index.size()))
        # cycle pfor/varint/interpolative so every mixed dispatch branch of
        # the native walk is exercised (partial blocks coerce to interp)
        types = (np.arange(2 * nb) % 3).astype(np.uint8)
        params = np.where(types == 0, 10, 0).astype(np.uint8)  # pfor: b=10
        index = rebuild_mixed(index, types, params, index.params)

    monkeypatch.setenv("DS2I_NATIVE", "0")
    t_py, sd_py, gd_py, sf_py, gf_py = build_block_tables(index)
    monkeypatch.setenv("DS2I_NATIVE", "1")
    t_nat, sd_nat, gd_nat, sf_nat, gf_nat = build_block_tables(index)

    np.testing.assert_array_equal(t_nat.docs, t_py.docs)
    np.testing.assert_array_equal(t_nat.freqs, t_py.freqs)
    np.testing.assert_array_equal(t_nat.tile_list, t_py.tile_list)
    np.testing.assert_array_equal(t_nat.list_tile_start, t_py.list_tile_start)
    # statics sets are equal and per-tile statics agree (gid numbering may differ)
    for s_py, g_py, s_nat, g_nat in ((sd_py, gd_py, sd_nat, gd_nat), (sf_py, gf_py, sf_nat, gf_nat)):
        assert sorted(map(tuple, s_py)) == sorted(map(tuple, s_nat))
        st_py = [tuple(s_py[g]) for g in g_py]
        st_nat = [tuple(s_nat[g]) for g in g_nat]
        assert st_py == st_nat


def test_engine_edge_queries(coll):
    """Empty queries, single-term queries, and k larger than any result
    set flow through the batched engine without error and match the
    oracle."""
    c, index = build(coll, "ef")
    wdata = WandData.build(read_sizes(coll), c)
    engine = ResidentEngine(index, wdata)
    queries = [[], [5], [5, 5, 5], list(range(1, 9))]
    got_and = engine.and_counts(queries)
    got_or = engine.or_counts(queries)
    for i, terms in enumerate(queries):
        assert got_and[i] == (and_query(index, terms) if terms else 0)
        assert got_or[i] == (or_query(index, terms) if terms else 0)
    got = engine.ranked_and(queries, k=100)
    for i, terms in enumerate(queries):
        exp = ranked_and_query(index, wdata, terms, k=100) if terms else []
        assert len(got[i]) == len(exp)
        if exp:
            np.testing.assert_allclose(got[i], exp, rtol=1e-3)


def test_make_engine_factory(coll):
    """make_engine picks ResidentEngine under the stream limit and a
    DocShardedEngine (matching results) above it."""
    from ds2i_tpu.engine import make_engine
    from ds2i_tpu.parallel import DocShardedEngine

    c, index = build(coll, "block_optpfor")
    wdata = WandData.build(read_sizes(coll), c)
    queries = read_queries(coll + ".queries")[:10]
    small = make_engine(index, wdata)
    assert isinstance(small, ResidentEngine)
    forced = make_engine(index, wdata, limit=len(index.lists) // 3)
    assert isinstance(forced, DocShardedEngine)
    np.testing.assert_array_equal(forced.and_counts(queries), small.and_counts(queries))


def test_doc_sharded_from_collection(coll):
    """Building shards directly from the collection (the scale path) must
    agree with resharding a built index."""
    from ds2i_tpu.parallel import DocShardedEngine

    c, index = build(coll, "block_optpfor")
    wdata = WandData.build(read_sizes(coll), c)
    queries = read_queries(coll + ".queries")[:12]
    a = DocShardedEngine(index, wdata, num_shards=3)
    b = DocShardedEngine.from_collection(c, "block_optpfor", wdata, num_shards=3)
    np.testing.assert_array_equal(a.and_counts(queries), b.and_counts(queries))
    ra = a.ranked_and(queries, k=10)
    rb = b.ranked_and(queries, k=10)
    for x, y in zip(ra, rb):
        np.testing.assert_allclose(x, y, rtol=1e-6)


def test_engine_term_cap_raises(coll):
    """The block directory packs term slots into 5 bits, so >32 unique
    terms per query must raise with a clear message (documented limit;
    the cursor engines have no cap)."""
    c, index = build(coll, "ef")
    engine = ResidentEngine(index)
    ok = list(range(32))
    assert engine.and_counts([ok]).shape == (1,)
    with pytest.raises(ValueError, match="32 unique terms"):
        engine.prepare([list(range(33))], ops=("counts",), ranked=False)


def test_prune_kmax_fallback_exact(coll, capsys):
    """k > PRUNE_KMAX disables per-term static thresholds; pruned results
    must still equal the exhaustive op, and the engine must say so."""
    c, index = build(coll, "ef")
    wdata = WandData.build(read_sizes(coll), c)
    engine = ResidentEngine(index, wdata)
    engine.PRUNE_KMAX = 4  # instance override, before first blockmax build
    queries = read_queries(coll + ".queries")[:12]
    got = engine.wand(queries, k=8)
    want = engine.ranked_or(queries, k=8)
    for g, w in zip(got, want):
        assert len(g) == len(w)
        np.testing.assert_allclose(g, w, rtol=1e-3)
    assert "PRUNE_KMAX" in capsys.readouterr().err
