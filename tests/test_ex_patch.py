"""Resident exception patch tables (round 5, the DEFAULT for block
indexes): the engine decodes every OptPFor Simple16 exception stream
once at init into (slot position, high<<b) pairs appended to the
resident stream (block_tiles.build_exception_patches); the per-pass
decode then gathers the pairs instead of re-decoding Simple16
(ops/optpfor_device.py ex_patch=True). Results must be BIT-equal to the
in-pass decode (DS2I_EX_PATCH=0) and oracle-exact.

Also hosts the quarter-pow2 decode-row-ladder bit-identity test
(formerly in test_dynb.py; the DYNB experiment itself was removed in
round 5 after measuring worse — docs/PERF.md round-4 tables)."""

import gc

import jax
import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.engine import ResidentEngine
from ds2i_tpu.index.types import make_index_type
from ds2i_tpu.queries import ranked_and_query, ranked_or_query
from ds2i_tpu.queries.wand_data import WandData


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    yield
    jax.clear_caches()
    gc.collect()


def _build(tname="block_optpfor", seed=17, num_docs=2500, nterms=90, fmax=200):
    rng = np.random.RandomState(seed)
    sizes = rng.randint(40, 300, num_docs).astype(np.int64)
    lens = np.maximum(
        np.minimum(rng.zipf(1.3, nterms) * 4, num_docs // 2), 1
    ).astype(np.int64)
    b = make_index_type(tname).builder(num_docs, GlobalParameters())
    lists = []
    for i in range(nterms):
        n = int(lens[i])
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        # wide freq spread exercises many bit widths b (and exceptions)
        freqs = rng.randint(1, fmax, n).astype(np.int64)
        lists.append((docs, freqs))
        b.add_posting_list(n, docs, freqs, int(freqs.sum()))
    idx = b.build()
    wd = WandData.build(sizes, lists)
    p = np.sqrt(lens.astype(float))
    p /= p.sum()
    qs = [sorted(set(rng.choice(nterms, size=rng.randint(1, 6), p=p)))
          for _ in range(32)]
    return idx, wd, qs


def test_ex_patch_bit_identical_and_oracle(monkeypatch):
    # block_optpfor only: mixed indexes reuse the same "opt"/"optp"
    # decode classes for their PFor blocks (block_tiles._full_stream
    # resolves the per-block codec before interning statics)
    idx, wd, qs = _build("block_optpfor")
    monkeypatch.setenv("DS2I_EX_PATCH", "0")
    e0 = ResidentEngine(idx, wd, pallas=0)
    assert not any(s[0] == "optp" for s in e0.group_statics_d)
    a0 = e0.ranked_and(qs, k=10)
    o0 = e0.ranked_or(qs, k=10)
    jax.clear_caches()
    monkeypatch.setenv("DS2I_EX_PATCH", "1")
    e1 = ResidentEngine(idx, wd, pallas=0)
    # the exception-carrying decode classes actually moved to patch mode
    assert any(s[0] == "optp" for s in e1.group_statics_d)
    assert not any(s[0] == "opt" and s[2] > 0 for s in e1.group_statics_d)
    a1 = e1.ranked_and(qs, k=10)
    o1 = e1.ranked_or(qs, k=10)
    p1 = e1.ranked_and(qs, k=10, prune=True)
    w1 = e1.wand(qs, k=10)
    for i, q in enumerate(qs):
        np.testing.assert_array_equal(
            np.asarray(a0[i]), np.asarray(a1[i]), err_msg=f"and q{i}")
        np.testing.assert_array_equal(
            np.asarray(o0[i]), np.asarray(o1[i]), err_msg=f"or q{i}")
        oa = ranked_and_query(idx, wd, q, k=10)
        oo = ranked_or_query(idx, wd, q, k=10)
        np.testing.assert_allclose(a1[i], oa, rtol=1e-3, err_msg=f"and q{i}")
        np.testing.assert_allclose(p1[i], oa, rtol=1e-3, err_msg=f"skip q{i}")
        np.testing.assert_allclose(w1[i], oo, rtol=1e-3, err_msg=f"wand q{i}")


def test_ex_patch_raw_decode_bit_identical(monkeypatch):
    """Kernel-level: the patch-mode decode of every OptPFor group must
    reproduce the in-pass Simple16 decode VALUE-for-VALUE (not just
    through the join) — exercises positions, gaps, high parts, and the
    per-row b shifts across all (b, E) classes the index produces."""
    from ds2i_tpu.engine.resident import _decode_block_stream

    idx, wd, _ = _build(seed=5, fmax=4000)  # heavy exceptions
    monkeypatch.setenv("DS2I_EX_PATCH", "1")
    e1 = ResidentEngine(idx, wd, pallas=0)
    monkeypatch.setenv("DS2I_EX_PATCH", "0")
    jax.clear_caches()
    e0 = ResidentEngine(idx, wd, pallas=0)
    t0, t1 = e0.tiles, e1.tiles
    found = 0
    for gi, st in enumerate(e1.group_statics_d):
        if st[0] != "optp":
            continue
        rows = np.nonzero(e1.tile_gid_d == gi)[0][:64]
        st_legacy = ("opt",) + st[1:]
        v0 = np.asarray(_decode_block_stream(
            e0.docs_words, e0.tiles_docs[np.asarray(rows, np.int32)],
            st_legacy, len(rows), True, e0.num_docs))
        v1 = np.asarray(_decode_block_stream(
            e1.docs_words, e1.tiles_docs[np.asarray(rows, np.int32)],
            st, len(rows), True, e1.num_docs))
        nv = t1.docs[rows, :][:, 9]  # F_NVALS
        for r in range(len(rows)):
            np.testing.assert_array_equal(
                v0[r, : nv[r]], v1[r, : nv[r]], err_msg=f"group {gi} row {r}")
        found += 1
    assert found > 0  # index produced at least one exception class


def test_ex_patch_cache_roundtrip(monkeypatch, tmp_path):
    """Patch words persist in DS2I_ENGINE_CACHE; a reloaded engine must
    produce identical results and identical resident patch state."""
    idx, wd, qs = _build(seed=29)
    e0 = ResidentEngine(idx, wd, pallas=0, cache_dir=str(tmp_path))
    a0 = e0.ranked_and(qs, k=10)
    w0 = np.asarray(e0.docs_words)
    e1 = ResidentEngine(idx, wd, pallas=0, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(w0, np.asarray(e1.docs_words))
    np.testing.assert_array_equal(
        np.asarray(e0.tiles_docs), np.asarray(e1.tiles_docs))
    a1 = e1.ranked_and(qs, k=10)
    for i in range(len(qs)):
        np.testing.assert_array_equal(np.asarray(a0[i]), np.asarray(a1[i]))


def test_native_patch_builder_byte_identical(monkeypatch):
    """The C++ exception-patch decoder must produce the identical patch
    stream to the vectorized numpy builder (same bit semantics as the
    device in-pass decode, block_codecs.hpp:203-216 layout)."""
    from ds2i_tpu.native import _load, available

    if not available() or not hasattr(_load(), "ds2i_s16_exception_patches"):
        pytest.skip("native library not built")
    from ds2i_tpu.engine.block_tiles import (
        build_block_tables, build_exception_patches,
    )

    idx, _, _ = _build(seed=3, fmax=5000)
    t, *_rest = build_block_tables(idx)
    data = np.asarray(idx.lists, dtype=np.uint8)
    pad = (-len(data)) % 4
    words = np.ascontiguousarray(
        np.concatenate([data, np.zeros(pad + 8, np.uint8)]).view("<u4").astype(np.uint32)
    )
    p_nat, bases_nat = build_exception_patches(words, [t.docs, t.freqs])
    monkeypatch.setenv("DS2I_NATIVE", "0")
    p_py, bases_py = build_exception_patches(words, [t.docs, t.freqs])
    assert len(p_nat) == len(p_py) > 0
    np.testing.assert_array_equal(p_nat, p_py)
    for a, c in zip(bases_nat, bases_py):
        np.testing.assert_array_equal(a, c)


@pytest.mark.parametrize("tname", ["block_optpfor", "ef"])
def test_unfused_decode_matches_fused(monkeypatch, tname):
    """The per-group (unfused) decode path — default for one-shot probe
    plans, DS2I_DECODE_FUSED=0 for serving — must be bit-equal to the
    fused per-layout decode executable on both pruned ops."""
    idx, wd, qs = _build(tname, seed=43, num_docs=2000, nterms=60)
    out = {}
    for fe in ("1", "0"):
        monkeypatch.setenv("DS2I_DECODE_FUSED", fe)
        e = ResidentEngine(idx, wd, pallas=0)
        out[(fe, "skip")] = e.ranked_and(qs, k=10, prune=True)
        out[(fe, "wand")] = e.wand(qs, k=10)
        jax.clear_caches()
    for op in ("skip", "wand"):
        for i in range(len(qs)):
            np.testing.assert_array_equal(
                np.asarray(out[("1", op)][i]), np.asarray(out[("0", op)][i]),
                err_msg=f"{op} q{i}")


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
