"""Scatter-free tiled query engine — the fast path.

Successor of flat_executor with every XLA scatter eliminated (measured
~150M updates/s on v5e — the bottleneck of both the plane- and the
scatter-assembled flat pipelines). One fused dispatch per query batch:

  1. per W-bucket group: contiguous window gathers -> bit expansion ->
     running rank -> COMPARISON-REDUCE select
     (sel[r,j] = #window positions with rank <= j, an (R, Wb, 128)
     masked reduction — pure VPU, no scatter/compaction; replaces the
     reference's sequential unary-skip chains, compact_elias_fano.hpp)
  2. low-bits extraction from per-tile windows via take_along_axis
  3. tile values -> flat postings stream by a contiguous ROW GATHER with a
     host-computed tile permutation (128-slot slices, near-bandwidth)
  4. per-posting BM25; query row / qw / target ride along as
     broadcast-from-tile constants and sort operands — never gathered
  5. ONE sort by composite key (row*D' + doc); duplicate-run aggregation
     via exclusive-cumsum + cummax
  6. AND/OR counts from row-boundary prefix diffs
  7. top-k by a second (row, -score) sort + (B, k) slice gather

All shapes pow2/pow4-bucketed; intra-tile padding keeps lists value-
aligned (pads carry sentinel docids and inherit the running freq cum).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.segments import SEG_AO, SEG_EF, SEG_EF_STRICT, SEG_RB
from ..queries.bm25 import BM25
from ..queries.parsing import query_freqs
from .device_index import DeviceIndex
from .tiles import (
    F_BASE, F_KIND, F_LB_BITOFF, F_LB_WORD0, F_LOWER_BITS, F_NVALS,
    F_SEL_ADJ, F_WIN_BITOFF, F_WIN_LEN, F_WIN_WORD0, N_FIELDS, TILE,
    build_tile_tables,
)

_F32 = np.float32
_I32 = np.int32
NEG_INF = float("-inf")


def _pow2_at_least(x, lo=1):
    v = lo
    while v < int(x):
        v *= 2
    return v


def _masked_lowbits(hi):
    """(1 << hi) - 1 for hi in [0, 32], uint32-safe."""
    h = jnp.clip(hi, 0, 32).astype(jnp.uint32)
    return jnp.where(h >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << (h & jnp.uint32(31))) - jnp.uint32(1))


def _decode_group(words, fields, W, WL, T=TILE):
    """Decode one group of tiles: fields (R, N_FIELDS) -> (R, T) int32
    values (pads undefined, masked by caller). T is the tile width in
    value slots (<= TILE); narrow groups decode short lists without
    paying full-width select work.

    Select = popcount hierarchy, entirely via masked comparison-reduces
    (no bit expansion, no gathers): per-word population counts locate the
    word holding the (j+1)-th one; a branchless 5-step binary search over
    popcount masks finds the bit. Replaces the reference's sequential
    broadword unary skips (succinct unary_enumerator) with ~W*TILE VPU
    lanes per tile."""
    R = fields.shape[0]
    kind = fields[:, F_KIND]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]

    # select window: W words masked to [win_bitoff, win_bitoff + win_len)
    widx = fields[:, F_WIN_WORD0][:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    wv = words[jnp.clip(widx, 0, words.shape[0] - 1)]  # (R, W) uint32
    wbit0 = jnp.arange(W, dtype=jnp.int32)[None, :] * 32
    lo = fields[:, F_WIN_BITOFF][:, None] - wbit0
    hi = fields[:, F_WIN_BITOFF][:, None] + fields[:, F_WIN_LEN][:, None] - wbit0
    wv = wv & (_masked_lowbits(hi) & ~_masked_lowbits(lo))

    pc = jax.lax.population_count(wv).astype(jnp.int32)
    cum = jnp.cumsum(pc, axis=1)  # (R, W) inclusive
    # word holding the (j+1)-th one, its preceding rank, and its value —
    # all via (R, W, TILE) masked reduces
    le = cum[:, :, None] <= j[:, None, :]
    word_idx = le.sum(axis=1, dtype=jnp.int32)  # (R, TILE)
    widx_c = jnp.clip(word_idx, 0, W - 1)
    eq_prev = jnp.arange(W, dtype=jnp.int32)[None, :, None] == (word_idx - 1)[:, None, :]
    rank_before = jnp.where(eq_prev, cum[:, :, None], 0).sum(axis=1, dtype=jnp.int32)
    eq_cur = jnp.arange(W, dtype=jnp.int32)[None, :, None] == widx_c[:, None, :]
    target_word = jnp.where(eq_cur, wv[:, :, None], jnp.uint32(0)).sum(axis=1, dtype=jnp.uint32)

    # branchless in-word select of the (rem+1)-th set bit
    rem = j - rank_before
    pos = jnp.zeros((R, T), dtype=jnp.int32)
    for width in (16, 8, 4, 2, 1):
        mask = _masked_lowbits(jnp.full((R, T), width, jnp.int32)) << pos.astype(jnp.uint32)
        c = jax.lax.population_count(target_word & mask).astype(jnp.int32)
        right = rem >= c
        rem = rem - jnp.where(right, c, 0)
        pos = pos + jnp.where(right, width, 0)

    sel = widx_c * 32 + pos - fields[:, F_WIN_BITOFF][:, None]  # rel to window start

    # low bits: in-row word selection by comparison-reduce (faster than
    # take_along_axis row gathers on TPU)
    l = fields[:, F_LOWER_BITS][:, None]  # (R, 1)
    lbw_idx = fields[:, F_LB_WORD0][:, None] + jnp.arange(WL + 1, dtype=jnp.int32)[None, :]
    lbw = words[jnp.clip(lbw_idx, 0, words.shape[0] - 1)]  # (R, WL+1)
    bit_off = fields[:, F_LB_BITOFF][:, None] + j * l  # (R, TILE)
    w0i = jnp.clip(bit_off >> 5, 0, WL)
    s = (bit_off & 31).astype(jnp.uint32)
    widx_range = jnp.arange(WL + 1, dtype=jnp.int32)[None, None, :]
    sel0 = w0i[:, :, None] == widx_range  # (R, T, WL+1)
    w0 = jnp.where(sel0, lbw[:, None, :], jnp.uint32(0)).sum(axis=2, dtype=jnp.uint32)
    sel1 = (w0i + 1)[:, :, None] == widx_range
    w1 = jnp.where(sel1, lbw[:, None, :], jnp.uint32(0)).sum(axis=2, dtype=jnp.uint32)
    low = (w0 >> s) | jnp.where(s > 0, w1 << (jnp.uint32(32) - s), jnp.uint32(0))
    lmask = jnp.where(l >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << l.astype(jnp.uint32)) - jnp.uint32(1))
    low = (low & lmask).astype(jnp.int32)

    kc = kind[:, None]
    adj = fields[:, F_SEL_ADJ][:, None]
    base = fields[:, F_BASE][:, None]
    ef_val = (((sel + adj - j) << l) | low)
    val = jnp.where(kc == SEG_EF, ef_val, 0)
    val = jnp.where(kc == SEG_EF_STRICT, ef_val + j, val)
    val = jnp.where(kc == SEG_RB, sel + adj, val)
    val = jnp.where(kc == SEG_AO, j, val)
    return val + base


@partial(jax.jit, static_argnames=("groups", "P", "B", "Dp", "k", "ops", "tmax"))
def _tile_step(
    docs_words,
    freqs_words,
    gfields,  # int32[Rtotal, 2*N_FIELDS] docs fields | freqs fields, group-major
    perm,  # int32[P/TILE] flat tile t <- group-major row perm[t]
    tile_row,  # int32[P/TILE] query row per flat tile
    tile_qw,  # f32[P/TILE]
    tile_tgt,  # int32[P/TILE]
    tile_first,  # bool[P/TILE] tile starts its (query,term) span
    row_start,  # int32[B+1] flat start per row
    row_lenq,  # int32[B]
    norm_lens,  # f32[num_docs]
    groups,  # tuple of (offset, R, W, WL)
    P, B, Dp, k, ops,  # ops: subset of ("counts","or","and")
    tmax=8,  # max terms per query in this batch (bounds run lengths)
):
    num_docs = Dp - 1
    T = P // TILE

    dvals, fvals, dmask = [], [], []
    for off, R, W, WL in groups:
        df = gfields[off : off + R, :N_FIELDS]
        ff = gfields[off : off + R, N_FIELDS:]
        dvals.append(_decode_group(docs_words, df, W, WL))
        fvals.append(_decode_group(freqs_words, ff, W, WL))
        nv = df[:, F_NVALS][:, None]
        dmask.append(jnp.arange(TILE, dtype=jnp.int32)[None, :] < nv)

    dall = jnp.concatenate(dvals, axis=0)
    fall = jnp.concatenate(fvals, axis=0)
    mall = jnp.concatenate(dmask, axis=0)

    # flat assembly: contiguous row gather by tile permutation
    doc_t = jnp.take(jnp.where(mall, dall, num_docs), perm, axis=0)  # (T, TILE)
    cum_t = jnp.take(jnp.where(mall, fall, -(2**31) + 1), perm, axis=0)
    # pads inherit the running cum (values nondecreasing within a tile)
    cum_t = jax.lax.cummax(cum_t, axis=1)

    doc = doc_t.reshape(P)
    cum = cum_t.reshape(P)
    jj = jnp.arange(TILE, dtype=jnp.int32)[None, :]
    first = (jnp.broadcast_to(tile_first[:, None], (T, TILE)) & (jj == 0)).reshape(P)
    rowv = jnp.broadcast_to(tile_row[:, None], (T, TILE)).reshape(P)
    qwv = jnp.broadcast_to(tile_qw[:, None], (T, TILE)).reshape(P)
    tgtv = jnp.broadcast_to(tile_tgt[:, None], (T, TILE)).reshape(P)

    real = doc < num_docs
    prev_cum = jnp.concatenate([jnp.zeros(1, jnp.int32), cum[:-1]])
    freq = jnp.where(first, cum, cum - prev_cum)

    if ("or" in ops) or ("and" in ops):
        nl = norm_lens[jnp.clip(doc, 0, num_docs - 1)]
        fr = freq.astype(jnp.float32)
        k1, b = jnp.float32(BM25.k1), jnp.float32(BM25.b)
        contrib = qwv * (fr / (fr + k1 * (jnp.float32(1.0) - b + b * nl)))
        contrib = jnp.where(real, contrib, 0.0)
    else:
        contrib = jnp.zeros(P, jnp.float32)

    key = rowv * Dp + doc  # pads: row*Dp + num_docs -> end of their row
    one = real.astype(jnp.int32)
    skey, scontrib, sone, stgt = jax.lax.sort([key, contrib, one, tgtv], num_keys=1)

    nxt = jnp.concatenate([skey[1:], jnp.full(1, -1, jnp.int32)])
    last = skey != nxt
    # runs of equal (row, doc) keys are at most `tmax` long (one posting per
    # term); accumulate run sums with tmax-1 shifted adds — no scans needed
    run_score = scontrib
    run_cnt = sone
    match = jnp.ones(P, dtype=bool)
    for m in range(1, tmax):
        keym = jnp.concatenate([jnp.full(m, -2, jnp.int32), skey[:-m]])
        match = match & (skey == keym)
        cm = jnp.concatenate([jnp.zeros(m, jnp.float32), scontrib[:-m]])
        om = jnp.concatenate([jnp.zeros(m, jnp.int32), sone[:-m]])
        run_score = run_score + jnp.where(match, cm, 0.0)
        run_cnt = run_cnt + jnp.where(match, om, 0)

    srow = skey // Dp
    sdoc = skey - srow * Dp
    run_last = last & (srow < B) & (sdoc < num_docs)
    and_run = run_last & (run_cnt == stgt) & (stgt > 0)

    c_or = jnp.cumsum(run_last.astype(jnp.int32))
    c_and = jnp.cumsum(and_run.astype(jnp.int32))
    lo = row_start[:B]
    hi = row_start[:B] + row_lenq

    def prefix_at(c, i):
        return jnp.where(i > 0, c[jnp.clip(i - 1, 0, P - 1)], 0)

    or_counts = prefix_at(c_or, hi) - prefix_at(c_or, lo)
    and_counts = prefix_at(c_and, hi) - prefix_at(c_and, lo)

    out = [and_counts, or_counts]
    kk = jnp.arange(k, dtype=jnp.int32)[None, :]
    for op in ("or", "and"):
        if op not in ops:
            out.append(jnp.full((B, k), NEG_INF, jnp.float32))
            continue
        flag = run_last if op == "or" else and_run
        negs = jnp.where(flag, -run_score, jnp.inf)
        _, s2 = jax.lax.sort([srow, negs], num_keys=2)
        idx = jnp.clip(row_start[:B][:, None] + kk, 0, P - 1)
        topk = -s2[idx]
        topk = jnp.where(kk < row_lenq[:, None], topk, NEG_INF)
        out.append(topk)
    # out: and_counts, or_counts, topk_or, topk_and
    return out[0], out[1], out[2], out[3]


class TileQueryEngine:
    """Scatter-free tiled engine; one fused dispatch per query batch."""

    def __init__(self, index, wdata=None, scorer=BM25, max_postings=1 << 23):
        self.dindex = index if isinstance(index, DeviceIndex) else DeviceIndex(index)
        index = self.dindex.index
        self.num_docs = self.dindex.num_docs
        self.Dp = self.num_docs + 1
        self.scorer = scorer
        self.norm_lens = (
            jnp.asarray(wdata.norm_lens) if wdata is not None else jnp.ones(self.num_docs, jnp.float32)
        )
        self.tiles = build_tile_tables(index)
        self.max_postings = max_postings
        # per-list padded tile counts
        self.list_tiles = np.diff(self.tiles.list_tile_start)

    # -- host batch layout ----------------------------------------------------

    def _prep(self, queries, ranked):
        d = self.dindex
        tf = [query_freqs(t) for t in queries]
        counts = np.array([len(x) for x in tf], dtype=np.int64)
        terms = np.array([t for q in tf for t, _ in q], dtype=np.int64)
        qmult = np.array([m for q in tf for _, m in q], dtype=np.int64)
        if ranked and len(terms):
            dfs = d.list_n[terms].astype(_F32)
            N = _F32(self.num_docs)
            idf = np.log((N - dfs + _F32(0.5)) / (dfs + _F32(0.5))).astype(_F32)
            qw = qmult.astype(_F32) * np.maximum(_F32(1e-6), idf) * (_F32(1.0) + BM25.k1)
        else:
            qw = np.ones(len(terms), dtype=_F32)
        return terms, qw, counts

    def _build_batch(self, terms, qw, counts):
        t = self.tiles
        B = len(counts)
        assert (B + 1) * self.Dp < 2**31, "composite sort key must fit int32"

        # tiles of each requested list, flat (query-major, list-major) order
        tstarts = t.list_tile_start[terms]
        tcounts = self.list_tiles[terms]
        total_tiles = int(tcounts.sum())
        if total_tiles:
            excl = np.cumsum(tcounts) - tcounts
            tidx = np.repeat(tstarts - excl, tcounts) + np.arange(total_tiles, dtype=np.int64)
            span_of_tile = np.repeat(np.arange(len(terms), dtype=np.int64), tcounts)
        else:
            tidx = np.zeros(0, dtype=np.int64)
            span_of_tile = np.zeros(0, dtype=np.int64)

        qend = np.cumsum(counts)
        qstart = qend - counts
        span_row = np.repeat(np.arange(B, dtype=_I32), counts)

        Tn = _pow2_at_least(max(total_tiles, 1), lo=2)
        P = Tn * TILE

        # group tiles by pow4 window buckets (few groups -> big fused ops;
        # up to 4x padded decode work is cheaper than fragmented dispatch)
        ww = np.maximum(t.win_words[tidx], 1)
        wl = np.maximum(t.lb_words[tidx], 1)
        wb = 1 << (2 * np.ceil(np.log2(np.maximum(ww, 4)) / 2).astype(np.int64))
        lb = 1 << (2 * np.ceil(np.log2(np.maximum(wl, 4)) / 2).astype(np.int64))
        bkey = wb * 1024 + lb
        order = np.argsort(bkey, kind="stable")

        groups = []
        gfields = np.zeros((_pow2_at_least(max(total_tiles, 1), lo=8), 2 * N_FIELDS), dtype=_I32)
        gfields[:, F_KIND] = -1
        gfields[:, N_FIELDS + F_KIND] = -1
        sk = bkey[order] if total_tiles else np.zeros(0, dtype=np.int64)
        boundaries = np.nonzero(np.diff(sk))[0] + 1 if total_tiles else np.zeros(0, np.int64)
        gstarts = np.concatenate([[0], boundaries, [total_tiles]]).astype(np.int64)
        off = 0
        perm_inv = np.zeros(Tn, dtype=_I32)
        for gi in range(len(gstarts) - 1):
            lo_i, hi_i = int(gstarts[gi]), int(gstarts[gi + 1])
            if hi_i <= lo_i:
                continue
            sel = order[lo_i:hi_i]
            W = int(wb[sel[0]])
            WL = int(lb[sel[0]])
            R = _pow2_at_least(hi_i - lo_i + 1, lo=64)  # always >=1 padding row
            if off + R > len(gfields):
                grown = np.zeros((_pow2_at_least(off + R, lo=8), 2 * N_FIELDS), dtype=_I32)
                grown[:, F_KIND] = -1
                grown[:, N_FIELDS + F_KIND] = -1
                grown[: len(gfields)] = gfields
                gfields = grown
            gfields[off : off + (hi_i - lo_i), :N_FIELDS] = t.docs[tidx[sel]]
            gfields[off : off + (hi_i - lo_i), N_FIELDS:] = t.freqs[tidx[sel]]
            perm_inv[sel] = off + np.arange(hi_i - lo_i, dtype=_I32)
            groups.append((off, R, W, WL))
            off += R
        gfields = gfields[:off] if off else np.zeros((8, 2 * N_FIELDS), dtype=_I32)
        if off == 0:
            groups = [(0, 8, 1, 4)]
            gfields = np.zeros((8, 2 * N_FIELDS), dtype=_I32)
            gfields[:, F_KIND] = -1
            gfields[:, N_FIELDS + F_KIND] = -1
            off = 8

        # flat-order per-tile tables
        perm = np.full(Tn, off - 1, dtype=_I32)
        perm[:total_tiles] = perm_inv[:total_tiles]
        tile_row = np.full(Tn, B, dtype=_I32)
        tile_qw = np.zeros(Tn, dtype=_F32)
        tile_tgt = np.zeros(Tn, dtype=_I32)
        tile_first = np.zeros(Tn, dtype=bool)
        if total_tiles:
            tile_row[:total_tiles] = span_row[span_of_tile]
            tile_qw[:total_tiles] = qw[span_of_tile]
            tile_tgt[:total_tiles] = counts[span_row[span_of_tile]]
            firsts = np.zeros(total_tiles, dtype=bool)
            span_first = np.cumsum(tcounts) - tcounts
            firsts[span_first[tcounts > 0]] = True
            tile_first[:total_tiles] = firsts

        # per-row flat spans
        row_tiles = np.zeros(B, dtype=np.int64)
        np.add.at(row_tiles, span_row, tcounts)
        row_start = np.zeros(B + 1, dtype=_I32)
        row_start[1:] = np.cumsum(row_tiles) * TILE
        row_lenq = (row_tiles * TILE).astype(_I32)

        return groups, gfields, perm, tile_row, tile_qw, tile_tgt, tile_first, row_start, row_lenq, P, B

    def run(self, queries, k=10, ops=("or", "and"), ranked=True):
        terms_all, qw_all, counts_all = self._prep(queries, ranked)
        qend = np.cumsum(counts_all)
        qstart = qend - counts_all

        # postings budget split (padded tiles)
        if len(terms_all):
            tposts = self.list_tiles[terms_all] * TILE
            safe = np.minimum(qstart, len(terms_all) - 1)
            qpost = np.add.reduceat(tposts, safe)
            qpost = np.where(counts_all > 0, qpost, 0)
        else:
            qpost = np.zeros(len(counts_all), dtype=np.int64)

        max_B = (2**31) // self.Dp - 2  # composite sort key must fit int32
        parts, cur, cur_p = [], [], 0
        for qi in range(len(queries)):
            pl = int(qpost[qi])
            if cur and (cur_p + pl > self.max_postings or len(cur) >= max_B):
                parts.append(cur)
                cur, cur_p = [], 0
            cur.append(qi)
            cur_p += pl
        if cur:
            parts.append(cur)

        results = [None] * len(queries)
        pending = []
        for part in parts:
            sel = (
                np.concatenate([np.arange(qstart[j], qend[j]) for j in part]).astype(np.int64)
                if part
                else np.zeros(0, np.int64)
            )
            (groups, gfields, perm, tile_row, tile_qw, tile_tgt, tile_first,
             row_start, row_lenq, P, B) = self._build_batch(
                terms_all[sel], qw_all[sel], counts_all[part]
            )
            out = _tile_step(
                self.dindex.docs_words,
                self.dindex.freqs_words,
                jnp.asarray(gfields),
                jnp.asarray(perm),
                jnp.asarray(tile_row),
                jnp.asarray(tile_qw),
                jnp.asarray(tile_tgt),
                jnp.asarray(tile_first),
                jnp.asarray(row_start),
                jnp.asarray(row_lenq),
                self.norm_lens,
                groups=tuple(groups),
                P=P,
                B=B,
                Dp=self.Dp,
                k=k,
                ops=tuple(ops),
                tmax=_pow2_at_least(int(counts_all[part].max()) if len(part) else 1, lo=4),
            )
            pending.append((part, out))
        for part, out in pending:
            res = [np.asarray(r) for r in out]
            for local, j in enumerate(part):
                results[j] = tuple(r[local] for r in res)
        return results

    # -- public ops -----------------------------------------------------------

    def and_counts(self, queries):
        return np.array([r[0] for r in self.run(queries, ops=("counts",), ranked=False)])

    def or_counts(self, queries):
        return np.array([r[1] for r in self.run(queries, ops=("counts",), ranked=False)])

    def _topk_list(self, r):
        return [float(s) for s in r[np.isfinite(r)]]

    def ranked_or(self, queries, k=10):
        return [self._topk_list(r[2]) for r in self.run(queries, k=k, ops=("or",))]

    def ranked_and(self, queries, k=10):
        return [self._topk_list(r[3]) for r in self.run(queries, k=k, ops=("and",))]

    wand = ranked_or
    maxscore = ranked_or
