"""Resident-table batched query engine: decode-unique + block-gather +
row-sort join.

The fast path for TPU query processing. Everything static lives in HBM
from engine init — the compressed bit words AND the per-tile decode
metadata (the resident tables). A query batch then uploads only
~50-100 bytes per query and downloads only results, which matters both
on real hardware (PCIe) and through a device tunnel.

One jit dispatch per part:

  1. gather tile field rows from the resident tables by uploaded tile id
  2. per (window, low-bits) pow4 bucket: comparison-reduce select decode
     of each UNIQUE tile exactly once per part — queries sharing a term
     share the decode (the reference decodes per query cursor,
     block_posting_list.hpp; batching makes dedup free)
  3. tile-local freq reconstruction: the F_PREV_CUM table field carries
     the prefix-sum value preceding the tile, so cum-diff needs no
     cross-tile adjacency and no flat-order permute
  4. per-posting BM25 doc-term partial weights (query-independent)
  5. 32-slot blocks: each query row gathers its terms' blocks by block
     index — replication across queries is a contiguous row gather
  6. per length-bucket (B, L) layout: ONE stable row sort [doc, contrib]
     joins each query's postings (replaces the cursor leapfrog of
     queries.hpp and_query:59-82 / wand_query with a branch-free join;
     row sorts are ~5x cheaper than one global posting sort)
  7. bounded-run aggregation by shifted adds (runs are <= terms-per-query
     long), AND/OR counts by row reduction, top-k via lax.top_k per row

Semantics match the oracle layer exactly: same doc sets and counts,
f32 scores accumulated in query term order.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import pallas_decode
from ..ops.interp_device import interp_decode
from ..ops.optpfor_device import optpfor_decode
from ..ops.qmx_device import qmx_decode
from ..ops.varint_device import varint_decode
from ..queries.bm25 import BM25
from ..queries.parsing import query_freqs
from .tile_executor import _decode_group
from .tiles import F_BASE, F_NVALS, F_PREV_CUM, N_FIELDS, TILE, build_tile_tables

_F32 = np.float32
_I32 = np.int32
BLOCK = 32
BPT = TILE // BLOCK  # blocks per tile
NEG_INF = float("-inf")


def _pow2_at_least(x, lo=1):
    v = lo
    while v < int(x):
        v *= 2
    return v


def _decode_block_stream(words, fld, st, R, is_docs, num_docs):
    """Decode one stream of one block group. st = ("opt", b, E, T) |
    ("var", G, T) | ("qmx", NW, S, T) | ("interp", W, T). Returns
    (R, T) doc ids (docs) or raw freqs (freqs); pads NOT yet masked."""
    from .block_tiles import BF_B, BF_BIT0, BF_EX0, BF_NEX

    sk, T = st[0], st[-1]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    if sk == "opt":
        b = st[1]
        ws = (31 + T * min(b, 32)) // 32 + 1
        raw = optpfor_decode(
            words, fld[:, BF_BIT0], fld[:, BF_B], fld[:, BF_NEX],
            fld[:, BF_EX0], WS=ws, E=st[2], T=T, b_static=b,
        )
    elif sk == "var":
        raw = varint_decode(words, fld[:, BF_BIT0], fld[:, BF_B], G=st[1], T=T)
    elif sk == "qmx":
        raw = qmx_decode(
            words, fld[:, BF_BIT0], fld[:, BF_B], fld[:, BF_EX0],
            fld[:, BF_NEX], NI=st[1], S=st[2], T=T,
        )
    elif sk == "interp":
        nw = words.shape[0]
        W = st[1]
        widx = (fld[:, BF_BIT0] >> 5)[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        win = words[jnp.clip(widx, 0, nw - 1)]
        cum = interp_decode(
            win, fld[:, BF_BIT0] & 31, fld[:, F_NVALS], fld[:, BF_EX0],
            NC=T, W=W, steps=T - 1,
        )
        if is_docs:
            return fld[:, F_BASE][:, None] - 1 + cum + j + 1
        prevf = jnp.concatenate([jnp.zeros((R, 1), jnp.int32), cum[:, :-1]], axis=1)
        return cum - prevf + 1
    else:
        raise ValueError(f"unknown stream kind {sk}")
    if is_docs:
        return fld[:, F_BASE][:, None] - 1 + jnp.cumsum(raw + 1, axis=1)
    return raw + 1


def _decode_doc_group_blocks(docs_words, df, st, R, num_docs, split):
    """One decode group's docids as masked, padded 32-slot block rows
    (R * max(T//32, 1), 32); pad slots carry num_docs. Shared by the
    query step's split mode and the norm-cache init so the two paths
    cannot diverge."""
    T = st[-1]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = j < df[:, F_NVALS][:, None]
    if split:
        doc = jnp.where(valid, _decode_block_stream(docs_words, df, st, R, True, num_docs), num_docs)
        if T < BLOCK:  # narrow tail tiles decode short, emit one padded block
            doc = jnp.pad(doc, ((0, 0), (0, BLOCK - T)), constant_values=num_docs)
    else:
        doc = jnp.where(valid, _decode_group(docs_words, df, st[1], st[2], T), num_docs)
    return doc.reshape(-1, BLOCK)


@partial(jax.jit, static_argnames=("groups", "num_docs", "split"))
def _norm_cache_step(docs_words, tiles_docs, norm_lens, gtile_ids, groups, num_docs, split):
    """One-time decode of EVERY tile's docids -> per-slot norm lengths,
    (total_blocks, 32) f32 in the canonical group-major block order.

    The per-posting norm-length gather is the engine's largest kernel
    cost (it runs at the chip's random-gather rate, see docs/PERF.md);
    tiles are static, so the gather result is too. This materializes it
    once at init — the reference keeps norm_lens as an uncompressed
    per-doc side table (wand_data.hpp:20-53); this is that same side
    table reorganized posting-aligned, 4 bytes per posting of HBM."""
    blocks = [
        _decode_doc_group_blocks(docs_words, tiles_docs[gtile_ids[off : off + R]], st, R, num_docs, split)
        for off, R, st in groups
    ]
    d = jnp.concatenate(blocks, axis=0)
    return norm_lens[jnp.clip(d, 0, num_docs - 1)]


def _cached_norm_rows(nl_blocks, tile_gblk0, ids, T):
    """Norm-length rows for one decode group: a contiguous row gather
    from the init-time cache (rows of tile t live at
    [tile_gblk0[t], +T//32) in nl_blocks)."""
    bpt = max(T // BLOCK, 1)
    idx = tile_gblk0[ids][:, None] + jnp.arange(bpt, dtype=jnp.int32)[None, :]
    return jnp.take(nl_blocks, idx.reshape(-1), axis=0)  # (R*bpt, 32)


@partial(
    jax.jit,
    static_argnames=(
        "groups", "groups_f", "buckets", "sent_dir", "num_docs", "k", "ops", "tmax", "pallas",
        "fetch16", "normcache",
    ),
)
def _resident_step(
    docs_words,
    freqs_words,
    tiles_docs,  # RESIDENT (Nt+1, N_FIELDS) i32; last row is the pad tile
    tiles_freqs,
    norm_lens,  # RESIDENT f32[num_docs]
    gtile_ids,  # i32[Rtot] group-major tile ids, docs ordering (pads -> Nt)
    gtile_ids_f,  # i32: freqs-ordering tile ids (split mode; len 1 dummy else)
    blkperm,  # i32: docs-order block -> freqs-order block (split mode)
    bucket_dir,  # tuple of i32[Bb, L/32]: (global block id << 5) | term slot
    bucket_qwtab,  # tuple of f32[Bb, tmax] per-row term-slot query weights
    bucket_tgt,  # tuple of i32[Bb]
    groups,  # docs-pass groups: tuple of (off, R, statics)
    groups_f,  # freqs-pass groups (empty tuple in pair mode)
    buckets,  # tuple of (Bb, L, nrows)
    sent_dir,  # static: packed directory value of the sentinel block
    num_docs,
    k,
    ops,
    tmax,
    pallas=0,  # 0: XLA decode, 1: pallas kernel, 2: pallas interpret (tests)
    fetch16=0,  # downloads ride f16: 2^-11 rounding of the returned scores
    # sits inside the 0.1% relative tolerance the reference's own ranked
    # tests assert (test_ranked_queries.cpp:52) and halves the dominant
    # device->host transfer. Scores are pre-scaled by fscale (a host-
    # chosen power of two, undone exactly after download) so every
    # representable score lands in f16's NORMAL range — tiny scores from
    # bm25's idf epsilon path would otherwise hit subnormals, where
    # rounding error blows past the tolerance. The host plans f32
    # instead whenever its provable score bounds don't fit (see
    # _part_plan). Counts passes stay f32 (exact to 2^24).
    fscale=None,  # f32 scalar, only read when fetch16
    normcache=0,  # per-slot norm lengths from the init-time cache (row
    # gather) instead of the per-posting random gather; exact (f32 cache)
    nl_blocks=None,  # RESIDENT f32[total_blocks, 32] (normcache mode)
    tile_gblk0=None,  # RESIDENT i32[Nt+1]: first cache row of each tile
):
    ranked = ("or" in ops) or ("and" in ops)
    if groups_f:
        # SPLIT mode (block indexes): each stream decodes in its own
        # group-major order; freq blocks realign to docs order by one
        # contiguous block-row gather.
        d_blocks, f_blocks, nl_rows = [], [], []
        for off, R, st in groups:
            ids = gtile_ids[off : off + R]
            d_blocks.append(
                _decode_doc_group_blocks(docs_words, tiles_docs[ids], st, R, num_docs, split=True)
            )
            if ranked and normcache:
                nl_rows.append(_cached_norm_rows(nl_blocks, tile_gblk0, ids, st[-1]))
        for off, R, st in groups_f:
            ids = gtile_ids_f[off : off + R]
            ff = tiles_freqs[ids]
            T = st[-1]
            j = jnp.arange(T, dtype=jnp.int32)[None, :]
            valid = j < ff[:, F_NVALS][:, None]
            fv = jnp.where(valid, _decode_block_stream(freqs_words, ff, st, R, False, num_docs), 0)
            if T < BLOCK:
                fv = jnp.pad(fv, ((0, 0), (0, BLOCK - T)))
            f_blocks.append(fv.reshape(R * max(T // BLOCK, 1), BLOCK))
        docs32 = jnp.concatenate(d_blocks, axis=0)
        freq32 = jnp.take(jnp.concatenate(f_blocks, axis=0), blkperm, axis=0)
        freq32 = freq32.astype(jnp.float32)
        if ranked:
            if normcache:
                nl = jnp.concatenate(nl_rows, axis=0)
            else:
                nl = norm_lens[jnp.clip(docs32, 0, num_docs - 1)]
            k1, b = jnp.float32(BM25.k1), jnp.float32(BM25.b)
            w = freq32 / (freq32 + k1 * (jnp.float32(1.0) - b + b * nl))
            w = jnp.where(docs32 < num_docs, w, 0.0)
        else:
            w = jnp.where(docs32 < num_docs, 1.0, 0.0)
        w32 = w
    else:
        # PAIR mode (EF family): both streams share the group layout
        docs_blocks, w_blocks = [], []
        for off, R, st in groups:
            kind, T = st[0], st[-1]
            ids = gtile_ids[off : off + R]
            df = tiles_docs[ids]
            ff = tiles_freqs[ids]
            j = jnp.arange(T, dtype=jnp.int32)[None, :]
            valid = j < df[:, F_NVALS][:, None]
            W, WL = st[1], st[2]
            if pallas:
                doc, freq_i = pallas_decode.decode_pair(
                    docs_words, freqs_words, df, ff, W, WL, T, num_docs,
                    interpret=(pallas == 2),
                )
                freq = freq_i.astype(jnp.float32)
            else:
                dv = _decode_group(docs_words, df, W, WL, T)  # (R, T)
                fv = _decode_group(freqs_words, ff, W, WL, T)
                doc = jnp.where(valid, dv, num_docs)
                prev = jnp.concatenate([ff[:, F_PREV_CUM][:, None], fv[:, :-1]], axis=1)
                freq = jnp.where(valid, fv - prev, 0).astype(jnp.float32)
            if ranked:
                if normcache:
                    nl = _cached_norm_rows(nl_blocks, tile_gblk0, ids, T).reshape(R, T)
                else:
                    nl = norm_lens[jnp.clip(doc, 0, num_docs - 1)]
                k1, b = jnp.float32(BM25.k1), jnp.float32(BM25.b)
                w = freq / (freq + k1 * (jnp.float32(1.0) - b + b * nl))
            else:
                w = jnp.where(doc < num_docs, 1.0, 0.0)
            docs_blocks.append(doc.reshape(R * (T // BLOCK), BLOCK))
            w_blocks.append(w.reshape(R * (T // BLOCK), BLOCK))
        docs32 = jnp.concatenate(docs_blocks, axis=0)
        w32 = jnp.concatenate(w_blocks, axis=0)

    out = []
    for bi, (Bb, L, nrows) in enumerate(buckets):
        # uploads carry only the real rows; pad to the pow2 batch on device
        bdir = jnp.concatenate(
            [bucket_dir[bi], jnp.full((Bb - nrows, L // BLOCK), sent_dir, jnp.int32)], axis=0
        ) if Bb > nrows else bucket_dir[bi]
        qwtab = jnp.concatenate(
            [bucket_qwtab[bi], jnp.zeros((Bb - nrows, bucket_qwtab[bi].shape[1]), jnp.float32)], axis=0
        ) if Bb > nrows else bucket_qwtab[bi]
        tgtv = jnp.concatenate(
            [bucket_tgt[bi], jnp.zeros(Bb - nrows, jnp.int32)]
        ) if Bb > nrows else bucket_tgt[bi]
        blkidx = bdir >> 5
        slot = bdir & 31
        qw = jnp.take_along_axis(qwtab, slot, axis=1)  # (Bb, L/32)
        d = jnp.take(docs32, blkidx, axis=0).reshape(Bb, L)
        c = (jnp.take(w32, blkidx, axis=0) * qw[:, :, None]).reshape(Bb, L)
        sd, sc = jax.lax.sort([d, c], dimension=1, num_keys=1, is_stable=True)

        real = sd < num_docs
        nxt = jnp.concatenate([sd[:, 1:], jnp.full((Bb, 1), -1, jnp.int32)], axis=1)
        last = sd != nxt
        run_score = sc
        run_cnt = real.astype(jnp.int32)
        match = jnp.ones((Bb, L), dtype=bool)
        for m in range(1, tmax):
            keym = jnp.concatenate([jnp.full((Bb, m), -2, jnp.int32), sd[:, :-m]], axis=1)
            match = match & (sd == keym)
            cm = jnp.concatenate([jnp.zeros((Bb, m), jnp.float32), sc[:, :-m]], axis=1)
            om = jnp.concatenate(
                [jnp.zeros((Bb, m), jnp.int32), real[:, :-m].astype(jnp.int32)], axis=1
            )
            run_score = run_score + jnp.where(match, cm, 0.0)
            run_cnt = run_cnt + jnp.where(match, om, 0)

        last_real = last & real
        tgt = tgtv[:, None]
        and_flag = last_real & (run_cnt == tgt) & (tgt > 0)

        # pack one f32 row per query: [counts?, topk_or?, topk_and?]
        # (counts are exact in f32 up to 2^24) so each part downloads ONE array
        res = []
        if "counts" in ops:
            res.append(and_flag.sum(axis=1, dtype=jnp.int32).astype(jnp.float32)[:, None])
            res.append(last_real.sum(axis=1, dtype=jnp.int32).astype(jnp.float32)[:, None])
        for op, flag in (("or", last_real), ("and", and_flag)):
            if op in ops:
                res.append(jax.lax.top_k(jnp.where(flag, run_score, NEG_INF), k)[0])
        row = jnp.concatenate(res, axis=1)[:nrows]  # download real rows only
        out.append((row * fscale).astype(jnp.float16) if fetch16 else row)
    return jnp.concatenate(out, axis=0)


class ResidentEngine:
    """Resident-table engine; minimal per-batch transfer, one dispatch per
    part, decode shared across queries."""

    MIN_L = 64

    def __init__(self, index, wdata=None, scorer=BM25, max_part_slots=1 << 21,
                 max_part_queries=16384, pallas=None, devices=None,
                 query_dfs=None, term_remap=None):
        # query_dfs: per-GLOBAL-term document frequencies for bm25 query
        # weights, overriding this index's own list lengths — a doc-range
        # shard must score with collection-level idf (parallel/doc_sharded).
        # term_remap: i64[global_terms] -> local list id, -1 when this
        # index holds no postings for the term (the term still counts
        # toward AND targets, contributing nothing).
        self.index = index
        self.num_docs = index.num_docs()
        self.scorer = scorer
        self.max_part_slots = max_part_slots
        self.max_part_queries = max_part_queries
        self._pallas_req = pallas
        self.devices = list(devices) if devices else None
        self.query_dfs = None if query_dfs is None else np.asarray(query_dfs, dtype=np.int64)
        self.term_remap = None if term_remap is None else np.asarray(term_remap, dtype=np.int64)

        self.norm_lens = (
            jnp.asarray(wdata.norm_lens) if wdata is not None else jnp.ones(self.num_docs, jnp.float32)
        )
        # provable lower bound on any bm25 doc-term weight (f>=1, nl<=max):
        # used to plan the f16 download scaling (see _part_plan)
        nl_max = float(np.max(np.asarray(self.norm_lens))) if self.num_docs else 1.0
        self._wmin = 1.0 / (1.0 + BM25.k1 * (1.0 - BM25.b + BM25.b * nl_max))
        # pallas decode only on a real TPU placement (the axon plugin makes
        # default_backend() report tpu even when arrays land on cpu)
        import os as _os

        env = _os.environ.get("DS2I_PALLAS")
        if self._pallas_req is None:
            # default to the XLA decode: measured faster than the pallas
            # kernel at these group shapes (see ops/pallas_decode.py)
            self._pallas_req = {"0": 0, "1": 1, "interpret": 2}.get(env, 0)
        self.pallas = self._pallas_req
        num_lists = index.size()
        if hasattr(index, "docs_sequences"):
            t = self._init_ef(index)
        else:
            t = self._init_block(index)
        self.tiles = t
        nt = len(t.tile_list)

        # resident field tables, one trailing pad row (kind=-1, n_vals=0)
        def with_pad(a):
            out = np.zeros((nt + 1, N_FIELDS), dtype=_I32)
            out[:nt] = a
            out[nt, 0] = -1
            return jnp.asarray(out)

        self.tiles_docs = with_pad(t.docs)
        self.tiles_freqs = with_pad(t.freqs)
        self.pad_tile = nt
        self.nl_blocks = None  # built lazily by _ensure_norm_cache
        self.tile_gblk0 = None
        self._norm_replicas = None
        self.normcache = 0 if _os.environ.get("DS2I_NORM_CACHE") == "0" else 1
        if self.devices:
            # replicate the resident state on every serving device; parts
            # round-robin across them (query data parallelism over ICI-
            # attached chips — the scale-out axis for batch serving)
            self._replicas = [
                tuple(jax.device_put(a, d) for a in (
                    self.docs_words, self.freqs_words, self.tiles_docs,
                    self.tiles_freqs, self.norm_lens,
                ))
                for d in self.devices
            ]
        else:
            self._replicas = None

        # host-side layout tables (shared across tile kinds)
        self.list_tile_start = t.list_tile_start
        self.list_tiles = np.diff(t.list_tile_start)
        nvals = t.docs[:, F_NVALS].astype(np.int64)
        self.tile_blocks = (nvals + BLOCK - 1) // BLOCK  # 32-slot blocks per tile
        self.list_n = np.zeros(num_lists, dtype=np.int64)
        np.add.at(self.list_n, t.tile_list, nvals)
        self.list_blocks = np.zeros(num_lists, dtype=np.int64)
        np.add.at(self.list_blocks, t.tile_list, self.tile_blocks)

    def _ensure_norm_cache(self):
        """Materialize the per-slot norm-length cache (one decode of every
        tile). Lazy: only ranked execution pays the init cost."""
        if self.nl_blocks is not None:
            return
        nt = self.pad_tile
        utidx = np.arange(nt, dtype=np.int64)
        gid = self.tile_gid_d if self.split else self.tile_gid
        stats = self.group_statics_d if self.split else self.group_statics
        groups, gtile_ids, tblk, sent_blk, _ = self._order_groups(utidx, gid, stats)
        g0 = np.full(nt + 1, sent_blk, dtype=_I32)
        if nt:
            g0[:nt] = tblk
        self.tile_gblk0 = jnp.asarray(g0)
        self.nl_blocks = _norm_cache_step(
            self.docs_words, self.tiles_docs, self.norm_lens,
            jnp.asarray(gtile_ids), groups=tuple(groups),
            num_docs=self.num_docs, split=self.split,
        )
        if self.devices:
            self._norm_replicas = [
                (jax.device_put(self.nl_blocks, d), jax.device_put(self.tile_gblk0, d))
                for d in self.devices
            ]

    def _init_ef(self, index):
        # EF-family tiles: group statics are ("ef", W, WL, T)
        t = build_tile_tables(index)
        nvals = t.docs[:, F_NVALS].astype(np.int64)
        ww = np.maximum(t.win_words, 1)
        wl = np.maximum(t.lb_words, 1)
        wb = 1 << (2 * np.ceil(np.log2(np.maximum(ww, 4)) / 2).astype(np.int64))
        lb = 1 << (2 * np.ceil(np.log2(np.maximum(wl, 4)) / 2).astype(np.int64))
        tT = np.clip(2 ** np.ceil(np.log2(np.maximum(nvals, 1))).astype(np.int64), BLOCK, TILE)
        key = tT * (1 << 22) + wb * 1024 + lb
        uniq, inv = np.unique(key, return_inverse=True)
        self.group_statics = [
            ("ef", int((int(kv) >> 10) & 1023), int(int(kv) & 1023), int(int(kv) >> 22))
            for kv in uniq
        ]
        self.tile_gid = inv.astype(np.int64)
        self._empty_statics = ("ef", 4, 4, TILE)
        self.split = False
        for coll_bv in (index.docs_sequences.bits_bv, index.freqs_sequences.bits_bv):
            if coll_bv.nbits >= 2**31:
                raise ValueError(
                    "device engine limit: 256MB per resident stream (i32 bit "
                    "cursors); shard larger indexes by doc range across "
                    "devices with parallel.DocShardedEngine"
                )
        self.docs_words = jnp.asarray(index.docs_sequences.bits_bv.words.view(np.uint32))
        self.freqs_words = jnp.asarray(index.freqs_sequences.bits_bv.words.view(np.uint32))
        return t

    def _init_block(self, index):
        # block_freq_index tiles: one tile per 128-int block; statics are
        # ("opt", WSd, Ed, WSf, Ef, 128) or ("interp", Wd, Wf, NC)
        from .block_tiles import build_block_tables

        t, slist_d, gid_d, slist_f, gid_f = build_block_tables(index)
        self.group_statics_d = slist_d
        self.tile_gid_d = gid_d
        self.group_statics_f = slist_f
        self.tile_gid_f = gid_f
        self._empty_statics = ("interp", 4, BLOCK)
        self.split = True
        data = np.asarray(index.lists, dtype=np.uint8)
        assert len(data) * 8 < 2**31, (
            "device block engine limit: 256MB per resident stream (i32 bit "
            "cursors); shard larger indexes by doc range across devices "
            "with parallel.DocShardedEngine"
        )
        pad = (-len(data)) % 4
        words = np.concatenate([data, np.zeros(pad + 8, np.uint8)]).view("<u4")
        w = jnp.asarray(words.astype(np.uint32))
        self.docs_words = w
        self.freqs_words = w
        return t

    # -- host batch layout ----------------------------------------------------

    def _prep_terms(self, queries, ranked):
        tf = [query_freqs(t) for t in queries]
        counts = np.array([len(x) for x in tf], dtype=np.int64)
        terms = np.array([t for q in tf for t, _ in q], dtype=np.int64)
        qmult = np.array([m for q in tf for _, m in q], dtype=np.int64)
        if ranked and len(terms):
            src = self.query_dfs if self.query_dfs is not None else self.list_n
            dfs = src[terms].astype(_F32)
            N = _F32(self.num_docs)
            idf = np.log((N - dfs + _F32(0.5)) / (dfs + _F32(0.5))).astype(_F32)
            qw = qmult.astype(_F32) * np.maximum(_F32(1e-6), idf) * (_F32(1.0) + BM25.k1)
        else:
            qw = np.ones(len(terms), dtype=_F32)
        if self.term_remap is not None and len(terms):
            terms = self.term_remap[terms]  # -1: no postings in this index
        return terms, qw, counts

    def _term_tiles(self, terms):
        """(tile_start, tile_count) per term; remapped -1 terms own none."""
        t = np.clip(terms, 0, None)
        missing = terms < 0
        return (
            np.where(missing, 0, self.list_tile_start[t]),
            np.where(missing, 0, self.list_tiles[t]),
        )

    def _term_blocks(self, terms):
        return np.where(terms < 0, 0, self.list_blocks[np.clip(terms, 0, None)])

    def _order_groups(self, utidx, tile_gid, statics_list):
        """Group-major ordering of the part's tiles for one decode pass.
        Returns (groups, gtile_ids, tblk, sent_blk, total_blocks)."""
        ntiles = len(utidx)
        bkey = tile_gid[utidx] if ntiles else np.zeros(0, np.int64)
        order = np.argsort(bkey, kind="stable")
        sk = bkey[order]
        bnd = (np.nonzero(np.diff(sk))[0] + 1) if ntiles else np.zeros(0, np.int64)
        gstarts = np.concatenate([[0], bnd, [ntiles]]).astype(np.int64)

        groups = []
        tblk = np.zeros(ntiles, dtype=np.int64)  # first block of each utile
        gids_parts = []
        off = 0
        gblk = 0
        ngroups = len(gstarts) - 1
        sent_blk = 0
        for gi in range(ngroups):
            lo_i, hi_i = int(gstarts[gi]), int(gstarts[gi + 1])
            if hi_i <= lo_i:
                continue
            sel = order[lo_i:hi_i]
            cnt = hi_i - lo_i
            st = statics_list[int(bkey[sel[0]])]
            T = st[-1]
            bpt = max(T // BLOCK, 1)
            # last group gets one guaranteed pad row (the sentinel block)
            R = _pow2_at_least(cnt + (1 if gi == ngroups - 1 else 0), lo=8)
            ids = np.full(R, self.pad_tile, dtype=_I32)
            ids[:cnt] = utidx[sel]
            tblk[sel] = gblk + np.arange(cnt) * bpt
            groups.append((off, R, st))
            gids_parts.append(ids)
            sent_blk = gblk + cnt * bpt  # first pad row's block (last group)
            off += R
            gblk += R * bpt
        if not groups:
            groups = [(0, 8, self._empty_statics)]
            gids_parts = [np.full(8, self.pad_tile, dtype=_I32)]
            gblk = 8 * max(self._empty_statics[-1] // BLOCK, 1)
            sent_blk = 0
        gtile_ids = np.concatenate(gids_parts)
        return tuple(groups), gtile_ids, tblk, sent_blk, gblk

    def _part_plan(self, terms, qw, counts, k, ops, tmax, qids):
        """Layout for one part: group-major unique-tile ids + per-bucket
        block directories. All numpy, no device work."""
        B = len(counts)

        uterms, uinv = (
            np.unique(terms, return_inverse=True) if len(terms) else
            (np.zeros(0, np.int64), np.zeros(0, np.int64))
        )

        # --- unique-term tile expansion (CSR)
        tstarts, tcounts = self._term_tiles(uterms)
        ntiles = int(tcounts.sum())
        if ntiles:
            excl = np.cumsum(tcounts) - tcounts
            utidx = np.repeat(tstarts - excl, tcounts) + np.arange(ntiles, dtype=np.int64)
        else:
            utidx = np.zeros(0, dtype=np.int64)

        # --- group by decode class, group-major row ids (per stream when the
        # index's codecs differ between docs and freqs: see _order_groups)
        groups, gtile_ids, tblk, sent_blk, nb_d = self._order_groups(
            utidx, self.tile_gid_d if self.split else self.tile_gid,
            self.group_statics_d if self.split else self.group_statics,
        )
        if self.split:
            groups_f, gtile_f, tblk_f, sent_f, _ = self._order_groups(
                utidx, self.tile_gid_f, self.group_statics_f
            )
            blkperm = np.full(nb_d, sent_f, dtype=_I32)
            if ntiles:
                bpt = self.tile_blocks[utidx]
                tot_b = int(bpt.sum())
                bex = np.cumsum(bpt) - bpt
                blkperm[np.repeat(tblk - bex, bpt) + np.arange(tot_b, dtype=np.int64)] = (
                    np.repeat(tblk_f - bex, bpt) + np.arange(tot_b, dtype=np.int64)
                )
        else:
            groups_f = ()
            gtile_f = np.zeros(1, dtype=_I32)
            blkperm = np.zeros(1, dtype=_I32)

        # --- per-unique-term block lists (group-major block ids, tile order)
        nbt = self.tile_blocks[utidx]  # blocks of each utile
        tot_blk = int(nbt.sum())
        if tot_blk:
            bexcl = np.cumsum(nbt) - nbt
            # block b of utile i -> tblk[i] + b
            ublocks = (
                np.repeat(tblk - bexcl, nbt) + np.arange(tot_blk, dtype=np.int64)
            )
        else:
            ublocks = np.zeros(0, dtype=np.int64)
        # CSR over unique terms (utidx is unique-major, so ublocks is too)
        unb = self._term_blocks(uterms)
        ustart = np.concatenate([[0], np.cumsum(unb)])

        # --- per-query block directory
        span_nb = unb[uinv] if len(terms) else np.zeros(0, np.int64)
        row_nb = np.zeros(B, dtype=np.int64)
        span_row = np.repeat(np.arange(B), counts)
        np.add.at(row_nb, span_row, span_nb)
        min_l = max(self.MIN_L, _pow2_at_least(k))
        Lrow = np.maximum(row_nb * BLOCK, 1)
        Lb = (2 ** np.ceil(np.log2(np.maximum(Lrow, min_l)))).astype(np.int64)

        # expand each span's blocks, query-major
        tot = int(span_nb.sum())
        sexcl = np.cumsum(counts) - counts  # span slot within row
        slot_of_span = np.arange(len(span_nb), dtype=np.int64) - sexcl[span_row]
        if tot:
            bexcl2 = np.cumsum(span_nb) - span_nb
            span_of_blk = np.repeat(np.arange(len(span_nb)), span_nb)
            blk_flat = ublocks[
                np.repeat(ustart[uinv] - bexcl2, span_nb) + np.arange(tot, dtype=np.int64)
            ]
            dir_flat = (blk_flat << 5) | slot_of_span[span_of_blk]
            row_of_blk = span_row[span_of_blk]
            # column of each block within its row
            rexcl = np.zeros(B + 1, dtype=np.int64)
            rexcl[1:] = np.cumsum(row_nb)
            col_of_blk = np.arange(tot, dtype=np.int64) - rexcl[row_of_blk]
        else:
            dir_flat = row_of_blk = col_of_blk = np.zeros(0, np.int64)

        # --- bucket the queries by Lb
        plan_buckets = []
        ubl = np.unique(Lb)
        bucket_of_row = np.zeros(B, dtype=np.int64)
        row_in_bucket = np.zeros(B, dtype=np.int64)
        for bi, L in enumerate(ubl):
            rows = np.nonzero(Lb == L)[0]
            bucket_of_row[rows] = bi
            row_in_bucket[rows] = np.arange(len(rows))
            Bb = _pow2_at_least(len(rows), lo=1)
            nr = len(rows)
            bdir = np.full((nr, int(L) // BLOCK), sent_blk << 5, dtype=_I32)
            qwtab = np.zeros((nr, tmax), dtype=_F32)
            tgt = counts[rows].astype(_I32)
            plan_buckets.append(
                {"L": int(L), "Bb": Bb, "rows": qids[rows], "dir": bdir, "qwtab": qwtab, "tgt": tgt}
            )
        if len(terms):
            b_of_span = bucket_of_row[span_row]
            r_of_span = row_in_bucket[span_row]
            for bi, pb in enumerate(plan_buckets):
                m = b_of_span == bi
                pb["qwtab"][r_of_span[m], slot_of_span[m]] = qw[m]
        if tot:
            b_of = bucket_of_row[row_of_blk]
            r_of = row_in_bucket[row_of_blk]
            for bi, pb in enumerate(plan_buckets):
                m = b_of == bi
                pb["dir"][r_of[m], col_of_blk[m]] = dir_flat[m]

        # f16 download scaling: find a power of two putting every possible
        # finite score in f16's normal range [~6.1e-5, 65504); None -> f32.
        fscale = 1.0
        pos = qw[qw > 0]
        if len(pos):
            import math

            min_s = float(pos.min()) * self._wmin  # >= any finite score's floor
            row_qwsum = np.zeros(B, dtype=np.float64)
            np.add.at(row_qwsum, span_row, qw.astype(np.float64))
            max_s = float(row_qwsum.max())  # >= any score (w < 1)
            lo, hi = 6.2e-5, 6.0e4  # normal-f16 window with margin
            if min_s > 0 and max_s / min_s <= hi / lo:
                kmin = math.ceil(math.log2(lo / min_s))
                if max_s * 2.0**kmin <= hi:
                    fscale = 2.0**kmin
                else:
                    fscale = None
            else:
                fscale = None

        return {
            "fscale": fscale,
            "gtile_ids": gtile_ids,
            "gtile_f": gtile_f,
            "blkperm": blkperm,
            "groups": tuple(groups),
            "groups_f": tuple(groups_f),
            "buckets": plan_buckets,
            "sent_dir": int(sent_blk << 5),
            "k": k,
            "ops": ops,
            "tmax": tmax,
        }

    def prepare(self, queries, k=10, ops=("or", "and"), ranked=True):
        """Parse + lay out the batch (host only). The returned plan is the
        analogue of queries.cpp's pre-parsed query vector."""
        terms, qw, counts = self._prep_terms(queries, ranked)
        qend = np.cumsum(counts)
        qstart = qend - counts
        tmax = _pow2_at_least(int(counts.max()) if len(counts) else 1, lo=2)
        if tmax > 32:
            raise ValueError("ResidentEngine supports at most 32 unique terms per query")

        # part splitting by bucketed slot budget
        qslots = np.zeros(len(queries), dtype=np.int64)
        if len(terms):
            nb = self._term_blocks(terms)
            np.add.at(qslots, np.repeat(np.arange(len(queries)), counts), nb * BLOCK)
        qslots = np.maximum(2 ** np.ceil(np.log2(np.maximum(qslots, self.MIN_L))).astype(np.int64), self.MIN_L)

        parts = []
        cur0, cur_slots = 0, 0
        for qi in range(len(queries)):
            if qi > cur0 and (
                cur_slots + qslots[qi] > self.max_part_slots
                or qi - cur0 >= self.max_part_queries
            ):
                parts.append((cur0, qi))
                cur0, cur_slots = qi, 0
            cur_slots += qslots[qi]
        parts.append((cur0, len(queries)))

        plans = []
        for q0, q1 in parts:
            if q1 <= q0:
                continue
            s0, s1 = qstart[q0], qend[q1 - 1]
            plans.append(
                self._part_plan(
                    terms[s0:s1], qw[s0:s1], counts[q0:q1], k, tuple(ops), tmax,
                    qids=np.arange(q0, q1),
                )
            )
        return {"plans": plans, "n": len(queries), "k": k, "ops": tuple(ops)}

    def execute(self, plan):
        """Upload per-part layouts, dispatch, download results. One device
        round trip per part, pipelined.

        A plan's layout arrays are pinned on device on first execution and
        reused by later executions of the SAME plan — the analogue of
        queries.cpp parsing stdin into a vector once and replaying it
        across op_perftest runs (queries.cpp:25-60,124-138). Postings are
        still decoded from the compressed index on every execution."""
        return self.collect(plan, self.dispatch(plan))

    def dispatch(self, plan):
        """Enqueue every part's device step WITHOUT downloading results
        (jax dispatch is async). Callers coordinating several engines
        (parallel.DocShardedEngine) dispatch all of them before any
        collect so the devices overlap."""
        import os as _os
        import time as _time

        debug = _os.environ.get("DS2I_ENGINE_DEBUG")
        t0 = _time.time()
        ranked_ops = any(
            ("or" in p["ops"]) or ("and" in p["ops"]) for p in plan["plans"]
        )
        normcache = self.normcache if ranked_ops else 0
        if normcache:
            self._ensure_norm_cache()
        pending = []
        for pi, p in enumerate(plan["plans"]):
            bb = p["buckets"]
            if self._replicas:
                dev = self.devices[pi % len(self.devices)]
                dw, fw, td, tf, nlr = self._replicas[pi % len(self.devices)]
                nlb, tg0 = (
                    self._norm_replicas[pi % len(self.devices)]
                    if normcache else (None, None)
                )
                put = lambda a: jax.device_put(jnp.asarray(a), dev)
            else:
                dw, fw, td, tf, nlr = (
                    self.docs_words, self.freqs_words, self.tiles_docs,
                    self.tiles_freqs, self.norm_lens,
                )
                nlb, tg0 = (self.nl_blocks, self.tile_gblk0) if normcache else (None, None)
                put = jnp.asarray
            dk = pi % len(self.devices) if self._replicas else 0
            cache = p.setdefault("_dev", {})
            if dk not in cache:
                cache[dk] = (
                    put(p["gtile_ids"]),
                    put(p["gtile_f"]),
                    put(p["blkperm"]),
                    tuple(put(b["dir"]) for b in bb),
                    tuple(put(b["qwtab"]) for b in bb),
                    tuple(put(b["tgt"]) for b in bb),
                )
            d_gt, d_gf, d_bp, d_dir, d_qw, d_tgt = cache[dk]
            out = _resident_step(
                dw,
                fw,
                td,
                tf,
                nlr,
                d_gt,
                d_gf,
                d_bp,
                d_dir,
                d_qw,
                d_tgt,
                groups=p["groups"],
                groups_f=p["groups_f"],
                buckets=tuple((b["Bb"], b["L"], len(b["rows"])) for b in bb),
                sent_dir=p["sent_dir"],
                num_docs=self.num_docs,
                k=p["k"],
                ops=p["ops"],
                tmax=p["tmax"],
                pallas=self.pallas,
                fetch16=int(
                    "counts" not in p["ops"]
                    and p["fscale"] is not None
                    and not _os.environ.get("DS2I_FETCH_F32")
                ),
                fscale=jnp.float32(p["fscale"]) if p["fscale"] is not None else None,
                normcache=normcache,
                nl_blocks=nlb,
                tile_gblk0=tg0,
            )
            pending.append((p, out))
        if not _os.environ.get("DS2I_ENGINE_NOFETCH"):  # keep compute-only timing clean
            for _, out in pending:
                # start device->host transfers as soon as each part's compute
                # finishes, overlapping with later parts' compute
                try:
                    out.copy_to_host_async()
                except AttributeError:
                    break
        if debug:
            print(f"[resident] dispatch={(_time.time()-t0)*1e3:.0f}ms", flush=True)
        return pending

    def collect(self, plan, pending):
        """Download + unpack the results of a dispatch()."""
        import os as _os
        import time as _time

        debug = _os.environ.get("DS2I_ENGINE_DEBUG")
        if _os.environ.get("DS2I_ENGINE_NOFETCH"):
            t0 = _time.time()
            for p, out in pending:
                _ = np.asarray(out[:1, :1])  # force compute, skip download
            print(f"[resident] compute-only: {(_time.time()-t0)*1e3:.0f}ms", flush=True)
        results = [None] * plan["n"]
        t_fetch = t_unpack = 0.0
        for p, out in pending:
            tf = _time.time()
            packed = np.asarray(out)  # one transfer per part
            if packed.dtype == np.float16:
                packed = packed.astype(np.float32) / np.float32(p["fscale"])
            t_fetch += _time.time() - tf
            tf = _time.time()
            ops = p["ops"]
            off = 0
            c0 = 2 if "counts" in ops else 0
            c_or = c0 + (p["k"] if "or" in ops else 0)
            for b in p["buckets"]:
                rows = packed[off : off + len(b["rows"])]
                off += len(b["rows"])
                for local, qi in enumerate(b["rows"]):
                    r = rows[local]
                    results[qi] = (
                        int(r[0]) if c0 else 0,
                        int(r[1]) if c0 else 0,
                        r[c0:c_or] if "or" in ops else None,
                        r[c_or : c_or + p["k"]] if "and" in ops else None,
                    )
            t_unpack += _time.time() - tf
        if debug:
            print(
                f"[resident] parts={len(pending)} "
                f"fetch={t_fetch*1e3:.0f}ms unpack={t_unpack*1e3:.0f}ms",
                flush=True,
            )
        return results

    def run(self, queries, k=10, ops=("or", "and"), ranked=True):
        return self.execute(self.prepare(queries, k=k, ops=ops, ranked=ranked))

    # -- public ops (API-compatible with TileQueryEngine) ----------------------

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
