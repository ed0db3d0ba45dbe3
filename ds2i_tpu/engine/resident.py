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
from .tiles import (
    F_BASE, F_NVALS, F_PREV_CUM, N_FIELDS, TILE, TileTables, build_tile_tables,
)

_F32 = np.float32
_I32 = np.int32
BLOCK = 32
BPT = TILE // BLOCK  # blocks per tile
NEG_INF = float("-inf")


def _concat_collection(collection):
    """Concatenate a collection's postings list-major: returns
    (docs_all, freqs_all, list_n) int64 arrays. Vectorized for
    BinaryFreqCollection (one fancy-index per memmapped stream, no
    per-list Python work at scale); any iterable of (docs, freqs)
    pairs works as a fallback."""
    docs_obj = getattr(collection, "docs", None)
    freqs_obj = getattr(collection, "freqs", None)
    if docs_obj is not None and hasattr(docs_obj, "offsets"):
        def flat(bc, skip_first=False):
            offs = bc.offsets()[1:] if skip_first else bc.offsets()
            starts = np.fromiter((p for p, _ in offs), dtype=np.int64, count=len(offs))
            lens = np.fromiter((n for _, n in offs), dtype=np.int64, count=len(offs))
            tot = int(lens.sum())
            ex = np.cumsum(lens) - lens
            idx = np.repeat(starts - ex, lens) + np.arange(tot, dtype=np.int64)
            return np.asarray(bc.data[idx], dtype=np.int64), lens

        docs_all, dl = flat(docs_obj, skip_first=True)
        freqs_all, fl = flat(freqs_obj)
        if not np.array_equal(dl, fl):
            raise ValueError("docs/freqs sequence lengths differ")
        return docs_all, freqs_all, dl
    ds, fs, ln = [], [], []
    for docs, freqs in collection:
        ds.append(np.asarray(docs, dtype=np.int64))
        fs.append(np.asarray(freqs, dtype=np.int64))
        ln.append(len(ds[-1]))
    if not ds:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return np.concatenate(ds), np.concatenate(fs), np.array(ln, dtype=np.int64)


def _pow2_at_least(x, lo=1):
    v = lo
    while v < int(x):
        v *= 2
    return v


def _decode_block_stream(words, fld, st, R, is_docs, num_docs):
    """Decode one stream of one block group. st = ("opt", b, E, T) |
    ("optp", b, E, T) (resident exception patch tables — default for
    block indexes since round 5) | ("var", G, T) | ("qmx", NI, S, T) |
    ("interp", W, T). Returns (R, T) doc ids (docs) or raw freqs
    (freqs); pads NOT yet masked."""
    from .block_tiles import (
        BF_B, BF_BOFF, BF_EX_BASE, BF_EX_BOFF, BF_EX_W0, BF_NEX, BF_W0,
    )

    sk, T = st[0], st[-1]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    # TIMING DIAGNOSTIC ONLY (results wrong where blocks have
    # exceptions): DS2I_DECODE_NOEX=1 forces the OptPFor exception
    # capacity to 0, isolating the exception path's share of decode
    # time. Never a default; ResidentEngine.__init__ warns loudly when
    # it is set. See docs/PERF.md round-4 decode breakdown.
    import os as _os

    _noex = _os.environ.get("DS2I_DECODE_NOEX") == "1"
    if sk == "opt":
        b = st[1]
        ws = (31 + T * min(b, 32)) // 32 + 1
        raw = optpfor_decode(
            words, fld[:, BF_W0], fld[:, BF_BOFF], fld[:, BF_B], fld[:, BF_NEX],
            fld[:, BF_EX_W0], fld[:, BF_EX_BOFF], WS=ws,
            E=0 if _noex else st[2], T=T, b_static=b,
        )
    elif sk == "optp":
        # resident exception patch tables: the Simple16 exception
        # streams were decoded once at engine init into (position,
        # high<<b) pairs appended to the resident stream
        # (block_tiles.build_exception_patches); BF_EX_BASE carries each
        # row's first patch-pair word. Bit-identical to "opt" (tested).
        b = st[1]
        ws = (31 + T * min(b, 32)) // 32 + 1
        raw = optpfor_decode(
            words, fld[:, BF_W0], fld[:, BF_BOFF], fld[:, BF_B], fld[:, BF_NEX],
            fld[:, BF_EX_BASE], fld[:, BF_EX_BOFF], WS=ws,
            E=0 if _noex else st[2], T=T, b_static=b, ex_patch=True,
        )
    elif sk == "var":
        raw = varint_decode(
            words, fld[:, BF_W0], fld[:, BF_BOFF], fld[:, BF_B], G=st[1], T=T
        )
    elif sk == "qmx":
        raw = qmx_decode(
            words, fld[:, BF_W0], fld[:, BF_BOFF], fld[:, BF_B],
            fld[:, BF_EX_W0], fld[:, BF_EX_BOFF], fld[:, BF_NEX],
            NI=st[1], S=st[2], T=T,
        )
    elif sk == "interp":
        nw = words.shape[0]
        W = st[1]
        widx = fld[:, BF_W0][:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        win = words[jnp.clip(widx, 0, nw - 1)]
        cum = interp_decode(
            win, fld[:, BF_BOFF], fld[:, F_NVALS], fld[:, BF_EX_W0],
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
    query step's split mode, the unfused per-group step, and the
    norm-cache init so the paths cannot diverge."""
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


def _decode_freq_group_blocks(freqs_words, ff, st, R):
    """One decode group's raw freqs as masked, padded 32-slot block rows
    (split mode). Shared by the fused decode (_decode_weight_blocks) and
    the unfused per-group step so the two cannot diverge."""
    T = st[-1]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = j < ff[:, F_NVALS][:, None]
    fv = jnp.where(valid, _decode_block_stream(freqs_words, ff, st, R, False, 0), 0)
    if T < BLOCK:
        fv = jnp.pad(fv, ((0, 0), (0, BLOCK - T)))
    return fv.reshape(R * max(T // BLOCK, 1), BLOCK)


def _decode_pair_blocks(docs_words, freqs_words, df, ff, st, R, num_docs):
    """One EF-family group's (docids, raw freqs) as 32-slot block rows
    (pair mode: both streams share the group layout; F_PREV_CUM carries
    the prefix-sum preceding the tile). Shared by the fused decode and
    the unfused per-group step."""
    T = st[-1]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid = j < df[:, F_NVALS][:, None]
    dv = _decode_group(docs_words, df, st[1], st[2], T)
    fv = _decode_group(freqs_words, ff, st[1], st[2], T)
    doc = jnp.where(valid, dv, num_docs)
    prev = jnp.concatenate([ff[:, F_PREV_CUM][:, None], fv[:, :-1]], axis=1)
    freq = jnp.where(valid, fv - prev, 0).astype(jnp.float32)
    return doc.reshape(R * (T // BLOCK), BLOCK), freq.reshape(R * (T // BLOCK), BLOCK)


@partial(jax.jit, static_argnames=("groups", "num_docs", "split"))
def _norm_cache_step(docs_words, tiles_docs, norm_den, gtile_ids, groups, num_docs, split):
    """One-time decode of EVERY tile's docids -> per-slot BM25
    denominators, (total_blocks, 32) f32 in the canonical group-major
    block order.

    The per-posting denominator gather is the engine's largest kernel
    cost (it runs at the chip's random-gather rate, see docs/PERF.md);
    tiles are static, so the gather result is too. This materializes it
    once at init — the reference keeps norm_lens as an uncompressed
    per-doc side table (wand_data.hpp:20-53); this is that same side
    table reorganized posting-aligned (k1*(1-b+b*norm_len) precomputed),
    4 bytes per posting of HBM."""
    blocks = [
        _decode_doc_group_blocks(docs_words, tiles_docs[gtile_ids[off : off + R]], st, R, num_docs, split)
        for off, R, st in groups
    ]
    d = jnp.concatenate(blocks, axis=0)
    return norm_den[jnp.clip(d, 0, num_docs - 1)]


def _cached_den_rows(den_blocks, tile_gblk0, ids, T):
    """BM25-denominator rows for one decode group: a contiguous row gather
    from the init-time cache (rows of tile t live at
    [tile_gblk0[t], +T//32) in den_blocks)."""
    bpt = max(T // BLOCK, 1)
    idx = tile_gblk0[ids][:, None] + jnp.arange(bpt, dtype=jnp.int32)[None, :]
    return jnp.take(den_blocks, idx.reshape(-1), axis=0)  # (R*bpt, 32)


def _decode_weight_blocks(
    docs_words, freqs_words, tiles_docs, tiles_freqs, norm_den,
    gtile_ids, gtile_ids_f, blkperm, groups, groups_f, num_docs,
    ranked, pallas=0, normcache=0, den_blocks=None, tile_gblk0=None,
    raw=False,
):
    """Decode every tile of the part into 32-slot block rows: returns
    (docs32, w32) — (total_blocks, 32) docids (pads carry num_docs) and
    doc-term weights (ranked) or 1.0 presence flags. With raw=True the
    second plane is instead the raw frequencies as f32 (pads 0) so the
    caller can evaluate weights in a separate, shape-canonical
    executable (see _slots_weight_step). Shared by the query step and
    the block-max metadata pass so they cannot diverge."""
    if groups_f:
        # SPLIT mode (block indexes): each stream decodes in its own
        # group-major order; freq blocks realign to docs order by one
        # contiguous block-row gather.
        d_blocks, f_blocks, den_rows = [], [], []
        for off, R, st in groups:
            ids = gtile_ids[off : off + R]
            d_blocks.append(
                _decode_doc_group_blocks(docs_words, tiles_docs[ids], st, R, num_docs, split=True)
            )
            if ranked and normcache:
                den_rows.append(_cached_den_rows(den_blocks, tile_gblk0, ids, st[-1]))
        for off, R, st in groups_f:
            ids = gtile_ids_f[off : off + R]
            f_blocks.append(
                _decode_freq_group_blocks(freqs_words, tiles_freqs[ids], st, R)
            )
        docs32 = jnp.concatenate(d_blocks, axis=0)
        freq32 = jnp.take(jnp.concatenate(f_blocks, axis=0), blkperm, axis=0)
        freq32 = freq32.astype(jnp.float32)
        if raw:
            return docs32.astype(jnp.int32), freq32
        if ranked:
            if normcache:
                den = jnp.concatenate(den_rows, axis=0)
            else:
                den = norm_den[jnp.clip(docs32, 0, num_docs - 1)]
            # one f32 add + one f32 divide: no multiply, so no backend can
            # FMA-contract — bit-identical to the host numpy expression in
            # build_blockmax (the denominator is precomputed per doc)
            w = freq32 / (freq32 + den)
            w = jnp.where(docs32 < num_docs, w, 0.0)
        else:
            w = jnp.where(docs32 < num_docs, 1.0, 0.0)
        return docs32, w

    # PAIR mode (EF family): both streams share the group layout
    docs_blocks, w_blocks = [], []
    for off, R, st in groups:
        T = st[-1]
        ids = gtile_ids[off : off + R]
        df = tiles_docs[ids]
        ff = tiles_freqs[ids]
        if pallas:
            d_rt, freq_i = pallas_decode.decode_pair(
                docs_words, freqs_words, df, ff, st[1], st[2], T, num_docs,
                interpret=(pallas == 2),
            )
            doc = d_rt.reshape(R * (T // BLOCK), BLOCK)
            freq = freq_i.astype(jnp.float32).reshape(R * (T // BLOCK), BLOCK)
        else:
            doc, freq = _decode_pair_blocks(
                docs_words, freqs_words, df, ff, st, R, num_docs)
        if raw:
            w = freq
        elif ranked:
            if normcache:
                den = _cached_den_rows(den_blocks, tile_gblk0, ids, T)
            else:
                den = norm_den[jnp.clip(doc, 0, num_docs - 1)]
            w = freq / (freq + den)  # add+div only, see SPLIT branch note
        else:
            w = jnp.where(doc < num_docs, 1.0, 0.0)
        docs_blocks.append(doc)
        w_blocks.append(w)
    docs32 = jnp.concatenate(docs_blocks, axis=0)
    if raw:
        docs32 = docs32.astype(jnp.int32)
    return docs32, jnp.concatenate(w_blocks, axis=0)


@partial(jax.jit, static_argnames=("groups", "groups_f", "num_docs", "pallas"))
def _decode_slots_step(
    docs_words, freqs_words, tiles_docs, tiles_freqs,
    gtile_ids, gtile_ids_f, blkperm, groups, groups_f, num_docs, pallas=0,
):
    """One decode call over a run of tiles -> raw 32-slot planes
    (docs32 i32, freq32 f32, dmax, dmin) in group-major block order, for
    the block-max metadata pass. The WEIGHT evaluation deliberately
    lives in a separate, shape-canonical executable
    (_slots_weight_step) shared with the build-time artifact pass:
    XLA's f32 divide codegen varies with fusion context, so evaluating
    weights inside two differently-fused programs produced
    1-ulp-different block maxima (observed on XLA-CPU, 16/572 blocks).
    One shared executable makes the two artifacts byte-identical by
    construction."""
    docs32, freq32 = _decode_weight_blocks(
        docs_words, freqs_words, tiles_docs, tiles_freqs, None,
        gtile_ids, gtile_ids_f, blkperm, groups, groups_f, num_docs,
        ranked=False, pallas=pallas, raw=True,
    )
    dmax = jnp.where(docs32 < num_docs, docs32, -1).max(axis=1)
    dmin = docs32[:, 0]  # slot 0 is the block's first (smallest) docid
    return docs32, freq32, dmax, dmin


@partial(jax.jit, static_argnames=("num_docs",))
def _slots_weight_step(doc32, freq32, norm_den, num_docs):
    """THE block-max weight evaluator — per-32-block max doc-term weight
    (the metadata behind device-side WAND/MaxScore pruning; the
    reference keeps only LIST-level maxes, wand_data.hpp:20-53) plus the
    full weight plane for short-list posting-exact bounds. Both metadata
    passes (_ensure_blockmax's tile decode and build_blockmax's
    collection upload) MUST evaluate weights through this one function
    at the canonical _bm_chunk_rows shape: the divide must run on the
    same backend as serving (XLA lowers f32 divide via reciprocal +
    refinement, 1 ulp off IEEE numpy on ~half of all values), and even
    on-device the divide's codegen varies with fusion context, so only
    a single shared executable guarantees byte-identical artifacts."""
    den = norm_den[jnp.clip(doc32, 0, num_docs - 1)]
    w = freq32 / (freq32 + den)
    w = jnp.where(doc32 < num_docs, w, 0.0)
    return w.max(axis=1), w


@jax.jit
def _take_rows(a, rows):
    """Row gather used to download short-list slot planes (exact)."""
    return jnp.take(a, rows, axis=0)


def _bm_chunk_rows(max_part_slots, total):
    """Canonical row-chunk size of the block-max weight evaluation.
    MUST be a pure function of (engine slot budget, total blocks) so the
    decode pass and the build-time artifact pass feed identical shapes
    to _slots_weight_step — same shapes = same compiled executable =
    bitwise-equal weights."""
    budget = max(min(int(max_part_slots), 1 << 25), 1 << 12)
    return min(max(budget // BLOCK, 1), _pow2_at_least(max(total, 1)))


@partial(
    jax.jit,
    static_argnames=("groups", "groups_f", "num_docs", "ranked", "pallas", "normcache"),
)
def _decode_part(
    docs_words, freqs_words, tiles_docs, tiles_freqs, norm_den,
    gtile_ids, gtile_ids_f, blkperm, groups, groups_f, num_docs,
    ranked, pallas=0, normcache=0, den_blocks=None, tile_gblk0=None,
):
    """Decode stage, jitted alone. The decoded slot tables pad to a
    power-of-two row count so the downstream join kernels — keyed only on
    (table rows, bucket shape, ops) — get compile-cache hits across
    parts, plans, and even engines; the monolithic per-part step used to
    recompile the whole pipeline for every new part layout."""
    docs32, w32 = _decode_weight_blocks(
        docs_words, freqs_words, tiles_docs, tiles_freqs, norm_den,
        gtile_ids, gtile_ids_f, blkperm, groups, groups_f, num_docs,
        ranked=ranked, pallas=pallas, normcache=normcache,
        den_blocks=den_blocks, tile_gblk0=tile_gblk0,
    )
    rows = docs32.shape[0]
    rp = _pow2_at_least(rows)
    if rp > rows:
        docs32 = jnp.pad(docs32, ((0, rp - rows), (0, 0)), constant_values=num_docs)
        w32 = jnp.pad(w32, ((0, rp - rows), (0, 0)))
    return docs32, w32


# -- unfused decode: per-GROUP executables ---------------------------------
#
# _decode_part's compile key is the ENTIRE group layout tuple, so every
# distinct plan layout compiles a fresh monolithic decode executable —
# the dominant cold-start cost at 50x (docs/PERF.md round-4: first
# pruned layout 3963 s, almost all theta-probe decode compiles). The
# unfused path compiles one small executable PER GROUP, keyed only on
# (R, statics): shapes recur heavily across plans/parts (the
# quarter-pow2 ladder quantizes R), so a new plan mostly hits cache.
# One extra dispatch per group + one concat/assemble dispatch per part;
# used for one-shot plans (the prepare-time probe) by default and for
# serving with DS2I_DECODE_FUSED=0.


@partial(jax.jit, static_argnames=("st", "num_docs", "split"))
def _decode_docs_group_step(docs_words, tiles_docs, ids, st, num_docs, split):
    if not split:
        raise NotImplementedError  # pair mode decodes docs+freqs together
    return _decode_doc_group_blocks(
        docs_words, tiles_docs[ids], st, ids.shape[0], num_docs, split=True)


@partial(jax.jit, static_argnames=("st",))
def _decode_freqs_group_step(freqs_words, tiles_freqs, ids, st):
    return _decode_freq_group_blocks(
        freqs_words, tiles_freqs[ids], st, ids.shape[0])


@partial(jax.jit, static_argnames=("st", "num_docs"))
def _decode_pair_group_step(docs_words, freqs_words, tiles_docs, tiles_freqs,
                            ids, st, num_docs):
    return _decode_pair_blocks(
        docs_words, freqs_words, tiles_docs[ids], tiles_freqs[ids], st,
        ids.shape[0], num_docs)


@partial(jax.jit, static_argnames=("T",))
def _den_rows_group_step(den_blocks, tile_gblk0, ids, T):
    return _cached_den_rows(den_blocks, tile_gblk0, ids, T)


@partial(jax.jit, static_argnames=("num_docs", "rp", "perm", "normc"))
def _assemble_part(d_parts, f_parts, den_parts, blkperm, norm_den, num_docs,
                   rp, perm, normc):
    """Concat per-group planes, realign freqs (split mode), evaluate
    weights, pad to the pow2 row count — the tail of _decode_part as one
    cheap elementwise/gather executable (compile keyed on totals)."""
    docs32 = jnp.concatenate(d_parts, axis=0) if len(d_parts) > 1 else d_parts[0]
    freq32 = jnp.concatenate(f_parts, axis=0) if len(f_parts) > 1 else f_parts[0]
    if perm:
        freq32 = jnp.take(freq32, blkperm, axis=0)
    freq32 = freq32.astype(jnp.float32)
    if normc:
        den = (jnp.concatenate(den_parts, axis=0)
               if len(den_parts) > 1 else den_parts[0])
        den = den.reshape(docs32.shape)
    else:
        den = norm_den[jnp.clip(docs32, 0, num_docs - 1)]
    w = freq32 / (freq32 + den)  # add+div only, see _decode_weight_blocks
    w = jnp.where(docs32 < num_docs, w, 0.0)
    rows = docs32.shape[0]
    if rp > rows:
        docs32 = jnp.pad(docs32, ((0, rp - rows), (0, 0)), constant_values=num_docs)
        w = jnp.pad(w, ((0, rp - rows), (0, 0)))
    return docs32.astype(jnp.int32), w


def _decode_part_unfused(
    docs_words, freqs_words, tiles_docs, tiles_freqs, norm_den,
    gid_parts, gid_f_parts, blkperm, groups, groups_f, num_docs,
    normcache=0, den_blocks=None, tile_gblk0=None,
):
    """Python orchestration of the per-group decode (ranked only — the
    probe/one-shot path always scores). gid_parts: per-group id arrays
    (docs order); gid_f_parts: freqs order (split mode)."""
    d_parts, f_parts, den_parts = [], [], []
    if groups_f:
        for (off, R, st), ids in zip(groups, gid_parts):
            d_parts.append(_decode_docs_group_step(
                docs_words, tiles_docs, ids, st, num_docs, True))
            if normcache:
                den_parts.append(_den_rows_group_step(
                    den_blocks, tile_gblk0, ids, st[-1]))
        for (off, R, st), ids in zip(groups_f, gid_f_parts):
            f_parts.append(_decode_freqs_group_step(
                freqs_words, tiles_freqs, ids, st))
        perm = True
    else:
        for (off, R, st), ids in zip(groups, gid_parts):
            d, f = _decode_pair_group_step(
                docs_words, freqs_words, tiles_docs, tiles_freqs, ids, st,
                num_docs)
            d_parts.append(d)
            f_parts.append(f)
            if normcache:
                den_parts.append(_den_rows_group_step(
                    den_blocks, tile_gblk0, ids, st[-1]))
        perm = False
    rows = sum(int(x.shape[0]) for x in d_parts)
    return _assemble_part(
        tuple(d_parts), tuple(f_parts), tuple(den_parts) if normcache else (),
        blkperm, norm_den, num_docs, rp=_pow2_at_least(rows), perm=perm,
        normc=int(bool(normcache)),
    )


@partial(jax.jit, static_argnames=("num_docs", "k", "ops", "tmax"))
def _join_bucket(docs32, w32, bdir, qwtab, tgtv, num_docs, k, ops, tmax):
    """Join/score/top-k for one query bucket (all Bb rows, including the
    sentinel-padded tail — dropped later by _pack_rows' gather)."""
    Bb, nb_row = bdir.shape
    L = nb_row * BLOCK
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
    return jnp.concatenate(res, axis=1)


@partial(jax.jit, static_argnames=("fetch16",))
def _pack_rows(rows, pack_idx, fscale, fetch16):
    """Concatenate the buckets' full outputs, gather the real query rows
    (sentinel padding dropped), and cast for download. fetch16: downloads
    ride f16 — 2^-11 rounding sits inside the 0.1% relative tolerance the
    reference's own ranked tests assert (test_ranked_queries.cpp:52) and
    halves the dominant device->host transfer. Scores are pre-scaled by
    fscale (a host-chosen power of two, undone exactly after download) so
    every representable score lands in f16's NORMAL range; the host plans
    f32 instead whenever its provable score bounds don't fit (see
    _part_plan). Counts passes stay f32 (exact to 2^24)."""
    full = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    out = jnp.take(full, pack_idx, axis=0)
    return (out * fscale).astype(jnp.float16) if fetch16 else out


def _resident_step(
    docs_words,
    freqs_words,
    tiles_docs,  # RESIDENT (Nt+1, N_FIELDS) i32; last row is the pad tile
    tiles_freqs,
    norm_den,  # RESIDENT f32[num_docs]
    gtile_ids,  # i32[Rtot] group-major tile ids, docs ordering (pads -> Nt)
    gtile_ids_f,  # i32: freqs-ordering tile ids (split mode; len 1 dummy else)
    blkperm,  # i32: docs-order block -> freqs-order block (split mode)
    bucket_dir,  # tuple of i32[Bb, L/32]: (global block id << 5) | term slot
    bucket_qwtab,  # tuple of f32[Bb, tmax] per-row term-slot query weights
    bucket_tgt,  # tuple of i32[Bb]
    pack_idx,  # i32[sum nrows]: real-row gather over the concat of buckets
    groups,  # docs-pass groups: tuple of (off, R, statics)
    groups_f,  # freqs-pass groups (empty tuple in pair mode)
    num_docs,
    k,
    ops,
    tmax,
    pallas=0,  # 0: XLA decode, 1: pallas kernel, 2: pallas interpret (tests)
    fetch16=0,
    fscale=None,  # f32 scalar, only read when fetch16
    normcache=0,  # per-slot norm lengths from the init-time cache (row
    # gather) instead of the per-posting random gather; exact (f32 cache)
    den_blocks=None,  # RESIDENT f32[total_blocks, 32] (normcache mode)
    tile_gblk0=None,  # RESIDENT i32[Nt+1]: first cache row of each tile
    fused=1,  # 0: per-group decode executables (gtile_ids/gtile_ids_f
    # are then TUPLES of per-group id arrays) — see _decode_part_unfused
):
    """Orchestrates the three jitted stages (decode -> per-bucket join ->
    pack); plain Python so each stage's compile cache is keyed only on
    what it actually depends on.

    The sort join is the ONLY join: a posting-granular probe join (the
    literal next_geq leapfrog, dependent binary-search gathers) was
    built and measured in rounds 3-4 — 28x slower at 1x and 6.7x at 50x
    (random gather is this chip's weakest primitive; docs/PERF.md
    round-4 probe-vs-sort tables) — and removed in round 5. The device
    analogue of cursor skipping lives at PLAN time instead
    (_pruned_directory's block-overlap + theta pruning)."""
    if fused:
        docs32, w32 = _decode_part(
            docs_words, freqs_words, tiles_docs, tiles_freqs, norm_den,
            gtile_ids, gtile_ids_f, blkperm, groups, groups_f, num_docs,
            ranked=("or" in ops) or ("and" in ops),
            pallas=pallas, normcache=normcache, den_blocks=den_blocks,
            tile_gblk0=tile_gblk0,
        )
    else:
        docs32, w32 = _decode_part_unfused(
            docs_words, freqs_words, tiles_docs, tiles_freqs, norm_den,
            gtile_ids, gtile_ids_f, blkperm, groups, groups_f, num_docs,
            normcache=normcache, den_blocks=den_blocks,
            tile_gblk0=tile_gblk0,
        )
    import os as _os

    if _os.environ.get("DS2I_ENGINE_JOIN") == "0":
        # perf instrumentation: decode stage only (combine with
        # DS2I_ENGINE_NOFETCH for a decode-only compute timing; the
        # decode executable is the production one — it is jitted
        # separately, so its cost cannot be DCE'd by skipping the join)
        return w32
    rows = tuple(
        _join_bucket(docs32, w32, d, q, t, num_docs=num_docs, k=k, ops=ops, tmax=tmax)
        for d, q, t in zip(bucket_dir, bucket_qwtab, bucket_tgt)
    )
    return _pack_rows(
        rows, pack_idx,
        jnp.float32(fscale) if fscale is not None else jnp.float32(1.0),
        fetch16,
    )


class ResidentEngine:
    """Resident-table engine; minimal per-batch transfer, one dispatch per
    part, decode shared across queries."""

    MIN_L = 64

    # bump when the resident table layout changes (invalidates caches)
    CACHE_VERSION = 3  # v3: norm cache stores BM25 denominators, not norm lens

    def __init__(self, index, wdata=None, scorer=BM25, max_part_slots=1 << 21,
                 max_part_queries=16384, pallas=None, devices=None,
                 query_dfs=None, term_remap=None, cache_dir=None):
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
        import os as _os_c

        self.cache_dir = cache_dir if cache_dir is not None else _os_c.environ.get("DS2I_ENGINE_CACHE")
        self._cache_key = None  # computed lazily from index identity

        # host copy kept so init and cache-key hashing never read the
        # device array back (the tunnel's FIRST device->host transfer
        # costs minutes; it must happen at first fetch, not init)
        self._norm_lens_host = (
            np.asarray(wdata.norm_lens, dtype=np.float32)
            if wdata is not None else np.ones(self.num_docs, np.float32)
        )
        # per-doc BM25 denominator k1*(1-b+b*norm_len), precomputed ONCE in
        # f32 on host so every weight is just f/(f+den): an add and a divide,
        # which neither numpy nor XLA can FMA-contract — the device metadata
        # pass, the query step, and the host build-time artifact pass
        # (build_blockmax) therefore agree bit-for-bit (bm25.hpp:11-15)
        self._norm_den_host = BM25.norm_denominator(self._norm_lens_host)
        self.norm_den = jnp.asarray(self._norm_den_host)
        # provable lower bound on any bm25 doc-term weight (f>=1, den<=max),
        # with 1-ULP slack for the device's f32 divide: used to plan the
        # f16 download scaling (see _part_plan)
        den_max = float(np.max(self._norm_den_host)) if self.num_docs else 1.0
        self._wmin = (1.0 / (1.0 + den_max)) * (1.0 - 1e-6)
        # pallas decode only on a real TPU placement (the axon plugin makes
        # default_backend() report tpu even when arrays land on cpu)
        import os as _os

        env = _os.environ.get("DS2I_PALLAS")
        if self._pallas_req is None:
            # default to the XLA decode: measured faster than the pallas
            # kernel at these group shapes (see ops/pallas_decode.py)
            self._pallas_req = {"0": 0, "1": 1, "interpret": 2}.get(env, 0)
        self.pallas = self._pallas_req
        if _os.environ.get("DS2I_DECODE_NOEX") == "1":
            from ..utils.logging import logger

            logger(
                "WARNING: DS2I_DECODE_NOEX=1 — OptPFor exception decode is "
                "DISABLED; results are WRONG wherever blocks carry "
                "exceptions. Timing diagnostic only (docs/PERF.md)."
            )
        import time as _time

        self._init_times = {}
        t0 = _time.time()
        num_lists = index.size()
        if hasattr(index, "docs_sequences"):
            t = self._init_ef(index)
        else:
            t = self._init_block(index)
        self._init_times["tables_s"] = round(_time.time() - t0, 2)
        t0 = _time.time()
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
        self.den_blocks = None  # built lazily by _ensure_norm_cache
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
                    self.tiles_freqs, self.norm_den,
                ))
                for d in self.devices
            ]
        else:
            self._replicas = None

        self._init_times["upload_s"] = round(_time.time() - t0, 2)

        # host-side layout tables (shared across tile kinds)
        self.list_tile_start = t.list_tile_start
        self.list_tiles = np.diff(t.list_tile_start)
        nvals = t.docs[:, F_NVALS].astype(np.int64)
        self.tile_blocks = (nvals + BLOCK - 1) // BLOCK  # 32-slot blocks per tile
        self.list_n = np.zeros(num_lists, dtype=np.int64)
        np.add.at(self.list_n, t.tile_list, nvals)
        self.list_blocks = np.zeros(num_lists, dtype=np.int64)
        np.add.at(self.list_blocks, t.tile_list, self.tile_blocks)

    # -- derived-state persistence (queries.cpp:76-77 mmap-attach analogue) --
    #
    # Everything the engine derives from the index — tile tables, group
    # statics, the norm cache, block-max pruning metadata — is a pure
    # function of (index bytes, norm lens, CACHE_VERSION). With
    # DS2I_ENGINE_CACHE=<dir> (or cache_dir=), each piece is frozen on
    # first computation and re-attached on later engine starts, so a
    # restart is load + upload instead of walk + decode-everything.

    def _cache_id(self):
        if self._cache_key is not None:
            return self._cache_key
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        h.update(f"v{self.CACHE_VERSION}".encode())
        if self.split:
            data = self.index.lists
            h.update(np.asarray(data[: 1 << 20]).tobytes())
            h.update(np.asarray(data[-(1 << 20):]).tobytes())
            h.update(str((len(data), self.index.size(), self.num_docs)).encode())
        else:
            for coll in (self.index.docs_sequences, self.index.freqs_sequences):
                w = np.asarray(coll.bits_bv.words)
                h.update(w[: 1 << 17].tobytes())
                h.update(w[-(1 << 17):].tobytes())
                h.update(str((int(coll.bits_bv.nbits), coll.size())).encode())
            h.update(str(self.num_docs).encode())
        self._cache_key = h.hexdigest()
        return self._cache_key

    def _cache_path(self, part, with_norms=False):
        if not self.cache_dir:
            return None
        import os as _os

        key = self._cache_id()
        if with_norms:
            import hashlib

            hn = hashlib.blake2b(digest_size=8)
            hn.update(self._norm_lens_host.tobytes())
            key = f"{key}_{hn.hexdigest()}"
        _os.makedirs(self.cache_dir, exist_ok=True)
        return _os.path.join(self.cache_dir, f"resident_{key}_{part}.npz")

    def _cache_load(self, part, with_norms=False):
        import os as _os

        p = self._cache_path(part, with_norms)
        if p is None or not _os.path.exists(p):
            return None
        try:
            return np.load(p, allow_pickle=False)
        except Exception:
            return None

    def _cache_save(self, part, with_norms=False, **arrays):
        p = self._cache_path(part, with_norms)
        if p is None:
            return
        import os as _os

        tmp = p + f".tmp{_os.getpid()}.npz"
        np.savez(tmp, **arrays)
        _os.replace(tmp, p)

    @staticmethod
    def _statics_to_json(statics):
        import json

        return json.dumps([list(s) for s in statics])

    @staticmethod
    def _statics_from_json(s):
        import json

        return [tuple(x if isinstance(x, str) else int(x) for x in row)
                for row in json.loads(str(s))]

    def _ensure_norm_cache(self):
        """Materialize the per-slot BM25-denominator cache (one decode of
        every tile). Lazy: only ranked execution pays the init cost."""
        if self.den_blocks is not None:
            return
        cached = self._cache_load("norms", with_norms=True)
        if cached is not None:
            self.tile_gblk0 = jnp.asarray(cached["tile_gblk0"])
            self.den_blocks = jnp.asarray(cached["den_blocks"])
        else:
            nt = self.pad_tile
            utidx = np.arange(nt, dtype=np.int64)
            gid = self.tile_gid_d if self.split else self.tile_gid
            stats = self.group_statics_d if self.split else self.group_statics
            groups, gtile_ids, tblk, sent_blk, _ = self._order_groups(utidx, gid, stats)
            g0 = np.full(nt + 1, sent_blk, dtype=_I32)
            if nt:
                g0[:nt] = tblk
            self.tile_gblk0 = jnp.asarray(g0)
            self.den_blocks = _norm_cache_step(
                self.docs_words, self.tiles_docs, self.norm_den,
                jnp.asarray(gtile_ids), groups=tuple(groups),
                num_docs=self.num_docs, split=self.split,
            )
            if self.cache_dir:
                self._cache_save(
                    "norms", with_norms=True,
                    den_blocks=np.asarray(self.den_blocks),
                    tile_gblk0=np.asarray(self.tile_gblk0),
                )
        if self.devices:
            self._norm_replicas = [
                (jax.device_put(self.den_blocks, d), jax.device_put(self.tile_gblk0, d))
                for d in self.devices
            ]

    def _full_tile_orders(self, utidx=None):
        """Group-major orderings (docs + freqs + blkperm) over ALL tiles
        (or a subset) — the tile-set analogue of _part_plan's layout, for
        init passes."""
        nt = self.pad_tile
        if utidx is None:
            utidx = np.arange(nt, dtype=np.int64)
        gid = self.tile_gid_d if self.split else self.tile_gid
        stats = self.group_statics_d if self.split else self.group_statics
        groups, gtile_ids, tblk, sent_blk, nb_d = self._order_groups(utidx, gid, stats)
        if self.split:
            groups_f, gtile_f, tblk_f, _, _ = self._order_groups(
                utidx, self.tile_gid_f, self.group_statics_f
            )
            blkperm = np.full(nb_d, 0, dtype=_I32)
            if len(utidx):
                bpt = self.tile_blocks[utidx]
                tot_b = int(bpt.sum())
                bex = np.cumsum(bpt) - bpt
                blkperm[np.repeat(tblk - bex, bpt) + np.arange(tot_b, dtype=np.int64)] = (
                    np.repeat(tblk_f - bex, bpt) + np.arange(tot_b, dtype=np.int64)
                )
        else:
            groups_f, gtile_f, blkperm = (), np.zeros(1, _I32), np.zeros(1, _I32)
        return groups, gtile_ids, tblk, sent_blk, groups_f, gtile_f, blkperm

    # maximum k the pruning threshold tables support (per-list sorted
    # block maxes are truncated here; larger k just disables pruning
    # for that term)
    PRUNE_KMAX = 128

    def _ensure_blockmax(self):
        """Materialize WAND/MaxScore pruning metadata (one decode of every
        tile, lazy like the norm cache):
          wmax_blk   f32[total_blocks]  per-32-block max doc-term weight,
                                        global (tile-major) block order
          list_wmax  f32[num_lists]     per-list max (reference wand_data's
                                        max_term_weight, un-multiplied)
          kth CSR    per-list block maxes sorted descending (<= PRUNE_KMAX):
                     the j-th entry is an ACHIEVED doc-term weight of j
                     distinct docs, so qw * vals[k-1] lower-bounds the true
                     k-th best score of any query containing the term."""
        if getattr(self, "wmax_blk", None) is not None:
            return
        if self._attach_blockmax_cache():
            return
        import os as _os

        src = _os.environ.get("DS2I_BLOCKMAX_FROM")
        if src:
            # build-time artifact path: derive the metadata from the
            # original collection on host (create_wand_data.cpp analogue)
            from ..io.binary_collection import BinaryFreqCollection

            self.build_blockmax(BinaryFreqCollection(src))
            return

        nt = self.pad_tile
        tb = self.tile_blocks[:nt]
        gblk0 = np.zeros(nt + 1, dtype=np.int64)
        np.cumsum(tb, out=gblk0[1:])
        total = int(gblk0[-1])

        # short lists get posting-exact planner metadata (their blocks span
        # wide docid ranges); budget-capped so host memory stays bounded
        self._pick_short_lists()
        short_gblks, short_list_of_blk = self._short_block_ids(gblk0)

        # Chunked metadata pass: one decode call over EVERY tile would need
        # HBM for all decoded slots at once (OOM at 50x = 100M postings).
        # Tiles are split into contiguous runs of bounded slot count; each
        # run decodes in its own device call and the (tile-major) metadata
        # assembles on host — the global block range of tiles [lo, hi) is
        # exactly gblk0[lo]:gblk0[hi].
        wmax_all = np.zeros(total, dtype=np.float32)
        dmax_all = np.full(total, -1, dtype=np.int64)
        dmin_all = np.zeros(total, dtype=np.int64)
        sdocs = np.full((len(short_gblks), BLOCK), np.iinfo(np.int32).max, dtype=np.int32)
        sw = np.zeros((len(short_gblks), BLOCK), dtype=np.float32)
        budget = max(min(int(self.max_part_slots), 1 << 25), 1 << 12)
        CB = _bm_chunk_rows(self.max_part_slots, total)
        slots_tile = tb * BLOCK
        cid = (np.cumsum(slots_tile) - slots_tile) // budget if nt else np.zeros(0, np.int64)
        cuts = np.concatenate([[0], np.nonzero(np.diff(cid))[0] + 1, [nt]]).astype(np.int64)
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            lo, hi = int(lo), int(hi)
            if hi <= lo:
                continue
            tix = np.arange(lo, hi, dtype=np.int64)
            groups_c, gtile_c, tblk_c, _, groups_fc, gtile_fc, blkperm_c = (
                self._full_tile_orders(tix)
            )
            tb_c = tb[lo:hi]
            tot_c = int(tb_c.sum())
            if not tot_c:
                continue
            bex_c = np.cumsum(tb_c) - tb_c
            src_c = np.repeat(tblk_c, tb_c) + (
                np.arange(tot_c, dtype=np.int64) - np.repeat(bex_c, tb_c)
            )
            smask = (short_gblks >= gblk0[lo]) & (short_gblks < gblk0[hi])
            sidx = np.nonzero(smask)[0]
            rows_c = src_c[short_gblks[sidx] - gblk0[lo]]  # group-major
            docs_d, freq_d, dmax_c, dmin_c = _decode_slots_step(
                self.docs_words, self.freqs_words, self.tiles_docs, self.tiles_freqs,
                jnp.asarray(gtile_c), jnp.asarray(gtile_fc), jnp.asarray(blkperm_c),
                groups=tuple(groups_c), groups_f=tuple(groups_fc),
                num_docs=self.num_docs, pallas=self.pallas,
            )
            # weight evaluation in canonical CB-row slices through THE
            # shared executable (see _slots_weight_step docstring).
            # rows_d >= tot_c: the group-major decode layout carries pad
            # rows, and src_c addresses positions in that padded space.
            rows_d = int(docs_d.shape[0])
            wmax_c = np.zeros(rows_d, dtype=np.float32)
            for j0 in range(0, rows_d, CB):
                j1 = min(j0 + CB, rows_d)
                dp, fp = docs_d[j0:j1], freq_d[j0:j1]
                if j1 - j0 < CB:
                    padn = CB - (j1 - j0)
                    dp = jnp.pad(dp, ((0, padn), (0, 0)), constant_values=self.num_docs)
                    fp = jnp.pad(fp, ((0, padn), (0, 0)))
                wm, w = _slots_weight_step(dp, fp, self.norm_den, num_docs=self.num_docs)
                wmax_c[j0:j1] = np.asarray(wm)[: j1 - j0]
                in_sl = (rows_c >= j0) & (rows_c < j1)
                if np.any(in_sl):
                    rloc = (rows_c[in_sl] - j0).astype(np.int32)
                    sw[sidx[in_sl]] = np.asarray(
                        _take_rows(w, jnp.asarray(rloc))
                    )
            if len(sidx):
                sdocs[sidx] = np.asarray(
                    _take_rows(docs_d, jnp.asarray(rows_c.astype(np.int32)))
                )
            wmax_all[gblk0[lo]:gblk0[hi]] = wmax_c[src_c]
            dmax_all[gblk0[lo]:gblk0[hi]] = np.asarray(dmax_c)[src_c]
            dmin_all[gblk0[lo]:gblk0[hi]] = np.asarray(dmin_c)[src_c]

        # short-list posting CSR keyed by list*stride+docid (globally sorted
        # since blocks arrive list-major in docid order)
        if len(short_gblks):
            valid = sdocs < self.num_docs
            lists_rep = np.repeat(short_list_of_blk, BLOCK).reshape(-1, BLOCK)
            short_keys = (
                lists_rep[valid].astype(np.int64) * np.int64(self.num_docs + 1)
                + sdocs[valid]
            )
            short_w = sw[valid].astype(np.float32)
        else:
            short_keys = np.zeros(0, dtype=np.int64)
            short_w = np.zeros(0, dtype=np.float32)
        self._install_blockmax(wmax_all, dmax_all, dmin_all, gblk0, short_keys, short_w)

    def _attach_blockmax_cache(self):
        """Attach persisted pruning metadata if present (True on hit)."""
        cached = self._cache_load("blockmax", with_norms=True)
        if cached is None:
            return False
        names = ("wmax_blk", "dmax_blk", "dmin_blk", "gblk0", "tile_of_gblk",
                 "list_gblk0", "list_wmax", "_kth_vals", "_kth_start",
                 "rank_blk", "is_short", "_short_keys", "_short_w")
        if any(n.lstrip("_") not in cached for n in names):
            return False  # cache from an older field set: rebuild
        for name in names:
            setattr(self, name, cached[name.lstrip("_")])
        self._short_stride = np.int64(cached["short_stride"])
        self._derive_prune_tables()
        return True

    def _short_block_ids(self, gblk0):
        """Global block ids (and owning lists) of every short list's
        blocks — the rows whose raw (docid, weight) slots the planner
        keeps for posting-exact bounds. Shared by the device decode pass
        and the build-time artifact pass so their selection is identical."""
        lgb0_all = gblk0[self.list_tile_start]
        short_lists = np.nonzero(self.is_short)[0]
        if not len(short_lists):
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
        s_nb = (lgb0_all[short_lists + 1] - lgb0_all[short_lists])
        s_tot = int(s_nb.sum())
        s_ex = np.cumsum(s_nb) - s_nb
        short_gblks = np.repeat(lgb0_all[short_lists] - s_ex, s_nb) + np.arange(s_tot, dtype=np.int64)
        return short_gblks, np.repeat(short_lists, s_nb)

    def _pick_short_lists(self):
        """Short lists get posting-exact planner metadata (their blocks
        span wide docid ranges); budget-capped so host memory stays
        bounded. Deterministic in list sizes alone, so the build-time
        artifact pass (build_blockmax) picks the identical set."""
        short_max = 256
        while short_max > 8 and int(self.list_n[self.list_n <= short_max].sum()) > (1 << 26):
            short_max //= 2
        self.is_short = self.list_n <= short_max

    def _install_blockmax(self, wmax_all, dmax_all, dmin_all, gblk0, short_keys, short_w):
        """Install per-block metadata + every derived planner table, then
        persist. Shared by the device decode pass (_ensure_blockmax) and
        the host build-time pass (build_blockmax) so their artifacts are
        identical by construction."""
        nt = self.pad_tile
        tb = self.tile_blocks[:nt]
        total = int(gblk0[-1])
        self.wmax_blk = wmax_all
        self.dmax_blk = dmax_all
        self.dmin_blk = dmin_all
        self.gblk0 = gblk0
        self.tile_of_gblk = np.repeat(np.arange(nt, dtype=np.int64), tb)
        self._short_stride = np.int64(self.num_docs + 1)
        self._short_keys = short_keys
        self._short_w = short_w

        # per-list ranges in global block space (a list's tiles, hence its
        # blocks, are contiguous)
        lgb0 = gblk0[self.list_tile_start]  # (num_lists+1,)
        self.list_gblk0 = lgb0
        nl = len(lgb0) - 1
        if total:
            nblk_l = np.diff(lgb0)
            list_of_blk = np.repeat(np.arange(nl, dtype=np.int64), nblk_l)
            self.list_wmax = np.zeros(nl, dtype=np.float32)
            ne = nblk_l > 0
            if np.any(ne):
                self.list_wmax[ne] = np.maximum.reduceat(
                    self.wmax_blk, np.minimum(lgb0[:-1][ne], total - 1)
                )
            # per-list descending block maxes, truncated to PRUNE_KMAX
            order = np.lexsort((-self.wmax_blk, list_of_blk))
            rank = np.arange(total, dtype=np.int64) - lgb0[list_of_blk[order]]
            keep = rank < self.PRUNE_KMAX
            self._kth_vals = self.wmax_blk[order][keep]
            kept_per_list = np.bincount(list_of_blk[order][keep], minlength=nl)
            self._kth_start = np.zeros(nl + 1, dtype=np.int64)
            np.cumsum(kept_per_list, out=self._kth_start[1:])
            # rank of each block within its list (desc by wmax): drives the
            # phase-1 probe directory (top-P blocks per term)
            self.rank_blk = np.zeros(total, dtype=np.int64)
            self.rank_blk[order] = rank
        else:
            self.list_wmax = np.zeros(nl, dtype=np.float32)
            self._kth_vals = np.zeros(0, dtype=np.float32)
            self._kth_start = np.zeros(nl + 1, dtype=np.int64)
            self.rank_blk = np.zeros(0, dtype=np.int64)
        self._derive_prune_tables()

        if self.cache_dir:
            self._cache_save(
                "blockmax", with_norms=True,
                wmax_blk=self.wmax_blk, dmax_blk=self.dmax_blk,
                dmin_blk=self.dmin_blk,
                gblk0=self.gblk0, tile_of_gblk=self.tile_of_gblk,
                list_gblk0=self.list_gblk0, list_wmax=self.list_wmax,
                kth_vals=self._kth_vals, kth_start=self._kth_start,
                rank_blk=self.rank_blk, is_short=self.is_short,
                short_keys=self._short_keys, short_w=self._short_w,
                short_stride=np.int64(self._short_stride),
            )

    def build_blockmax(self, collection):
        """Build the WAND/MaxScore pruning metadata from the ORIGINAL
        collection on host — the build-time-artifact path the reference
        uses for its ranking metadata (create_wand_data.cpp,
        wand_data.hpp:20-53): the builder already knows every block's
        docids and freqs, so deriving (block max weight, block max docid)
        costs seconds instead of the device pass's decode of every tile.
        Bit-identical arrays to _ensure_blockmax's device pass (tested).
        The slot layout and block maxima selection come from the host,
        but the per-posting WEIGHTS are evaluated on device through
        _slots_weight_step — the same backend expression the decode pass
        and the query step use — because XLA's f32 divide is
        reciprocal-based (1 ulp off IEEE numpy on ~half of all values)
        and pruning thresholds must agree exactly with the scores the
        engine computes. This pass uploads the collection's slot planes
        once (no decode of any tile) and downloads only block maxima
        plus short-list slots.

        collection: a BinaryFreqCollection or any iterable of
        (docs, freqs) pairs in index list order. No-op when metadata is
        already attached or cached."""
        if getattr(self, "wmax_blk", None) is not None:
            return
        if self._attach_blockmax_cache():
            return
        import time as _time

        t0 = _time.time()
        docs_all, freqs_all, list_n = _concat_collection(collection)
        if not np.array_equal(list_n, self.list_n):
            raise ValueError(
                "collection does not match the index (per-list posting "
                "counts differ); build_blockmax needs the collection the "
                "index was built from"
            )

        nt = self.pad_tile
        nvals = self.tiles.docs[:, F_NVALS].astype(np.int64)
        tb = self.tile_blocks[:nt]
        gblk0 = np.zeros(nt + 1, dtype=np.int64)
        np.cumsum(tb, out=gblk0[1:])
        total = int(gblk0[-1])

        self._pick_short_lists()
        short_gblks, short_list_of_blk = self._short_block_ids(gblk0)

        # engine block b = 32-slot run of its tile; tiles cover each
        # list's postings contiguously in order (tiles.py value-aligned
        # cut), so block b of tile t covers postings
        # [pbase[t] + 32*j, min(+32, pbase[t] + nvals[t])) globally.
        pbase = np.cumsum(nvals) - nvals
        if total:
            bex = np.cumsum(tb) - tb
            block_tile = np.repeat(np.arange(nt, dtype=np.int64), tb)
            j_in_tile = np.arange(total, dtype=np.int64) - bex[block_tile]
            bstart = pbase[block_tile] + BLOCK * j_in_tile
            bend = np.minimum(bstart + BLOCK, pbase[block_tile] + nvals[block_tile])
            dmax_all = docs_all[bend - 1].astype(np.int64)
            dmin_all = docs_all[bstart].astype(np.int64)
            # (total, 32) slot planes; pad slots carry (num_docs, freq 0)
            # exactly like the decode pass's masked output
            npost = len(docs_all)
            idx = bstart[:, None] + np.arange(BLOCK, dtype=np.int64)[None, :]
            validp = idx < bend[:, None]
            idxc = np.minimum(idx, max(npost - 1, 0))
            doc_plane = np.where(validp, docs_all[idxc], self.num_docs).astype(np.int32)
            freq_plane = np.where(validp, freqs_all[idxc], 0).astype(np.float32)
            del idx, validp, idxc

            wmax_all = np.zeros(total, dtype=np.float32)
            sw = np.zeros((len(short_gblks), BLOCK), dtype=np.float32)
            CB = _bm_chunk_rows(self.max_part_slots, total)
            for lo in range(0, total, CB):
                hi = min(lo + CB, total)
                dpc, fpc = doc_plane[lo:hi], freq_plane[lo:hi]
                if hi - lo < CB:  # fixed chunk shape: one compile
                    padn = CB - (hi - lo)
                    dpc = np.pad(dpc, ((0, padn), (0, 0)), constant_values=self.num_docs)
                    fpc = np.pad(fpc, ((0, padn), (0, 0)))
                wmax_c, w = _slots_weight_step(
                    jnp.asarray(dpc), jnp.asarray(fpc), self.norm_den,
                    num_docs=self.num_docs,
                )
                wmax_all[lo:hi] = np.asarray(wmax_c)[: hi - lo]
                sidx = np.nonzero((short_gblks >= lo) & (short_gblks < hi))[0]
                if len(sidx):
                    srows = (short_gblks[sidx] - lo).astype(np.int32)
                    sw[sidx] = np.asarray(_take_rows(w, jnp.asarray(srows)))
            sdocs = doc_plane[short_gblks]
        else:
            wmax_all = np.zeros(0, dtype=np.float32)
            dmax_all = np.zeros(0, dtype=np.int64)
            dmin_all = np.zeros(0, dtype=np.int64)
            sdocs = np.zeros((0, BLOCK), dtype=np.int32)
            sw = np.zeros((0, BLOCK), dtype=np.float32)

        # short-list posting CSR assembly, identical to _ensure_blockmax's
        if len(short_gblks):
            valid = sdocs < self.num_docs
            lists_rep = np.repeat(short_list_of_blk, BLOCK).reshape(-1, BLOCK)
            short_keys = (
                lists_rep[valid].astype(np.int64) * np.int64(self.num_docs + 1)
                + sdocs[valid]
            )
            short_w = sw[valid].astype(np.float32)
        else:
            short_keys = np.zeros(0, dtype=np.int64)
            short_w = np.zeros(0, dtype=np.float32)
        self._install_blockmax(wmax_all, dmax_all, dmin_all, gblk0, short_keys, short_w)
        import os as _os

        if _os.environ.get("DS2I_ENGINE_DEBUG"):
            print(f"[resident] blockmax host build: {_time.time()-t0:.1f}s",
                  flush=True)

    def _derive_prune_tables(self):
        """Planner tables derived from the decoded block metadata — cheap
        host passes, rebuilt on cache load rather than persisted:

          _dmax_keys / _dlo_keys  i64[total_blocks], globally sorted
              (list-major, docids increase within a list): two
              searchsorted calls give the EXACT range of a list's blocks
              overlapping any docid interval — the planner analogue of
              the reference cursor's next_geq block walk
              (block_posting_list.hpp skipping).
          _pyr (+ _pyr_off/_pyr_q)  per-list binary max-pyramid over
              block maxes: max(wmax) over any block range [b0,b1] in two
              gathers, outward-rounded to the enclosing power-of-two
              cells (a valid upper bound; <=4x range dilation)."""
        total = len(self.wmax_blk)
        lgb0 = self.list_gblk0
        nl = len(lgb0) - 1
        stride = np.int64(self.num_docs + 1)
        nb = np.diff(lgb0)
        list_of_blk = np.repeat(np.arange(nl, dtype=np.int64), nb)
        # TRUE first docid per block (not prev-max+1): a list's block
        # ranges then leave visible gaps between blocks, so block-exact
        # overlap prunes against lists of every length — with tiled
        # ranges it could only prune past a list's last docid
        dlo = self.dmin_blk
        self._blk_dlo = dlo
        self._dmax_keys = list_of_blk * stride + self.dmax_blk
        self._dlo_keys = list_of_blk * stride + dlo

        Q = np.ones(nl, dtype=np.int64)
        pos = nb > 0
        Q[pos] = 2 ** np.ceil(np.log2(nb[pos])).astype(np.int64)
        off = np.zeros(nl + 1, dtype=np.int64)
        np.cumsum(2 * Q - 1, out=off[1:])
        pyr = np.zeros(int(off[-1]), dtype=np.float32)
        if total:
            rel = np.arange(total, dtype=np.int64) - lgb0[list_of_blk]
            pyr[off[list_of_blk] + rel] = self.wmax_blk
        # level s of list l starts at off[l] + 2*Q[l] - 2*(Q[l] >> s)
        depth = int(np.log2(int(Q.max()))) if nl else 0
        for s in range(1, depth + 1):
            m = (Q >> s) >= 1
            cells = (Q >> s)[m]
            loff = off[:-1][m]
            Ql = Q[m]
            tot_c = int(cells.sum())
            ex = np.cumsum(cells) - cells
            j = np.arange(tot_c, dtype=np.int64) - np.repeat(ex, cells)
            par = np.repeat(loff + 2 * Ql - 2 * cells, cells) + j
            ch = np.repeat(loff + 2 * Ql - 4 * cells, cells) + 2 * j
            pyr[par] = np.maximum(pyr[ch], pyr[ch + 1])
        self._pyr = pyr
        self._pyr_off = off[:-1]
        self._pyr_q = Q

    def _blk_overlap(self, lists, dlo_e, dhi_e):
        """First/last block of each list whose docid range intersects
        [dlo_e, dhi_e] (global block ids; empty iff bf > bl). Exact at
        block granularity for ANY list length."""
        stride = np.int64(self.num_docs + 1)
        bf = np.searchsorted(self._dmax_keys, lists * stride + dlo_e)
        bl = np.searchsorted(self._dlo_keys, lists * stride + dhi_e, side="right") - 1
        return bf, bl

    def _range_ub(self, lists, b0, b1):
        """Upper bound on max doc-term weight over blocks [b0, b1] of
        each list (global ids within the list) via the max-pyramid."""
        r0 = b0 - self.list_gblk0[lists]
        r1 = b1 - self.list_gblk0[lists]
        d = r1 - r0
        s = np.zeros(len(d), dtype=np.int64)
        m = d > 0
        if np.any(m):
            s[m] = np.floor(np.log2(d[m])).astype(np.int64) + 1
        Q = self._pyr_q[lists]
        start = self._pyr_off[lists] + 2 * Q - 2 * (Q >> s)
        return np.maximum(self._pyr[start + (r0 >> s)], self._pyr[start + (r1 >> s)])

    def _init_ef(self, index):
        # EF-family tiles: group statics are ("ef", W, WL, T)
        self.split = False
        cached = self._cache_load("tables")
        if cached is not None:
            t = TileTables(
                docs=cached["docs"], freqs=cached["freqs"],
                tile_list=cached["tile_list"],
                list_tile_start=cached["list_tile_start"],
                win_words=cached["win_words"], lb_words=cached["lb_words"],
            )
        else:
            t = build_tile_tables(index)
            self._cache_save(
                "tables", docs=t.docs, freqs=t.freqs, tile_list=t.tile_list,
                list_tile_start=t.list_tile_start, win_words=t.win_words,
                lb_words=t.lb_words,
            )
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
            if coll_bv.nbits >= 2**36:
                raise ValueError(
                    "device engine limit: 8GB per resident stream (i32 WORD "
                    "cursors in the tile tables); shard larger indexes by doc "
                    "range across devices with parallel.DocShardedEngine"
                )
        self.docs_words = jnp.asarray(index.docs_sequences.bits_bv.words.view(np.uint32))
        self.freqs_words = jnp.asarray(index.freqs_sequences.bits_bv.words.view(np.uint32))
        return t

    def _init_block(self, index):
        # block_freq_index tiles: one tile per 128-int block; statics are
        # ("opt", WSd, Ed, WSf, Ef, 128) or ("interp", Wd, Wf, NC)
        from .block_tiles import build_block_tables

        self.split = True
        cached = self._cache_load("tables")
        if cached is not None:
            t = TileTables(
                docs=cached["docs"], freqs=cached["freqs"],
                tile_list=cached["tile_list"],
                list_tile_start=cached["list_tile_start"],
                win_words=cached["win_words"], lb_words=cached["lb_words"],
            )
            slist_d = self._statics_from_json(cached["statics_d"])
            slist_f = self._statics_from_json(cached["statics_f"])
            gid_d, gid_f = cached["gid_d"], cached["gid_f"]
        else:
            t, slist_d, gid_d, slist_f, gid_f = build_block_tables(index)
            self._cache_save(
                "tables", docs=t.docs, freqs=t.freqs, tile_list=t.tile_list,
                list_tile_start=t.list_tile_start, win_words=t.win_words,
                lb_words=t.lb_words, gid_d=gid_d, gid_f=gid_f,
                statics_d=np.array(self._statics_to_json(slist_d)),
                statics_f=np.array(self._statics_to_json(slist_f)),
            )
        self._empty_statics = ("interp", 4, BLOCK)
        data = np.asarray(index.lists, dtype=np.uint8)
        assert len(data) < 2**33, (
            "device block engine limit: 8GB per resident stream (i32 WORD "
            "cursors in the tile tables); shard larger indexes by doc range "
            "across devices with parallel.DocShardedEngine"
        )
        pad = (-len(data)) % 4
        words = np.ascontiguousarray(
            np.concatenate([data, np.zeros(pad + 8, np.uint8)]).view("<u4").astype(np.uint32)
        )

        import os as _os

        # Resident exception patch tables (round 5, DEFAULT): decode the
        # static Simple16 exception streams ONCE here into flat
        # (position, high<<b) pairs appended to the resident stream —
        # the in-pass exception decode was ~47% of all decode time at
        # 50x (docs/PERF.md round-4 DS2I_DECODE_NOEX breakdown).
        # DS2I_EX_PATCH=0 restores the in-pass Simple16 decode
        # (bit-identical either way, tests/test_ex_patch.py). Applied IN
        # MEMORY after cache load/save: the persisted tables stay
        # canonical (byte-identity with the native walk); the patch
        # words themselves are cached separately (index-keyed — they
        # derive from index bytes alone).
        self.ex_patch = 0 if _os.environ.get("DS2I_EX_PATCH") == "0" else 1
        has_opt_ex = any(s[0] == "opt" and s[2] > 0 for s in slist_d + slist_f)
        if self.ex_patch and has_opt_ex:
            from .block_tiles import BF_EX_BASE, build_exception_patches

            cached_p = self._cache_load("expatch")
            if cached_p is not None:
                patch, base_d, base_f = (
                    cached_p["patch"], cached_p["base_d"], cached_p["base_f"])
            else:
                patch, (base_d, base_f) = build_exception_patches(
                    words, [t.docs, t.freqs])
                self._cache_save("expatch", patch=patch, base_d=base_d,
                                 base_f=base_f)
            nw0 = np.int64(len(words))
            if nw0 + len(patch) >= 2**31:
                # absolute patch words must fit the i32 field columns;
                # past ~8GB combined fall back to the in-pass decode
                self.ex_patch = 0
            else:
                t.docs[:, BF_EX_BASE] = np.where(
                    base_d >= 0, nw0 + 2 * base_d, 0).astype(np.int32)
                t.freqs[:, BF_EX_BASE] = np.where(
                    base_f >= 0, nw0 + 2 * base_f, 0).astype(np.int32)
                words = np.concatenate([words, patch.astype(np.uint32)])
                remap = lambda s: ("optp",) + s[1:] if (
                    s[0] == "opt" and s[2] > 0) else s
                slist_d = [remap(s) for s in slist_d]
                slist_f = [remap(s) for s in slist_f]
        # A dense-mask variant (expand the pairs into per-block T-word
        # OR-masks; no (R, T, E) apply one-hot at all) was measured WORSE
        # at both scales — 3.09 vs 2.67 us/q at 1x, 9.61 vs 7.78 at 50x
        # (docs/PERF.md round-5: the extra contiguous 512B/row read costs
        # more than the lanes it removes) — and removed; implementation
        # in git history (commit a109b4a).
        self.group_statics_d = slist_d
        self.tile_gid_d = gid_d
        self.group_statics_f = slist_f
        self.tile_gid_f = gid_f
        w = jnp.asarray(words)
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
        import os as _os_og

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
            need = cnt + (1 if gi == ngroups - 1 else 0)
            R = _pow2_at_least(need, lo=8)
            if R > 8 and _os_og.environ.get("DS2I_R_FINE", "1") != "0":
                # quarter-pow2 ladder: padding drops from <=2x to <=1.25x
                # (pow2 row padding inflated 50x decode work 2.4x across
                # ~300 small groups). DEFAULT since round 4, measured on
                # the v5e in the same change: 50x and_skip 7.87 us/q vs
                # 11.70 pow2 (-33%), 1x 2.83 vs 3.15 (docs/PERF.md
                # round-4 tables); bit-identical results
                # (tests/test_dynb.py::test_r_fine_ladder_bit_identical).
                # ~3x more compile keys, amortized by the persistent
                # compile cache. DS2I_R_FINE=0 restores pow2 rows.
                for c in (R // 2 * 5 // 4, R // 2 * 6 // 4, R // 2 * 7 // 4):
                    if need <= c:
                        R = c
                        break
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

    def _split_layout(self, utidx, tblk, nb_d):
        """Freqs-order groups + docs->freqs block permutation for split
        (block-index) parts; trivial placeholders for pair mode."""
        ntiles = len(utidx)
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
        return groups_f, gtile_f, blkperm

    def _entry_score_ub(self, t, qw, missing, counts, span_row,
                        span_of_blk, gblk_flat):
        """Range-aware score upper bound per directory entry: entry e
        (one block of one span, docid range [dlo, dhi]) takes its own
        qw-weighted block max plus, for every OTHER span s of its row,
        qw_s * max doc-term weight of t_s over the blocks overlapping
        [dlo, dhi] — other terms can only add score where their docids
        land in this block's range (block-max WAND's docid alignment,
        exact at block granularity via _blk_overlap + pyramid range max;
        posting-exact for short other-terms). Valid for any doc in the
        block under both OR and AND semantics (same score sum)."""
        tot = len(gblk_flat)
        rowe = span_row[span_of_blk]
        sexcl = np.cumsum(counts) - counts
        cnt_e = counts[rowe]
        P = int(cnt_e.sum())
        ent_of_pair = np.repeat(np.arange(tot, dtype=np.int64), cnt_e)
        pexcl = np.cumsum(cnt_e) - cnt_e
        s_pair = sexcl[rowe][ent_of_pair] + (np.arange(P, dtype=np.int64) - pexcl[ent_of_pair])
        ts_pair = t[s_pair]
        dlo_e = self._blk_dlo[gblk_flat][ent_of_pair]
        dhi_e = self.dmax_blk[gblk_flat][ent_of_pair]
        bf, bl = self._blk_overlap(ts_pair, dlo_e, dhi_e)
        has = bf <= bl
        v = np.zeros(P, dtype=np.float32)
        if np.any(has):
            v[has] = self._range_ub(ts_pair[has], bf[has], bl[has])
        # short other-terms: posting-exact overlap against the entry's
        # docid range (their blocks span wide docid ranges)
        sp = self.is_short[ts_pair] & ~missing[s_pair]
        if np.any(sp):
            base = ts_pair[sp] * self._short_stride
            lo = np.searchsorted(self._short_keys, base + dlo_e[sp])
            hi = np.searchsorted(self._short_keys, base + dhi_e[sp] + 1)
            cnt = hi - lo
            vs = np.where(
                cnt == 0, np.float32(0.0),
                np.where(
                    cnt == 1,
                    self._short_w[np.clip(lo, 0, max(len(self._short_w) - 1, 0))],
                    v[sp],
                ),
            )
            v[sp] = vs
        v = np.where(missing[s_pair], 0.0, v)
        own = s_pair == span_of_blk[ent_of_pair]
        contrib = np.where(own, 0.0, qw[s_pair].astype(np.float64) * v)
        rest_ub = np.add.reduceat(contrib, pexcl) if P else np.zeros(tot)
        return rest_ub + qw.astype(np.float64)[span_of_blk] * self.wmax_blk[gblk_flat]

    def _pruned_directory(self, terms, qw, counts, k, span_row,
                          theta_override=None, probe_rank=None, mode="or",
                          essential=False):
        """Block-max pruned flat directory (device WAND/MaxScore,
        queries.hpp:200-319/:478-591 semantics, batched):

        theta[row] = max over terms of qw * (k-th largest block max) — an
        ACHIEVED lower bound on the true k-th best score (each block max
        is a real doc's doc-term weight; distinct blocks, distinct docs).
        An entry (query, term t, block b) is dropped when
            ub = qw_t*bmax(t,b) + sum_{t' != t} qw_t'*rmax(t', b) < theta
        (rmax = max doc-term weight of t' over b's docid range, an upper
        bound from _blk_overlap + the block max-pyramid):
        every doc in b then has true score < theta <= true k-th score, so
        it cannot enter the top-k; docs that CAN enter keep every block
        of every their term (their ub >= their true score >= theta), so
        their join-assembled scores stay exact. Skipped-entry docs may
        score partially, but partial <= true < theta keeps them out.
        Returns (gblk_kept, span_kept, row_of_blk, row_nb) in global
        block ids, row-major order."""
        B = len(counts)
        t = np.clip(terms, 0, None)
        missing = terms < 0
        span_nb = np.where(missing, 0, self.list_blocks[t])

        tot = int(span_nb.sum())
        if not tot:
            z = np.zeros(0, np.int64)
            return z, z, z, np.zeros(B, np.int64)
        bexcl = np.cumsum(span_nb) - span_nb
        span_of_blk = np.repeat(np.arange(len(span_nb)), span_nb)
        gblk_flat = (
            np.repeat(self.list_gblk0[t] - bexcl, span_nb) + np.arange(tot, dtype=np.int64)
        )

        if probe_rank is not None:
            # phase-1 probe: each term's top probe_rank blocks by block max
            keep = self.rank_blk[gblk_flat] < probe_rank
        elif mode == "and":
            # intersection pruning — the device-side leapfrog analogue
            # (and_query's next_geq skipping, queries.hpp:59-82): drop an
            # entry when ANY other span of its row provably has no posting
            # in the entry's docid range; no doc of the block can then be
            # in the intersection, so counts and scores stay exact (docs
            # IN the intersection overlap every term at themselves, so all
            # their blocks survive).
            rowe = span_row[span_of_blk]
            sexcl = np.cumsum(counts) - counts
            cnt_e = counts[rowe]
            P = int(cnt_e.sum())
            ent_of_pair = np.repeat(np.arange(tot, dtype=np.int64), cnt_e)
            pexcl = np.cumsum(cnt_e) - cnt_e
            s_pair = sexcl[rowe][ent_of_pair] + (np.arange(P, dtype=np.int64) - pexcl[ent_of_pair])
            ts_pair = t[s_pair]
            dlo_e = self._blk_dlo[gblk_flat][ent_of_pair]
            dhi_e = self.dmax_blk[gblk_flat][ent_of_pair]
            bf, bl = self._blk_overlap(ts_pair, dlo_e, dhi_e)
            present = bf <= bl  # block-exact range overlap
            sp = self.is_short[ts_pair]
            if np.any(sp):
                base = ts_pair[sp] * self._short_stride
                lo = np.searchsorted(self._short_keys, base + dlo_e[sp])
                hi = np.searchsorted(self._short_keys, base + dhi_e[sp] + 1)
                present[sp] = hi > lo  # posting-exact overlap
            present[missing[s_pair]] = False  # absent term: empty AND
            own = s_pair == span_of_blk[ent_of_pair]
            ok_pair = present | own
            keep = (
                np.add.reduceat(ok_pair.astype(np.int64), pexcl) == cnt_e
                if P else np.zeros(tot, dtype=bool)
            )
            theta_keep = None
            if theta_override is not None and np.any(np.isfinite(theta_override)):
                # AND score pruning (exact): theta_override[row] is an
                # ACHIEVED k-th best AND score (prepare()'s docid-prefix
                # probe computes true intersection scores of a block
                # subset — any doc fully covered by a subset scores
                # exactly). A block with ub < theta holds no doc of the
                # final top-k (every doc of the true top-k has score >=
                # theta, and each of its blocks has ub >= that score),
                # so dropping it only removes docs that AND semantics
                # already exclude from the top-k: a doc missing ANY
                # block is excluded entirely, not partially scored.
                # Applied to overlap survivors only (ub on the full
                # pre-overlap directory is the expensive part of the OR
                # planner); the fixpoint below then compounds both
                # filters, exact by the same induction.
                srv = np.nonzero(keep)[0]
                th_e = theta_override[span_row[span_of_blk[srv]]]
                cand = np.isfinite(th_e)
                if np.any(cand):
                    sc = srv[cand]
                    ub = self._entry_score_ub(
                        t, qw, missing, counts, span_row,
                        span_of_blk[sc], gblk_flat[sc],
                    )
                    th = th_e[cand]
                    keep[sc[ub < th - np.abs(th) * 1e-4]] = False
                    # the fixpoint below recomputes keep from pair
                    # overlap alone; score drops must stay dropped
                    theta_keep = keep.copy()
            # fixpoint: each round's dropped blocks shrink the other
            # terms' surviving coverage, which drops more blocks — the
            # batched analogue of the cursor leapfrog's mutual narrowing
            # (queries.hpp:59-82 re-probes after every advance). Exact by
            # induction: a doc in the intersection keeps all its blocks
            # in round 0, so each of its pair probes keeps finding the
            # surviving partner block that contains it.
            import os as _os

            stride = self._short_stride
            dmax_flat = self.dmax_blk[gblk_flat]
            dmin_flat = self._blk_dlo[gblk_flat]
            rounds = 0 if _os.environ.get("DS2I_AND_FIXPOINT") == "0" else 3
            for _ in range(rounds):
                if P == 0 or not keep.any():
                    break
                srv = np.nonzero(keep)[0]
                # span-major, docid-ascending by construction of gblk_flat
                keys_max = span_of_blk[srv] * stride + dmax_flat[srv]
                pos = np.searchsorted(keys_max, s_pair * stride + dlo_e)
                posc = np.minimum(pos, max(len(srv) - 1, 0))
                cover = (
                    (pos < len(srv))
                    & (span_of_blk[srv][posc] == s_pair)
                    & (dmin_flat[srv][posc] <= dhi_e)
                )
                ok_new = (present & cover) | own
                keep_new = np.add.reduceat(ok_new.astype(np.int64), pexcl) == cnt_e
                if theta_keep is not None:
                    keep_new &= theta_keep  # score drops stay dropped
                if np.array_equal(keep_new, keep):
                    break
                keep = keep_new
        else:
            # static theta: k-th largest block max per term (CSR; -inf when
            # the term has fewer than k blocks or k exceeds the table)
            if k > self.PRUNE_KMAX and not getattr(self, "_kmax_warned", False):
                from ..utils.logging import logger

                logger(
                    f"warning: k={k} exceeds PRUNE_KMAX={self.PRUNE_KMAX}: "
                    f"per-term static thresholds are disabled (results stay "
                    f"exact; pruning falls back to probe/range bounds only)"
                )
                self._kmax_warned = True
            kstart = self._kth_start[t]
            kn = self._kth_start[t + 1] - kstart
            ok = (~missing) & (kn >= k) & (k <= self.PRUNE_KMAX)
            kth = np.where(ok, self._kth_vals[np.where(ok, kstart + k - 1, 0)], -np.inf)
            theta_s = np.where(ok, qw.astype(np.float64) * kth, -np.inf)
            theta = np.full(B, -np.inf)
            np.maximum.at(theta, span_row, theta_s)
            if theta_override is not None:
                # phase-1 probe scores are true partial scores of real docs,
                # so their k-th best is a valid (usually far tighter) bound
                theta = np.maximum(theta, theta_override)

            ub = self._entry_score_ub(
                t, qw, missing, counts, span_row, span_of_blk, gblk_flat
            )
            # 1e-4 relative margin absorbs f32 accumulation-order noise on
            # both sides (the parity tolerance itself is 0.1% relative,
            # test_ranked_queries.cpp:52)
            th = theta[span_row[span_of_blk]]
            keep = ~(ub < th - np.abs(th) * 1e-4)

            if essential:
                keep = self._essential_restrict(
                    keep, t, qw, counts, missing, theta, span_row,
                    span_of_blk, gblk_flat)

        gblk_kept = gblk_flat[keep]
        span_kept = span_of_blk[keep]
        row_of_blk = span_row[span_kept]
        row_nb = np.bincount(row_of_blk, minlength=B).astype(np.int64)
        return gblk_kept, span_kept, row_of_blk, row_nb

    def _essential_restrict(self, keep, t, qw, counts, missing, theta,
                            span_row, span_of_blk, gblk_flat):
        """MaxScore's essential/non-essential split, applied at PLAN time
        (the device analogue of maxscore_query's candidate restriction,
        queries.hpp:478-591): per query, sort terms ascending by their
        max possible contribution qw*list_wmax; the maximal prefix whose
        cumulative sum stays below theta is NON-ESSENTIAL — no doc
        scoring >= theta can consist of non-essential postings alone, so
        a surviving non-essential block is kept only when its docid
        range overlaps >= 1 surviving ESSENTIAL block of the same query
        (a top-k doc has an essential posting, and both its blocks
        contain its docid, hence overlap — so every top-k doc keeps all
        its blocks and assembled scores stay exact; the restriction is
        often tighter than the score UB test because the UB's pyramid
        range-max rounds outward by up to 4x)."""
        B = len(counts)
        nspans = len(t)
        contrib = np.where(missing, 0.0, qw.astype(np.float64) * self.list_wmax[t])
        # within-row ascending contribution order
        order = np.lexsort((contrib, span_row))
        csum = np.cumsum(contrib[order])
        sexcl = np.cumsum(counts) - counts
        row_of_o = span_row[order]
        # per-row exclusive base of the global cumsum: value just before
        # the row's first ordered span (lexsort keeps rows contiguous, so
        # row r's ordered spans occupy [sexcl[r], sexcl[r]+counts[r]))
        row_base = np.zeros(B, dtype=np.float64)
        nz = counts > 0
        row_base[nz] = np.where(sexcl[nz] > 0, csum[np.maximum(sexcl[nz] - 1, 0)], 0.0)
        within = csum - row_base[row_of_o]
        th_o = theta[row_of_o]
        # non-essential: cumulative (ascending) max-contribution strictly
        # below theta, with the same 1e-4 relative slack the UB test uses
        # (device scores accumulate in f32; the split must not claim
        # "< theta" on sums f32 noise could push over). Rows with no
        # usable theta keep everything essential, and the last (largest)
        # span of each row is always essential.
        is_last = np.zeros(nspans, dtype=bool)
        if nspans:
            is_last[np.cumsum(counts)[nz] - 1] = True
        noness_o = (np.isfinite(th_o)
                    & (within < th_o - np.abs(th_o) * 1e-4) & ~is_last)
        is_noness = np.zeros(nspans, dtype=bool)
        is_noness[order] = noness_o
        if not is_noness.any():
            return keep

        stride = self._short_stride
        dmax_e = self.dmax_blk[gblk_flat]
        dmin_e = self._blk_dlo[gblk_flat]
        row_e = span_row[span_of_blk]
        ess_entry = keep & ~is_noness[span_of_blk]
        non_entry = keep & is_noness[span_of_blk]
        if not non_entry.any():
            return keep
        eidx = np.nonzero(ess_entry)[0]
        srt = np.argsort(row_e[eidx] * stride + dmax_e[eidx], kind="stable")
        eidx = eidx[srt]
        ekey = row_e[eidx] * stride + dmax_e[eidx]
        # keyed suffix-min of dmin: later rows' keys exceed any same-row
        # dhi by construction (dmin < stride), so cross-row contamination
        # can never fake an overlap
        kmin = row_e[eidx] * stride + dmin_e[eidx]
        sufmin = (np.minimum.accumulate(kmin[::-1])[::-1]
                  if len(kmin) else kmin)
        nidx = np.nonzero(non_entry)[0]
        pos = np.searchsorted(ekey, row_e[nidx] * stride + dmin_e[nidx])
        posc = np.minimum(pos, max(len(ekey) - 1, 0))
        ok = (
            (pos < len(ekey))
            & (ekey[posc] < (row_e[nidx] + 1) * stride)
            & (sufmin[posc] - row_e[nidx] * stride <= dmax_e[nidx])
        ) if len(ekey) else np.zeros(len(nidx), dtype=bool)
        keep = keep.copy()
        keep[nidx[~ok]] = False
        return keep

    def _and_prefix_probe(self, dir0, terms, qw, counts, k, tmax):
        """Docid-prefix AND probe: for rows whose overlap-pruned
        directory is still heavy, execute the intersection restricted to
        the blocks whose docid range starts within the rarest span's
        first P kept blocks. Any doc fully covered by a block subset
        scores exactly under AND, so each row's k-th best probe score is
        an ACHIEVED lower bound on its true k-th best — the theta that
        lets _pruned_directory drop high-docid blocks whose score upper
        bound cannot reach the top-k (the device analogue of a WAND
        cursor's threshold tightening as the heap fills,
        queries.hpp:200-319). Returns per-row theta (-inf where the
        probe found fewer than k results) or None when no row is heavy."""
        import os as _os

        gk, sk, rb, rnb = dir0
        B = len(counts)
        H = int(_os.environ.get("DS2I_AND_PROBE_MIN_BLOCKS", 128))
        P = int(_os.environ.get("DS2I_AND_PROBE_BLOCKS", 64))
        heavy = rnb > H
        if not heavy.any() or not len(gk):
            return None
        span_row = np.repeat(np.arange(B), counts)
        sexcl = np.cumsum(counts) - counts
        span_cnt = np.bincount(sk, minlength=len(terms)).astype(np.int64)
        # rarest span per row (kept-block counts; dir entries are
        # row-major with span-contiguous runs)
        slot_of_span = np.arange(len(terms), dtype=np.int64) - sexcl[span_row]
        KEY = 64
        key = span_cnt * KEY + slot_of_span
        rare_key = np.full(B, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(rare_key, span_row, key)
        has = counts > 0
        rare_span = np.where(has, sexcl + (rare_key % KEY), 0)
        rare_cnt = np.where(has, rare_key // KEY, 0)
        # per-row docid cutoff: the rare span's P-th kept block's dmax
        g_excl = np.cumsum(span_cnt) - span_cnt
        ok = heavy & (rare_cnt > 0)
        if not ok.any():
            return None
        last_e = g_excl[rare_span] + np.minimum(rare_cnt, P) - 1
        X = np.full(B, -1, dtype=np.int64)
        X[ok] = self.dmax_blk[gk[last_e[ok]]]
        mask = ok[rb] & (self._blk_dlo[gk] <= X[rb])
        if not mask.any():
            return None
        # compact the probe batch to the heavy rows only
        hrows = np.nonzero(ok)[0]
        hmap = np.full(B, -1, dtype=np.int64)
        hmap[hrows] = np.arange(len(hrows))
        hspan = ok[span_row]
        terms_h, qw_h, counts_h = terms[hspan], qw[hspan], counts[hrows]
        ns_of_os = np.cumsum(hspan) - 1
        pdir = (
            gk[mask],
            ns_of_os[sk[mask]],
            hmap[rb[mask]],
            np.bincount(hmap[rb[mask]], minlength=len(hrows)).astype(np.int64),
        )
        qe = np.cumsum(counts_h)
        qs = qe - counts_h
        plans = []
        for q0, q1, pd in self._split_parts(pdir, counts_h):
            pp = self._part_plan(
                terms_h[qs[q0]:qe[q1 - 1]], qw_h[qs[q0]:qe[q1 - 1]],
                counts_h[q0:q1], k, ("and",), tmax,
                qids=np.arange(q0, q1), prune=True, pruned_dir=pd,
            )
            pp["fscale"] = None  # thresholds need f32 downloads
            pp["fused"] = 0  # one-shot plan: per-group decode compiles
            plans.append(pp)
        pplan = {"plans": plans, "n": len(hrows), "k": k, "ops": ("and",)}
        pres = self.collect(pplan, self.dispatch(pplan))
        theta = np.full(B, -np.inf)
        for hi, r in enumerate(pres):
            s = np.asarray(r[3])
            fin = s[np.isfinite(s)]
            if len(fin) >= k:
                theta[hrows[hi]] = float(fin[k - 1])
        return theta if np.any(np.isfinite(theta)) else None

    def _part_plan(self, terms, qw, counts, k, ops, tmax, qids, prune=False,
                   theta=None, probe_rank=None, pruned_dir=None):
        """Layout for one part: group-major unique-tile ids + per-bucket
        block directories. All numpy, no device work (the pruning tables
        are precomputed device results held on host)."""
        B = len(counts)
        span_row = np.repeat(np.arange(B), counts)
        sexcl = np.cumsum(counts) - counts
        slot_of_span = np.arange(len(terms), dtype=np.int64) - sexcl[span_row]

        if prune:
            # --- block-max pruned path: filter (query, block) entries by
            # score upper bound FIRST, then decode only surviving tiles.
            # prepare() computes the whole batch's directory once and
            # passes each part its slice (pruned_dir), so parts are split
            # by PRUNED slot counts; the direct call remains for callers
            # planning a single part.
            if pruned_dir is not None:
                gblk_kept, span_kept, row_of_blk, row_nb = pruned_dir
            else:
                gblk_kept, span_kept, row_of_blk, row_nb = self._pruned_directory(
                    terms, qw, counts, k, span_row,
                    theta_override=theta, probe_rank=probe_rank,
                    mode="and" if ops == ("and",) else "or",
                )
            tot = len(gblk_kept)
            span_nb_eff = np.bincount(
                span_kept, minlength=len(terms)
            ).astype(np.int64) if tot else np.zeros(len(terms), np.int64)
            tiles_kept = self.tile_of_gblk[gblk_kept] if tot else np.zeros(0, np.int64)
            utidx = np.unique(tiles_kept)
            groups, gtile_ids, tblk, sent_blk, nb_d = self._order_groups(
                utidx, self.tile_gid_d if self.split else self.tile_gid,
                self.group_statics_d if self.split else self.group_statics,
            )
            groups_f, gtile_f, blkperm = self._split_layout(utidx, tblk, nb_d)
            if tot:
                pos = np.searchsorted(utidx, tiles_kept)
                local_blk = tblk[pos] + (gblk_kept - self.gblk0[tiles_kept])
                dir_flat = (local_blk << 5) | slot_of_span[span_kept]
                rexcl = np.zeros(B + 1, dtype=np.int64)
                rexcl[1:] = np.cumsum(row_nb)
                col_of_blk = np.arange(tot, dtype=np.int64) - rexcl[row_of_blk]
            else:
                dir_flat = col_of_blk = np.zeros(0, np.int64)
        else:
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

            # --- group by decode class, group-major row ids (per stream when
            # the index's codecs differ between docs and freqs)
            groups, gtile_ids, tblk, sent_blk, nb_d = self._order_groups(
                utidx, self.tile_gid_d if self.split else self.tile_gid,
                self.group_statics_d if self.split else self.group_statics,
            )
            groups_f, gtile_f, blkperm = self._split_layout(utidx, tblk, nb_d)

            # --- per-unique-term block lists (group-major block ids)
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
            span_nb_eff = span_nb
            row_nb = np.zeros(B, dtype=np.int64)
            np.add.at(row_nb, span_row, span_nb)

            # expand each span's blocks, query-major
            tot = int(span_nb.sum())
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

        min_l = max(self.MIN_L, _pow2_at_least(k))
        Lrow = np.maximum(row_nb * BLOCK, 1)
        Lb = (2 ** np.ceil(np.log2(np.maximum(Lrow, min_l)))).astype(np.int64)
        bkey = Lb << 32

        # --- bucket the queries by Lb
        plan_buckets = []
        ubl = np.unique(bkey)
        bucket_of_row = np.zeros(B, dtype=np.int64)
        row_in_bucket = np.zeros(B, dtype=np.int64)
        for bi, bk in enumerate(ubl):
            L = int(bk) >> 32
            rows = np.nonzero(bkey == bk)[0]
            bucket_of_row[rows] = bi
            row_in_bucket[rows] = np.arange(len(rows))
            Bb = _pow2_at_least(len(rows), lo=1)
            nr = len(rows)
            # full Bb rows (sentinel/zero tail) so the join kernel's
            # compile key is the pow2 bucket shape, shared across parts
            bdir = np.full((Bb, int(L) // BLOCK), sent_blk << 5, dtype=_I32)
            qwtab = np.zeros((Bb, tmax), dtype=_F32)
            tgt = np.zeros(Bb, dtype=_I32)
            tgt[:nr] = counts[rows].astype(_I32)
            plan_buckets.append(
                {"L": int(L), "Bb": Bb, "rows": qids[rows], "dir": bdir, "qwtab": qwtab, "tgt": tgt}
            )
        # real-row gather over the concatenation of the buckets' Bb rows
        bb_off = np.cumsum([0] + [pb["Bb"] for pb in plan_buckets])
        pack_idx = np.concatenate(
            [o + np.arange(len(pb["rows"]), dtype=np.int64)
             for o, pb in zip(bb_off[:-1], plan_buckets)]
        ).astype(_I32) if plan_buckets else np.zeros(0, dtype=_I32)
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
            "pack_idx": pack_idx,
            "sent_dir": int(sent_blk << 5),
            "k": k,
            "ops": ops,
            "tmax": tmax,
        }

    def prepare(self, queries, k=10, ops=("or", "and"), ranked=True, prune=False):
        """Parse + lay out the batch (host only). The returned plan is the
        analogue of queries.cpp's pre-parsed query vector. prune=True
        applies block-max skipping (valid only for top-k OR semantics —
        the WAND/MaxScore result contract); it triggers the one-time
        block-max metadata pass on first use."""
        bad_ops = set(ops) - {"counts", "or", "and"}
        if bad_ops:
            raise ValueError(
                f"unknown ops {sorted(bad_ops)}: ResidentEngine ops are "
                "'counts', 'or', 'and' (+ ranked=True for scored top-k; "
                "wand/maxscore are prepare(prune=True, ops=('or',)))"
            )
        if prune and (tuple(ops) not in (("or",), ("and",)) or not ranked):
            raise ValueError(
                "prune requires ranked ops=('or',) (WAND/MaxScore) or "
                "ops=('and',) (intersection block skipping)"
            )
        import time as _time

        timings = {}
        _t0 = _time.time()
        if prune:
            self._ensure_blockmax()
            timings["blockmax"] = _time.time() - _t0
        _t0 = _time.time()
        terms, qw, counts = self._prep_terms(queries, ranked)
        timings["parse"] = _time.time() - _t0
        qend = np.cumsum(counts)
        qstart = qend - counts
        tmax = _pow2_at_least(int(counts.max()) if len(counts) else 1, lo=2)
        if tmax > 32:
            # the block directory packs the term slot into 5 bits next to
            # the block id ((blk << 5) | slot, _join_bucket), so a row
            # joins at most 32 unique terms; the reference has no such
            # cap but its query logs top out far below it (documented in
            # docs/PARITY.md "Engine limits")
            bad = int(np.argmax(counts > 32))
            raise ValueError(
                f"ResidentEngine supports at most 32 unique terms per "
                f"query (query {bad} has {int(counts[bad])}); split the "
                f"query or use the cursor engines (queries/*) which have "
                f"no term cap"
            )

        probe_theta = None
        full_dir = None
        dir0 = None
        if prune:
            import os as _os

            B = len(queries)
            span_row = np.repeat(np.arange(B), counts)
            mode = "and" if tuple(ops) == ("and",) else "or"
            # Persisted probe thetas: the phase-1 probe executes a device
            # sub-plan (compile + dispatch) inside prepare — the dominant
            # layout cost on a cold process. Its result depends only on
            # (parsed queries, weights, k, mode, probe knobs) for this
            # index, so DS2I_ENGINE_CACHE can replay it across restarts.
            theta_key = None
            have_cached_theta = False
            probe_enabled = (
                _os.environ.get("DS2I_WAND_PROBE") != "0" if mode == "or"
                else _os.environ.get("DS2I_AND_THETA") != "0"
            )
            if self.cache_dir and probe_enabled:
                import hashlib as _hl

                hq = _hl.blake2b(digest_size=12)
                hq.update(np.ascontiguousarray(terms).tobytes())
                hq.update(np.ascontiguousarray(qw).tobytes())
                hq.update(np.ascontiguousarray(counts).tobytes())
                knobs = (
                    k, mode,
                    _os.environ.get("DS2I_AND_PROBE_MIN_BLOCKS", "128"),
                    _os.environ.get("DS2I_AND_PROBE_BLOCKS", "64"),
                    # the AND probe's input directory is fixpoint-pruned,
                    # so its thetas depend on this knob too
                    _os.environ.get("DS2I_AND_FIXPOINT", "1"),
                )
                hq.update(str(knobs).encode())
                theta_key = f"theta_{mode}_{hq.hexdigest()}"
                cached = self._cache_load(theta_key, with_norms=True)
                if cached is not None:
                    t_arr = cached["theta"]
                    probe_theta = t_arr if np.any(np.isfinite(t_arr)) else None
                    have_cached_theta = True
                    timings["probe"] = 0.0
            if have_cached_theta:
                pass
            elif mode == "or" and _os.environ.get("DS2I_WAND_PROBE") != "0":
                # phase 1: score only each term's top-P blocks (by block
                # max). The resulting per-query k-th best score is a TRUE
                # achieved partial score — a valid, much tighter threshold
                # than the static single-term bound, because it captures
                # multi-term score interactions.
                _tp = _time.time()
                probe_rank = max(2, -(-2 * k // BLOCK))
                pdir = self._pruned_directory(
                    terms, qw, counts, k, span_row, probe_rank=probe_rank)
                probe_plans = []
                for q0, q1, pd in self._split_parts(pdir, counts):
                    pp = self._part_plan(
                        terms[qstart[q0]:qend[q1 - 1]], qw[qstart[q0]:qend[q1 - 1]],
                        counts[q0:q1], k, ("or",), tmax,
                        qids=np.arange(q0, q1), prune=True, pruned_dir=pd,
                    )
                    pp["fscale"] = None  # thresholds need f32 downloads
                    pp["fused"] = 0  # one-shot plan: per-group decode compiles
                    probe_plans.append(pp)
                pplan = {"plans": probe_plans, "n": B, "k": k, "ops": ("or",)}
                pres = self.collect(pplan, self.dispatch(pplan))
                probe_theta = np.full(B, -np.inf)
                for qi, r in enumerate(pres):
                    s = np.asarray(r[2])
                    fin = s[np.isfinite(s)]
                    if len(fin) >= k:
                        probe_theta[qi] = float(fin[k - 1])
                timings["probe"] = _time.time() - _tp
                if theta_key is not None:
                    self._cache_save(theta_key, with_norms=True, theta=probe_theta)
            elif mode == "and" and _os.environ.get("DS2I_AND_THETA") != "0":
                # phase 1 for AND: overlap-prune, then a docid-prefix
                # probe on the still-heavy rows whose achieved k-th best
                # intersection scores let phase 2 drop blocks by score
                # upper bound as well (see _and_prefix_probe)
                _tp = _time.time()
                dir0 = self._pruned_directory(
                    terms, qw, counts, k, span_row, mode="and")
                timings["dir0"] = _time.time() - _tp
                _tp = _time.time()
                probe_theta = self._and_prefix_probe(
                    dir0, terms, qw, counts, k, tmax)
                timings["probe"] = _time.time() - _tp
                if theta_key is not None:
                    self._cache_save(
                        theta_key, with_norms=True,
                        theta=(probe_theta if probe_theta is not None
                               else np.full(B, -np.inf)),
                    )
            # the batch's FULL pruned directory, computed once: parts are
            # then split by the slots that actually survive pruning —
            # with unpruned slot counts the 50x query log shattered into
            # 35 parts (35 dispatch units per pass) for work that fits
            # comfortably in 3
            _tp = _time.time()
            if mode == "and" and probe_theta is None and dir0 is not None:
                full_dir = dir0  # no heavy rows: phase-1 result is final
            else:
                full_dir = self._pruned_directory(
                    terms, qw, counts, k, span_row,
                    theta_override=probe_theta, mode=mode,
                    essential=(prune == "maxscore"),
                )
            timings["directory"] = _time.time() - _tp
            _tp = _time.time()
            plans = [
                self._part_plan(
                    terms[qstart[q0]:qend[q1 - 1]], qw[qstart[q0]:qend[q1 - 1]],
                    counts[q0:q1], k, tuple(ops), tmax,
                    qids=np.arange(q0, q1), prune=True, pruned_dir=pd,
                )
                for q0, q1, pd in self._split_parts(full_dir, counts)
            ]
            timings["part_plans"] = _time.time() - _tp
            if _os.environ.get("DS2I_ENGINE_DEBUG"):
                from ..utils.logging import logger

                logger("prepare timings: " + ", ".join(
                    f"{k_}={v:.2f}s" for k_, v in timings.items()))
            return {"plans": plans, "n": B, "k": k, "ops": tuple(ops),
                    "timings": timings}

        # exhaustive path: part splitting by bucketed (unpruned) slot budget
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

    def _split_parts(self, full_dir, counts):
        """Split a batch into parts by the PRUNED per-query slot cost and
        slice the batch-wide pruned directory for each part: yields
        (q0, q1, (gblk_kept, span_kept_local, row_of_blk_local, row_nb_local)).
        Directory entries are row-major (spans are query-major and blocks
        span-major), so each part's slice is contiguous."""
        gblk_kept, span_kept, row_of_blk, row_nb = full_dir
        B = len(counts)
        Lb = np.maximum(row_nb * BLOCK, 1)
        Lb = np.maximum(
            2 ** np.ceil(np.log2(np.maximum(Lb, self.MIN_L))).astype(np.int64),
            self.MIN_L,
        )
        parts = []
        cur0, cur_slots = 0, 0
        for qi in range(B):
            if qi > cur0 and (
                cur_slots + Lb[qi] > self.max_part_slots
                or qi - cur0 >= self.max_part_queries
            ):
                parts.append((cur0, qi))
                cur0, cur_slots = qi, 0
            cur_slots += Lb[qi]
        parts.append((cur0, B))
        sexcl = np.cumsum(counts) - counts
        bounds = np.searchsorted(row_of_blk, [q for q, _ in parts] + [B])
        for (q0, q1), e0, e1 in zip(parts, bounds[:-1], bounds[1:]):
            if q1 <= q0:
                continue
            yield q0, q1, (
                gblk_kept[e0:e1],
                span_kept[e0:e1] - sexcl[q0],
                row_of_blk[e0:e1] - q0,
                row_nb[q0:q1],
            )

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
                    self.tiles_freqs, self.norm_den,
                )
                nlb, tg0 = (self.den_blocks, self.tile_gblk0) if normcache else (None, None)
                put = jnp.asarray
            dk = pi % len(self.devices) if self._replicas else 0
            # ranked one-shot plans (the prepare-time probe) decode
            # UNFUSED: per-group executables keyed on (R, statics) hit
            # the compile cache across plans, where the fused decode
            # recompiles per plan layout. DS2I_DECODE_FUSED overrides
            # both ways for measurement.
            fenv = _os.environ.get("DS2I_DECODE_FUSED")
            ranked_p = ("or" in p["ops"]) or ("and" in p["ops"])
            fused = int(p.get("fused", 1)) if fenv is None else int(fenv != "0")
            if not ranked_p or self.pallas:
                fused = 1
            cache = p.setdefault("_dev", {})
            if (dk, fused) not in cache:
                if fused:
                    gt, gf = put(p["gtile_ids"]), put(p["gtile_f"])
                else:
                    gt = tuple(
                        put(p["gtile_ids"][off : off + R])
                        for off, R, _ in p["groups"]
                    )
                    gf = tuple(
                        put(p["gtile_f"][off : off + R])
                        for off, R, _ in p["groups_f"]
                    )
                cache[(dk, fused)] = (
                    gt,
                    gf,
                    put(p["blkperm"]),
                    tuple(put(b["dir"]) for b in bb),
                    tuple(put(b["qwtab"]) for b in bb),
                    tuple(put(b["tgt"]) for b in bb),
                    put(p["pack_idx"]),
                )
            d_gt, d_gf, d_bp, d_dir, d_qw, d_tgt, d_pidx = cache[(dk, fused)]
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
                d_pidx,
                groups=p["groups"],
                groups_f=p["groups_f"],
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
                den_blocks=nlb,
                tile_gblk0=tg0,
                fused=fused,
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

    def run(self, queries, k=10, ops=("or", "and"), ranked=True, prune=False):
        return self.execute(self.prepare(queries, k=k, ops=ops, ranked=ranked, prune=prune))

    # -- public ops (API-compatible with TileQueryEngine) ----------------------

    def and_counts(self, queries):
        return np.array([r[0] for r in self.run(queries, ops=("counts",), ranked=False)])

    def or_counts(self, queries):
        return np.array([r[1] for r in self.run(queries, ops=("counts",), ranked=False)])

    def _topk_list(self, r):
        return [float(s) for s in r[np.isfinite(r)]]

    def ranked_or(self, queries, k=10):
        return [self._topk_list(r[2]) for r in self.run(queries, k=k, ops=("or",))]

    def ranked_and(self, queries, k=10, prune=False):
        """prune=True skips blocks provably outside the intersection
        (device leapfrog analogue; results identical)."""
        return [
            self._topk_list(r[3])
            for r in self.run(queries, k=k, ops=("and",), prune=prune)
        ]

    def wand(self, queries, k=10):
        """Top-k OR with device block-max pruning (wand_query semantics,
        queries.hpp:200-319): results equal ranked_or's top-k exactly;
        blocks provably below the per-query threshold are skipped before
        decode, shrinking both the decode set and the join width."""
        return [self._topk_list(r[2]) for r in self.run(queries, k=k, ops=("or",), prune=True)]

    def maxscore(self, queries, k=10):
        """Top-k OR with the MaxScore candidate restriction layered on
        the block-max directory (maxscore_query semantics,
        queries.hpp:478-591, at plan time): terms are split into
        essential/non-essential by cumulative max contribution vs the
        per-query threshold, and a non-essential term's blocks are kept
        only where they overlap a surviving essential block
        (_essential_restrict). Results equal ranked_or's top-k exactly
        (tested); the restriction can out-prune wand's score-UB test
        because the UB's pyramid range-max rounds outward."""
        return [
            self._topk_list(r[2])
            for r in self.run(queries, k=k, ops=("or",), prune="maxscore")
        ]
