"""Batched device query engine.

TPU-first reformulation of the reference's query operators (queries.hpp):
instead of pointer-chasing cursors with branchy skip logic, every query
batch is executed as dense, fixed-shape tensor ops in ONE fused jit
dispatch per chunk:

  segment decode (select + field gather from the compressed HBM words)
  -> per-posting BM25 contributions
  -> scatter-accumulate into a (B, num_docs) score/count plane
  -> top-k.

Boolean AND/OR become count comparisons on the same plane. WAND and
MaxScore pruning exist in the reference to SKIP postings on a serial CPU;
on a TPU the branch-free exhaustive evaluation of the whole batch is the
faster program shape, and it returns exactly the scores the pruned
algorithms return (pruning is lossless) — verified against the oracle in
tests. The pruned cursor implementations remain available in
ds2i_tpu.queries for single-query/CPU use.

Irregularity handling (the "hard part" in SURVEY.md §7): queries are
sorted by their longest posting list and chunked, so each chunk's decode
window W, segment capacity Lseg and tile width L are sized for ITS lists
only — short-list chunks stay tiny while the rare long-list chunk pays
full width. All dims are pow2-snapped to bound recompilation.

Scores are float32, like the reference; summation order differs
(scatter-add vs DAAT), so comparisons use the reference test tolerance
(0.1% relative, test_ranked_queries.cpp:52).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.decode import decode_rows
from ..queries.bm25 import BM25
from ..queries.parsing import query_freqs

_F32 = np.float32
_I32 = np.int32


_SEG_FIELDS = (
    "kind", "sel_start", "sel_len", "lb_start", "lower_bits",
    "n_vals", "base", "out_begin", "list_row",
)


def _decode_packed(words, packed, list_n, W, Lseg, rows, L_out, sentinel):
    f = {name: packed[:, i] for i, name in enumerate(_SEG_FIELDS)}
    return decode_rows(
        words,
        f["kind"], f["sel_start"], f["sel_len"], f["lb_start"],
        f["lower_bits"], f["n_vals"], f["base"], f["out_begin"],
        f["list_row"], list_n,
        W=W, Lseg=Lseg, rows=rows, L_out=L_out, sentinel=sentinel,
    )


@partial(
    jax.jit,
    static_argnames=("W", "Lseg", "B", "T", "L", "num_docs", "k", "with_scores"),
)
def _chunk_step(
    docs_words,
    freqs_words,
    dsegs,  # int32[Rd, 9] packed segment fields
    fsegs,  # int32[Rf, 9]
    list_n,  # int32[B*T + 1]
    qw,  # f32[B, T]; 0 marks an inactive term slot
    norm_lens,  # f32[num_docs]
    W,
    Lseg,
    B,
    T,
    L,
    num_docs,
    k,
    with_scores,
):
    rows = B * T + 1
    term_valid = qw > 0
    docs = _decode_packed(docs_words, dsegs, list_n, W, Lseg, rows, L, num_docs)[
        : B * T
    ].reshape(B, T, L)
    docs = jnp.where(term_valid[:, :, None], docs, num_docs)

    valid = docs < num_docs
    didx = jnp.where(valid, docs, num_docs)
    bi = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None, None], docs.shape)
    target = term_valid.sum(axis=1, dtype=jnp.int32)

    counts = jnp.zeros((B, num_docs + 1), dtype=jnp.int32).at[bi, didx].add(
        valid.astype(jnp.int32)
    )[:, :num_docs]
    and_counts = (counts == target[:, None]).sum(axis=1, dtype=jnp.int32)
    or_counts = (counts > 0).sum(axis=1, dtype=jnp.int32)

    if not with_scores:
        z = jnp.zeros((B, k), dtype=jnp.float32)
        return and_counts, or_counts, z, z

    cums = _decode_packed(freqs_words, fsegs, list_n, W, Lseg, rows, L, 0)[
        : B * T
    ].reshape(B, T, L)
    freqs = jnp.diff(cums, axis=2, prepend=jnp.zeros((B, T, 1), jnp.int32))

    nl = norm_lens[jnp.clip(docs, 0, num_docs - 1)]
    f = freqs.astype(jnp.float32)
    k1 = jnp.float32(BM25.k1)
    b = jnp.float32(BM25.b)
    contrib = qw[:, :, None] * (f / (f + k1 * (jnp.float32(1.0) - b + b * nl)))
    contrib = jnp.where(valid, contrib, 0.0)

    scores = jnp.zeros((B, num_docs + 1), dtype=jnp.float32).at[bi, didx].add(contrib)[
        :, :num_docs
    ]
    topk_or, _ = jax.lax.top_k(jnp.where(counts > 0, scores, -jnp.inf), k)
    topk_and, _ = jax.lax.top_k(jnp.where(counts == target[:, None], scores, -jnp.inf), k)
    return and_counts, or_counts, topk_or, topk_and


def _pow2_at_least(x, lo=1):
    v = lo
    while v < x:
        v *= 2
    return v


class QueryEngine:
    """Executes query batches on device against a DeviceIndex."""

    def __init__(self, index, wdata=None, scorer=BM25, chunk=512, max_plane_elems=128 << 20):
        from .device_index import DeviceIndex

        self.dindex = index if isinstance(index, DeviceIndex) else DeviceIndex(index)
        self.num_docs = self.dindex.num_docs
        self.wdata = wdata
        self.scorer = scorer
        self.norm_lens = (
            jnp.asarray(wdata.norm_lens)
            if wdata is not None
            else jnp.ones(self.num_docs, jnp.float32)
        )
        self.chunk = min(chunk, max(8, int(max_plane_elems // max(self.num_docs, 1) // 8)))

    # -- query prep -----------------------------------------------------------

    def _prep(self, queries, ranked):
        out = []
        for terms in queries:
            tf = query_freqs(terms)
            if ranked:
                qws = [
                    float(
                        self.scorer.query_term_weight(
                            qf, int(self.dindex.list_n[t]), self.num_docs
                        )
                    )
                    for t, qf in tf
                ]
            else:
                qws = [1.0] * len(tf)
            out.append(([t for t, _ in tf], qws))
        return out

    def _pack_segs(self, g, Rpad, off_row):
        a = np.zeros((Rpad, len(_SEG_FIELDS)), dtype=_I32)
        a[:, 0] = -1  # kind: padding matches no decode formula
        a[:, 8] = off_row  # list_row: padding scatters into the spare row
        R = len(g["kind"])
        for i, name in enumerate(_SEG_FIELDS):
            a[:R, i] = g[name]
        return a

    def _run_chunk(self, prepped, B, T, L, k, with_scores):
        """Issues one async device dispatch; returns device output refs."""
        d = self.dindex
        flat_terms = np.full(B * T, -1, dtype=np.int64)  # -1: empty slot
        qw = np.zeros((B, T), dtype=_F32)
        for bi, (terms, qws) in enumerate(prepped):
            for ti in range(min(T, len(terms))):
                flat_terms[bi * T + ti] = terms[ti]
                qw[bi, ti] = qws[ti]

        gd = d._gather_segments(d.docs_segs, d.d_ranges, flat_terms)
        gf = d._gather_segments(d.freqs_segs, d.f_ranges, flat_terms)
        Lseg = L  # segments never exceed their list's padded length
        slack_d = (gd["sel_start"] & 31) + gd["sel_len"]
        slack_f = (gf["sel_start"] & 31) + gf["sel_len"]
        wmax = max(
            int(slack_d.max()) if len(slack_d) else 1,
            int(slack_f.max()) if len(slack_f) else 1,
        )
        W = _pow2_at_least((wmax + 31) // 32, lo=4)
        Rpad = _pow2_at_least(max(len(gd["kind"]), len(gf["kind"]), 1), lo=8)

        list_n = np.zeros(B * T + 1, dtype=_I32)
        tv = flat_terms >= 0
        list_n[: B * T][tv] = d.list_n[flat_terms[tv]]

        return _chunk_step(
            d.docs_words,
            d.freqs_words,
            jnp.asarray(self._pack_segs(gd, Rpad, B * T)),
            jnp.asarray(self._pack_segs(gf, Rpad, B * T)),
            jnp.asarray(list_n),
            jnp.asarray(qw),
            self.norm_lens,
            W=W,
            Lseg=Lseg,
            B=B,
            T=T,
            L=L,
            num_docs=self.num_docs,
            k=k,
            with_scores=with_scores,
        )

    def _run(self, queries, k=10, with_scores=True, ranked=True):
        """Bucket queries by longest-list length; ONE async dispatch per
        bucket, readback pipelined after all dispatches are in flight
        (the tunnel round-trip hides behind compute)."""
        prepped = self._prep(queries, ranked)
        T = _pow2_at_least(max(1, max(len(t) for t, _ in prepped)), lo=1)

        buckets = {}
        for qi, (terms, _) in enumerate(prepped):
            ml = max((int(self.dindex.list_n[t]) for t in terms), default=0)
            Lb = _pow2_at_least(max(1, ml), lo=16)
            buckets.setdefault(Lb, []).append(qi)

        pending = []
        for Lb in sorted(buckets):
            idxs = buckets[Lb]
            for i in range(0, len(idxs), self.chunk):
                part = idxs[i : i + self.chunk]
                B = _pow2_at_least(len(part), lo=8)
                chunk = [prepped[j] for j in part] + [([], [])] * (B - len(part))
                out = self._run_chunk(chunk, B, T, Lb, k, with_scores)
                pending.append((part, out))

        results = [None] * len(prepped)
        for part, out in pending:
            res = [np.asarray(r) for r in out]
            for local, j in enumerate(part):
                results[j] = tuple(r[local] for r in res)
        return results

    # -- public ops -----------------------------------------------------------

    def and_counts(self, queries):
        return np.array([r[0] for r in self._run(queries, with_scores=False, ranked=False)])

    def or_counts(self, queries):
        return np.array([r[1] for r in self._run(queries, with_scores=False, ranked=False)])

    def _topk_list(self, row):
        return [float(s) for s in row[np.isfinite(row)]]

    def ranked_or(self, queries, k=10):
        return [self._topk_list(r[2]) for r in self._run(queries, k=k)]

    def ranked_and(self, queries, k=10):
        return [self._topk_list(r[3]) for r in self._run(queries, k=k)]

    # WAND / MaxScore return exactly the exhaustive top-k (lossless pruning);
    # on TPU the branch-free exhaustive plane IS the fast implementation.
    wand = ranked_or
    maxscore = ranked_or
