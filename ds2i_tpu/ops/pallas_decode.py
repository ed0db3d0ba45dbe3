"""Fused Pallas TPU kernel for tile decode.

An alternative to the XLA comparison-reduce decode
(engine.tile_executor._decode_group): every intermediate lives in VMEM
and the W/WL reductions are unrolled static loops over (BR, T) vector
ops.

Measured head-to-head on v5e (10k-doc bench, 54k tiles/part, both
streams): XLA 15.7ms vs Pallas 20.3ms — XLA's own fusion of the
comparison-reduce formulation already keeps the masks out of HBM at
these widths, and the kernel pays narrow-lane padding (T=32 groups use
a quarter of the VPU lanes) plus per-grid-step overhead at the small
block sizes the scoped-VMEM limit forces. The engine therefore defaults
to the XLA path (ResidentEngine(pallas=0)); the kernel stays available
(pallas=1, or DS2I_PALLAS=1) and is bit-identical (tests compare both).

One kernel invocation decodes BOTH streams of a tile group (docs + freq
prefix sums) and emits doc ids (pads -> num_docs) and tile-local freqs
(using the F_PREV_CUM table field), i.e. everything up to — but not
including — the per-doc norm-length gather, which stays in XLA.

Layout: rows (tiles) ride the sublane axis, the T value slots ride the
lane axis; per-row scalars broadcast along lanes. The select window words
are pre-gathered by XLA into dense (R, W) blocks (elementwise gathers of
R*W u32 are cheap; it is the per-slot HBM masks that are not).

Reference semantics: compact_elias_fano.hpp enumerators (value
reconstruction), compact_ranked_bitvector.hpp, all_ones_sequence.hpp.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.tiles import (
    F_BASE, F_KIND, F_LB_BITOFF, F_LB_WORD0, F_LOWER_BITS, F_NVALS,
    F_PREV_CUM, F_SEL_ADJ, F_WIN_BITOFF, F_WIN_LEN, F_WIN_WORD0, N_FIELDS,
)
from .segments import SEG_AO, SEG_EF, SEG_EF_STRICT, SEG_RB

_U32 = jnp.uint32


def _masked_lowbits(h):
    """(1 << h) - 1 for h clipped to [0, 32], uint32-safe, vectorized."""
    h = jnp.clip(h, 0, 32).astype(_U32)
    return jnp.where(h >= 32, _U32(0xFFFFFFFF), (_U32(1) << (h & _U32(31))) - _U32(1))


def _decode_stream(win, lbw, fld, W, WL, T):
    """Shared kernel math for one stream: (BR, W) window words +
    (BR, WL+1) low-bit words + (BR, N_FIELDS) fields -> (BR, T) values."""
    BR = win.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (BR, T), 1)

    bitoff = fld[:, F_WIN_BITOFF][:, None]
    wlen = fld[:, F_WIN_LEN][:, None]

    def wcol(w):
        # recompute the masked window column (cheap; avoids W live temps)
        lo = bitoff - w * 32
        hi = bitoff + wlen - w * 32
        return win[:, w][:, None] & (_masked_lowbits(hi) & ~_masked_lowbits(lo))

    # pass 1: word holding the (j+1)-th one via running popcount
    word_idx = jnp.zeros((BR, T), jnp.int32)
    run = jnp.zeros((BR, 1), jnp.int32)
    for w in range(W):
        run = run + jax.lax.population_count(wcol(w)).astype(jnp.int32)
        word_idx = word_idx + (run <= j)
    # pass 2: preceding rank and the target word itself
    rank_before = jnp.zeros((BR, T), jnp.int32)
    target = jnp.zeros((BR, T), _U32)
    run = jnp.zeros((BR, 1), jnp.int32)
    for w in range(W):
        col = wcol(w)
        run = run + jax.lax.population_count(col).astype(jnp.int32)
        rank_before = rank_before + jnp.where(word_idx == w + 1, run, 0)
        target = target | jnp.where(jnp.minimum(word_idx, W - 1) == w, col, _U32(0))

    # branchless in-word select of the (rem+1)-th set bit
    rem = j - rank_before
    pos = jnp.zeros((BR, T), jnp.int32)
    for width in (16, 8, 4, 2, 1):
        mask = ((_U32(1) << _U32(width)) - _U32(1)) << pos.astype(_U32)
        c = jax.lax.population_count(target & mask).astype(jnp.int32)
        right = rem >= c
        rem = rem - jnp.where(right, c, 0)
        pos = pos + jnp.where(right, width, 0)
    sel = jnp.minimum(word_idx, W - 1) * 32 + pos - bitoff

    # low bits: per-slot l-bit field at lb_bitoff + j*l, via masked column scan
    l = fld[:, F_LOWER_BITS][:, None]
    bit_off = fld[:, F_LB_BITOFF][:, None] + j * l
    w0i = jnp.clip(bit_off >> 5, 0, WL)
    s = (bit_off & 31).astype(_U32)
    w0 = jnp.zeros((BR, T), _U32)
    w1 = jnp.zeros((BR, T), _U32)
    for c in range(WL + 1):
        col = lbw[:, c][:, None]
        w0 = w0 | jnp.where(w0i == c, col, _U32(0))
        w1 = w1 | jnp.where(w0i + 1 == c, col, _U32(0))
    low = (w0 >> s) | jnp.where(s > 0, w1 << (_U32(32) - s), _U32(0))
    lmask = jnp.where(l >= 32, _U32(0xFFFFFFFF), (_U32(1) << jnp.clip(l, 0, 31).astype(_U32)) - _U32(1))
    low = (low & lmask).astype(jnp.int32)

    kind = fld[:, F_KIND][:, None]
    adj = fld[:, F_SEL_ADJ][:, None]
    base = fld[:, F_BASE][:, None]
    ef_val = ((sel + adj - j) << l) | low
    val = jnp.where(kind == SEG_EF, ef_val, 0)
    val = jnp.where(kind == SEG_EF_STRICT, ef_val + j, val)
    val = jnp.where(kind == SEG_RB, sel + adj, val)
    val = jnp.where(kind == SEG_AO, j, val)
    return val + base


def _pair_kernel(dwin, dlb, dfld, fwin, flb, ffld, doc_out, freq_out, *, W, WL, T, num_docs):
    BR = dwin.shape[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (BR, T), 1)

    dv = _decode_stream(dwin[:], dlb[:], dfld[:], W, WL, T)
    fv = _decode_stream(fwin[:], flb[:], ffld[:], W, WL, T)

    valid = j < dfld[:, F_NVALS][:, None]
    doc_out[:] = jnp.where(valid, dv, num_docs)

    # tile-local freq: cum diff, lane 0 uses the table's prev_cum
    prev = jnp.concatenate([jnp.zeros((BR, 1), jnp.int32), fv[:, : T - 1]], axis=1)
    prev = jnp.where(j == 0, ffld[:, F_PREV_CUM][:, None], prev)
    freq_out[:] = jnp.where(valid, fv - prev, 0)


def _gather_windows(words, fld, W, WL):
    """XLA-side dense window gathers: (R, W) select words + (R, WL+1)
    low-bit words per tile row."""
    R = fld.shape[0]
    nw = words.shape[0]
    widx = fld[:, F_WIN_WORD0][:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    win = words[jnp.clip(widx, 0, nw - 1)]
    lidx = fld[:, F_LB_WORD0][:, None] + jnp.arange(WL + 1, dtype=jnp.int32)[None, :]
    lbw = words[jnp.clip(lidx, 0, nw - 1)]
    return win, lbw


def decode_pair(docs_words, freqs_words, dfld, ffld, W, WL, T, num_docs, interpret=False):
    """Decode one (W, WL, T) tile group, both streams fused: returns
    (doc (R, T) i32 with pads -> num_docs, freq (R, T) i32). Traceable —
    call from inside jit."""
    R = dfld.shape[0]
    dwin, dlb = _gather_windows(docs_words, dfld, W, WL)
    fwin, flb = _gather_windows(freqs_words, ffld, W, WL)

    # VMEM budget: temporaries are (BR, T) but narrow arrays pad to 128
    # lanes, and the unrolled W/WL loops keep a large live set; scale the
    # block rows down with the unroll weight
    BR = 8
    target = max(8, 4096 // (W + WL + T // 8))
    while BR * 2 <= min(R, target):
        BR *= 2
    while R % BR:
        BR //= 2
    grid = (R // BR,)

    def row_spec(cols, dtype_cols=None):
        return pl.BlockSpec((BR, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((R, T), jnp.int32),
        jax.ShapeDtypeStruct((R, T), jnp.int32),
    ]
    kernel = partial(_pair_kernel, W=W, WL=WL, T=T, num_docs=num_docs)
    doc, freq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec(W), row_spec(WL + 1), row_spec(N_FIELDS),
            row_spec(W), row_spec(WL + 1), row_spec(N_FIELDS),
        ],
        out_specs=[row_spec(T), row_spec(T)],
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(dwin, dlb, dfld, fwin, flb, ffld)
    return doc, freq


decode_group_pair = jax.jit(
    decode_pair, static_argnames=("W", "WL", "T", "num_docs", "interpret")
)
