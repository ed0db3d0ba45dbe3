"""Batched QMX 128-block decode on device.

Mirrors codecs/qmx.py (the re-derivation of the reference's qmx_codec.hpp
selector design): 16-byte payload words each packing floor(128/w) values
at a per-word width w, plus trailing selector bytes (width_class << 4 |
run of words).

Device formulation: selector bytes expand to per-payload-word classes
with a run-boundary comparison-reduce; per-word value counts prefix-scan
into word bases; each output lane locates its word branch-free, then
extracts its bit field from the payload window. The reference needs ~6k
lines of unrolled SSE for this; the selector table IS the kernel here.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..codecs.qmx import QMX_WIDTHS, _PER_WORD

_U32 = jnp.uint32


@partial(jax.jit, static_argnames=("NW", "S", "T"))
def qmx_decode(words, pay_bit0, nwords, sel_byte0, nsel, NW, S, T=128):
    """Decode one group of full QMX blocks.

    words: u32[] stream; pay_bit0 (R,): payload start (bits);
    nwords (R,): 16-byte payload words; sel_byte0 (R,): selector bytes
    start; nsel (R,): selector count. NW/S: static capacities.
    Returns (R, T) int32 values.
    """
    R = pay_bit0.shape[0]
    nw_stream = words.shape[0]

    # --- selector bytes via realigned window (static byte positions)
    SW = (S + 7) // 4 + 2
    sbit0 = sel_byte0 * 8
    widx = (sbit0 >> 5)[:, None] + jnp.arange(SW, dtype=jnp.int32)[None, :]
    swin = words[jnp.clip(widx, 0, nw_stream - 1)]
    ss = (sbit0 & 31)[:, None].astype(_U32)
    snxt = jnp.concatenate([swin[:, 1:], jnp.zeros((R, 1), _U32)], axis=1)
    saligned = (swin >> ss) | jnp.where(ss > 0, snxt << (_U32(32) - ss), _U32(0))

    def sbyte(k):
        return ((saligned[:, k >> 2] >> _U32(8 * (k & 3))) & _U32(0xFF)).astype(jnp.int32)

    sel = jnp.stack([sbyte(k) for k in range(S)], axis=1)  # (R, S)
    svalid = jnp.arange(S, dtype=jnp.int32)[None, :] < nsel[:, None]
    ci_s = jnp.where(svalid, sel >> 4, 0)
    run_s = jnp.where(svalid, sel & 15, 0)
    run_cum = jnp.cumsum(run_s, axis=1)  # inclusive (R, S)

    # --- per-payload-word class
    ww = jnp.arange(NW, dtype=jnp.int32)[None, :, None]  # (1, NW, 1)
    cover = (ww < run_cum[:, None, :]) & (ww >= (run_cum - run_s)[:, None, :])
    class_w = jnp.where(cover, ci_s[:, None, :], 0).sum(axis=2, dtype=jnp.int32)  # (R, NW)
    wvalid = jnp.arange(NW, dtype=jnp.int32)[None, :] < nwords[:, None]

    per_w = jnp.zeros((R, NW), jnp.int32)
    width_w = jnp.zeros((R, NW), jnp.int32)
    for c, (w, per) in enumerate(zip(QMX_WIDTHS, _PER_WORD)):
        hit = (class_w == c) & wvalid
        per_w = per_w + jnp.where(hit, per, 0)
        width_w = width_w + jnp.where(hit, w, 0)
    base_w = jnp.cumsum(per_w, axis=1) - per_w  # exclusive (R, NW)

    # --- locate each output lane's word
    v = jnp.arange(T, dtype=jnp.int32)[None, :]
    le = base_w[:, None, :] <= v[:, :, None]  # (R, T, NW)
    word_of = le.sum(axis=2, dtype=jnp.int32) - 1
    word_of = jnp.clip(word_of, 0, NW - 1)
    pick = jnp.arange(NW, dtype=jnp.int32)[None, None, :] == word_of[:, :, None]
    b_v = jnp.where(pick, base_w[:, None, :], 0).sum(axis=2, dtype=jnp.int32)
    wd_v = jnp.where(pick, width_w[:, None, :], 0).sum(axis=2, dtype=jnp.int32)
    jj = v - b_v

    # --- payload bit-field extraction from the block window
    PW = NW * 4 + 2  # u32 words covering the payload
    pidx = (pay_bit0 >> 5)[:, None] + jnp.arange(PW, dtype=jnp.int32)[None, :]
    pwin = words[jnp.clip(pidx, 0, nw_stream - 1)]  # (R, PW)
    bitoff = (pay_bit0 & 31)[:, None] + word_of * 128 + jj * wd_v  # (R, T)
    w0i = jnp.clip(bitoff >> 5, 0, PW - 2)
    s = (bitoff & 31).astype(_U32)
    cols = jnp.arange(PW, dtype=jnp.int32)[None, None, :]
    w0 = jnp.where(w0i[:, :, None] == cols, pwin[:, None, :], _U32(0)).sum(axis=2, dtype=_U32)
    w1 = jnp.where((w0i + 1)[:, :, None] == cols, pwin[:, None, :], _U32(0)).sum(axis=2, dtype=_U32)
    x = (w0 >> s) | jnp.where(s > 0, w1 << (_U32(32) - s), _U32(0))
    mask = jnp.where(
        wd_v >= 32, _U32(0xFFFFFFFF), (_U32(1) << jnp.clip(wd_v, 0, 31).astype(_U32)) - _U32(1)
    )
    return (x & mask).astype(jnp.int32)
