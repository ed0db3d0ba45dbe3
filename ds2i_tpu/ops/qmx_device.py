"""Batched QMX 128-block decode on device — reference byte format.

Decodes the reference's QMX layout (qmx_codec.hpp; see codecs/qmx.py for
the format): payload instances of 16 or 32 bytes, selector bytes stored
reversed at the end of the block, each selector = (type << 4) |
(~(batch-1) & 0xF) covering up to 16 instances.

Device formulation (the reference needs ~6k lines of unrolled SSE; here
the layout tables ARE the kernel):
  1. gather the ≤S selector bytes (walking back from the last byte =
     forward selector order), expand to a per-instance type stream via a
     coverage compare against the running batch sum;
  2. prefix-scan per-instance output counts and payload advances into
     output bases / payload byte bases;
  3. each output lane locates its instance branch-free, then reads its
     (bitoff_a, width_a, bitoff_b, width_b) from LANE_TABLE (the 4-lane
     striping spec, shared with the host oracle) and extracts straight
     from the resident word stream;
  4. type-0 lanes (runs of the value 1) are overridden to 1.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..codecs.qmx import ADV_OF_TYPE, INTS_OF_TYPE, LANE_TABLE

_U32 = jnp.uint32

_INTS = jnp.asarray(INTS_OF_TYPE, dtype=jnp.int32)
_ADV = jnp.asarray(ADV_OF_TYPE, dtype=jnp.int32)
_TAB = jnp.asarray(LANE_TABLE, dtype=jnp.int32)  # (15, 256, 4)


def _extract(words, w_base, bitoff, width):
    """Gather `width` bits at (word base + relative bit offset) from the
    u32 stream. Word-based addressing keeps multi-GB streams in i32."""
    nw = words.shape[0]
    w0i = w_base + (bitoff >> 5)
    s = (bitoff & 31).astype(_U32)
    w0 = words[jnp.clip(w0i, 0, nw - 1)]
    w1 = words[jnp.clip(w0i + 1, 0, nw - 1)]
    x = (w0 >> s) | jnp.where(s > 0, w1 << (_U32(32) - s), _U32(0))
    mask = jnp.where(
        width >= 32, _U32(0xFFFFFFFF),
        (_U32(1) << jnp.clip(width, 0, 31).astype(_U32)) - _U32(1),
    )
    return x & mask


@partial(jax.jit, static_argnames=("NI", "S", "T"))
def qmx_decode(words, pay_w0, pay_boff, ninst, sel_w0, sel_b, nsel, NI, S, T=128):
    """Decode one group of full QMX blocks.

    words: u32[] stream; pay_w0/pay_boff (R,): payload start word +
    bit-in-word (after the vbyte length); ninst (R,): payload instances;
    sel_w0/sel_b (R,): word + byte-in-word of the LAST stream byte
    (= first selector in walk order); nsel (R,): selector count.
    NI/S: static capacities (max 32 each). Returns (R, T) int32 values."""
    R = pay_w0.shape[0]
    nw_stream = words.shape[0]

    # --- selector bytes, walking backwards from sel_last (forward order)
    bk = sel_b[:, None] - jnp.arange(S, dtype=jnp.int32)[None, :]  # (R, S)
    wsel = words[jnp.clip(sel_w0[:, None] + (bk >> 2), 0, nw_stream - 1)]
    sel = ((wsel >> ((bk & 3) * 8).astype(_U32)) & _U32(0xFF)).astype(jnp.int32)
    svalid = jnp.arange(S, dtype=jnp.int32)[None, :] < nsel[:, None]
    t_s = jnp.where(svalid, sel >> 4, 0)
    batch_s = jnp.where(svalid, 16 - (sel & 15), 0)

    # --- per-instance type via selector coverage
    cum = jnp.cumsum(batch_s, axis=1)  # inclusive (R, S)
    ii = jnp.arange(NI, dtype=jnp.int32)[None, :, None]
    cover = (ii < cum[:, None, :]) & (ii >= (cum - batch_s)[:, None, :])
    t_i = jnp.where(cover, t_s[:, None, :], 0).sum(axis=2, dtype=jnp.int32)  # (R, NI)
    ivalid = jnp.arange(NI, dtype=jnp.int32)[None, :] < ninst[:, None]

    ints_i = jnp.where(ivalid, _INTS[t_i], 0)
    adv_i = jnp.where(ivalid, _ADV[t_i], 0)
    out_base = jnp.cumsum(ints_i, axis=1) - ints_i  # exclusive (R, NI)
    pay_byte = jnp.cumsum(adv_i, axis=1) - adv_i

    # --- locate each output lane's instance
    v = jnp.arange(T, dtype=jnp.int32)[None, :]
    le = (out_base[:, None, :] <= v[:, :, None]) & ivalid[:, None, :]  # (R,T,NI)
    inst_of = jnp.clip(le.sum(axis=2, dtype=jnp.int32) - 1, 0, NI - 1)
    pick = jnp.arange(NI, dtype=jnp.int32)[None, None, :] == inst_of[:, :, None]
    t_v = jnp.where(pick, t_i[:, None, :], 0).sum(axis=2, dtype=jnp.int32)
    b_v = jnp.where(pick, out_base[:, None, :], 0).sum(axis=2, dtype=jnp.int32)
    p_v = jnp.where(pick, pay_byte[:, None, :], 0).sum(axis=2, dtype=jnp.int32)
    j = jnp.clip(v - b_v, 0, 255)

    # --- LANE_TABLE extraction
    lane = _TAB[t_v, j]  # (R, T, 4)
    ba, wa, bb, wb = lane[..., 0], lane[..., 1], lane[..., 2], lane[..., 3]
    base_bits = pay_boff[:, None] + p_v * 8  # relative to pay_w0 (< 2^31)
    wbase = pay_w0[:, None]
    a = _extract(words, wbase, base_bits + ba, wa)
    b = jnp.where(wb > 0, _extract(words, wbase, base_bits + bb, wb), _U32(0))
    val = a | (b << jnp.clip(wa, 0, 31).astype(_U32))
    return jnp.where(t_v == 0, 1, val.astype(jnp.int32))
