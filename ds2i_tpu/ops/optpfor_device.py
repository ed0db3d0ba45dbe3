"""Batched OptPFor 128-block decode on device.

Mirrors codecs/optpfor.py (the reference's FastPFor OPTPFor<4,Simple16>
role, block_codecs.hpp:150-227): per block, 128 b-bit slots plus an
optional Simple16-coded exception stream ([first pos, pos gaps - 1,
high parts - 1]).

The slot section is the same per-lane bit-field extraction as Elias-Fano
low bits (comparison-reduce word select; b is per-row dynamic). The
exception stream has two decode modes:

  ex_patch=False — in-pass Simple16 decode: a STATIC unroll over the 16
    selector modes (each mode's 28 shift/width constants are
    compile-time), then compaction to stream order with a rank
    comparison-reduce, and a branch-free apply of the high bits back
    into their slots. Measured at ~47% of all decode time at 50x
    (docs/PERF.md round-4 DS2I_DECODE_NOEX breakdown) — the compaction
    one-hot is (R, 2E, 2E*28) lanes.

  ex_patch=True — resident exception patch tables (round 5): the
    exception streams are STATIC index data, so the engine decodes them
    ONCE at init (block_tiles.build_exception_patches) into flat
    (slot position, high<<b) word pairs appended to the resident
    stream; per-pass work drops to one contiguous (R, 2E) pair gather
    plus the same (R, T, E) apply one-hot. Bit-identical to the in-pass
    mode (tests/test_ex_patch.py). In this mode ex_w0 carries the
    ABSOLUTE word index of the row's first patch pair and ex_boff is
    unused. (A third variant — dense per-block T-word OR-masks with no
    apply one-hot at all — was measured worse at both scales, 1x 3.09
    vs 2.67 us/q and 50x 9.61 vs 7.78: the extra contiguous 512B/row
    read outweighs the lanes it removes. Removed; docs/PERF.md round 5,
    implementation in git history commit a109b4a.)

Everything operates on bit positions into the u32-viewed byte stream,
so byte-misaligned codec regions need no special casing. Groups are
bucketed by (slot window words WS, exception capacity E).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..codecs.simple16 import S16_MODES

_U32 = jnp.uint32

# per-mode static (shift, width) tables, padded to 28 slots
_MODE_SHIFTS = []
_MODE_WIDTHS28 = []
_MODE_COUNT = []
for mode in S16_MODES:
    widths = [b for cnt, b in mode for _ in range(cnt)]
    shifts = list(np.concatenate([[0], np.cumsum(widths)[:-1]])) if widths else []
    _MODE_COUNT.append(len(widths))
    widths += [0] * (28 - len(widths))
    shifts += [0] * (28 - len(shifts))
    _MODE_WIDTHS28.append(widths)
    _MODE_SHIFTS.append(shifts)


def _extract_u32s(words, w0, boff, count):
    """(R, count) consecutive 32-bit fields starting at per-row word w0,
    bit boff (< 32). Word-based addressing keeps streams beyond 2^31 bits
    (256MB) addressable with i32 indices (up to 8GB)."""
    nw = words.shape[0]
    widx = w0[:, None] + jnp.arange(count + 1, dtype=jnp.int32)[None, :]
    w = words[jnp.clip(widx, 0, nw - 1)]
    s = boff[:, None].astype(_U32)
    lo = w[:, :count] >> s
    hi = jnp.where(s > 0, w[:, 1:] << (_U32(32) - s), _U32(0))
    return lo | hi


@partial(jax.jit, static_argnames=("WS", "E", "T", "b_static", "ex_patch"))
def optpfor_decode(words, slot_w0, slot_boff, b, n_ex, ex_w0, ex_boff, WS, E,
                   T=128, b_static=None, ex_patch=False):
    """Decode one group of full OptPFor blocks.

    words: u32[] device stream; slot_w0/slot_boff: (R,) i32 word index +
    bit-in-word of the slot section (word-based so multi-GB streams fit
    i32); b/n_ex: (R,) i32; ex_w0/ex_boff: exception stream cursor
    (ex_patch=False) or first patch-pair word index (ex_patch=True).
    WS: static slot-window words (>= ceil((31 + T*b)/32));
    E: static exception capacity (>= max n_ex in group)
    b_static: when the whole group shares one bit width, every slot's
    word/shift becomes STATIC after realigning the window by slot_boff —
    no per-slot word-select reduction at all.
    Returns (R, T) int32 raw slot values (gaps for docs, freq-1 for freqs).
    """
    R = slot_w0.shape[0]
    nw = words.shape[0]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]

    widx = slot_w0[:, None] + jnp.arange(WS + 1, dtype=jnp.int32)[None, :]
    win = words[jnp.clip(widx, 0, nw - 1)]  # (R, WS+1)

    if b_static is not None:
        bs = min(b_static, 32)
        s0 = slot_boff[:, None].astype(_U32)
        nxt = jnp.concatenate([win[:, 1:], jnp.zeros((R, 1), _U32)], axis=1)
        aligned = (win >> s0) | jnp.where(s0 > 0, nxt << (_U32(32) - s0), _U32(0))
        if bs == 0:
            out = jnp.zeros((R, T), _U32)
        else:
            cols_lo, cols_hi, shifts = [], [], []
            for jj in range(T):
                bit = jj * bs
                cols_lo.append(bit >> 5)
                cols_hi.append(min((bit >> 5) + 1, WS))
                shifts.append(bit & 31)
            lo = aligned[:, jnp.asarray(cols_lo)]
            hi = aligned[:, jnp.asarray(cols_hi)]
            sh = jnp.asarray(shifts, jnp.uint32)[None, :]
            x = (lo >> sh) | jnp.where(sh > 0, hi << (_U32(32) - sh), _U32(0))
            mask = _U32(0xFFFFFFFF) if bs >= 32 else (_U32(1) << _U32(bs)) - _U32(1)
            out = x & mask
    else:
        # per-row dynamic width: comparison-reduce word select
        bclip = jnp.minimum(b, 32)
        bitoff = slot_boff[:, None] + j * bclip[:, None]
        w0i = jnp.clip(bitoff >> 5, 0, WS)
        s = (bitoff & 31).astype(_U32)
        cols = jnp.arange(WS + 1, dtype=jnp.int32)[None, None, :]
        w0 = jnp.where(w0i[:, :, None] == cols, win[:, None, :], _U32(0)).sum(axis=2, dtype=_U32)
        w1 = jnp.where((w0i + 1)[:, :, None] == cols, win[:, None, :], _U32(0)).sum(axis=2, dtype=_U32)
        low = (w0 >> s) | jnp.where(s > 0, w1 << (_U32(32) - s), _U32(0))
        bmask = jnp.where(
            bclip[:, None] >= 32, _U32(0xFFFFFFFF),
            (_U32(1) << jnp.clip(bclip, 0, 31)[:, None].astype(_U32)) - _U32(1),
        )
        out = low & bmask  # (R, T) u32

    if E > 0 and ex_patch:
        # resident patch tables: entry e of row r lives at words
        # [ex_w0[r] + 2e] = slot position, [+1] = (high << b), decoded
        # once at engine init. One contiguous pair gather + the apply.
        ee = jnp.arange(E, dtype=jnp.int32)[None, :]
        pidx = jnp.clip(ex_w0[:, None] + 2 * ee, 0, max(nw - 2, 0))
        pos = words[pidx].astype(jnp.int32)  # (R, E)
        add = words[pidx + 1]  # (R, E) u32, pre-shifted by b
        evalid = ee < n_ex[:, None]
        hit = (j[:, :, None] == pos[:, None, :]) & evalid[:, None, :]
        out = out | jnp.where(hit, add[:, None, :], _U32(0)).sum(axis=2, dtype=_U32)
    elif E > 0:
        K = 2 * E
        xw = _extract_u32s(words, ex_w0, ex_boff, K)  # <= one s16 word per value
        sel = (xw >> _U32(28)).astype(jnp.int32)
        payload = xw & _U32(0x0FFFFFFF)

        cnt = jnp.zeros((R, K), jnp.int32)
        val28 = jnp.zeros((R, K, 28), _U32)
        vmask = jnp.zeros((R, K, 28), bool)
        slot28 = jnp.arange(28, dtype=jnp.int32)[None, None, :]
        for m in range(16):
            hit = sel == m
            cnt = cnt + jnp.where(hit, _MODE_COUNT[m], 0)
            sh = jnp.asarray(_MODE_SHIFTS[m], jnp.uint32)[None, None, :]
            wd = jnp.asarray(_MODE_WIDTHS28[m], jnp.uint32)[None, None, :]
            vm = (payload[:, :, None] >> sh) & ((_U32(1) << wd) - _U32(1))
            val28 = jnp.where(hit[:, :, None], vm, val28)
            vmask = jnp.where(hit[:, :, None], slot28 < _MODE_COUNT[m], vmask)

        base = jnp.cumsum(cnt, axis=1) - cnt  # exclusive
        sidx = base[:, :, None] + slot28  # stream index of each (word, slot)
        fl_idx = sidx.reshape(R, K * 28)
        fl_val = val28.reshape(R, K * 28)
        fl_ok = vmask.reshape(R, K * 28)

        kk = jnp.arange(K, dtype=jnp.int32)[None, :, None]
        elem = jnp.where(
            (fl_idx[:, None, :] == kk) & fl_ok[:, None, :], fl_val[:, None, :], _U32(0)
        ).sum(axis=2, dtype=_U32).astype(jnp.int32)  # (R, K) stream values

        # positions: first absolute, then gaps-1; highs (high-1) start at
        # stream index n_ex (per-row dynamic)
        steps = jnp.concatenate([elem[:, :1], elem[:, 1:E] + 1], axis=1)
        pos = jnp.cumsum(steps, axis=1)  # (R, E)
        ee = jnp.arange(E, dtype=jnp.int32)[None, :]
        qq = jnp.arange(K, dtype=jnp.int32)[None, None, :]
        want = (n_ex[:, None] + ee)[:, :, None]  # (R, E, 1)
        high = (
            jnp.where(qq == want, elem[:, None, :], 0).sum(axis=2, dtype=jnp.int32) + 1
        ).astype(_U32)
        evalid = ee < n_ex[:, None]

        hit = (j[:, :, None] == pos[:, None, :]) & evalid[:, None, :]
        add = jnp.where(
            hit, (high[:, None, :] << jnp.clip(b, 0, 31)[:, None, None].astype(_U32)), _U32(0)
        ).sum(axis=2, dtype=_U32)
        out = out | add

    return out.astype(jnp.int32)
