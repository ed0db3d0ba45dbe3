"""Batched binary-interpolative decode on device: a vectorized stack machine.

Interpolative coding (interpolative_coding.hpp:109-146; codecs/
interpolative.py) is a DFS over midpoints whose code widths depend on
already-decoded bounds — inherently sequential per block. The reference
decodes it with a recursive scalar reader; here EVERY ROW (block) runs
its own DFS simultaneously: the carry holds a per-row explicit stack of
(lo, hi) ranges (depth <= 8 for 128-value blocks), the per-row bit
cursor, and the partially-filled value array. One lax.fori_loop step
pops a range, reads its centered minimal binary code, writes the value,
and pushes the children. All dynamic indexing (stack slots, value lanes,
bit-window words) is branch-free comparison-reduce, so the whole batch
is pure VPU work with no gathers.

A block with n values needs exactly n-1 steps (only non-empty ranges are
pushed); groups are bucketed by n so short tail blocks don't pay for
long ones.

Value arithmetic is uint32 with the same u < 2^31 domain the rest of the
engine assumes (num_docs < 2^31, freq prefix sums < 2^31).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_U32 = jnp.uint32
DEPTH = 8  # max DFS stack depth for <=128 values (ceil(log2(128)) + 1)


def _sel_lane(arr, idx, width):
    """arr (R, width) at per-row idx (R,) via comparison-reduce."""
    lanes = jnp.arange(width, dtype=jnp.int32)[None, :]
    return jnp.where(lanes == idx[:, None], arr, 0).sum(axis=1)


def _write_lane(arr, idx, val, mask, width):
    lanes = jnp.arange(width, dtype=jnp.int32)[None, :]
    hit = (lanes == idx[:, None]) & mask[:, None]
    return jnp.where(hit, val[:, None], arr)


def _read_bits(win, pos, width):
    """win (R, W) u32 LSB-first stream; per-row pos/width (width <= 31)."""
    W = win.shape[1]
    w0i = pos >> 5
    s = (pos & 31).astype(_U32)
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    w0 = jnp.where(cols == w0i[:, None], win, _U32(0)).sum(axis=1, dtype=_U32)
    w1 = jnp.where(cols == (w0i + 1)[:, None], win, _U32(0)).sum(axis=1, dtype=_U32)
    x = (w0 >> s) | jnp.where(s > 0, w1 << (_U32(32) - s), _U32(0))
    mask = jnp.where(width >= 32, _U32(0xFFFFFFFF), (_U32(1) << jnp.clip(width, 0, 31).astype(_U32)) - _U32(1))
    return x & mask


def _msb_u32(u):
    """floor(log2(u)) for u >= 1, vectorized."""
    r = jnp.zeros(u.shape, jnp.int32)
    x = u
    for s in (16, 8, 4, 2, 1):
        m = (x >> _U32(s)) > 0
        r = r + jnp.where(m, s, 0)
        x = jnp.where(m, x >> _U32(s), x)
    return r


@partial(jax.jit, static_argnames=("NC", "W", "steps"))
def interp_decode(win, rel0, n, sums, NC, W, steps):
    """Decode a group of interpolative blocks.

    win  (R, W) u32: stream words (block bit 0 at bit rel0 of win[:, 0])
    rel0 (R,): bit offset of the stream within win[:, 0] (0..31)
    n    (R,): values per block (1 <= n <= NC)
    sums (R,): known sum_of_values (the preset last cum value)
    NC: static max values; W: static window words; steps: static >= NC-1

    Returns cum (R, NC) int32: absolute prefix sums cum[0..n-1]
    (cum[n-1] == sums; lanes >= n are 0).
    """
    R = win.shape[0]
    VW = NC + 2  # vals: [global-low=0, cum[0..NC-1], pad]
    lanes = jnp.arange(VW, dtype=jnp.int32)[None, :]
    vals = jnp.where(lanes == n[:, None], sums[:, None], 0).astype(jnp.int32)

    lo_s = jnp.zeros((R, DEPTH), jnp.int32)
    hi_s = jnp.zeros((R, DEPTH), jnp.int32)
    hi_s = hi_s.at[:, 0].set(n - 1)
    sp = (n > 1).astype(jnp.int32)
    bitpos = rel0.astype(jnp.int32)

    def step(_, carry):
        vals, lo_s, hi_s, sp, bitpos = carry
        active = sp > 0
        idx = jnp.maximum(sp - 1, 0)
        lo = _sel_lane(lo_s, idx, DEPTH)
        hi = _sel_lane(hi_s, idx, DEPTH)
        sp1 = sp - active.astype(jnp.int32)

        h = lo + (hi - lo) // 2
        low = _sel_lane(vals, lo, VW)          # vals[lo] == cum[lo-1] (lane shift)
        high = _sel_lane(vals, hi + 1, VW)     # vals[hi+1] == cum[hi]
        u = (high - low + 1).astype(_U32)
        b = _msb_u32(jnp.maximum(u, _U32(1)))
        m = ((_U32(1) << (b + 1).astype(_U32)) - u).astype(_U32)

        x = _read_bits(win, bitpos, b)
        bp1 = bitpos + jnp.where(active, b, 0)
        extra = _read_bits(win, bp1, jnp.ones_like(b))
        wide = x >= m
        code = jnp.where(wide, (x << _U32(1)) + extra - m, x)
        bp2 = bp1 + (active & wide).astype(jnp.int32)

        val = low + code.astype(jnp.int32)
        vals = _write_lane(vals, h + 1, val, active, VW)

        # push right child (h+1, hi) then left (lo, h); left pops first
        push_r = active & (hi - h - 1 > 0)
        lo_s = _write_lane(lo_s, sp1, h + 1, push_r, DEPTH)
        hi_s = _write_lane(hi_s, sp1, hi, push_r, DEPTH)
        sp2 = sp1 + push_r.astype(jnp.int32)
        push_l = active & (h - lo > 0)
        lo_s = _write_lane(lo_s, sp2, lo, push_l, DEPTH)
        hi_s = _write_lane(hi_s, sp2, h, push_l, DEPTH)
        sp3 = sp2 + push_l.astype(jnp.int32)
        return vals, lo_s, hi_s, sp3, bp2

    vals, _, _, _, _ = jax.lax.fori_loop(0, steps, step, (vals, lo_s, hi_s, sp, bitpos))
    return vals[:, 1 : NC + 1]


def interp_decode_np(buf_u32, bit0, n, sums, NC, W=None, steps=None):
    """Host convenience wrapper over numpy inputs (used by tests)."""
    R = len(n)
    if W is None:
        W = int(np.asarray(buf_u32).shape[1])
    if steps is None:
        steps = NC - 1 if NC > 1 else 1
    return np.asarray(
        interp_decode(
            jnp.asarray(buf_u32, dtype=jnp.uint32),
            jnp.asarray(bit0, dtype=jnp.int32),
            jnp.asarray(n, dtype=jnp.int32),
            jnp.asarray(sums, dtype=jnp.int32),
            NC=NC, W=W, steps=steps,
        )
    )
