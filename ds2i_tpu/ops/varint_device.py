"""Batched varint-G8IU 128-block decode on device.

Mirrors codecs/varint.py (the reference's FastPFor VarIntG8IU role,
block_codecs.hpp:229-315): groups of 1 descriptor byte + 8 data bytes;
descriptor bit i set means data byte i ends an integer.

The reference decodes with SSSE3 shuffle tables; the TPU formulation is
scatter/gather-free: the block's words are realigned to byte 0 per row
(one shift pass), after which every descriptor/data byte lives at a
STATIC word/shift position; per-byte output indices come from an
exclusive scan over the end-marker bits, and each output integer is
assembled with one masked reduction over the data bytes.
"""

from functools import partial

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


@partial(jax.jit, static_argnames=("G", "T"))
def varint_decode(words, w0, boff, ngroups, G, T=128):
    """Decode one group of full varint-G8IU blocks.

    words: u32[] stream; w0/boff (R,): word index + bit-in-word of each
    block's first group (word-based so multi-GB streams fit i32);
    ngroups (R,): 9-byte groups in the block; G: static max groups.
    Returns (R, T) int32 values.
    """
    nw = words.shape[0]
    WB = (G * 9 + 7) // 4 + 2
    widx = w0[:, None] + jnp.arange(WB, dtype=jnp.int32)[None, :]
    win = words[jnp.clip(widx, 0, nw - 1)]  # (R, WB)
    s = boff[:, None].astype(_U32)
    nxt = jnp.concatenate([win[:, 1:], jnp.zeros((win.shape[0], 1), _U32)], axis=1)
    aligned = (win >> s) | jnp.where(s > 0, nxt << (_U32(32) - s), _U32(0))

    def byte_at(k):  # static byte index k within the block
        return ((aligned[:, k >> 2] >> _U32(8 * (k & 3))) & _U32(0xFF)).astype(jnp.int32)

    R = w0.shape[0]
    gg = jnp.arange(G, dtype=jnp.int32)[None, :]
    gvalid = gg < ngroups[:, None]

    # gather desc bits and data bytes at static positions
    desc = jnp.stack([byte_at(9 * g) for g in range(G)], axis=1)  # (R, G)
    ends = jnp.stack(
        [((desc >> i) & 1).astype(bool) for i in range(8)], axis=2
    ) & gvalid[:, :, None]  # (R, G, 8)
    data = jnp.stack(
        [jnp.stack([byte_at(9 * g + 1 + i) for i in range(8)], axis=1) for g in range(G)],
        axis=1,
    )  # (R, G, 8)

    flat_ends = ends.reshape(R, G * 8)
    flat_data = jnp.where(ends.reshape(R, G * 8), 0, 0) * 0 + data.reshape(R, G * 8)
    # output index of each data byte = end markers strictly before it
    cume = jnp.cumsum(flat_ends.astype(jnp.int32), axis=1)
    out_idx = cume - flat_ends.astype(jnp.int32)  # exclusive
    # byte position within its integer: non-end bytes since the last end,
    # computed with an in-group scan (integers never span groups)
    wpos = jnp.zeros((R, G, 8), jnp.int32)
    run = jnp.zeros((R, G), jnp.int32)
    cols = []
    for i in range(8):
        cols.append(run)
        run = jnp.where(ends[:, :, i], 0, run + 1)
    wpos = jnp.stack(cols, axis=2).reshape(R, G * 8)
    # a byte contributes iff some later byte in its integer is an end marker;
    # trailing pad bytes of a group (no end marker after) contribute nothing.
    # contribution mask: the byte belongs to integer out_idx < 128 and its
    # integer terminates within the group — equivalently cume at group end
    # exceeds out_idx.
    gend = jnp.repeat(cume.reshape(R, G, 8)[:, :, 7], 8, axis=1).reshape(R, G * 8)
    ok = (out_idx < gend) & (out_idx < T) & jnp.repeat(gvalid, 8, axis=1).reshape(R, G * 8)

    vv = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    contrib = jnp.where(
        ok[:, None, :] & (out_idx[:, None, :] == vv),
        flat_data[:, None, :] << (8 * wpos)[:, None, :],
        0,
    ).sum(axis=2, dtype=jnp.int32)
    return contrib
