"""Batched segment decode: the device-side replacement for cursor decode.

`decode_segments_device` is one fused jnp computation (jit-compiled by XLA
onto the TPU VPU) that decodes R segments at once from the compressed
uint32 word array resident in HBM:

  1. window gather: W words per segment from `words`
  2. bit expansion -> (R, W*32) 0/1 lanes
  3. rank = exclusive running sum per row (vectorized select-all:
     replaces the reference's sequential unary_enumerator::next chain,
     compact_elias_fano.hpp:170-177)
  4. scatter the j-th one's position into (R, Lseg)
  5. low-bits field gather + EF reconstruction formula per segment kind
  6. scatter-assemble into per-list output tiles with universe sentinel
     padding

All shapes are static (R, W, Lseg, rows, L_out chosen per call bucket);
no data-dependent control flow — XLA fuses steps 2-5 into a handful of
VPU loops.

`decode_segments_numpy` is the bit-exact host reference used by tests.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .segments import SEG_AO, SEG_EF, SEG_EF_STRICT, SEG_RB


def decode_rows(
    words,  # uint32[num_words] — the compressed index bits in HBM
    kind,  # int32[R]
    sel_start,  # int32[R] absolute bit offset
    sel_len,  # int32[R]
    lb_start,  # int32[R]
    lower_bits,  # int32[R]
    n_vals,  # int32[R]
    base,  # int32[R]
    out_begin,  # int32[R]
    list_row,  # int32[R] destination row
    list_n,  # int32[rows] total values per output row (for sentinel mask)
    W=64,
    Lseg=128,
    rows=1,
    L_out=128,
    sentinel=0,
):
    """Traceable core (jit'd by callers, possibly fused with scoring)."""
    R = kind.shape[0]
    j = jnp.arange(Lseg, dtype=jnp.int32)

    # ---- 1-2: window gather + bit expansion ------------------------------
    word0 = (sel_start >> 5).astype(jnp.int32)  # (R,)
    widx = word0[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]  # (R, W)
    wv = words[jnp.clip(widx, 0, words.shape[0] - 1)]  # (R, W) uint32
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((wv[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)).astype(jnp.int32)
    bits = bits.reshape(R, W * 32)

    gbi = (word0[:, None] << 5) + jnp.arange(W * 32, dtype=jnp.int32)[None, :]
    rel = gbi - sel_start[:, None]  # bit position relative to window start
    valid_bit = (rel >= 0) & (rel < sel_len[:, None])
    bits = jnp.where(valid_bit, bits, 0)

    # ---- 3-4: rank + scatter select --------------------------------------
    rank = jnp.cumsum(bits, axis=1)  # inclusive; one's index = rank-1
    col = jnp.where((bits == 1) & (rank <= Lseg), rank - 1, Lseg)
    row_idx = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], col.shape)
    sel = jnp.zeros((R, Lseg + 1), dtype=jnp.int32).at[row_idx, col].set(rel)[:, :Lseg]

    # ---- 5: value reconstruction -----------------------------------------
    l = lower_bits[:, None].astype(jnp.uint32)  # (R,1)
    bit_off = lb_start[:, None] + j[None, :] * lower_bits[:, None]  # (R, Lseg)
    w0i = bit_off >> 5
    s = (bit_off & 31).astype(jnp.uint32)
    w0 = words[jnp.clip(w0i, 0, words.shape[0] - 1)]
    w1 = words[jnp.clip(w0i + 1, 0, words.shape[0] - 1)]
    low = (w0 >> s) | jnp.where(s > 0, w1 << (jnp.uint32(32) - s), jnp.uint32(0))
    mask = jnp.where(l >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << l) - jnp.uint32(1))
    low = (low & mask).astype(jnp.int32)

    ef_val = ((sel - j[None, :] - 1) << lower_bits[:, None]) | low
    kindc = kind[:, None]
    val = jnp.where(kindc == SEG_EF, ef_val, 0)
    val = jnp.where(kindc == SEG_EF_STRICT, ef_val + j[None, :], val)
    val = jnp.where(kindc == SEG_RB, sel, val)
    val = jnp.where(kindc == SEG_AO, j[None, :], val)
    val = val + base[:, None]

    # ---- 6: assemble into output tiles ------------------------------------
    valid = j[None, :] < n_vals[:, None]
    out_col = jnp.where(valid, out_begin[:, None] + j[None, :], L_out)
    out_row = jnp.broadcast_to(list_row[:, None], out_col.shape)
    out = jnp.full((rows, L_out + 1), sentinel, dtype=jnp.int32)
    out = out.at[out_row, out_col].set(val)[:, :L_out]
    # sentinel past each list's end
    pos = jnp.arange(L_out, dtype=jnp.int32)[None, :]
    out = jnp.where(pos < list_n[:, None], out, sentinel)
    return out


decode_segments_device = jax.jit(
    decode_rows, static_argnames=("W", "Lseg", "rows", "L_out", "sentinel")
)


def decode_segments_numpy(words_u32, seg_arrays, rows, L_out, sentinel):
    """Host reference implementation (bit-exact vs the device kernel)."""
    out = np.full((rows, L_out), sentinel, dtype=np.int64)
    bits_all = np.unpackbits(words_u32.view(np.uint8), bitorder="little")
    k = seg_arrays["kind"]
    for r in range(len(k)):
        n = int(seg_arrays["n_vals"][r])
        j = np.arange(n, dtype=np.int64)
        kind = int(k[r])
        basev = int(seg_arrays["base"][r])
        if kind == SEG_AO:
            vals = j + basev
        else:
            s0 = int(seg_arrays["sel_start"][r])
            slen = int(seg_arrays["sel_len"][r])
            ones = np.nonzero(bits_all[s0 : s0 + slen])[0][:n]
            if kind == SEG_RB:
                vals = ones + basev
            else:
                l = int(seg_arrays["lower_bits"][r])
                lb = int(seg_arrays["lb_start"][r])
                low = np.zeros(n, dtype=np.int64)
                if l:
                    for i in range(n):
                        off = lb + i * l
                        w = off >> 5
                        sh = off & 31
                        v = int(words_u32[w]) >> sh
                        if sh + l > 32:
                            v |= int(words_u32[w + 1]) << (32 - sh)
                        low[i] = v & ((1 << l) - 1)
                vals = ((ones - j - 1) << l) | low
                if kind == SEG_EF_STRICT:
                    vals = vals + j
                vals = vals + basev
        row = int(seg_arrays["list_row"][r]) if "list_row" in seg_arrays else int(seg_arrays["list_id"][r])
        ob = int(seg_arrays["out_begin"][r])
        out[row, ob : ob + n] = vals
    return out
