"""Device QMX block decode must match the host codec exactly."""

import numpy as np
import jax.numpy as jnp

from ds2i_tpu.codecs.qmx import ADV_OF_TYPE, QMXBlock
from ds2i_tpu.codecs.vbyte import TightVariableByte
from ds2i_tpu.ops.qmx_device import qmx_decode


def _walk(stream):
    """Replay the decoder's selector walk (engine/block_tiles._qmx_stream):
    returns (payload byte offset, ninst, last selector byte offset, nsel)."""
    vals, q = TightVariableByte.decode(stream, 0, 1)
    elen = int(vals[0])
    in_off, keys_off = q, q + elen - 1
    ns = ninst = 0
    while in_off <= keys_off:
        sel = int(stream[keys_off])
        keys_off -= 1
        ns += 1
        batch = 16 - (sel & 0x0F)
        ninst += batch
        in_off += batch * ADV_OF_TYPE[sel >> 4]
    return q, ninst, q + elen - 1, ns


def test_qmx_device_matches_host():
    rng = np.random.RandomState(17)
    R = 24
    streams, expect = [], []
    for r in range(R):
        mag = int(rng.choice([1, 3, 7, 12, 20, 31]))
        v = rng.randint(0, 2 ** mag, size=128).astype(np.uint64)
        if r % 3 == 0:  # mixed widths within a block
            v[rng.choice(128, 20, replace=False)] = rng.randint(0, 2 ** 31, 20)
        if r % 5 == 0:  # heavy runs of the value 1 (the 0-bit class)
            v[: 64 + (r % 3) * 16] = 1
        chunk = []
        QMXBlock.encode(v, int(v.sum()), 128, chunk)
        streams.append(np.concatenate([np.asarray(c, np.uint8).reshape(-1) for c in chunk]))
        expect.append(v.astype(np.uint32))

    offs, parts, cur = [], [], 0
    for s in streams:
        pad = int(rng.randint(0, 5))
        parts.append(np.zeros(pad, np.uint8)); cur += pad
        offs.append(cur)
        parts.append(s); cur += len(s)
    buf = np.concatenate(parts + [np.zeros(32, np.uint8)])
    buf = np.concatenate([buf, np.zeros((-len(buf)) % 4, np.uint8)])
    words = jnp.asarray(buf.view("<u4").astype(np.uint32))

    pw0, pboff, niv, sw0, sb, nselv = [], [], [], [], [], []
    for r, off in enumerate(offs):
        q, ninst, last, ns = _walk(streams[r])
        pw0.append((off + q) >> 2)
        pboff.append(((off + q) & 3) * 8)
        niv.append(ninst)
        sw0.append((off + last) >> 2)
        sb.append((off + last) & 3)
        nselv.append(ns)
    NI = max(niv); S = max(nselv)
    out = np.asarray(qmx_decode(
        words, jnp.asarray(pw0, jnp.int32), jnp.asarray(pboff, jnp.int32),
        jnp.asarray(niv, jnp.int32), jnp.asarray(sw0, jnp.int32),
        jnp.asarray(sb, jnp.int32), jnp.asarray(nselv, jnp.int32), NI=NI, S=S,
    ))
    for r in range(R):
        np.testing.assert_array_equal(out[r].astype(np.uint32), expect[r], err_msg=f"row {r}")
