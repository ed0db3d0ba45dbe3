"""Device QMX block decode must match the host codec exactly."""

import numpy as np
import jax.numpy as jnp

from ds2i_tpu.codecs.qmx import QMXBlock
from ds2i_tpu.codecs.vbyte import TightVariableByte
from ds2i_tpu.ops.qmx_device import qmx_decode


def test_qmx_device_matches_host():
    rng = np.random.RandomState(17)
    R = 20
    streams, expect = [], []
    for r in range(R):
        mag = int(rng.choice([1, 3, 7, 12, 20, 31]))
        v = rng.randint(0, 2 ** mag, size=128).astype(np.uint64)
        if r % 3 == 0:  # mixed widths within a block
            v[rng.choice(128, 20, replace=False)] = rng.randint(0, 2 ** 31, 20)
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

    pay0, nwv, sel0, nselv = [], [], [], []
    for r, off in enumerate(offs):
        vals, q = TightVariableByte.decode(streams[r], 0, 1)
        plen = int(vals[0])
        pay0.append((off + q) * 8)
        nwv.append(plen // 16)
        sel0.append(off + q + plen)
        nselv.append(len(streams[r]) - q - plen)
    NW = max(nwv); S = max(nselv)
    out = np.asarray(qmx_decode(
        words, jnp.asarray(pay0, jnp.int32), jnp.asarray(nwv, jnp.int32),
        jnp.asarray(sel0, jnp.int32), jnp.asarray(nselv, jnp.int32), NW=NW, S=S,
    ))
    for r in range(R):
        np.testing.assert_array_equal(out[r].astype(np.uint32), expect[r], err_msg=f"row {r}")
