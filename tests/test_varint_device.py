"""Device varint-G8IU block decode must match the host codec exactly."""

import numpy as np
import jax.numpy as jnp

from ds2i_tpu.codecs.varint import VarintG8IUBlock
from ds2i_tpu.ops.varint_device import varint_decode


def test_varint_device_matches_host():
    rng = np.random.RandomState(11)
    R = 20
    streams, expect = [], []
    for r in range(R):
        mag = int(rng.choice([6, 8, 14, 22, 30]))
        v = rng.randint(0, 2 ** mag, size=128).astype(np.uint32)
        chunk = []
        VarintG8IUBlock.encode(v, int(v.sum()), 128, chunk)
        streams.append(np.concatenate([np.asarray(c, np.uint8).reshape(-1) for c in chunk]))
        expect.append(v)

    offs, parts, cur = [], [], 0
    for s in streams:
        pad = int(rng.randint(0, 9))
        parts.append(np.zeros(pad, np.uint8)); cur += pad
        offs.append(cur)
        parts.append(s); cur += len(s)
    buf = np.concatenate(parts + [np.zeros(16, np.uint8)])
    buf = np.concatenate([buf, np.zeros((-len(buf)) % 4, np.uint8)])
    words = jnp.asarray(buf.view("<u4").astype(np.uint32))

    ng = np.array([len(s) // 9 for s in streams], np.int32)
    G = int(ng.max())
    out = np.asarray(varint_decode(
        words, jnp.asarray([o >> 2 for o in offs], jnp.int32),
        jnp.asarray([(o & 3) * 8 for o in offs], jnp.int32),
        jnp.asarray(ng), G=G,
    ))
    for r in range(R):
        np.testing.assert_array_equal(out[r].astype(np.uint32), expect[r], err_msg=f"row {r}")
