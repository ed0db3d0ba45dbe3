"""Device OptPFor block decode must match the host codec exactly,
including byte-misaligned codec regions and exception streams."""

import numpy as np
import jax.numpy as jnp

from ds2i_tpu.codecs.optpfor import OptPForBlock
from ds2i_tpu.ops.optpfor_device import optpfor_decode


def _blocks(rng, R, heavy_exceptions):
    streams, metas, expect = [], [], []
    for r in range(R):
        base = rng.randint(1, 60)
        v = rng.randint(0, base, size=128).astype(np.uint32)
        n_exc = rng.randint(0, 40 if heavy_exceptions else 6)
        if n_exc:
            idx = rng.choice(128, size=n_exc, replace=False)
            v[idx] = rng.randint(base, base * 5000, size=n_exc).astype(np.uint32)
        chunk = []
        OptPForBlock.encode(v, int(v.sum()), 128, chunk)
        raw = np.concatenate([np.asarray(c, np.uint8).reshape(-1) for c in chunk])
        streams.append(raw)
        expect.append(v)
    return streams, expect


def _run(streams, expect, rng):
    R = len(streams)
    # pack all blocks into one byte stream at random (misaligned) offsets
    offs, parts, cur = [], [], 0
    for s in streams:
        pad = int(rng.randint(0, 7))
        parts.append(np.zeros(pad, np.uint8))
        cur += pad
        offs.append(cur)
        parts.append(s)
        cur += len(s)
    buf = np.concatenate(parts + [np.zeros(8, np.uint8)])
    buf = np.concatenate([buf, np.zeros((-len(buf)) % 4, np.uint8)])
    words = jnp.asarray(buf.view("<u4").astype(np.uint32))

    bs, n_exs, slot_w0, slot_boff, ex_w0, ex_boff = [], [], [], [], [], []
    for r, off in enumerate(offs):
        b = int(streams[r][0]); n_ex = int(streams[r][1])
        sw = (128 * min(b, 32) + 31) // 32
        bs.append(b); n_exs.append(n_ex)
        slot_w0.append((off + 2) >> 2)
        slot_boff.append(((off + 2) & 3) * 8)
        ex = off + 2 + 4 * sw
        ex_w0.append(ex >> 2)
        ex_boff.append((ex & 3) * 8)
    E = max(1, max(n_exs))
    WS = (31 + 128 * 32) // 32 + 1
    out = np.asarray(optpfor_decode(
        words, jnp.asarray(slot_w0, jnp.int32), jnp.asarray(slot_boff, jnp.int32),
        jnp.asarray(bs, jnp.int32), jnp.asarray(n_exs, jnp.int32),
        jnp.asarray(ex_w0, jnp.int32), jnp.asarray(ex_boff, jnp.int32),
        WS=WS, E=E,
    ))
    for r in range(R):
        np.testing.assert_array_equal(
            out[r].astype(np.uint32), expect[r], err_msg=f"row {r} b={bs[r]} n_ex={n_exs[r]}"
        )


def test_optpfor_device_light():
    rng = np.random.RandomState(3)
    _run(*_blocks(rng, 16, heavy_exceptions=False), rng)


def test_optpfor_device_heavy():
    rng = np.random.RandomState(4)
    _run(*_blocks(rng, 12, heavy_exceptions=True), rng)


def test_optpfor_device_no_exceptions():
    rng = np.random.RandomState(5)
    streams, expect = [], []
    for r in range(8):
        v = rng.randint(0, 2 ** int(rng.choice([1, 4, 9, 13])), size=128).astype(np.uint32)
        chunk = []
        OptPForBlock.encode(v, int(v.sum()), 128, chunk)
        streams.append(np.concatenate([np.asarray(c, np.uint8).reshape(-1) for c in chunk]))
        expect.append(v)
    _run(streams, expect, rng)


def test_optpfor_device_wide_values():
    """b=32 blocks (no exception coding possible) decode correctly, on
    both the dynamic-width and static-width kernel paths."""
    rng = np.random.RandomState(9)
    streams, expect = [], []
    for r in range(6):
        v = rng.randint(0, 2 ** 31, size=128).astype(np.uint32)
        chunk = []
        OptPForBlock.encode(v, int(v.sum()), 128, chunk)
        raw = np.concatenate([np.asarray(c, np.uint8).reshape(-1) for c in chunk])
        assert int(raw[0]) == 32
        streams.append(raw)
        expect.append(v)
    _run(streams, expect, rng)
    # static-width path (the engine's route when a group shares b)
    buf = np.concatenate([np.zeros(2, np.uint8)] + streams + [np.zeros(8, np.uint8)])
    buf = np.concatenate([buf, np.zeros((-len(buf)) % 4, np.uint8)])
    words = jnp.asarray(buf.view("<u4").astype(np.uint32))
    offs = np.cumsum([2] + [len(s) for s in streams[:-1]])
    slot_w0 = [(int(o) + 2) >> 2 for o in offs]
    slot_boff = [((int(o) + 2) & 3) * 8 for o in offs]
    ws = (31 + 128 * 32) // 32 + 1
    out = np.asarray(optpfor_decode(
        words, jnp.asarray(slot_w0, jnp.int32), jnp.asarray(slot_boff, jnp.int32),
        jnp.full(6, 32, jnp.int32), jnp.zeros(6, jnp.int32),
        jnp.zeros(6, jnp.int32), jnp.zeros(6, jnp.int32),
        WS=ws, E=0, b_static=32,
    ))
    for r in range(6):
        np.testing.assert_array_equal(out[r].astype(np.uint32), expect[r])
