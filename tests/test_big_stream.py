"""Streams beyond 2^31 bits (the old 256MB limit) must serve correctly:
tile-table cursors are (word, bit-in-word) pairs, so i32 indexing now
reaches 8GB per resident stream. Instead of building ~170M postings, a
small index's byte stream is rebased past the 2^31-bit mark by
prepending zero padding and shifting the endpoint directory — every
cursor the walk produces then exceeds the old i32 bit-offset range."""

import numpy as np

from ds2i_tpu import GlobalParameters
from ds2i_tpu.engine import ResidentEngine
from ds2i_tpu.index.types import make_index_type

PAD = (1 << 28) + 64  # bytes -> first real bit > 2^31


def _small_index(tname, num_docs=3000, nlists=40, seed=4):
    rng = np.random.RandomState(seed)
    cls = make_index_type(tname)
    b = cls.builder(num_docs, GlobalParameters())
    for i in range(nlists):
        n = int(rng.randint(1, 600))
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        freqs = (1 + rng.zipf(1.5, n) % 40).astype(np.int64)
        b.add_posting_list(n, docs, freqs, int(freqs.sum()))
    return b.build(), rng


def test_block_stream_past_2g_bits():
    idx, rng = _small_index("block_optpfor")
    base = ResidentEngine(idx, pallas=0)

    padded = type(idx)(
        idx.params, idx.num_docs(),
        np.concatenate([np.zeros(PAD, np.uint8), idx.lists]),
        idx.endpoints_bv, idx.size(),
    )
    # rebase the endpoint directory past the padding (the EF-coded
    # endpoints themselves would be rebuilt by a real giant build)
    padded._endpoints_cache = idx.endpoints().astype(np.uint64) + PAD

    big = ResidentEngine(padded, pallas=0)
    qs = [list(rng.choice(40, size=rng.randint(1, 4), replace=False)) for _ in range(24)]
    np.testing.assert_array_equal(big.and_counts(qs), base.and_counts(qs))
    for a, b in zip(big.ranked_or(qs, k=5), base.ranked_or(qs, k=5)):
        np.testing.assert_allclose(b, a, rtol=1e-6)


def test_ef_stream_past_2g_bits():
    from ds2i_tpu.bitvec import BitVector
    from ds2i_tpu.index.bitvector_collection import BitvectorCollection

    idx, rng = _small_index("ef")
    base = ResidentEngine(idx, pallas=0)

    def pad_coll(coll):
        pad_words64 = PAD // 8  # whole u64 words keep content bit-aligned
        words = np.concatenate([
            np.zeros(pad_words64, np.uint64), np.asarray(coll.bits_bv.words),
        ])
        bv = BitVector(words, int(coll.bits_bv.nbits) + pad_words64 * 64)
        out = BitvectorCollection(coll.size(), coll.endpoints_bv, bv, coll._params)
        out._endpoints_cache = (
            np.asarray(coll.endpoints(), dtype=np.uint64) + np.uint64(pad_words64 * 64)
        )
        return out

    padded = type(idx)(
        idx.params, idx.num_docs(),
        pad_coll(idx.docs_sequences), pad_coll(idx.freqs_sequences),
    )

    big = ResidentEngine(padded, pallas=0)
    qs = [list(rng.choice(40, size=rng.randint(1, 4), replace=False)) for _ in range(24)]
    np.testing.assert_array_equal(big.and_counts(qs), base.and_counts(qs))
    for a, b in zip(big.ranked_or(qs, k=5), base.ranked_or(qs, k=5)):
        np.testing.assert_allclose(b, a, rtol=1e-6)
