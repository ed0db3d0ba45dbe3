"""Block index integration tests (mirrors test_block_freq_index.cpp and
test_block_posting_list.cpp): roundtrip through frozen files, next_geq,
and block reordering via write_blocks (the hybrid-index mechanism)."""

import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.index import freeze, load
from ds2i_tpu.index.block_index import BlockPostingList
from ds2i_tpu.index.types import make_index_type

def make_lists(num_docs=8192, n_lists=20, seed=17):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_lists):
        n = int(rng.randint(1, 1000))
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.uint64)
        freqs = rng.randint(1, 256, size=n).astype(np.uint64)
        out.append((docs, freqs))
    return out


LISTS = make_lists()

BLOCK_TYPES = ["block_optpfor", "block_varint", "block_interpolative", "block_qmx"]


@pytest.mark.parametrize("name", BLOCK_TYPES)
def test_block_index_roundtrip(name, tmp_path):
    num_docs = 8192
    cls = make_index_type(name)
    b = cls.builder(num_docs, GlobalParameters())
    for docs, freqs in LISTS:
        b.add_posting_list(len(docs), docs, freqs, int(freqs.sum()))
    index = b.build()
    path = tmp_path / f"{name}.bin"
    freeze(index.tree(), path)
    index2 = cls.from_tree(load(path))
    assert index2.size() == len(LISTS)

    for i, (docs, freqs) in enumerate(LISTS):
        d, f = index2.decode_list(i)
        np.testing.assert_array_equal(d, docs)
        np.testing.assert_array_equal(f, freqs)
        if i % 5 == 0:
            e = index2[i]
            mid = int(docs[len(docs) // 2])
            e.next_geq(mid)
            assert e.docid() == mid
            assert e.freq() == freqs[len(docs) // 2]
            e.next_geq(int(docs[-1]) + 1)
            assert e.docid() == num_docs


def test_block_reordering_via_write_blocks():
    """Shuffle blocks, rewrite via write_blocks, re-verify
    (test_block_posting_list.cpp:72-97)."""
    rng = np.random.RandomState(4)
    cls = make_index_type("block_optpfor")
    codec = cls.codec
    n = 1000
    docs = np.sort(rng.choice(100_000, size=n, replace=False)).astype(np.uint64)
    freqs = rng.randint(1, 100, size=n).astype(np.uint64)

    out = []
    BlockPostingList.write(out, n, docs, freqs, codec)
    data = np.concatenate([np.asarray(o, dtype=np.uint8).reshape(-1) for o in out])

    blocks = BlockPostingList.get_blocks(data, 0, codec)
    assert len(blocks) == (n + 127) // 128
    shuffled = [blocks[0]] + [blocks[i] for i in rng.permutation(np.arange(1, len(blocks)))]

    out2 = []
    BlockPostingList.write_blocks(out2, n, shuffled, codec)
    data2 = np.concatenate([np.asarray(o, dtype=np.uint8).reshape(-1) for o in out2])
    d2, f2 = BlockPostingList.decode_list(data2, 0, codec)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(f2, freqs)
