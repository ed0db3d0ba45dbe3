import numpy as np

from ds2i_tpu import GlobalParameters
from ds2i_tpu.index import freeze, load
from ds2i_tpu.index.sequence_collection import SequenceCollection
from ds2i_tpu.sequences import IndexedSequence


def test_sequence_collection_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    b = SequenceCollection.builder(IndexedSequence, GlobalParameters())
    seqs = []
    for _ in range(15):
        n = int(rng.randint(1, 300))
        universe = int(rng.randint(n + 1, n * 20 + 2))
        v = np.sort(rng.choice(universe, size=n, replace=False)).astype(np.uint64)
        seqs.append(v)
        b.add_sequence(v, universe)
    coll = b.build()
    assert coll.size() == 15
    path = tmp_path / "seqs.bin"
    freeze(coll.tree(), path)
    coll2 = SequenceCollection.from_tree(IndexedSequence, load(path))
    for i, v in enumerate(seqs):
        np.testing.assert_array_equal(coll2.decode(i), v)
        e = coll2.enumerator(i)
        assert e.move(len(v) - 1) == (len(v) - 1, int(v[-1]))
