import numpy as np

from ds2i_tpu.io import (
    BinaryCollection,
    BinaryFreqCollection,
    generate_collection,
    read_sizes,
    write_binary_collection,
)


def test_binary_collection_roundtrip(tmp_path):
    path = tmp_path / "c.docs"
    seqs = [np.array([5]), np.array([1, 2, 3]), np.array([], dtype=np.uint32), np.array([9, 10])]
    write_binary_collection(path, seqs)
    coll = BinaryCollection(path)
    got = [np.asarray(s) for s in coll]
    # empty sequences are skipped, like the reference reader
    assert len(got) == 3
    np.testing.assert_array_equal(got[0], [5])
    np.testing.assert_array_equal(got[1], [1, 2, 3])
    np.testing.assert_array_equal(got[2], [9, 10])


def test_generate_collection(tmp_path):
    base = str(tmp_path / "test_collection")
    num_docs, num_terms, postings = generate_collection(
        base, num_docs=1000, num_terms=5000, postings_target=60_000, num_queries=100
    )
    coll = BinaryFreqCollection(base)
    assert coll.num_docs == 1000
    assert len(coll) == num_terms
    total = 0
    for docs, freqs in coll:
        assert len(docs) == len(freqs)
        assert len(docs) > 0
        d = np.asarray(docs, dtype=np.int64)
        assert np.all(np.diff(d) > 0), "docids must be strictly increasing"
        assert d[-1] < 1000
        assert np.all(np.asarray(freqs) >= 1)
        total += len(docs)
    assert total == postings

    sizes = read_sizes(base)
    assert len(sizes) == 1000
    assert np.all(sizes >= 1)

    queries = open(base + ".queries").read().strip().split("\n")
    assert len(queries) == 100
    for q in queries:
        terms = [int(t) for t in q.split()]
        assert all(0 <= t < num_terms for t in terms)


def test_generator_deterministic(tmp_path):
    b1, b2 = str(tmp_path / "a"), str(tmp_path / "b")
    generate_collection(b1, num_docs=500, num_terms=2000, postings_target=20_000, num_queries=10)
    generate_collection(b2, num_docs=500, num_terms=2000, postings_target=20_000, num_queries=10)
    for ext in (".docs", ".freqs", ".sizes", ".queries"):
        assert open(b1 + ext, "rb").read() == open(b2 + ext, "rb").read()
