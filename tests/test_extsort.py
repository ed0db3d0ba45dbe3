"""External-memory sort (stxxl::sort parity, utils/extsort.py) — tiny
budgets force multi-run spills; result must match a single stable
in-memory argsort, including tie order."""

import numpy as np
import pytest

from ds2i_tpu.index.hybrid import LAMBDA_DTYPE
from ds2i_tpu.utils.extsort import external_sort_to_file


def _random_lambdas(rng, n):
    a = np.zeros(n, dtype=LAMBDA_DTYPE)
    a["block_id"] = rng.integers(0, max(n // 2, 1) + 1, n)
    # few distinct keys -> many ties, exercising merge stability
    a["lambda"] = rng.integers(0, 7, n).astype(np.float32) / 4
    a["time"] = rng.random(n).astype(np.float32)
    a["space"] = rng.integers(0, 1 << 16, n)
    a["type"] = rng.integers(0, 3, n)
    a["param"] = rng.integers(0, 16, n)
    return a


@pytest.mark.parametrize("n,budget", [(0, 1 << 20), (1, 1 << 20), (1000, 1 << 20), (20000, 4096), (100000, 1 << 14)])
def test_extsort_matches_stable_argsort(tmp_path, n, budget):
    rng = np.random.default_rng(12345 + n)
    a = _random_lambdas(rng, n)
    chunks = np.array_split(a, 7) if n else [a]
    out = str(tmp_path / "sorted.bin")
    total = external_sort_to_file(chunks, LAMBDA_DTYPE, "lambda", out, budget)
    assert total == n
    got = np.load(out, mmap_mode="r")
    want = a[np.argsort(a["lambda"], kind="stable")]
    assert np.array_equal(np.asarray(got), want)


def test_compute_lambdas_checkpoint_and_budget(tmp_path, monkeypatch):
    """Full pipeline: out-of-core sorted lambdas reload from the checkpoint
    and drive the same greedy result as a fresh computation."""
    from ds2i_tpu.codecs.time_prediction import Predictor
    from ds2i_tpu.config import Configuration
    from ds2i_tpu.global_params import GlobalParameters
    from ds2i_tpu.index.hybrid import compute_lambdas, greedy_tradeoff
    from ds2i_tpu.index.types import make_index_type

    monkeypatch.setenv("DS2I_SORT_BUDGET", "8192")  # force several runs
    Configuration.reset()
    try:
        rng = np.random.default_rng(7)
        cls = make_index_type("block_optpfor")
        b = cls.builder(2000, GlobalParameters())
        n_lists = 12
        for _ in range(n_lists):
            n = int(rng.integers(100, 400))
            docs = np.sort(rng.choice(2000, size=n, replace=False)).astype(np.uint32)
            freqs = rng.integers(1, 5, n).astype(np.uint32)
            b.add_posting_list(n, docs, freqs)
        idx = b.build()

        preds = [
            Predictor([("bias", 1.0), ("size", 0.1), ("nonzeros", 0.05)])
            for _ in range(3)
        ]

        path = str(tmp_path / "lambdas.bin")
        lam = compute_lambdas(idx, preds, {}, path)
        assert len(lam) > 0
        keys = np.asarray(lam["lambda"])
        assert np.all(keys[:-1] <= keys[1:])
        # reload path (checkpoint hit) gives identical stream
        lam2 = compute_lambdas(idx, preds, {}, path)
        assert np.array_equal(np.asarray(lam), np.asarray(lam2))

        r = greedy_tradeoff(idx, lam, budget=1 << 20)
        assert r is not None
        types, params = r
        assert len(types) == 2 * sum(
            -(-idx.list_length(l) // 128) for l in range(idx.size())
        )
    finally:
        Configuration.reset()


def test_lambdas_checkpoint_npz_named_path(tmp_path, monkeypatch):
    """A checkpoint whose FILENAME says .npz but whose content is the
    current raw-.npy format must reload correctly (content is sniffed,
    not the name), and genuine legacy .npz archives still load."""
    import numpy as np

    from ds2i_tpu.index.hybrid import LAMBDA_DTYPE, compute_lambdas

    rng = np.random.default_rng(3)
    arr = _random_lambdas(rng, 500)
    arr = arr[np.argsort(arr["lambda"], kind="stable")]

    legacy = tmp_path / "legacy.npz"
    np.savez_compressed(legacy, lambdas=arr)
    got = compute_lambdas(None, None, None, str(legacy))
    np.testing.assert_array_equal(np.asarray(got), arr)

    modern = tmp_path / "modern.npz"  # misleading name, raw .npy content
    with open(modern, "wb") as f:
        np.save(f, arr)
    got = compute_lambdas(None, None, None, str(modern))
    np.testing.assert_array_equal(np.asarray(got), arr)
