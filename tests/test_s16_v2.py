"""DS2I_S16_V2=1 swaps the OptPFor Simple16 exception decode for the
two-stage v2 (ops/optpfor_device.py). The decode output is integer, so
engine scores must be BIT-identical to the default path, across blocks
with heavy exception loads (wide value spreads force big n_ex)."""

import gc

import jax
import numpy as np
import pytest

from ds2i_tpu import GlobalParameters
from ds2i_tpu.engine import ResidentEngine
from ds2i_tpu.index.types import make_index_type
from ds2i_tpu.queries import ranked_and_query
from ds2i_tpu.queries.wand_data import WandData


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    # the knob is read at trace time; clearing caches between tests lets
    # each test's env setting take effect
    yield
    jax.clear_caches()
    gc.collect()


@pytest.mark.parametrize("variant", ["1", "2"])
@pytest.mark.parametrize("seed,fmax", [(3, 50), (11, 5000), (29, 200000)])
def test_s16_v2_bit_identical(monkeypatch, seed, fmax, variant):
    rng = np.random.RandomState(seed)
    num_docs, nterms = 2000, 70
    sizes = rng.randint(40, 300, num_docs).astype(np.int64)
    lens = np.maximum(
        np.minimum(rng.zipf(1.3, nterms) * 4, num_docs // 2), 1
    ).astype(np.int64)
    b = make_index_type("block_optpfor").builder(num_docs, GlobalParameters())
    lists = []
    for i in range(nterms):
        n = int(lens[i])
        docs = np.sort(rng.choice(num_docs, size=n, replace=False)).astype(np.int64)
        # long-tailed freqs: most small, spikes up to fmax -> many
        # exception positions and multi-word Simple16 streams
        freqs = rng.randint(1, 8, n).astype(np.int64)
        spikes = rng.rand(n) < 0.15
        if spikes.any():
            freqs[spikes] = rng.randint(8, fmax, int(spikes.sum()))
        lists.append((docs, freqs))
        b.add_posting_list(n, docs, freqs, int(freqs.sum()))
    idx = b.build()
    wd = WandData.build(sizes, lists)
    qs = [sorted(set(rng.choice(nterms, size=rng.randint(1, 5))))
          for _ in range(24)]

    e0 = ResidentEngine(idx, wd, pallas=0)
    a0 = e0.ranked_and(qs, k=10)
    o0 = e0.ranked_or(qs, k=10)
    jax.clear_caches()
    monkeypatch.setenv("DS2I_S16_V2", variant)
    e1 = ResidentEngine(idx, wd, pallas=0)
    a1 = e1.ranked_and(qs, k=10)
    o1 = e1.ranked_or(qs, k=10)
    for i, q in enumerate(qs):
        np.testing.assert_array_equal(a1[i], a0[i], err_msg=f"and q{i}")
        np.testing.assert_array_equal(o1[i], o0[i], err_msg=f"or q{i}")
        oracle = ranked_and_query(idx, wd, q, k=10)
        assert len(a1[i]) == len(oracle)
        np.testing.assert_allclose(a1[i], oracle, rtol=1e-3, err_msg=f"vs oracle q{i}")
