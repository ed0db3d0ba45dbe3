#!/usr/bin/env python
"""Benchmark driver: batched ranked_and over the synthetic 10k-doc test
collection on the real TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's published mean ranked_and query time on its
bundled 10k-doc test collection, block_optpfor index: 11.125 us/query
(reference README.md:131-135; BASELINE.md). vs_baseline > 1 means faster
than the reference CPU number.

Protocol mirrors queries.cpp:25-60: 1 untimed warmup pass (also triggers
XLA compilation), 2 timed passes over the full query log, mean per-query
microseconds.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_US = 11.125

CACHE = os.environ.get("DS2I_BENCH_CACHE", "/tmp/ds2i_bench")
NUM_DOCS = int(os.environ.get("DS2I_BENCH_DOCS", 10_000))
POSTINGS = int(os.environ.get("DS2I_BENCH_POSTINGS", 2_000_000))
NUM_TERMS = int(os.environ.get("DS2I_BENCH_TERMS", 110_000))
NUM_QUERIES = int(os.environ.get("DS2I_BENCH_QUERIES", 3_500))
INDEX_TYPE = os.environ.get("DS2I_BENCH_INDEX", "ef")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    os.makedirs(CACHE, exist_ok=True)
    base = os.path.join(CACHE, f"coll_{NUM_DOCS}_{POSTINGS}")

    from ds2i_tpu.io import BinaryFreqCollection, generate_collection, read_sizes

    if not os.path.exists(base + ".docs"):
        log("generating collection...")
        generate_collection(
            base, num_docs=NUM_DOCS, num_terms=NUM_TERMS,
            postings_target=POSTINGS, num_queries=NUM_QUERIES,
        )
    coll = BinaryFreqCollection(base)

    from ds2i_tpu import GlobalParameters
    from ds2i_tpu.index.types import make_index_type
    from ds2i_tpu.queries import WandData, read_queries

    t0 = time.time()
    cls = make_index_type(INDEX_TYPE)
    b = cls.builder(coll.num_docs, GlobalParameters())
    for docs, freqs in coll:
        b.add_posting_list(len(docs), docs, freqs, int(np.asarray(freqs, dtype=np.int64).sum()))
    index = b.build()
    log(f"built {INDEX_TYPE} index in {time.time()-t0:.1f}s "
        f"({index.docs_sequences.bits_bv.nbits / 8 / 1e6:.1f} MB docs bits)")

    wdata = WandData.build(read_sizes(base), coll)
    queries = read_queries(base + ".queries")

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ds2i_tpu.engine import TileQueryEngine

    log(f"devices: {jax.devices()}")
    engine = TileQueryEngine(index, wdata)

    # warmup (compile + cache shapes)
    t0 = time.time()
    engine.ranked_and(queries, k=10)
    log(f"warmup pass (incl. compile): {time.time()-t0:.1f}s")

    times = []
    for run in range(2):
        t0 = time.time()
        res = engine.ranked_and(queries, k=10)
        dt = time.time() - t0
        times.append(dt)
        log(f"run {run}: {dt:.3f}s for {len(queries)} queries "
            f"({dt / len(queries) * 1e6:.2f} us/query)")

    mean_us = float(np.mean(times) / len(queries) * 1e6)
    print(json.dumps({
        "metric": f"mean ranked_and query time, {INDEX_TYPE} index, "
                  f"{NUM_DOCS}-doc collection, batched TPU engine",
        "value": round(mean_us, 3),
        "unit": "us/query",
        "vs_baseline": round(BASELINE_US / mean_us, 3),
    }))


if __name__ == "__main__":
    main()
