#!/usr/bin/env python
"""Perf-ledger measurement: per-op full / compute-only / decode-only
timings on the real TPU, at the scale given by DS2I_BENCH_DOCS /
DS2I_BENCH_POSTINGS (defaults to the 1x bench collection).

For each op family this prints median us/query over PASSES timed passes:
  full          execute(plan): decode + join + download + unpack
  compute-only  dispatch + device compute, forced by a 1-element
                readback per part (DS2I_ENGINE_NOFETCH protocol:
                block_until_ready does not sync through the tunnel)
  decode-only   compute-only with DS2I_ENGINE_JOIN=0 (the decode stage
                executable is unchanged; see engine/resident.py)

Feeds docs/PERF.md's round-3 ledger tables (VERDICT missing #2/#3).
"""
import json
import os
import sys
import time

os.environ.setdefault("DS2I_ENGINE_CACHE", "/tmp/ds2i_bench/engine_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("DS2I_BENCH_CACHE", "/tmp/ds2i_bench")
NUM_DOCS = int(os.environ.get("DS2I_BENCH_DOCS", 10_000))
POSTINGS = int(os.environ.get("DS2I_BENCH_POSTINGS", 2_000_000))
NUM_QUERIES = int(os.environ.get("DS2I_BENCH_QUERIES", 35_000))
INDEX_TYPE = os.environ.get("DS2I_BENCH_INDEX", "block_optpfor")
PASSES = int(os.environ.get("DS2I_BENCH_PASSES", 3))
OPS = os.environ.get("DS2I_BENCH_LEDGER_OPS", "and_skip,and,wand,or").split(",")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    base = os.path.join(CACHE, f"coll_{NUM_DOCS}_{POSTINGS}_{NUM_QUERIES}")
    idx_path = os.path.join(CACHE, f"{INDEX_TYPE}_{NUM_DOCS}_{POSTINGS}.idx")
    from ds2i_tpu.io import BinaryFreqCollection, read_sizes
    from ds2i_tpu.queries import WandData, read_queries
    from ds2i_tpu.tools.common import load_index

    t0 = time.time()
    index = load_index(idx_path, INDEX_TYPE)
    coll = BinaryFreqCollection(base)
    wdata = WandData.build(read_sizes(base), coll)
    queries = read_queries(base + ".queries")
    log(f"load: {time.time()-t0:.1f}s")

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    _warm = jnp.zeros(16)  # start the tunnel's one-time first readback now
    try:
        _warm.copy_to_host_async()
    except AttributeError:
        pass

    from ds2i_tpu.engine import ResidentEngine

    os.environ.setdefault("DS2I_BLOCKMAX_FROM", base)
    log(f"devices: {jax.devices()}")
    t0 = time.time()
    engine = ResidentEngine(
        index, wdata,
        max_part_slots=int(os.environ.get("DS2I_BENCH_PART_SLOTS", 1 << 25)),
        max_part_queries=int(os.environ.get("DS2I_BENCH_PART_QUERIES", 16384)),
    )
    log(f"engine init: {time.time()-t0:.1f}s")

    def timed_full(plan):
        ts = []
        for _ in range(PASSES):
            t0 = time.time()
            engine.execute(plan)
            ts.append(time.time() - t0)
        return ts

    def timed_compute(plan, decode_only=False):
        os.environ["DS2I_ENGINE_NOFETCH"] = "1"
        if decode_only:
            os.environ["DS2I_ENGINE_JOIN"] = "0"
        try:
            # warm this mode's (tiny) slice compiles
            pend = engine.dispatch(plan)
            for _, out in pend:
                np.asarray(out[:1, :1])
            ts = []
            for _ in range(PASSES):
                t0 = time.time()
                pend = engine.dispatch(plan)
                for _, out in pend:
                    np.asarray(out[:1, :1])  # forces compute, 4-byte fetch
                ts.append(time.time() - t0)
            return ts
        finally:
            os.environ.pop("DS2I_ENGINE_NOFETCH", None)
            os.environ.pop("DS2I_ENGINE_JOIN", None)

    results = {}
    for op in OPS:
        ops = ("or",) if op in ("or", "wand") else ("and",)
        prune = op in ("wand", "and_skip")
        t0 = time.time()
        plan = engine.prepare(queries, k=10, ops=ops, ranked=True, prune=prune)
        log(f"[{op}] layout: {time.time()-t0:.1f}s, {len(plan['plans'])} parts")
        t0 = time.time()
        engine.execute(plan)  # warmup/compile
        log(f"[{op}] warmup: {time.time()-t0:.1f}s")
        full = timed_full(plan)
        comp = timed_compute(plan)
        row = {
            "full_us": round(float(np.median(full)) / len(queries) * 1e6, 2),
            "compute_us": round(float(np.median(comp)) / len(queries) * 1e6, 2),
            "full_passes": [round(t, 3) for t in full],
            "compute_passes": [round(t, 3) for t in comp],
            "parts": len(plan["plans"]),
        }
        if op == "and_skip":
            dec = timed_compute(plan, decode_only=True)
            row["decode_us"] = round(float(np.median(dec)) / len(queries) * 1e6, 2)
            row["decode_passes"] = [round(t, 3) for t in dec]
        results[op] = row
        log(f"[{op}] {json.dumps(row)}")
    print(json.dumps({"docs": NUM_DOCS, "postings": POSTINGS, "ops": results}))


if __name__ == "__main__":
    main()
