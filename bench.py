#!/usr/bin/env python
"""Benchmark driver: batched ranked_and over a synthetic test collection
on the real TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's published mean ranked_and query time on its
bundled 10k-doc test collection, block_optpfor index: 11.125 us/query
(reference README.md:131-135; BASELINE.md). The bench uses the SAME
index type (block_optpfor, device-decoded: OptPFor kernel for full
blocks, stack-machine interpolative for tails) and the SAME op
semantics: the default op is ranked_and with intersection block
skipping (prepare(prune=True)), whose top-k scores are identical to
the exhaustive op (tested) — the device analogue of the next_geq
block skipping the reference's own AND cursor performs. vs_baseline > 1 means
faster than the reference CPU number.

Protocol mirrors queries.cpp:25-60: queries are parsed/laid out up front
(the reference parses stdin into a vector before op_perftest; here the
prepared plan's layout arrays additionally pin on device on the warmup
pass and are reused, the engine's analogue of replaying the parsed
vector), then 1 untimed warmup pass (also triggers XLA compilation) and
9 timed passes (DS2I_BENCH_PASSES; rounds 1-4 used 5); the JSON line
reports the MEDIAN per-query microseconds as "value" plus the per-pass
spread as "value_min"/"value_max". The reference uses the mean of 2
passes on a dedicated CPU; the device here sits behind a shared tunnel
whose transfer bandwidth shows transient congestion (individual passes
vary 2x for identical work, and cross-SESSION 5-pass medians have
differed 35% on identical code — all pass times are logged to stderr),
so the median is taken over more passes and the min/max range is part
of the recorded artifact. Each timed pass decodes the compressed postings on
device, joins, scores, and downloads the top-k scores — nothing decoded
is cached across passes.

The query log defaults to 35,000 queries drawn from the same
distribution as the reference's 3.5k log: per-query cost is
distribution-dependent, not count-dependent, so the per-query mean is
comparable while amortizing the device-tunnel dispatch latency that
would otherwise dominate a batch engine's measurement.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# reference README.md:125-135: block_optpfor 11.125us, block_mixed (4MB
# hybrid) 9.955us; other configs have no published number and compare
# against the block_optpfor headline
BASELINE_US = 9.955 if os.environ.get("DS2I_BENCH_INDEX") == "block_mixed" else 11.125

# Measured same-machine baseline (BASELINE.md "Measured same-machine CPU
# baselines": the native C++ cursor engine, `tools/queries.py --engine
# native`, running the reference's own block-cursor algorithms on this
# machine's CPU) — the honest denominator, per scale and op family.
# vs_baseline_measured > 1 means the TPU engine beats the reference's
# algorithms on modern local silicon, not just the 2014 published number.
_MEASURED_US = {  # num_docs -> {op_family: us/query}
    10_000: {"and": 2.42, "or": 7.29},
    100_000: {"and": 3.63, "or": 14.63},
    500_000: {"and": 5.49, "or": 36.93},
}

CACHE = os.environ.get("DS2I_BENCH_CACHE", "/tmp/ds2i_bench")
# Persist derived engine state (tile tables, norm cache, block-max
# metadata) keyed by index identity, so repeated bench runs attach in
# seconds instead of recomputing (~150 s at 1x; docs/PERF.md
# "Engine-state persistence"). An explicit DS2I_ENGINE_CACHE wins.
os.environ.setdefault("DS2I_ENGINE_CACHE", os.path.join(CACHE, "engine_cache"))
NUM_DOCS = int(os.environ.get("DS2I_BENCH_DOCS", 10_000))
POSTINGS = int(os.environ.get("DS2I_BENCH_POSTINGS", 2_000_000))
NUM_TERMS = int(os.environ.get("DS2I_BENCH_TERMS", 110_000))
NUM_QUERIES = int(os.environ.get("DS2I_BENCH_QUERIES", 35_000))
INDEX_TYPE = os.environ.get("DS2I_BENCH_INDEX", "block_optpfor")
# "and_skip" (default): top-10 BM25 ranked_and with intersection block
#   skipping — results identical to exhaustive "and": the in-repo parity
#   test is tests/test_wand_device.py::test_ranked_and_skip_matches_
#   exhaustive (synthetic queries, rtol=1e-3); DS2I_BENCH_VERIFY=1
#   additionally runs BOTH ops at bench scale here and asserts the full
#   query log's top-k matches. This is the device analogue of the
#   reference's next_geq leapfrog cursor (its and_query skips blocks
#   too, queries.hpp), so it is the apples-to-apples headline op;
# "and": exhaustive ranked_and (every posting of every query term
#   decodes and joins);
# "or": top-10 BM25 ranked_or (exhaustive DAAT union);
# "wand"/"maxscore": top-10 BM25 with block-max pruning (identical
#   results to ranked_or; see ResidentEngine.wand);
# "counts": boolean and+or counts (BASELINE config 1)
BENCH_OP = os.environ.get("DS2I_BENCH_OP", "and_skip")
if BENCH_OP not in ("and", "and_skip", "or", "wand", "maxscore", "counts"):
    raise SystemExit(
        f"DS2I_BENCH_OP must be and|and_skip|or|wand|maxscore|counts, got {BENCH_OP!r}")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    os.makedirs(CACHE, exist_ok=True)
    base = os.path.join(CACHE, f"coll_{NUM_DOCS}_{POSTINGS}_{NUM_QUERIES}")

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
    from ds2i_tpu.tools.common import load_index, save_index

    idx_path = os.path.join(CACHE, f"{INDEX_TYPE}_{NUM_DOCS}_{POSTINGS}.idx")
    t0 = time.time()
    if os.path.exists(idx_path):
        index = load_index(idx_path, INDEX_TYPE)
        log(f"loaded cached {INDEX_TYPE} index in {time.time()-t0:.1f}s")
    else:
        cls = make_index_type(INDEX_TYPE)
        b = cls.builder(coll.num_docs, GlobalParameters())
        for docs, freqs in coll:
            b.add_posting_list(len(docs), docs, freqs, int(np.asarray(freqs, dtype=np.int64).sum()))
        index = b.build()
        save_index(index, idx_path)
        log(f"built {INDEX_TYPE} index in {time.time()-t0:.1f}s")

    wdata = WandData.build(read_sizes(base), coll)
    queries = read_queries(base + ".queries")

    # First-ever pruning metadata comes from the build-time artifact pass
    # (ResidentEngine.build_blockmax: collection slots + device weight
    # kernel — minutes at 50x) instead of the full tile decode pass
    # (create_wand_data.cpp analogue); byte-identical metadata, tested.
    os.environ.setdefault("DS2I_BLOCKMAX_FROM", base)

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ds2i_tpu.engine import ResidentEngine

    log(f"devices: {jax.devices()}")

    # Warm the tunnel's one-time first device->host readback NOW, async:
    # it otherwise serializes into the warmup pass (measured 243s-1658s
    # through the shared tunnel; docs/PERF.md "Tunnel first-readback").
    # Started here it overlaps engine init + layout + compile.
    import jax.numpy as jnp

    _warm = jnp.zeros(16)
    try:
        _warm.copy_to_host_async()
    except AttributeError:
        pass

    t0 = time.time()
    engine = ResidentEngine(
        index, wdata,
        max_part_slots=int(os.environ.get('DS2I_BENCH_PART_SLOTS', 1 << 25)),
        # 35k queries split into 3 parts by the engine's 16384-query
        # default; a single part means one decode-group set per pass
        # instead of three (measured round 4: group-launch overhead, not
        # data, bounds the decode stage)
        max_part_queries=int(os.environ.get('DS2I_BENCH_PART_QUERIES', 16384)),
    )
    log(f"engine init (resident upload + tile tables): {time.time()-t0:.1f}s")

    # parse + lay out the batch (reference: queries parsed before op_perftest)
    t0 = time.time()
    ops = {"counts": ("counts",), "or": ("or",), "wand": ("or",),
           "maxscore": ("or",)}.get(BENCH_OP, ("and",))
    # maxscore = the round-5 distinct algorithm (essential-lists
    # candidate restriction, ResidentEngine.maxscore)
    prune = ("maxscore" if BENCH_OP == "maxscore"
             else BENCH_OP in ("wand", "and_skip"))
    plan = engine.prepare(queries, k=10, ops=ops, ranked=BENCH_OP != "counts", prune=prune)
    log(f"batch layout{' (block-max pruned)' if prune else ''}: "
        f"{time.time()-t0:.1f}s, {len(plan['plans'])} parts")

    # warmup (compile + cache shapes)
    t0 = time.time()
    engine.execute(plan)
    log(f"warmup pass (incl. compile): {time.time()-t0:.1f}s")

    # 9 timed passes (the reference uses 2, queries.cpp:25-60; the
    # tunnel's transient congestion makes individual passes vary — the
    # round-4 driver capture and the builder's session disagreed by 35%
    # on 5-pass medians, so the median is taken over more passes and the
    # min/max spread is part of the recorded artifact)
    times = []
    for run in range(int(os.environ.get("DS2I_BENCH_PASSES", 9))):
        t0 = time.time()
        res = engine.execute(plan)
        dt = time.time() - t0
        times.append(dt)
        log(f"run {run}: {dt:.3f}s for {len(queries)} queries "
            f"({dt / len(queries) * 1e6:.2f} us/query)")

    if os.environ.get("DS2I_BENCH_VERIFY") and BENCH_OP in ("and_skip", "wand", "maxscore"):
        # full-log verification: the pruned op's top-k must match the
        # exhaustive op's on every query (the reference's ranked-test
        # tolerance, test_ranked_queries.cpp:52)
        t0 = time.time()
        exact = engine.execute(engine.prepare(queries, k=10, ops=ops, ranked=True))
        idx_r = 3 if BENCH_OP == "and_skip" else 2
        bad = 0
        for r_p, r_e in zip(res, exact):
            a, b = np.asarray(r_p[idx_r]), np.asarray(r_e[idx_r])
            fa, fb = a[np.isfinite(a)], b[np.isfinite(b)]
            if len(fa) != len(fb) or not np.allclose(fa, fb, rtol=1e-3):
                bad += 1
        log(f"verify vs exhaustive: {bad}/{len(queries)} mismatches "
            f"({time.time()-t0:.1f}s)")
        assert bad == 0, f"pruned op mismatched exhaustive on {bad} queries"

    mean_us = float(np.median(times) / len(queries) * 1e6)
    min_us = float(np.min(times) / len(queries) * 1e6)
    max_us = float(np.max(times) / len(queries) * 1e6)
    fam = "and" if BENCH_OP in ("and", "and_skip") else "or"
    measured = _MEASURED_US.get(NUM_DOCS, {}).get(fam) if BENCH_OP != "counts" else None
    out = {
        "metric": f"median {'boolean and+or counts' if BENCH_OP == 'counts' else BENCH_OP if BENCH_OP in ('wand', 'maxscore') else 'ranked_and (block-skipping, results identical to exhaustive)' if BENCH_OP == 'and_skip' else 'ranked_' + BENCH_OP} query time, {INDEX_TYPE} index, "
                  f"{NUM_DOCS}-doc collection, {NUM_QUERIES}-query log, batched TPU engine",
        "op": BENCH_OP,
        "value": round(mean_us, 3),
        "unit": "us/query",
        # per-pass spread of THIS session (tunnel congestion moves
        # individual passes; cross-session medians historically spread
        # further — quote the range, not just the median)
        "value_min": round(min_us, 3),
        "value_max": round(max_us, 3),
        "vs_baseline": round(BASELINE_US / mean_us, 3),
    }
    if measured is not None:
        # vs the measured same-machine native C++ cursor engine at this
        # scale (BASELINE.md) — the number that actually has to exceed 1
        out["vs_baseline_measured"] = round(measured / mean_us, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
