"""CLI: query benchmark (queries.cpp:124-153 equivalent).

Usage: python -m ds2i_tpu.tools.queries <type> <op[:op...]> <index file>
           [wand data] [-k 10] < queries.txt

Timing protocol mirrors op_perftest (queries.cpp:25-60): 1 untimed warmup
run, 2 timed runs over all queries, per-query microseconds; reports
mean/q50/q90/q95 as a stats_line.
"""

import argparse
import sys
import time

import numpy as np

from ..queries import QUERY_OPS, read_queries
from ..utils import logger, stats_line
from .common import load_index, load_wand_data


def op_perftest(op_fn, queries, op_name, type_name, runs=2):
    times = []
    for run in range(runs + 1):
        run_times = []
        for terms in queries:
            t0 = time.perf_counter()
            op_fn(terms)
            run_times.append((time.perf_counter() - t0) * 1e6)
        if run:  # first run is warmup
            times.extend(run_times)
    times = np.sort(np.array(times))
    mean = float(times.mean())
    logger(f"---- {type_name} {op_name}")
    logger(f"Mean: {mean}")
    logger(f"50% quantile: {np.quantile(times, 0.5)}")
    logger(f"90% quantile: {np.quantile(times, 0.9)}")
    logger(f"95% quantile: {np.quantile(times, 0.95)}")
    stats_line(
        type=type_name, query=op_name, avg=mean,
        q50=float(np.quantile(times, 0.5)),
        q90=float(np.quantile(times, 0.9)),
        q95=float(np.quantile(times, 0.95)),
    )


def perftest(index, wdata, queries, type_name, ops, k=10):
    # warm lists (queries.cpp:79-88)
    warmed = set()
    for terms in queries:
        for t in terms:
            if t not in warmed:
                index.warmup(t)
                warmed.add(t)
    for op_name in ops:
        if op_name not in QUERY_OPS:
            logger(f"unsupported query type: {op_name}")
            continue
        op_fn = QUERY_OPS[op_name](index, wdata, k)
        op_perftest(op_fn, queries, op_name, type_name)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("type")
    ap.add_argument("ops", help="colon-separated: and:or:ranked_and:wand:maxscore")
    ap.add_argument("index_file")
    ap.add_argument("wand_file", nargs="?")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--queries", help="read queries from file instead of stdin")
    args = ap.parse_args()

    index = load_index(args.index_file, args.type)
    wdata = load_wand_data(args.wand_file) if args.wand_file else None
    queries = read_queries(args.queries if args.queries else sys.stdin)
    logger(f"{len(queries)} queries")
    perftest(index, wdata, queries, args.type, args.ops.split(":"), k=args.k)


if __name__ == "__main__":
    main()
