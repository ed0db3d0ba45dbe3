"""CLI: collect per-block access counts (profile_queries.cpp equivalent).

Usage: python -m ds2i_tpu.tools.profile_queries <type> <op[:op...]> <index>
           [wand data] [--queries FILE] [--out FILE]

Attaches the block profiler to a block index, replays the query log, and
dumps `term\\tc0 c1 ...` TSV (docs/freqs counts interleaved per block) —
the input of the decode-time model and the hybrid-index optimizer.
"""

import argparse
import sys

from ..queries import QUERY_OPS, read_queries
from ..utils import logger
from ..utils.block_profiler import BlockProfiler
from .common import load_index, load_wand_data


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("type")
    ap.add_argument("ops")
    ap.add_argument("index_file")
    ap.add_argument("wand_file", nargs="?")
    ap.add_argument("--queries")
    ap.add_argument("--out")
    ap.add_argument("-k", type=int, default=10)
    args = ap.parse_args()

    index = load_index(args.index_file, args.type)
    if not hasattr(index, "profiler"):
        raise SystemExit("profiling requires a block index type")
    index.profiler = BlockProfiler()
    wdata = load_wand_data(args.wand_file) if args.wand_file else None
    queries = read_queries(args.queries if args.queries else sys.stdin)
    logger(f"{len(queries)} queries")

    for op_name in args.ops.split(":"):
        op = QUERY_OPS[op_name](index, wdata, args.k)
        for terms in queries:
            op(terms)

    out = open(args.out, "w") if args.out else sys.stdout
    index.profiler.dump(out)
    if args.out:
        out.close()
        logger(f"block stats written to {args.out}")


if __name__ == "__main__":
    main()
