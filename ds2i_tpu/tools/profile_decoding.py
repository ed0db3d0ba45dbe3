"""CLI: measure per-(type,param) block decode times (profile_decoding.cpp).

Usage: python -m ds2i_tpu.tools.profile_decoding <type> <index> <fraction>
           [--out FILE]

Samples `fraction` of the full blocks (rng seeded 1729, like the
reference), re-encodes each with every viable (type, param), measures
decode time over repeated randomly-ordered replays, and emits one JSON
line per measurement with the block's features — the training data for
the decode-time regression.

The measured cost is THIS machine's decode cost for the oracle path; the
TPU batch engine's cost model is dominated by bytes (see
ds2i_tpu.engine), so the reference's feature set doubles as a space
proxy there.
"""

import argparse
import json
import sys
import time

import numpy as np

from ..codecs.interpolative import UNKNOWN_SUM
from ..codecs.mixed import BLOCK_TYPES, MixedBlock, compr_params
from ..codecs.time_prediction import FEATURES, FeatureVector, values_statistics
from ..utils import logger
from .common import load_index


def measure_decode(block_type, param, values, sum_of_values, replays=64):
    out = []
    fv = FeatureVector()
    values_statistics(values, fv)
    buf = MixedBlock.compression_stats(block_type, param, values, sum_of_values, len(values), fv)
    if buf is None:
        return None
    t0 = time.perf_counter_ns()
    for _ in range(replays):
        MixedBlock.decode(buf, 0, sum_of_values, len(values))
    elapsed = (time.perf_counter_ns() - t0) / replays
    rec = {"type": block_type, "time": elapsed}
    rec.update(fv.dump())
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("type")
    ap.add_argument("index_file")
    ap.add_argument("fraction", type=float)
    ap.add_argument("--out")
    ap.add_argument("--replays", type=int, default=64)
    args = ap.parse_args()

    index = load_index(args.index_file, args.type)
    rng = np.random.RandomState(1729)
    out = open(args.out, "w") if args.out else sys.stdout

    measured = 0
    for l in range(index.size()):
        if index.list_length(l) < MixedBlock.block_size:
            continue
        if rng.rand() > args.fraction:
            continue
        for ib in index.get_blocks(l):
            if ib.size != MixedBlock.block_size:
                continue
            gaps, _ = index.codec.decode(ib.docs_bytes, 0, ib.doc_gaps_universe, ib.size)
            freqs, _ = index.codec.decode(ib.freqs_bytes, 0, UNKNOWN_SUM, ib.size)
            for values, sov in ((gaps, ib.doc_gaps_universe), (freqs, UNKNOWN_SUM)):
                for t in range(BLOCK_TYPES):
                    for param in range(compr_params(t)):
                        rec = measure_decode(t, param, values, sov, args.replays)
                        if rec is not None:
                            out.write(json.dumps(rec) + "\n")
                            measured += 1
    logger(f"{measured} measurements")
    if args.out:
        out.close()


if __name__ == "__main__":
    main()
