#!/usr/bin/env python
"""One-off analysis: 50x pruned-AND plan statistics on CPU (host planner
only) — quantifies where the per-pass device work goes and sizes the
candidate probe-join redesign. Not part of the shipped API."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("DS2I_ENGINE_CACHE", "/tmp/ds2i_bench/engine_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ds2i_tpu.io import BinaryFreqCollection, read_sizes
from ds2i_tpu.queries import WandData, read_queries
from ds2i_tpu.tools.common import load_index

CACHE = "/tmp/ds2i_bench"
base = os.path.join(CACHE, "coll_500000_100000000_35000")
idx_path = os.path.join(CACHE, "block_optpfor_500000_100000000.idx")

t0 = time.time()
index = load_index(idx_path, "block_optpfor")
coll = BinaryFreqCollection(base)
wdata = WandData.build(read_sizes(base), coll)
queries = read_queries(base + ".queries")
print(f"load: {time.time()-t0:.1f}s", flush=True)

from ds2i_tpu.engine import ResidentEngine

t0 = time.time()
eng = ResidentEngine(index, wdata, max_part_slots=1 << 25)
print(f"engine init: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
eng._ensure_blockmax()
print(f"blockmax attach: {time.time()-t0:.1f}s", flush=True)

terms, qw, counts = eng._prep_terms(queries, True)
B = len(queries)
span_row = np.repeat(np.arange(B), counts)
t0 = time.time()
full_dir = eng._pruned_directory(terms, qw, counts, 10, span_row, mode="and")
print(f"AND pruned directory: {time.time()-t0:.1f}s", flush=True)
gblk_kept, span_kept, row_of_blk, row_nb = full_dir

# --- per-span kept blocks
nspans = len(terms)
span_nb_kept = np.bincount(span_kept, minlength=nspans)
sexcl = np.cumsum(counts) - counts

# rare span per row = argmin kept blocks among the row's spans
INF = 1 << 60
rare_nb = np.full(B, INF, dtype=np.int64)
np.minimum.at(rare_nb, span_row, span_nb_kept)
rare_nb[rare_nb == INF] = 0
other_nb_max = np.zeros(B, dtype=np.int64)  # max kept blocks among non-rare spans
# compute per row: total, max; other_max = max if max>rare else second... approximate with max
row_max = np.zeros(B, dtype=np.int64)
np.maximum.at(row_max, span_row, span_nb_kept)
other_nb_max = row_max

tot_kept = int(row_nb.sum())
print(f"\nqueries={B}  total kept blocks={tot_kept}  kept slots={tot_kept*32}")
print(f"terms/query: mean={counts.mean():.2f} max={counts.max()}")

# --- current sort-join cost model
MIN_L = 64
Lb = np.maximum(row_nb * 32, 1)
Lb = np.maximum(2 ** np.ceil(np.log2(np.maximum(Lb, MIN_L))).astype(np.int64), MIN_L)
sort_cost = (Lb * np.maximum(np.log2(Lb), 1)).sum()  # compare-exchange units
gather_cost = Lb.sum()
print(f"\n[sort-join] padded slots/query: mean={Lb.mean():.0f} p50={np.median(Lb):.0f} "
      f"p90={np.percentile(Lb,90):.0f} max={Lb.max()}")
print(f"[sort-join] total padded slots/pass: {Lb.sum()} "
      f"sortwork={sort_cost/1e9:.2f}G cmpx")

# --- probe-join cost model
CLb = np.maximum(rare_nb * 32, 1)
CLb = np.maximum(2 ** np.ceil(np.log2(np.maximum(CLb, MIN_L))).astype(np.int64), MIN_L)
NBb = 2 ** np.ceil(np.log2(np.maximum(other_nb_max, 1))).astype(np.int64)
To = np.maximum(counts - 1, 0)
probe_gathers = CLb * (To * (np.log2(np.maximum(NBb, 2)) + 5))
print(f"\n[probe-join] candidates/query: mean={CLb.mean():.0f} p50={np.median(CLb):.0f} "
      f"p90={np.percentile(CLb,90):.0f} max={CLb.max()}")
print(f"[probe-join] total candidate slots/pass: {CLb.sum()} "
      f"gatherwork={probe_gathers.sum()/1e9:.2f}G gathers")

# --- decode volume (shared by both): unique kept tiles per part
tiles_kept = eng.tile_of_gblk[gblk_kept]
ut = np.unique(tiles_kept)
tslots = int(eng.tile_blocks[ut].sum() * 32)
print(f"\n[decode] unique kept tiles={len(ut)} decoded slots={tslots} "
      f"({tslots/B:.0f}/query)")

# bucket counts under (CLb, NBb) probing vs Lb
print(f"\n[buckets] sort-join L classes: {len(np.unique(Lb))}")
NBc = np.maximum(NBb, 1)
keys = CLb * (1 << 30) + NBc
print(f"[buckets] probe-join (CL,NB) classes: {len(np.unique(keys))}")
print(f"[buckets] CL classes: {sorted(np.unique(CLb))}")
print(f"[buckets] NB classes: {sorted(np.unique(NBc))}")
