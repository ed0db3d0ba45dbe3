#!/bin/bash
# HISTORICAL (round-4 record): several env knobs used below
# (DS2I_ENGINE_PROBE, DS2I_OPT_DYNB, DS2I_S16_V2) were REMOVED in round 5
# after measuring worse; re-running those steps now measures the default
# path under a variant label. Kept for the measurement record only.
# Round-4 WSDM'15 hybrid pipeline re-run on the DEVICE cost model
# (VERDICT r3 item #6): profile_queries (closed form) ->
# profile_decoding --engine resident (real-TPU per-block decode times)
# -> dec_time_regression (Huber-L1) -> optimal_hybrid_index (lambda
# greedy, reference 4,000,000-byte budget) -> bench the mixed index.
# The output index lands at the bench cache path so bench.py serves it.
set -eu
OUT=${OUT:-/tmp/r4_hybrid}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

BASE=/tmp/ds2i_bench/coll_10000_2000000_35000
IDX=/tmp/ds2i_bench/block_optpfor_10000_2000000.idx
FRACTION=${FRACTION:-0.03}

python -m ds2i_tpu.tools.profile_queries block_optpfor ranked_and "$IDX" \
  --queries "$BASE.queries" --out "$OUT/block_stats.tsv" 2>"$OUT/pq.log"

timeout 10800 python -m ds2i_tpu.tools.profile_decoding block_optpfor "$IDX" \
  "$FRACTION" --engine resident --out "$OUT/profile_device.jsonl" 2>"$OUT/pd.log"

python -m ds2i_tpu.tools.dec_time_regression "$OUT/profile_device.jsonl" \
  --out "$OUT/weights_device.tsv" 2>"$OUT/reg.log"

timeout 7200 python -m ds2i_tpu.tools.optimal_hybrid_index block_optpfor \
  "$OUT/weights_device.tsv" "$OUT/block_stats.tsv" "$IDX" \
  "$OUT/lambdas_device.bin" 4000000 \
  /tmp/ds2i_bench/block_mixed_10000_2000000.idx \
  --check "$BASE" >"$OUT/hybrid.json" 2>"$OUT/hybrid.log"

DS2I_BENCH_INDEX=block_mixed timeout 3600 python bench.py \
  >"$OUT/bench_mixed_device.json" 2>"$OUT/bench_mixed_device.log"

echo "hybrid pipeline done; logs in $OUT"
tail -c 300 "$OUT/bench_mixed_device.json"
