#!/bin/bash
# Round-5 fresh-machine 1x recovery: /tmp was wiped mid-round (all
# caches cold) and the tunnel came back — re-capture the 1x rows the
# outage swallowed, ordered by value:
#   1. headline (also warms collection/index/engine-cache/jax-cache for
#      every later step and for the driver's end-of-round bench run)
#   2. ledger compute/decode splits (verdict #2: compute <= 2.9?)
#   3. maxscore (the round-5 distinct algorithm's 1x number)
#   4. latency sweep incl. the 1024/full rows (verdict #6)
# Logs in $OUT. Steps are independent; a hung step dies on its timeout.
set -u
OUT=${OUT:-/tmp/r5_1x}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "rc=$? $(tail -c 300 "$OUT/$name.json" 2>/dev/null)"
}

step headline_1x 5400 python bench.py
DS2I_BENCH_LEDGER_OPS=and_skip,wand DS2I_BENCH_PASSES=9 \
  step ledger_1x 5400 python tools/bench_ledger.py
DS2I_BENCH_OP=maxscore step maxscore_1x 3600 python bench.py

# sweep needs a saved wand file; collection exists after the headline
if [ ! -f /tmp/ds2i_bench/wand_1x.bin ]; then
  timeout 600 python -m ds2i_tpu.tools.create_wand_data \
    /tmp/ds2i_bench/coll_10000_2000000_35000 /tmp/ds2i_bench/wand_1x.bin \
    >"$OUT/wand_data.log" 2>&1
fi
step sweep_1x 7200 python -m ds2i_tpu.tools.queries block_optpfor ranked_and \
  /tmp/ds2i_bench/block_optpfor_10000_2000000.idx /tmp/ds2i_bench/wand_1x.bin \
  --engine resident --latency-sweep \
  --queries /tmp/ds2i_bench/coll_10000_2000000_35000.queries

echo "all 1x steps done; logs in $OUT"
