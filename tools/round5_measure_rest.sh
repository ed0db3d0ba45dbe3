#!/bin/bash
# Round-5 remaining measurements, ordered by value: fired as soon as the
# tunnel recovers (it was UNAVAILABLE for a stretch mid-round). Logs in
# $OUT. Steps are independent; a hung remote compile dies on its step
# timeout without blocking the rest.
set -u
OUT=${OUT:-/tmp/r5_logs_rest}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "rc=$? $(tail -c 300 "$OUT/$name.json" 2>/dev/null)"
}

# 1. 50x results-identity evidence with patch tables (carried done-bar)
DS2I_BENCH_DOCS=500000 DS2I_BENCH_POSTINGS=100000000 DS2I_BENCH_TERMS=5000000 DS2I_BENCH_VERIFY=1 step verify_50x 10800 python bench.py

# 2. 50x maxscore (the distinct algorithm's first scale number)
DS2I_BENCH_DOCS=500000 DS2I_BENCH_POSTINGS=100000000 DS2I_BENCH_TERMS=5000000 DS2I_BENCH_OP=maxscore step maxscore_50x 7200 python bench.py

# 3. 1x quiet-window ledger + headline (verdict #2: compute <= 2.9?)
DS2I_BENCH_LEDGER_OPS=and_skip,wand DS2I_BENCH_PASSES=9 \
  step ledger_1x 5400 python tools/bench_ledger.py
step headline_1x 3600 python bench.py
DS2I_BENCH_OP=maxscore step maxscore_1x 3600 python bench.py

# 4. 50x one-part retry (the fused compile hung once; retry when the
#    tunnel is healthy — removes cross-part duplicate decode)
DS2I_BENCH_DOCS=500000 DS2I_BENCH_POSTINGS=100000000 DS2I_BENCH_TERMS=5000000 \
  DS2I_BENCH_PART_QUERIES=65536 DS2I_BENCH_PART_SLOTS=67108864 step onepart_50x 5400 python bench.py

# 5. 50x NOEX floor retry (diagnostic)
DS2I_BENCH_DOCS=500000 DS2I_BENCH_POSTINGS=100000000 DS2I_BENCH_TERMS=5000000 \
  DS2I_DECODE_NOEX=1 DS2I_BENCH_LEDGER_OPS=and_skip DS2I_BENCH_PASSES=5 step noex_ledger_50x 5400 python tools/bench_ledger.py

# 6. latency sweep completion (verdict #6: 1024 + full rows)
step sweep_1x 10800 python -m ds2i_tpu.tools.queries block_optpfor ranked_and \
  /tmp/ds2i_bench/block_optpfor_10000_2000000.idx /tmp/ds2i_bench/wand_1x.bin \
  --engine resident --latency-sweep \
  --queries /tmp/ds2i_bench/coll_10000_2000000_35000.queries

echo "all steps done; logs in $OUT"
