#!/bin/bash
# Round-5 50x measurement: resident exception patch tables (DEFAULT) vs
# the carried target (pruned ranked_and <= 5.5 us/query; BASELINE.md
# native cursor 5.49). First run on a machine pays: expatch build
# (~2 min), fresh optp decode compiles, theta re-probe (theta cache is
# keyed on norms since round 5). Repeats are cache-warm. Logs in $OUT.
set -u
OUT=${OUT:-/tmp/r5_logs_50x}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

export DS2I_BENCH_DOCS=500000
export DS2I_BENCH_POSTINGS=100000000
export DS2I_BENCH_TERMS=5000000

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "rc=$? $(tail -c 300 "$OUT/$name.json" 2>/dev/null)"
}

# 1. headline (patch tables default); cold on first run, warm repeat
step headline_50x 14400 python bench.py
step headline_50x_warm 7200 python bench.py

# 2. ledger splits + the no-exception floor diagnostic
DS2I_BENCH_LEDGER_OPS=and_skip DS2I_BENCH_PASSES=7 \
  step ledger_50x 7200 python tools/bench_ledger.py
DS2I_DECODE_NOEX=1 DS2I_BENCH_LEDGER_OPS=and_skip DS2I_BENCH_PASSES=7 \
  step noex_ledger_50x 7200 python tools/bench_ledger.py

# 3. A/B: in-pass Simple16 exception decode (pre-round-5 default)
DS2I_EX_PATCH=0 step legacy_expath_50x 7200 python bench.py

# 4. serving variants
DS2I_BENCH_PART_QUERIES=65536 step onepart_50x 7200 python bench.py
DS2I_DECODE_FUSED=0 step unfused_50x 7200 python bench.py

# 5. pruned-OR family: wand + the round-5 distinct maxscore
DS2I_BENCH_OP=wand     step wand_50x     7200 python bench.py
DS2I_BENCH_OP=maxscore step maxscore_50x 7200 python bench.py

# 6. results-identity evidence at 50x (pruned == exhaustive, full log)
DS2I_BENCH_VERIFY=1 step verify_50x 14400 python bench.py
