#!/bin/bash
# Round-5 fresh-machine 50x session (post-outage recovery, /tmp wiped):
# patch-table headline cold, then the dense-row A/B on warm caches, then
# the distinct maxscore's first 50x number. Logs in $OUT.
set -u
OUT=${OUT:-/tmp/r5_50x}
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

step headline_50x 10800 python bench.py
# NOTE (historical): DS2I_EX_DENSE was removed same-day after this A/B
# measured it worse at both scales (docs/PERF.md round 5; impl in git
# history a109b4a) — on current HEAD this step just re-runs the default.
DS2I_EX_DENSE=1 step dense_50x 7200 python bench.py
DS2I_BENCH_OP=maxscore step maxscore_50x 7200 python bench.py
DS2I_BENCH_OP=wand step wand_50x 5400 python bench.py

echo "all 50x steps done; logs in $OUT"
