#!/bin/bash
# HISTORICAL (round-4 record): several env knobs used below
# (DS2I_ENGINE_PROBE, DS2I_OPT_DYNB, DS2I_S16_V2) were REMOVED in round 5
# after measuring worse; re-running those steps now measures the default
# path under a variant label. Kept for the measurement record only.
# Continuation of round4_measure_1x.sh after a session restart: the
# steps that had not completed (probe_p256 ablation, wand default,
# wand-no-probe ablation, latency sweep). Same OUT dir and protocol.
set -u
OUT=${OUT:-/tmp/r4_logs}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "rc=$? $(tail -c 300 "$OUT/$name.json" 2>/dev/null)"
}

DS2I_AND_PROBE_BLOCKS=256    step ablate_probe_p256 3600 python bench.py
DS2I_BENCH_OP=wand  step wand_default       3600 python bench.py
DS2I_BENCH_OP=wand DS2I_WAND_PROBE=0 step ablate_wand_noprobe 3600 python bench.py

if [ ! -f /tmp/ds2i_bench/wand_1x.bin ]; then
  timeout 1200 python -m ds2i_tpu.tools.create_wand_data \
    /tmp/ds2i_bench/coll_10000_2000000_35000 /tmp/ds2i_bench/wand_1x.bin \
    >"$OUT/wand_build.log" 2>&1
fi
step latency_sweep 7200 python -m ds2i_tpu.tools.queries block_optpfor ranked_and \
  /tmp/ds2i_bench/block_optpfor_10000_2000000.idx /tmp/ds2i_bench/wand_1x.bin \
  --engine resident --latency-sweep \
  --queries /tmp/ds2i_bench/coll_10000_2000000_35000.queries

echo "all remaining 1x steps done; logs in $OUT"
