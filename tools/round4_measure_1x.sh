#!/bin/bash
# HISTORICAL (round-4 record): several env knobs used below
# (DS2I_ENGINE_PROBE, DS2I_OPT_DYNB, DS2I_S16_V2) were REMOVED in round 5
# after measuring worse; re-running those steps now measures the default
# path under a variant label. Kept for the measurement record only.
# Round-4 1x measurement ledger (VERDICT r3 items #1/#3/#7): headline
# bench with full-log verification, full/compute/decode ledger, the
# probe-vs-sort join comparison, pruning-knob ablations, and the
# request-latency sweep. Everything runs serially (the TPU tunnel is
# single-client); logs land in $OUT. Run from the repo root.
set -u
OUT=${OUT:-/tmp/r4_logs}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  echo "rc=$? $(tail -c 300 "$OUT/$name.json" 2>/dev/null)"
}

# 1. headline, full-log verified against exhaustive (identity proof at
#    bench scale, not just the in-suite synthetic test)
DS2I_BENCH_VERIFY=1 step headline_and_skip 3600 python bench.py

# 2. full / compute-only / decode-only ledger across op families
step ledger_1x 7200 python tools/bench_ledger.py

# 3. probe join (opt-in) vs the default sort join, same op and scale
DS2I_ENGINE_PROBE=1 step probe_join 3600 python bench.py

# 4. knob ablations (headline op unless noted); layout seconds are in
#    each step's .log (bench.py prints the layout line to stderr)
DS2I_AND_THETA=0    step ablate_no_theta    3600 python bench.py
DS2I_AND_FIXPOINT=0 step ablate_no_fixpoint 3600 python bench.py
DS2I_AND_PROBE_MIN_BLOCKS=32 step ablate_probe_h32 3600 python bench.py
DS2I_AND_PROBE_BLOCKS=256    step ablate_probe_p256 3600 python bench.py
DS2I_BENCH_OP=wand  step wand_default       3600 python bench.py
DS2I_BENCH_OP=wand DS2I_WAND_PROBE=0 step ablate_wand_noprobe 3600 python bench.py

# 5. request-latency sweep (reference protocol analogue; batch sizes
#    1/16/64/1024/full, cold plan per batch)
if [ ! -f /tmp/ds2i_bench/wand_1x.bin ]; then
  timeout 1200 python -m ds2i_tpu.tools.create_wand_data \
    /tmp/ds2i_bench/coll_10000_2000000_35000 /tmp/ds2i_bench/wand_1x.bin \
    >"$OUT/wand_build.log" 2>&1
fi
step latency_sweep 7200 python -m ds2i_tpu.tools.queries block_optpfor ranked_and \
  /tmp/ds2i_bench/block_optpfor_10000_2000000.idx /tmp/ds2i_bench/wand_1x.bin \
  --engine resident --latency-sweep \
  --queries /tmp/ds2i_bench/coll_10000_2000000_35000.queries

echo "all steps done; logs in $OUT"
