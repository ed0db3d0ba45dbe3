#!/bin/bash
# HISTORICAL (round-4 record): several env knobs used below
# (DS2I_ENGINE_PROBE, DS2I_OPT_DYNB, DS2I_S16_V2) were REMOVED in round 5
# after measuring worse; re-running those steps now measures the default
# path under a variant label. Kept for the measurement record only.
# Round-4 stage 2: after the sequence driver (suite run, 50x queue,
# hybrid pipeline) finishes, run the full serial suite twice (VERDICT
# r3 #2 done-bar: two consecutive clean runs, with the per-test cache
# clearing fix in test_wand_device), then rerun the latency sweep —
# its pow2-shape compile ladder now persists in the bench jax_cache,
# so this run prices the ladder once and a final repeat is warm.
# Launch with nohup; single-core machine, so everything is sequential.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_logs
mkdir -p "$OUT"

while [ -f /tmp/r4_seq.pid ] && kill -0 "$(cat /tmp/r4_seq.pid)" 2>/dev/null; do
  sleep 60
done
echo "sequence driver done at $(date)"

for run in 3 4; do
  echo "suite run $run starting at $(date)"
  timeout 3600 python -m pytest tests/ -q >"$OUT/suite_run$run.log" 2>&1
  echo "suite run $run: rc=$? $(tail -1 "$OUT/suite_run$run.log" | tail -c 200)"
done

echo "latency sweep rerun starting at $(date)"
timeout 10800 python -m ds2i_tpu.tools.queries block_optpfor ranked_and \
  /tmp/ds2i_bench/block_optpfor_10000_2000000.idx /tmp/ds2i_bench/wand_1x.bin \
  --engine resident --latency-sweep \
  --queries /tmp/ds2i_bench/coll_10000_2000000_35000.queries \
  >"$OUT/latency_sweep2.json" 2>"$OUT/latency_sweep2.log"
echo "sweep rc=$?"
echo "stage2 done at $(date)"
# appended: 1x measurement of the merged dynamic-b decode classes
DS2I_OPT_DYNB=1 timeout 3600 python bench.py >/tmp/r4_logs/dynb_1x.json 2>/tmp/r4_logs/dynb_1x.log
echo "dynb_1x rc=$? $(tail -c 300 /tmp/r4_logs/dynb_1x.json)"
DS2I_S16_V2=1 timeout 3600 python bench.py >/tmp/r4_logs/s16v2_1x.json 2>/tmp/r4_logs/s16v2_1x.log
echo "s16v2_1x rc=$? $(tail -c 300 /tmp/r4_logs/s16v2_1x.json)"
DS2I_S16_V2=2 timeout 3600 python bench.py >/tmp/r4_logs/s16v3_1x.json 2>/tmp/r4_logs/s16v3_1x.log
echo "s16v3_1x rc=$? $(tail -c 300 /tmp/r4_logs/s16v3_1x.json)"
DS2I_S16_V2=2 DS2I_R_FINE=1 timeout 3600 python bench.py >/tmp/r4_logs/s16v3_fine_1x.json 2>/tmp/r4_logs/s16v3_fine_1x.log
echo "s16v3_fine_1x rc=$? $(tail -c 300 /tmp/r4_logs/s16v3_fine_1x.json)"
DS2I_R_FINE=1 timeout 3600 python bench.py >/tmp/r4_logs/fine_1x.json 2>/tmp/r4_logs/fine_1x.log
echo "fine_1x rc=$? $(tail -c 300 /tmp/r4_logs/fine_1x.json)"
# appended: 50x wand + verified headline at HEAD defaults (fine ladder)
export DS2I_BENCH_DOCS=500000 DS2I_BENCH_POSTINGS=100000000 DS2I_BENCH_TERMS=5000000
DS2I_BENCH_OP=wand timeout 7200 python bench.py >/tmp/r4_logs/wand_fine_50x.json 2>/tmp/r4_logs/wand_fine_50x.log
echo "wand_fine_50x rc=$? $(tail -c 300 /tmp/r4_logs/wand_fine_50x.json)"
DS2I_BENCH_VERIFY=1 timeout 14400 python bench.py >/tmp/r4_logs/verify_fine_50x.json 2>/tmp/r4_logs/verify_fine_50x.log
echo "verify_fine_50x rc=$? $(tail -c 300 /tmp/r4_logs/verify_fine_50x.json)"
echo "stage2 fully done at $(date)"
