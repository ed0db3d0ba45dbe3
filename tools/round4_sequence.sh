#!/bin/bash
# HISTORICAL (round-4 record): several env knobs used below
# (DS2I_ENGINE_PROBE, DS2I_OPT_DYNB, DS2I_S16_V2) were REMOVED in round 5
# after measuring worse; re-running those steps now measures the default
# path under a variant label. Kept for the measurement record only.
# Round-4 sequence driver: wait for the 1x continuation queue, then
# (a) full suite run 2 while the TPU is idle, (b) the 50x measurement
# queue (VERDICT r3 #4: pruned ranked_and <= 5.5 us/q), (c) the 1x
# WSDM'15 hybrid pipeline on the device cost model (VERDICT r3 #6).
# Stages are strictly sequential so no CPU suite shares the machine
# with a tunnel-attached timing process (CLAUDE.md caveat). Launch
# with nohup so it survives session restarts.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_logs
mkdir -p "$OUT"

# 1. wait for the 1x continuation queue (round4_measure_1x_rest.sh)
while [ -f /tmp/r4_rest.pid ] && kill -0 "$(cat /tmp/r4_rest.pid)" 2>/dev/null; do
  sleep 30
done
echo "1x queue done at $(date)"

# 2. full suite, run 2 (CPU-only; conftest pins jax_platforms=cpu)
echo "suite run 2 starting at $(date)"
timeout 3600 python -m pytest tests/ -q >"$OUT/suite_run2.log" 2>&1
echo "suite run 2: rc=$? $(tail -1 "$OUT/suite_run2.log")"

# 3. 50x queue (cold first run: collection gen + build + blockmax)
echo "50x queue starting at $(date)"
bash tools/round4_measure_50x.sh >"$OUT/seq_50x_driver.log" 2>&1
echo "50x queue: rc=$?"

# 4. hybrid pipeline at 1x (device-measured decode-time model)
echo "hybrid pipeline starting at $(date)"
bash tools/round4_hybrid.sh >"$OUT/seq_hybrid_driver.log" 2>&1
echo "hybrid: rc=$?"
echo "sequence done at $(date)"
