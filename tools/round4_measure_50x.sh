#!/bin/bash
# HISTORICAL (round-4 record): several env knobs used below
# (DS2I_ENGINE_PROBE, DS2I_OPT_DYNB, DS2I_S16_V2) were REMOVED in round 5
# after measuring worse; re-running those steps now measures the default
# path under a variant label. Kept for the measurement record only.
# Round-4 50x measurement (VERDICT r3 items #1/#4/#5/#7): the carried
# 50x target is pruned ranked_and <= 5.5 us/query (BASELINE.md native
# cursor 5.49). First run on a machine is cold (collection gen + build
# + blockmax artifact + engine cache fill — expect >1 h); repeats are
# cache-warm. Logs land in $OUT.
set -u
OUT=${OUT:-/tmp/r4_logs_50x}
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

# 1. headline at 50x (cold on first run: builds every cache)
step headline_50x 14400 python bench.py

# 2. repeat, cache-warm (records warm init + warm pruned layout)
step headline_50x_warm 7200 python bench.py

# 2.5 full ledger at 50x (full / compute-only / decode-only splits,
#     VERDICT r3 item #3 wants this at both scales)
step ledger_50x 14400 python tools/bench_ledger.py

# 3. probe join at 50x (the round-3 motivation: the sort join's bitonic
#    stages dominate at this scale — measure rather than assume)
DS2I_ENGINE_PROBE=1 step probe_join_50x 7200 python bench.py

# 4. knob ablations at 50x
DS2I_AND_THETA=0    step ablate_no_theta_50x    7200 python bench.py
DS2I_AND_FIXPOINT=0 step ablate_no_fixpoint_50x 7200 python bench.py

# 5. exhaustive + wand for the op table
DS2I_BENCH_OP=and   step exhaustive_50x 7200 python bench.py
DS2I_BENCH_OP=wand  step wand_50x       7200 python bench.py

echo "all steps done; logs in $OUT"

# 6. results-identity evidence at 50x (VERDICT r3 #4 done-bar: pruned
#    results identical to exhaustive) — appended while the queue ran;
#    bash picks it up at EOF. Also reruns the probe join under
#    DS2I_ENGINE_PROBE=auto to exercise the per-bucket cost model.
DS2I_BENCH_VERIFY=1 step verify_50x 14400 python bench.py
DS2I_ENGINE_PROBE=auto step auto_join_50x 7200 python bench.py
# 7. merged dynamic-b decode classes (the decode stage is 91% of 50x
#    compute; ~100 exact-b groups -> ~19 fat ones). Appended mid-run;
#    uses warm caches (remap is in-memory, canonical caches untouched).
DS2I_OPT_DYNB=1 step dynb_50x 7200 python bench.py
DS2I_OPT_DYNB=1 DS2I_ENGINE_PROBE=auto step dynb_auto_50x 7200 python bench.py
# 8. one part for the whole 35k-query batch (3 -> 1 decode-group sets)
DS2I_OPT_DYNB=1 DS2I_BENCH_PART_QUERIES=65536 step dynb_1part_50x 7200 python bench.py
# 9. decode-stage science: decode-only splits for the dynb variant and
#    a no-exceptions timing diagnostic (results wrong, timing only)
DS2I_OPT_DYNB=1 DS2I_BENCH_LEDGER_OPS=and_skip step dynb_ledger_50x 7200 python tools/bench_ledger.py
DS2I_DECODE_NOEX=1 DS2I_BENCH_LEDGER_OPS=and_skip step noex_ledger_50x 7200 python tools/bench_ledger.py
DS2I_BENCH_PART_QUERIES=65536 DS2I_BENCH_LEDGER_OPS=and_skip step onepart_ledger_50x 7200 python tools/bench_ledger.py
# 10. two-stage S16 exception decode (the suspected decode dominator)
DS2I_S16_V2=1 step s16v2_50x 7200 python bench.py
DS2I_S16_V2=1 DS2I_BENCH_LEDGER_OPS=and_skip step s16v2_ledger_50x 7200 python tools/bench_ledger.py
DS2I_S16_V2=1 DS2I_BENCH_PART_QUERIES=65536 step s16v2_1part_50x 7200 python bench.py
# 11. s16v2 + fine row ladder (padding <=1.25x) — the candidate new default
DS2I_S16_V2=1 DS2I_R_FINE=1 step s16v2_fine_50x 7200 python bench.py
DS2I_S16_V2=1 DS2I_R_FINE=1 DS2I_BENCH_LEDGER_OPS=and_skip step s16v2_fine_ledger_50x 7200 python tools/bench_ledger.py
# 12. v3 exception decode: gather-free + MXU contractions
DS2I_S16_V2=2 step s16v3_50x 7200 python bench.py
DS2I_S16_V2=2 DS2I_BENCH_LEDGER_OPS=and_skip step s16v3_ledger_50x 7200 python tools/bench_ledger.py
DS2I_S16_V2=2 DS2I_R_FINE=1 step s16v3_fine_50x 7200 python bench.py
# 13. fine ladder alone (isolate its share of the s16v2_fine win)
DS2I_R_FINE=1 step fine_50x 7200 python bench.py
# 14. 1x numbers for the default-flip decision (override the 50x scale)
DS2I_BENCH_DOCS=10000 DS2I_BENCH_POSTINGS=2000000 DS2I_BENCH_TERMS=110000 \
  DS2I_R_FINE=1 step fine_1x_early 3600 python bench.py
DS2I_BENCH_DOCS=10000 DS2I_BENCH_POSTINGS=2000000 DS2I_BENCH_TERMS=110000 \
  step default_1x_recheck 3600 python bench.py
