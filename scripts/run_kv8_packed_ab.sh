#!/bin/bash
# Packed-KV A/B orchestrator (the round's #1 on-chip task, CLAUDE.md).
#
# Runs diag_kv8_packed_ab.py configs in ESCALATING compile-size order, each
# under its own timeout, so one stalled Mosaic compile (the round-3 failure
# mode: the batch-16 packed decode compile ran >20 min and the tunnel relay
# died) can't eat the whole session. Results append to /tmp/kv8_ab_results.txt.
#
# Pre-req: /tmp/mv_int4_params.npz (scripts/diag_stack_ab.py writes it;
# saves ~4-10 min of on-chip init+quantize per config).
set -u -o pipefail  # `timeout ... | tail` must surface timeout's 124
cd "$(dirname "$0")/.."
OUT=/tmp/kv8_ab_results.txt
echo "=== kv8 packed A/B $(date -u +%FT%TZ) ===" >> "$OUT"

if [ ! -f /tmp/mv_int4_params.npz ]; then
  echo "no cached params; building via diag_stack_ab.py (one-time ~10 min)" | tee -a "$OUT"
  timeout 1800 python scripts/diag_stack_ab.py 2>&1 | tail -2 >> "$OUT" || {
    echo "param build FAILED" | tee -a "$OUT"; exit 1; }
fi

run() {  # run <kv_dtype> <batch> <timeout_s> [chunk]
  local kvd=$1 b=$2 to=$3 chunk=${4:-}
  local env_extra=""
  [ -n "$chunk" ] && env_extra="MVTPU_BLOCK_CHUNK=$chunk"
  echo "--- kv=$kvd batch=$b chunk=${chunk:-auto} (timeout ${to}s)" | tee -a "$OUT"
  env MVTPU_KV_DTYPE="$kvd" MVTPU_AB_BATCH="$b" $env_extra \
    timeout "$to" python scripts/diag_kv8_packed_ab.py 2>&1 | tail -6 >> "$OUT"
  local rc=${PIPESTATUS[0]}
  [ $rc -eq 124 ] && echo "TIMED OUT (compile stall?)" >> "$OUT"
  return $rc
}

# escalate: small-compile configs first; baselines interleaved for same-day
# comparability. A config that times out doesn't block the rest.
run int8        8  900
run int8_packed 8  1200
run int8_packed 8  1200 64
run int8        16 1200
run int8_packed 16 1800 64
run int8_packed 16 1800

echo "=== done; results in $OUT ===" ; tail -40 "$OUT"
