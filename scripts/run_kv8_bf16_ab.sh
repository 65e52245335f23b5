#!/bin/bash
# bf16 vs int8_packed KV at BATCH 8 — the A/B round 3 never ran cleanly.
#
# Round-3's packed-vs-int8 A/B happened on a degraded tunnel (20-35%
# within-arm decay) and never included a bf16 arm, so "quantized KV is a
# capacity lever only" was concluded from cross-session numbers. Roofline
# math says otherwise at batch 8: at pos~190 the bf16 cache stream is
# ~0.6 GB/step vs 0.72 GB of int4 weights, so halving KV bytes is worth
# ~+25-30% aggregate IF the packed unpack stays off the critical path.
#
# Arms are interleaved (bf16, packed, bf16, packed) so tunnel drift hits
# both equally, at the bench's positions (pos0=132) and deep in the cache
# (pos0=1200) where attention bytes dominate. Results append to
# /tmp/kv8_bf16_ab.txt.
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/kv8_bf16_ab.txt
echo "=== kv bf16-vs-packed batch-8 A/B $(date -u +%FT%TZ) ===" >> "$OUT"

if [ ! -f /tmp/mv_int4_params.npz ]; then
  echo "no cached params; building via diag_stack_ab.py (one-time ~10 min)" | tee -a "$OUT"
  timeout 1800 python scripts/diag_stack_ab.py 2>&1 | tail -2 >> "$OUT" || {
    echo "param build FAILED" | tee -a "$OUT"; exit 1; }
fi

run() {  # run <kv_dtype> <pos0> <timeout_s>
  local kvd=$1 pos0=$2 to=$3
  echo "--- kv=$kvd batch=8 pos0=$pos0 (timeout ${to}s)" | tee -a "$OUT"
  env MVTPU_KV_DTYPE="$kvd" MVTPU_AB_BATCH=8 MVTPU_AB_POS0="$pos0" \
    timeout "$to" python scripts/diag_kv8_packed_ab.py 2>&1 | tail -6 >> "$OUT"
  local rc=${PIPESTATUS[0]}
  [ $rc -eq 124 ] && echo "TIMED OUT (compile stall?)" >> "$OUT"
  return $rc
}

# bench-position arms, interleaved twice
run bf16        132 900
run int8_packed 132 1200
run bf16        132 900
run int8_packed 132 900
# deep-cache arms (attention bytes ~6x the bench positions)
run bf16        1200 900
run int8_packed 1200 900

echo "=== done; results in $OUT ===" ; tail -40 "$OUT"
