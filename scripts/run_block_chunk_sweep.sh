#!/bin/bash
# Batch-8 decode throughput vs attention cache-chunk length (VERDICT r3 weak
# #3: the bh=256 chunk loop runs ~180 GB/s at the default chunk=32 where
# bh=32/chunk=256 reaches ~420 — per-chunk fixed overhead, amortized 8x
# worse). MVTPU_BLOCK_CHUNK overrides the chunk in the int4 block kernel
# (100 MB VMEM limit already set; chunk=128 needs 32 MB of K+V buffers).
# Interleaved A/B/A to control the known within-session drift.
set -e
cd "$(dirname "$0")/.."
for chunk in 32 64 128 32 64 128; do
  echo "=== MVTPU_BLOCK_CHUNK=$chunk ===" >&2
  MVTPU_BLOCK_CHUNK=$chunk timeout 1200 python scripts/diag_batch8_ab.py 2>&1 | grep -E "BEST|iter" >&2
done
