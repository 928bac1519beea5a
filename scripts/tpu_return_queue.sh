#!/bin/bash
# The r3 TPU measurement queue, run the moment the axon tunnel returns
# after an outage (every job below was authored and CPU-smoke-tested
# during one; docs/PERFORMANCE.md r3-late section holds their context).
#
# Strictly sequential -- ONE TPU process at a time, each under `timeout`
# so a tunnel relapse cannot wedge the queue. Logs land in
# /tmp/tpu_queue/<job>.log; a one-line summary is appended to
# /tmp/tpu_queue/SUMMARY as each job finishes.
#
# Jobs (in value order):
#   1. delta_speed   -- collision vs batched-Woodcock variants @256^2
#   2. delta_bias    -- refresh the +5.2% baked-field bias number with the
#                       fully unbiased GT (ratio transmittance + local maj)
#   3. bench_delta   -- 1080p BENCH_SAMPLER=delta A/B vs the collision
#                       headline (quality off: same cache either way)
#   4. dirbuckets    -- field_dir_buckets (32,64) default-flip A/B at the
#                       1080p bench (bias halving already measured by
#                       profile_bias_knobs KNOB=dirs2x; this measures the
#                       headline + bake cost side of the flip)
#   5. bench_full    -- full headline bench for the round record
set -u
QD=/tmp/tpu_queue
mkdir -p "$QD"
cd "$(dirname "$0")/.."

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$QD/SUMMARY"
  timeout "$tmo" "$@" >"$QD/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc $(tail -c 400 "$QD/$name.log" | tr '\n' ' ')" \
    >>"$QD/SUMMARY"
  sleep 5  # let the tunnel-side process fully release before the next job
}

run delta_speed 3600 env SIZE=256 FRAMES=6 python scripts/profile_delta_speed.py
run delta_bias 5400 env BIAS_TRANSMIT=ratio BIAS_MAJORANT=local \
  BIAS_NULL_STEPS=24 python scripts/profile_delta_bias.py
run bench_delta 5400 env BENCH_SAMPLER=delta BENCH_QUALITY=0 BENCH_FRAMES=6 \
  python bench.py
run dirbuckets 5400 env BENCH_DIR_BUCKETS=32,64 BENCH_QUALITY=0 \
  BENCH_FRAMES=6 python bench.py
run bench_spp2 5400 env BENCH_SPP=2 BENCH_QUALITY=0 BENCH_FRAMES=4 \
  python bench.py  # packed-spp path: expect ~2x the spp=1 frame, not ~4x
run bench_nohoist 5400 env BENCH_NO_PACK_HOIST=1 BENCH_QUALITY=0 \
  BENCH_FRAMES=6 python bench.py  # pack-hoist A/B control (in-program pack)
run bench_full 7200 python bench.py

echo "QUEUE DONE $(date -u)" >>"$QD/SUMMARY"
