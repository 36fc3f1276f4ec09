#!/bin/bash
# TPU perf campaign: run the full train-bench matrix + inference bench +
# profile sequentially (never two JAX processes at once), appending one
# tagged JSON line per run to $OUT.  Safe to re-run; each phase has its own
# timeout so a hung tunnel cannot wedge the campaign.
#
#   bash tools/bench_campaign.sh [/tmp/campaign.jsonl]
set -u
OUT="${1:-/tmp/campaign.jsonl}"
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  local tmo="$1"; shift
  echo "=== $tag: $* (timeout ${tmo}s)" >&2
  local t0=$SECONDS
  local out
  out=$(timeout "$tmo" "$@" 2>/tmp/campaign_last.err)
  local rc=$?
  local line
  line=$(echo "$out" | grep -a '^{' | tail -1)
  if [ -z "$line" ]; then
    line="{\"error\": \"rc=$rc no json\"}"
    tail -3 /tmp/campaign_last.err >&2
  fi
  echo "{\"tag\": \"$tag\", \"rc\": $rc, \"wall_s\": $((SECONDS-t0)), \"result\": $line}" >> "$OUT"
  echo "    -> $line" >&2
}

# 0. inference headline first (also re-warms the TPU compile cache that the
#    bench watchdog cleared during the outage).  Outer timeout must exceed
#    bench.py's own two-attempt watchdog budget (750+750s) so the supervisor
#    always gets to emit its JSON line before the shell kills it.
run inference_bs32 1800 python bench.py

B="python tools/bench_train.py --iters 16 --dtype bfloat16 --upfirdn_backend pallas"

# 1. shared-forward reference point (r3 best so far: 62.8)
run bs16_share_noremat 1500 $B --batch 16 --share_noise 1 --remat_frozen 0 --remat_reg 0
# 2. shared + default remat (does remat cost or save at bs16?)
run bs16_share_remat 1500 $B --batch 16 --share_noise 1
# 3. cheap RNG
run bs16_share_rbg 1500 $B --batch 16 --share_noise 1 --remat_frozen 0 --remat_reg 0 --rng_impl unsafe_rbg
# 4. larger fused batch (HBM gamble, remat on to fit)
run bs24_share_remat 1800 $B --batch 24 --fuse_limit 24 --share_noise 1
# 5. larger fused batch without remat (only if 4 fits it may still be faster)
run bs24_share_noremat 1800 $B --batch 24 --fuse_limit 24 --share_noise 1 --remat_frozen 0 --remat_reg 0
# 6. bs20 fallback
run bs20_share 1800 $B --batch 20 --fuse_limit 20 --share_noise 1 --remat_frozen 0 --remat_reg 0

echo "=== campaign done; results in $OUT" >&2
cat "$OUT"
