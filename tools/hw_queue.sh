#!/usr/bin/env bash
# Pending hardware (real-TPU) work queue for round 3, in priority order.
# Run step-by-step when the relay tunnel is alive; every step is bounded with
# `timeout -k` (an axon client blocked in a remote call can ignore SIGTERM —
# NOTES_NEXT_ROUND.md lesson 4) and logs to /tmp/hwq_<step>.log.
#
# Usage: bash tools/hw_queue.sh <step>
#   probe      fast relay-port probe + a bounded jax.devices() smoke
#   parity     fused attn-block/LN-MLP hardware parity + kernel microbench
#   bench_ab   bench.py default vs BENCH_VARIANT=fusedblock A/B
#   train      TRAIN_r03.json via tools/bench_train.py --json
#   zoo        per-backbone zoo bench incl. dinov1 row (+ fused-block A/B)
#   robustness clean post-fix flagship robustness rerun (longest; run last)
#
# Deliberately NOT a fire-and-forget `all` target: parity results gate
# whether the fused-block variant may become a default, so a human/agent
# decision sits between steps.

set -u
cd "$(dirname "$0")/.."

step="${1:?usage: hw_queue.sh <probe|parity|bench_ab|train|zoo|robustness>}"
log="/tmp/hwq_${step}.log"

run() { echo "+ $*" | tee -a "$log"; "$@" 2>&1 | tee -a "$log"; return "${PIPESTATUS[0]}"; }

case "$step" in
  probe)
    run python tunnel_probe.py || exit 1
    run timeout -k 10 120 python -c "import jax; print(jax.devices())"
    ;;
  parity)
    run timeout -k 10 580 python tools/tpu_parity_attn_block.py
    ;;
  bench_ab)
    run timeout -k 10 2400 python bench.py
    run env BENCH_VARIANT=fusedblock timeout -k 10 2400 python bench.py
    ;;
  train)
    run timeout -k 10 2400 python tools/bench_train.py --json TRAIN_r03.json
    ;;
  zoo)
    run timeout -k 10 3600 python tools/bench_zoo.py --json ZOO_r03.json
    ;;
  robustness)
    run timeout -k 30 9000 python tools/run_robustness.py
    ;;
  *)
    echo "unknown step: $step" >&2; exit 2;;
esac
