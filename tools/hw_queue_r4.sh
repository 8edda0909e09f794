#!/bin/bash
# Round-4 hardware work queue, in priority order (VERDICT r3 items 1-9).
# Each step is bounded with `timeout -k` and gated on a fresh tiny-compute
# probe — the remote backend wedged mid-round (compute hangs while the relay
# port stays open), and running into a wedged backend just burns the step's
# timeout. Run: bash tools/hw_queue_r4.sh [start_step] (default 1).
set -u
cd "$(dirname "$0")/.."
LOG=${HW_QUEUE_LOG:-/tmp/hw_r4.log}
START=${1:-1}

probe() {
  timeout -k 10 120 python -c "
import jax, jax.numpy as jnp
assert float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))) == 128.0**3
print('probe-ok')" >/dev/null 2>&1
}

step() { # step <n> <timeout_s> <desc> <cmd...>
  local n=$1 t=$2 desc=$3; shift 3
  [ "$n" -lt "$START" ] && return 0
  if ! probe; then
    echo "$(date +%H:%M:%S) step $n ($desc): BACKEND WEDGED — queue parked" | tee -a "$LOG"
    exit 9
  fi
  echo "$(date +%H:%M:%S) step $n START: $desc" | tee -a "$LOG"
  timeout -k 15 "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "$(date +%H:%M:%S) step $n DONE rc=$rc: $desc" | tee -a "$LOG"
}

# 1. Flagship robustness matrix (VERDICT items 1+2): hard corpus, eps=8/255,
#    five families incl. RP2, 60 epochs (clean acc 0.77 @30 and still
#    climbing in calibration).
step 1 3600 "flagship robustness r4" \
  python tools/run_robustness.py --epochs 60 --n_per_class 32 \
      --out ROBUSTNESS_r04.json --workdir /tmp/apvt_rob_r4

# 2. Swin-B through the full six-stage pipeline (VERDICT item 4), reduced
#    attack budgets to bound cost.
step 2 3600 "swin flagship pipeline" \
  python tools/run_robustness.py --model swin --epochs 60 --n_per_class 32 \
      --patch_iters 150 --rp2_iters 150 --aa_iters 25 --aa_queries 300 \
      --out ROBUSTNESS_SWIN_r04.json --workdir /tmp/apvt_rob_swin_r4

# 3. Swin window-packing A/B (VERDICT item 6).
step 3 2400 "swin pack A/B" python tools/tpu_ab_swin.py --iters 4

# 4. ConvNeXt dwconv/lnmlp A/B + hardware parity (ADVICE r3).
step 4 2400 "convnext dwconv A/B" python tools/tpu_ab_convnext.py --iters 4

# 5. LoRA train-step trace (VERDICT item 5 evidence before any kernel work).
step 5 1800 "train profile (lora)" python tools/profile_train.py --mode lora

# 6. Headline bench + train/zoo artifacts.
step 6 1200 "bench.py headline" python bench.py
step 7 2400 "train bench r4 (incl. post_a dropout A/B)" \
  python tools/bench_train.py --json TRAIN_r04.json --modes full lora lora_pa
step 8 3000 "zoo r4" python tools/bench_zoo.py --json ZOO_r04.json

# 9. Eval-forward attribution + int8 verdict inputs (VERDICT items 8+9).
step 9 2400 "eval bench r4" python tools/bench_eval.py --json EVAL_r04.json
step 10 1800 "eval forward attribution" python tools/profile_eval.py

# 11. Fresh PGD trace for the roofline accounting (VERDICT item 7:
#     attribute the 226 ms "generic fusions" bucket per-fusion).
step 11 1800 "pgd trace r4" python tools/profile_pgd.py --top 40

echo "$(date +%H:%M:%S) queue complete" | tee -a "$LOG"
