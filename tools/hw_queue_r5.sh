#!/bin/bash
# Round-5 hardware work queue, in VERDICT r4 priority order.
# Steps are bounded with `timeout -k` and gated on a fresh tiny-compute probe
# (wedged-backend protection, same rationale as hw_queue_r4.sh).
# Run: bash tools/hw_queue_r5.sh [start_step] [stop_step]
set -u
cd "$(dirname "$0")/.."
LOG=${HW_QUEUE_LOG:-/tmp/hw_r5.log}
START=${1:-1}
STOP=${2:-99}

probe() {
  # cold compile of even a tiny program through the tunnel is ~100 s; a 120 s
  # bound parked the queue on a healthy backend twice (19:22 + 19:26)
  timeout -k 10 240 python -c "
import jax, jax.numpy as jnp
assert float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))) == 128.0**3
print('probe-ok')" >/dev/null 2>&1
}

step() { # step <n> <timeout_s> <desc> <cmd...>
  local n=$1 t=$2 desc=$3; shift 3
  [ "$n" -lt "$START" ] && return 0
  [ "$n" -gt "$STOP" ] && return 0
  if ! probe; then
    echo "$(date +%H:%M:%S) step $n ($desc): BACKEND WEDGED — queue parked" | tee -a "$LOG"
    exit 9
  fi
  echo "$(date +%H:%M:%S) step $n START: $desc" | tee -a "$LOG"
  timeout -k 15 "$t" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "$(date +%H:%M:%S) step $n DONE rc=$rc: $desc" | tee -a "$LOG"
}

CLI="python -m adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.cli"
R4D=/tmp/apvt_rob_r4
CK=$R4D/train/google_vit/all/google_vit_best_model_finetuned.safetensors

# 1. ConvNeXt dwconv/lnmlp hardware A/B (VERDICT item 1 / ADVICE r3) —
#    also gates whether the ConvNeXt pipeline (step 10) uses the kernel.
step 1 2400 "convnext dwconv A/B" python tools/tpu_ab_convnext.py --iters 4

# 2. Train bench incl. the lora_pa post-split dropout A/B (VERDICT items 1+6).
step 2 2400 "train bench r5 (full/lora/lora_pa)" \
  python tools/bench_train.py --json TRAIN_r05.json --modes full lora lora_pa

# 3. Flagship PGD trace, committed as JSON (VERDICT items 1+3 evidence).
step 3 1800 "pgd trace r5" \
  python tools/profile_pgd.py --top 40 --table_json TRACE_PGD_r05.json

# 4. RP2 64px calibration against the surviving r4 workdir (cheap de-risk
#    before the full flagship rerun: is the 64px adapter non-toxic?).
step 4 1200 "rp2-64 calibration (attack)" \
  $CLI rp2-attack --data_root $R4D/data --model google_vit --model_path $CK \
      --output_dir $R4D/adv_rp264 --splits train test \
      --patch_train_split train --patch_size 64 --max_iter 250 --batch_size 24
step 5 900 "rp2-64 calibration (lora)" \
  $CLI train-lora --data_root $R4D/data --model google_vit --model_path $CK \
      --adv_root $R4D/adv_rp264 --output_dir $R4D/loras_rp264 \
      --attacks rp2 --ranks 8 --epochs 4 --batch_size 32
step 6 900 "rp2-64 calibration (eval)" \
  $CLI eval-compose --data_root $R4D/data --model google_vit --model_path $CK \
      --adv_root $R4D/adv_rp264 --lora_root $R4D/loras_rp264 \
      --output_dir $R4D/eval_rp264 --attacks rp2 --rank 8 --batch_size 64

# 7. Flagship robustness rerun with de-toxified RP2 (VERDICT item 2).
#    RP2_SIZE is set from the calibration verdict before launching step 7.
step 7 3600 "flagship robustness r5 (rp2 ${RP2_SIZE:-64}px)" \
  python tools/run_robustness.py --epochs 60 --n_per_class 32 \
      --rp2_patch_size "${RP2_SIZE:-64}" \
      --out ROBUSTNESS_r05.json --workdir /tmp/apvt_rob_r5

# 8. Swin-B at FULL flagship budgets (VERDICT items 6+7: the like-for-like
#    pair AND the AutoAttack wall attribution, now embedded in the artifact).
step 8 6000 "swin flagship full budgets" \
  env APVT_STAGE_TIMEOUT=5000 \
  python tools/run_robustness.py --model swin --epochs 60 --n_per_class 32 \
      --out ROBUSTNESS_SWIN_r05.json --workdir /tmp/apvt_rob_swin_r5

# 9-11. Perf artifact refreshes (VERDICT item 1).
step 9 3000 "zoo r5" python tools/bench_zoo.py --json ZOO_r05.json
step 10 2400 "eval bench r5" python tools/bench_eval.py --json EVAL_r05.json
step 11 1800 "eval forward attribution" \
  python tools/profile_eval.py --table_json EVAL_ATTRIB_r05.json

# 12. ConvNeXt-B through the six-stage pipeline (VERDICT item 5),
#     budget-bounded like the r4 Swin run.
step 12 4200 "convnext flagship pipeline" \
  python tools/run_robustness.py --model convnext --epochs 60 \
      --n_per_class 32 --patch_iters 150 --rp2_iters 150 \
      --rp2_patch_size "${RP2_SIZE:-64}" --aa_iters 25 --aa_queries 300 \
      --out ROBUSTNESS_CONVNEXT_r05.json --workdir /tmp/apvt_rob_convnext_r5

# 13-14. Stretch: dinov1 + yolo11 reduced-budget pipelines (5/5 backbones
#     with at least one pipeline artifact).
step 13 2700 "dinov1 pipeline (reduced)" \
  python tools/run_robustness.py --model dinov1 --epochs 30 \
      --n_per_class 16 --patch_iters 100 --rp2_iters 100 \
      --rp2_patch_size "${RP2_SIZE:-64}" --aa_iters 25 --aa_queries 300 \
      --out ROBUSTNESS_DINOV1_r05.json --workdir /tmp/apvt_rob_dinov1_r5
step 14 2400 "yolo11 pipeline (reduced)" \
  python tools/run_robustness.py --model yolo11-cls --epochs 30 \
      --n_per_class 16 --patch_iters 100 --rp2_iters 100 \
      --rp2_patch_size "${RP2_SIZE:-64}" --aa_iters 25 --aa_queries 300 \
      --out ROBUSTNESS_YOLO11_r05.json --workdir /tmp/apvt_rob_yolo_r5

# 15. LoRA train-step trace (evidence for the lora_pa verdict).
step 15 1500 "train profile (lora)" \
  python tools/profile_train.py --mode lora --table_json TRACE_TRAIN_LORA_r05.json

# 16. Headline re-confirmation (driver runs its own at round end).
step 16 1200 "bench.py headline" python bench.py

echo "$(date +%H:%M:%S) queue complete" | tee -a "$LOG"
