"""Flagship robustness pipeline runner -> machine-readable artifact.

Runs the full six-stage pipeline (reference call graph, SURVEY.md §3) at the
ROBUSTNESS.md flagship configuration — ViT-B/16, 224 px synthetic corpus,
four attack families, rank-8 adapter per family, full composability matrix —
and writes ONE JSON artifact with per-stage wall-clocks and the variant ×
dataset accuracy matrix, so rounds can be diffed without re-reading prose
(VERDICT r2 item 9).

Each stage runs in a FRESH subprocess (clean backend session; stage
wall-clocks include its compiles, mirroring a cold pipeline run like the
reference's per-script invocations).

Usage: python tools/run_robustness.py [--out ROBUSTNESS_r03.json]
         [--workdir DIR] [--n_per_class 24] [--epsilon 24] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


STAGE_TIMEOUT_S = float(os.environ.get("APVT_STAGE_TIMEOUT", "3600"))
STAGE_ATTEMPTS = int(os.environ.get("APVT_STAGE_ATTEMPTS", "2"))
PLATFORM = "default"  # set from --platform; forwarded to every CLI stage
RESUME = False  # set from --resume


def run_stage(name: str, cli_args: list[str], stages: list[dict],
              done_marker: str | None = None) -> None:
    """One pipeline stage in a fresh subprocess, with a timeout and a retry.

    The remote TPU backend is stateful: a client whose session wedges (e.g.
    after an earlier abnormal kill) can block forever in a remote call while
    a FRESH process works fine — the same failure mode that cost round 2 its
    bench artifact (bench.py docstring). Bound each stage and retry once in
    a new process before declaring the pipeline dead.

    With --resume, a stage whose `done_marker` path already exists is skipped
    (recorded as {"resumed": true, "seconds": null}) — used to pick a run back
    up after a host interruption without repaying synth-data/train wall.
    Attack stages use their LAST-written artifact as the marker (splits run
    train→val→test and metadata.csv lands after the split's images, so
    test/<attack>/metadata.csv only exists once the stage finished);
    eval-compose always reruns — it is cheap and produces the matrix.
    """
    if RESUME and done_marker and os.path.exists(done_marker):
        print(f"=== {name}: resumed (marker {done_marker} exists)", flush=True)
        stages.append({"stage": name, "seconds": None, "rc": 0,
                       "resumed": True})
        return
    for attempt in range(1, STAGE_ATTEMPTS + 1):
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, "-m",
                 "adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.cli",
                 "--platform", PLATFORM,
                 *cli_args], cwd=REPO, text=True, capture_output=True,
                timeout=STAGE_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            dt = time.perf_counter() - t0
            print(f"=== {name}: TIMEOUT after {dt:.0f}s "
                  f"(attempt {attempt}/{STAGE_ATTEMPTS})", flush=True)
            stages.append({"stage": name, "seconds": round(dt, 1),
                           "rc": "timeout", "attempt": attempt})
            continue
        dt = time.perf_counter() - t0
        tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-14:])
        print(f"=== {name}: rc={proc.returncode} {dt:.0f}s\n{tail}", flush=True)
        stages.append({"stage": name, "seconds": round(dt, 1),
                       "rc": proc.returncode,
                       **({"attempt": attempt} if attempt > 1 else {})})
        if proc.returncode == 0:
            return
    raise RuntimeError(f"stage {name} failed after {STAGE_ATTEMPTS} attempts")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ROBUSTNESS_r04.json")
    ap.add_argument("--workdir", default="/tmp/apvt_robustness")
    ap.add_argument("--model", default="google_vit")
    ap.add_argument("--style", default="hard", choices=["default", "hard"],
                    help="synthetic corpus style; 'hard' = 12 glyph-coded "
                         "confusable classes so the matrix discriminates "
                         "(the 'default' 5-class corpus saturates every "
                         "cell at eps 8/255 — ROBUSTNESS_r03.json)")
    ap.add_argument("--n_per_class", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--epsilon", type=float, default=8 / 255,
                    help="whitebox/autoattack eps (reference-exact 8/255, "
                         "whitebox_attacks.py:59-61; the hard corpus keeps "
                         "it discriminating)")
    ap.add_argument("--pgd_steps", type=int, default=30)
    ap.add_argument("--patch_iters", type=int, default=250)
    ap.add_argument("--rp2_iters", type=int, default=250)
    ap.add_argument("--rp2_patch_size", type=int, default=96)
    ap.add_argument("--aa_iters", type=int, default=50)
    ap.add_argument("--aa_queries", type=int, default=500)
    ap.add_argument("--lora_epochs", type=int, default=4)
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke config (vit_test, 32px) for CI-style runs")
    ap.add_argument("--platform", choices=("default", "cpu"),
                    default="default",
                    help="forwarded to every CLI stage — 'cpu' makes --quick "
                         "runnable on hosts whose TPU is unreachable")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages whose completion marker already exists "
                         "in --workdir (post-interruption pickup); "
                         "eval-compose always reruns")
    args = ap.parse_args()
    global PLATFORM, RESUME
    PLATFORM = args.platform
    RESUME = args.resume

    d = args.workdir
    os.makedirs(d, exist_ok=True)
    if args.quick:
        # respect an explicit tiny backbone (swin_test/convnext_test/...);
        # only the flagship default collapses to vit_test
        if args.model == "google_vit":
            args.model = "vit_test"
        image_size = 64 if args.model == "yolo11_test" else 32
        args.n_per_class, args.epochs, args.lora_epochs = 4, 1, 1
        args.pgd_steps, args.patch_iters, args.rp2_iters = 2, 3, 3
        args.rp2_patch_size = 8
        args.aa_iters, args.aa_queries = 2, 10
    else:
        image_size = 224

    ck = os.path.join(d, "train", args.model, "all",
                      f"{args.model}_best_model_finetuned.safetensors")
    data, adv, loras, ev = (os.path.join(d, x)
                            for x in ("data", "adv", "loras", "eval"))
    stages: list[dict] = []
    t_total = time.perf_counter()

    run_stage("synth-data", ["synth-data", "--output_dir", data,
                             "--n_per_class", str(args.n_per_class),
                             "--image_size", str(image_size),
                             "--style", args.style], stages,
              done_marker=os.path.join(data, "test", "metadata.csv"))
    run_stage("train", ["train", "--data_root", data, "--model", args.model,
                        "--output_dir", os.path.join(d, "train"),
                        "--epochs", str(args.epochs), "--batch_size", "32"]
              + (["--resize", str(image_size)] if args.quick else []), stages,
              done_marker=ck)
    common = ["--data_root", data, "--model", args.model,
              "--model_path", ck, "--output_dir", adv]
    # last-written artifact per attack stage (see run_stage docstring)
    adv_test = os.path.join(adv, args.model, "all", "test")
    run_stage("attack-whitebox", ["attack", *common,
                                  "--splits", "train", "val", "test",
                                  "--epsilon", str(args.epsilon),
                                  "--steps", str(args.pgd_steps),
                                  "--batch_size", "64"], stages,
              done_marker=os.path.join(adv_test, "pgd", "metadata.csv"))
    run_stage("attack-patch", ["patch-attack", *common,
                               "--splits", "train", "val", "test",
                               "--patch_type", "circle",
                               "--max_iter", str(args.patch_iters),
                               "--batch_size", "24"], stages,
              done_marker=os.path.join(adv_test, "patch_circle",
                                       "metadata.csv"))
    aa_stats_path = os.path.join(d, "aa_stats.json")
    run_stage("attack-autoattack", ["autoattack", *common,
                                    "--splits", "train", "val", "test",
                                    "--epsilon", str(args.epsilon),
                                    "--n_iter", str(args.aa_iters),
                                    "--square_queries", str(args.aa_queries),
                                    "--stats_json", aa_stats_path,
                                    "--batch_size", "64"], stages,
              done_marker=os.path.join(adv_test, "autoattack",
                                       "metadata.csv"))
    # RP2 = fifth family (BASELINE.json config 5; reference rp2_attack.py
    # intent). Patches train once on the train split (physical-sticker
    # semantics) and apply to all three splits.
    run_stage("attack-rp2", ["rp2-attack", *common,
                             "--splits", "train", "val", "test",
                             "--patch_train_split", "train",
                             "--patch_size", str(args.rp2_patch_size),
                             "--max_iter", str(args.rp2_iters),
                             "--batch_size", "24"], stages,
              done_marker=os.path.join(adv_test, "rp2", "metadata.csv"))
    families = ["fgsm", "pgd", "patch_circle", "autoattack", "rp2"]
    run_stage("train-lora", ["train-lora", "--data_root", data,
                             "--model", args.model, "--model_path", ck,
                             "--adv_root", adv, "--output_dir", loras,
                             "--attacks", *families, "--ranks", "8",
                             "--epochs", str(args.lora_epochs),
                             "--batch_size", "32"], stages,
              done_marker=os.path.join(loras, "global_results.json"))
    run_stage("eval-compose", ["eval-compose", "--data_root", data,
                               "--model", args.model, "--model_path", ck,
                               "--adv_root", adv, "--lora_root", loras,
                               "--output_dir", ev, "--attacks", *families,
                               "--rank", "8", "--batch_size", "64"], stages)

    results_path = os.path.join(ev, "test_results.json")
    with open(results_path) as f:
        matrix = json.load(f)

    artifact = {
        "config": {"model": args.model, "image_size": image_size,
                   "style": args.style,
                   "n_per_class": args.n_per_class, "epochs": args.epochs,
                   "epsilon": args.epsilon, "pgd_steps": args.pgd_steps,
                   "patch_iters": args.patch_iters,
                   "rp2_iters": args.rp2_iters,
                   "rp2_patch_size": args.rp2_patch_size,
                   "aa_iters": args.aa_iters,
                   "aa_queries": args.aa_queries,
                   "lora_epochs": args.lora_epochs,
                   "attack_families": families,
                   **({"resumed": True} if args.resume else {})},
        "stages": stages,
        "total_seconds": round(time.perf_counter() - t_total, 1),
        "matrix": matrix,
    }
    # per-(stage,bucket) wall attribution of the AutoAttack stage (VERDICT
    # r4 item 7: the suite cost center must be attributed, not guessed)
    if os.path.exists(aa_stats_path):
        with open(aa_stats_path) as f:
            artifact["aa_attribution"] = json.load(f)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {args.out} (total {artifact['total_seconds']:.0f}s)")


if __name__ == "__main__":
    main()
