"""CLI pipeline test: synth-data -> train -> attack -> train-lora ->
eval-compose, all through the argparse surface (the reference's per-script
CLI contract, SURVEY.md §1)."""

import json
import os

import pytest

import importlib

cli = importlib.import_module(
    "adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.cli.main")


def run(argv):
    assert cli.main(argv) == 0


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


def test_cli_help():
    with pytest.raises(SystemExit) as e:
        cli.main(["--help"])
    assert e.value.code == 0


def test_cli_full_pipeline(cli_root):
    root = cli_root
    data = os.path.join(root, "data")

    # 1. synthetic data (stands in for `process` over raw corpora)
    run(["synth-data", "--output_dir", data, "--n_per_class", "6",
         "--image_size", "32"])
    assert os.path.exists(os.path.join(data, "train", "metadata.csv"))

    # 2. base fine-tune on the tiny test backbone
    train_out = os.path.join(root, "train_out")
    run(["train", "--data_root", data, "--model", "vit_test",
         "--output_dir", train_out, "--epochs", "1", "--batch_size", "10",
         "--resize", "32"])
    ckpt = os.path.join(train_out, "vit_test", "all",
                        "vit_test_best_model_finetuned.safetensors")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(train_out, "vit_test", "all",
                                       "class_mappings.txt"))

    # 3. FGSM/PGD adversarial generation (test split only, short PGD)
    adv = os.path.join(root, "adv")
    run(["attack", "--data_root", data, "--model", "vit_test",
         "--model_path", ckpt, "--output_dir", adv,
         "--splits", "test", "--steps", "3", "--batch_size", "10"])
    for a in ("fgsm", "pgd"):
        meta = os.path.join(adv, "vit_test", "all", "test", a, "metadata.csv")
        assert os.path.exists(meta), meta

    # also generate train-split adv data for LoRA training
    run(["attack", "--data_root", data, "--model", "vit_test",
         "--model_path", ckpt, "--output_dir", adv,
         "--splits", "train", "--attacks", "fgsm", "--batch_size", "10"])

    # 4. LoRA defense on the fgsm data
    loras = os.path.join(root, "loras")
    run(["train-lora", "--data_root", data, "--model", "vit_test",
         "--model_path", ckpt, "--adv_root", adv, "--output_dir", loras,
         "--attacks", "fgsm", "--ranks", "4", "--epochs", "1",
         "--batch_size", "10"])
    ad_dir = os.path.join(loras, "vit_test", "all", "fgsm",
                          "rank4_best_adapter")
    assert os.path.isdir(ad_dir)
    assert os.path.exists(os.path.join(loras, "vit_test", "all", "fgsm",
                                       "results.json"))

    # 5. composability eval over clean + discovered attacks
    eval_out = os.path.join(root, "eval_out")
    run(["eval-compose", "--data_root", data, "--model", "vit_test",
         "--model_path", ckpt, "--adv_root", adv, "--lora_root", loras,
         "--output_dir", eval_out, "--attacks", "fgsm", "--rank", "4",
         "--batch_size", "10"])
    results_path = os.path.join(eval_out, "test_results.json")
    assert os.path.exists(results_path)
    with open(results_path) as f:
        results = json.load(f)
    assert "base" in results and "lora_fgsm" in results
    assert set(results["base"]) >= {"clean", "fgsm", "pgd"}


def test_cli_patch_and_rp2(cli_root):
    root = cli_root
    data = os.path.join(root, "data")
    ckpt = os.path.join(root, "train_out", "vit_test", "all",
                        "vit_test_best_model_finetuned.safetensors")
    adv = os.path.join(root, "adv")

    run(["patch-attack", "--data_root", data, "--model", "vit_test",
         "--model_path", ckpt, "--output_dir", adv, "--splits", "test",
         "--patch_type", "circle", "--patch_size", "8", "--max_iter", "5",
         "--patch_sample_size", "10", "--batch_size", "5"])
    assert os.path.exists(os.path.join(adv, "vit_test", "all", "test",
                                       "patch_circle", "metadata.csv"))

    run(["rp2-attack", "--data_root", data, "--model", "vit_test",
         "--model_path", ckpt, "--output_dir", adv, "--splits", "test",
         "--patch_size", "8", "--max_iter", "4", "--patch_sample_size", "15",
         "--batch_size", "5"])
    rp2_dir = os.path.join(adv, "vit_test", "all", "test", "rp2")
    assert os.path.exists(os.path.join(rp2_dir, "metadata.csv"))
    assert os.path.isdir(os.path.join(rp2_dir, "patches"))


def test_cli_autoattack(cli_root):
    root = cli_root
    data = os.path.join(root, "data")
    ckpt = os.path.join(root, "train_out", "vit_test", "all",
                        "vit_test_best_model_finetuned.safetensors")
    adv = os.path.join(root, "adv")
    run(["autoattack", "--data_root", data, "--model", "vit_test",
         "--model_path", ckpt, "--output_dir", adv, "--splits", "test",
         "--n_iter", "5", "--square_queries", "10", "--batch_size", "8",
         "--suite", "apgd-ce", "square"])
    assert os.path.exists(os.path.join(adv, "vit_test", "all", "test",
                                       "autoattack", "metadata.csv"))


def test_cli_train_lora_without_val_split(cli_root, capsys):
    """No adversarial val split -> best adapter = final epoch, no shuffled-
    train-as-val fallback (review finding); --fused_attention is accepted on
    CPU (backend-aware kernel dispatch)."""
    root = cli_root
    data = os.path.join(root, "data")
    ckpt = os.path.join(root, "train_out", "vit_test", "all",
                        "vit_test_best_model_finetuned.safetensors")
    loras = os.path.join(root, "loras_noval")
    run(["train-lora", "--data_root", data, "--model", "vit_test",
         "--model_path", ckpt, "--adv_root", os.path.join(root, "adv"),
         "--output_dir", loras, "--attacks", "fgsm", "--ranks", "2",
         "--epochs", "1", "--batch_size", "10", "--fused_attention"])
    out = capsys.readouterr().out
    assert "no val split" in out
    assert os.path.isdir(os.path.join(loras, "vit_test", "all", "fgsm",
                                      "rank2_final_adapter"))
    with open(os.path.join(loras, "vit_test", "all", "fgsm",
                           "results.json")) as f:
        res = json.load(f)
    assert res["rank2"]["best_val_accuracy"] is None


def test_cli_process(tmp_path):
    """The `process` subcommand drives the raw-corpus ETL end to end
    (LISA fixture -> unified crops + metadata)."""
    import numpy as np

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import process as P

    base = tmp_path / "raw" / "lisa-road-sign"
    (base / "train" / "images").mkdir(parents=True)
    (base / "train" / "labels").mkdir(parents=True)
    img = np.zeros((200, 200, 3), np.uint8)
    img[:] = (30, 90, 180)
    P.imwrite(str(base / "train" / "images" / "a.png"), img)
    (base / "train" / "labels" / "a.txt").write_text("35 0.5 0.5 0.5 0.5\n")

    out = str(tmp_path / "processed")
    run(["process", "--base_dir", str(tmp_path / "raw"), "--output_dir", out,
         "--datasets", "lisa-road-sign", "--splits", "train"])
    meta = os.path.join(out, "train", "metadata.csv")
    assert os.path.exists(meta)
    import csv

    with open(meta) as f:
        rows = list(csv.DictReader(f))
    assert rows and rows[0]["unified_class"] == "stop"
    assert os.path.exists(rows[0]["image_path"])


def test_platform_flag_cpu_pin(tmp_path):
    """Global --platform cpu (before the subcommand) pins the CPU backend —
    the escape hatch for smoke runs / dead-TPU hosts (MIGRATION.md)."""
    import jax

    run(["--platform", "cpu", "synth-data", "--output_dir",
         str(tmp_path / "d"), "--n_per_class", "1", "--image_size", "16"])
    assert jax.default_backend() == "cpu"
    assert os.path.exists(tmp_path / "d" / "train" / "metadata.csv")


def test_dataset_names_match_processors_registry():
    """cli.main.DATASET_NAMES is a static copy (so parser construction never
    imports the ETL module) — pin it against the real registry."""
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.cli.main import DATASET_NAMES
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.process import PROCESSORS

    assert tuple(PROCESSORS) == DATASET_NAMES
