"""Command-line surface: one ``apvt-lora`` tool with subcommands matching the
reference's per-script CLIs (SURVEY.md §1 layer map).

======================  ==========================================
subcommand              reference script
======================  ==========================================
``process``             Process.py (dataset unification ETL)
``train``               train.py (base fine-tune)
``attack``              whitebox_attacks.py (FGSM/PGD)
``autoattack``          auto_attack.py (standard suite)
``patch-attack``        patch_attack.py (EOT patch)
``rp2-attack``          rp2_attack.py (per-class physical patches)
``train-lora``          train_loras.py (per-attack LoRA defense)
``eval-compose``        eval_compose.py (composability matrix)
``synth-data``          (new) synthetic dataset generator for smoke runs
======================  ==========================================

Run ``python -m adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.cli --help``
(or ``python -m apvt_lora.cli`` via the alias package).
"""

from .main import main  # noqa: F401
