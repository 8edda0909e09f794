"""TPU-native adversarial-robustness framework for LoRA-adapted vision transformers.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``rneddojr/Adapting-Pretrained-Vision-Transformers-with-LoRA-against-Attack-Vectors``:

* unified traffic-sign dataset ETL (5 sources -> one 21+ class corpus),
* a multi-backbone vision-model zoo (ViT-B/16 flagship, plus Swin / DINO /
  ConvNeXt / YOLO11-cls),
* base fine-tuning and per-attack LoRA-adapter defense training,
* adversarial attack factories (FGSM, PGD, AutoAttack suite, EOT patch, RP2),
* a LoRA composability evaluation harness.

Everything on the compute path is a pure, jittable function SPMD-sharded over a
``jax.sharding.Mesh`` — the PGD inner loop, the EOT patch optimisation, and the
eval sweeps all compile to single XLA programs (see ``attacks/`` and ``train/``).

Import alias: ``import apvt_lora`` re-exports this package under a short name.
"""

__version__ = "0.1.0"

# Short handles for the subpackages; heavy imports stay lazy inside modules.
from . import utils  # noqa: F401
