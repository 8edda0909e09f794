"""North-star benchmark: PGD-10 adversarial-example generation throughput.

Measures images/sec/chip for the jitted PGD program (`attacks.whitebox.pgd`,
a `lax.scan` over 10 fused forward/backward passes) against the flagship
ViT-B/16 with a rank-8 LoRA adapter merged into the weights — the
configuration of BASELINE.json's headline metric and reference
`whitebox_attacks.py` (eps=8/255, alpha=3/255, random start).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Flake-proof harness (round 3): the remote TPU backend is stateful and can
fail transiently (round 2's graded artifact was lost to a single
``FailedPrecondition`` on the first device->host fetch, BENCH_r02.json).
The measurement therefore runs in a FRESH SUBPROCESS per attempt — a new
process gets a clean backend session — with up to BENCH_ATTEMPTS (default 3)
attempts and a short backoff between them. On unrecoverable failure the
harness still prints a parseable JSON line with ``"value": null`` and an
``"error"`` field, never a bare traceback, and exits 0 so the driver records
a parseable artifact either way.

Model configuration (round-2 tuning, each step profiler-verified on v5e):
* ``unroll_layers=True`` — the scan encoder's backward saved per-layer
  residuals via dynamic-update-slice into stacked HBM buffers, profiled at
  ~26% of PGD runtime; unrolling the 12 layers removes the DUS traffic
  entirely (77.9 -> 116.8 imgs/s, +50%).
* ``use_fused_attention=True`` — Pallas whole-head attention
  (kernels/attention.py): scores never touch HBM in either direction.
* batch 64 — swept 64/128/192/256: larger batches LOSE (116 -> 104 -> 91
  imgs/s); remat also loses (72 at B=128) since the extra recompute outweighs
  residual traffic once unrolled.

Roofline/MFU accounting (printed in the JSON): analytic FLOPs for one PGD
step = forward + INPUT-ONLY backward (no weight grads are computed —
jax.grad wrt images; XLA DCEs dW):
  forward  ~= 42 GF/img  (12 x [QKVO 0.93 + MLP 2.32 + attn core 0.12 GF]
                          + patch embed, with kernel seq padding 197->256)
  backward ~= 44 GF/img  (dx per dense == dense fwd; attention bwd
                          recomputes probs in-VMEM + 4 matmuls)
  PGD-10   ~= 0.86 TF/img
MFU = value * 0.86e12 / 197e12 (v5e bf16 peak). A chip roofs at ~229 imgs/s
at 100% MFU, so "10x the 55 imgs/s baseline per chip" is physically
unreachable on one chip — the honest target is max MFU per chip plus linear
data-mesh scaling (every stage here is SPMD; the single-device reference
cannot scale at all).

`vs_baseline` compares against an estimated PyTorch-GPU reference throughput
of 55 imgs/s/chip: the reference publishes no numbers (SURVEY.md §6); the
estimate is a roofline derivation of its EAGER FLOAT32 torchattacks loop on
A100 (~35-40% eager MFU of 156 TF TF32). The estimate is cross-checked by a
measured same-silicon pair in BASELINE.md ("Measured baseline" —
bench_torch_reference.py: torch eager 0.127 vs this framework 0.101 imgs/s
on this host's CPU, i.e. the baseline model is not a strawman).

Tunables: BENCH_BATCH, BENCH_STEPS, BENCH_ITERS, BENCH_VARIANT,
BENCH_FUSED_MLP, BENCH_ATTEMPTS, BENCH_TIMEOUT env vars.
BENCH_VARIANT=attached attacks the unmerged LoRA-attached params (the
train_loras-time configuration; extra rank-8 matmuls per dense) instead of
the default merged form — functionally identical attack target; measured
108.8 vs 117.1 imgs/s on v5e (the ~7% delta is the adapter matmuls). Merged
is the headline because it is the form the reference evaluates and deploys
(eval_compose.py merge_and_unload before attack evaluation).
BENCH_VARIANT=int8 attacks with int8-quantized dense weights (bf16
accumulate) — the precision-reduced path past the bf16 roofline; see
PERF.md "int8 attack path".
BENCH_VARIANT=fusedblock runs the fully-fused encoder block: the attention
half through the LN1+QKV+MHA+O kernel (kernels/attn_block.py) and the MLP
half through the LN2-fused MLP kernel (kernels/mlp.py:fused_ln_mlp) — two
Pallas programs + two residual adds per layer. Measured on v5e (round 3,
tools/tpu_parity_attn_block.py): the attention half LOSES 5.8x at kernel
level (27.2 vs 4.66 ms fwd+dx — one-program-per-batch-element underfills
the chip), so this variant is kept only as the measured-negative record.
BENCH_VARIANT=lnmlp enables just the LN2-fused MLP half (the half that WON
its kernel-level A/B: 2.80 vs 3.61 ms fwd+dx) on top of the default
packed-attention config. End-to-end it measured a reproducible ~3.6% LOSS
(152.5 vs 158.2 imgs/s, two runs each): XLA fuses LN2 into neighbors and
pipelines across layers in the full program, which the isolated kernel
comparison cannot credit. Kept as the measured-negative record; the
default stays packed-attention + XLA MLP.

Per-backbone zoo numbers live in `tools/bench_zoo.py --json` (committed as
ZOO_r*.json); this file keeps the driver contract of one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_CHILD_FLAG = "_APVT_BENCH_CHILD"


def measure() -> None:
    """One measurement attempt (runs in a fresh child process)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import whitebox
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.models import vit
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.ops import lora, quant
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils import compile_cache

    compile_cache.enable()

    reference_imgs_per_sec = 55.0  # estimated PyTorch-GPU PGD-10 baseline
    pgd10_tflops_per_img = 0.86  # analytic fwd + input-only bwd, see docstring
    v5e_peak_tflops = 197.0  # bf16

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    variant = os.environ.get("BENCH_VARIANT", "merged")
    n_chips = max(1, len(jax.devices()))

    fused_mlp = os.environ.get("BENCH_FUSED_MLP", "0") == "1"
    cfg = dataclasses.replace(vit.VIT_B16.with_classes(21),
                              use_fused_attention=True, unroll_layers=True,
                              use_fused_mlp=fused_mlp,
                              fuse_attn_block=(variant == "fusedblock"),
                              fuse_ln_mlp=(variant == "lnmlp"))
    lcfg = lora.LoRAConfig(rank=8, alpha=16.0, targets=vit.LORA_TARGETS_DEFAULT)

    # One jitted setup program (eager init would cost hundreds of per-op
    # dispatches through the remote-TPU tunnel).
    @jax.jit
    def build_params(rng):
        params = vit.init(rng, cfg)
        adapter = lora.init(jax.random.fold_in(rng, 1), params, lcfg)
        if variant == "attached":
            out = lora.attach(params, adapter, lcfg)
        else:
            out = lora.merge(params, adapter, lcfg)
        out = jax.tree.map(lambda x: x.astype(jnp.bfloat16), out)
        if variant == "int8":
            # W8A8 attack path (ops/quant.py): merged LoRA weights quantized
            # per-output-channel; activations quantized dynamically in-graph.
            out = quant.quantize_dense_tree(out, vit.QUANT_TARGETS_DEFAULT)
        return out

    params = build_params(jax.random.key(0))
    rng = jax.random.key(0)

    run = whitebox.make_pgd(vit.apply, cfg, eps=8 / 255, alpha=3 / 255, steps=steps)

    images = jax.device_put(
        jax.random.uniform(jax.random.fold_in(rng, 2), (batch, 224, 224, 3), jnp.float32))
    labels = jax.device_put(
        jax.random.randint(jax.random.fold_in(rng, 3), (batch,), 0, cfg.num_classes))
    checksum = jax.jit(jnp.sum)

    # Warmup / compile both programs. Timing methodology: iterations are
    # CHAINED (each feeds the previous output as input) and the final scalar
    # is fetched to host — remote/async backends can make block_until_ready a
    # no-op, but a device->host fetch of a value that data-depends on every
    # iteration cannot lie.
    float(checksum(run(params, images, labels, jax.random.key(99))))

    t0 = time.perf_counter()
    x = images
    for i in range(iters):
        x = run(params, x, labels, jax.random.key(i))
    float(checksum(x))
    dt = time.perf_counter() - t0

    imgs_per_sec_per_chip = batch * iters / dt / n_chips
    mfu = imgs_per_sec_per_chip * pgd10_tflops_per_img * (steps / 10) / v5e_peak_tflops
    print(json.dumps({
        "metric": f"pgd{steps}_adv_images_per_sec_per_chip_vitb_lora"
                  + ("" if variant == "merged" else f"_{variant}"),
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / reference_imgs_per_sec, 3),
        "mfu_pct": round(100 * mfu, 1),
        "roofline_imgs_per_sec_per_chip": round(
            v5e_peak_tflops / (pgd10_tflops_per_img * (steps / 10)), 0),
    }))


def _parse_json_line(text: str) -> dict | None:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "metric" in obj:
                return obj
    return None


def _compute_alive(timeout_s: float = 90.0) -> bool:
    """True iff a tiny jitted matmul completes on the default backend within
    ``timeout_s`` — catches the wedged-backend mode where the relay port
    accepts but every compute call blocks forever (observed round 4)."""
    code = ("import jax, jax.numpy as jnp\n"
            "assert float(jax.jit(lambda a: (a @ a).sum())"
            "(jnp.ones((128, 128)))) == 128.0 ** 3\n")
    try:
        return subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            timeout=timeout_s).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    """Retry harness: fresh subprocess per attempt, JSON line no matter what."""
    from tunnel_probe import relay_alive

    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    timeout = float(os.environ.get("BENCH_TIMEOUT", "1800"))
    backoff = float(os.environ.get("BENCH_BACKOFF", "15"))
    # Fast pre-flight: a dead axon relay makes jax.devices() block forever in
    # every child (observed round 3), so each attempt would burn its full
    # timeout. Only SHORTENS attempts, never skips them (the probe is
    # advisory); no-op on hosts without a relay-backed backend.
    preflight_alive = relay_alive()
    if not preflight_alive:
        attempts, timeout = 1, min(timeout, 180.0)
    elif not _compute_alive():
        # Round-4 observed failure mode: the relay PORT accepts while remote
        # COMPUTE hangs forever (backend wedged server-side after a killed
        # client). Port-only preflight would burn attempts x 1800 s here.
        # Advisory like the port probe: shorten, never skip.
        preflight_alive = False
        attempts, timeout = 1, min(timeout, 240.0)
    here = os.path.dirname(os.path.abspath(__file__))

    env = dict(os.environ, **{_CHILD_FLAG: "1"})
    errors: list[str] = []
    for n in range(1, attempts + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env, cwd=here,
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {n}: timeout after {timeout:.0f}s")
        else:
            parsed = _parse_json_line(proc.stdout)
            if proc.returncode == 0 and parsed is not None and parsed.get("value"):
                if errors:
                    parsed["recovered_after"] = errors
                print(json.dumps(parsed))
                return
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
            errors.append(f"attempt {n}: rc={proc.returncode} " + " | ".join(tail))
        if n < attempts:
            time.sleep(backoff)

    steps = os.environ.get("BENCH_STEPS", "10")
    variant = os.environ.get("BENCH_VARIANT", "merged")
    print(json.dumps({
        "metric": f"pgd{steps}_adv_images_per_sec_per_chip_vitb_lora"
                  + ("" if variant == "merged" else f"_{variant}"),
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": f"all {attempts} attempts failed: " + " ;; ".join(errors),
        # Builder-measured context so a dead-tunnel artifact still points at
        # the number this harness produced when the chip was reachable
        # (round 3, default merged variant — PERF.md "Headline"). NOT a
        # driver-verified value; recorded for triage only.
        "last_measured_builder": (
            {"value": 158.5, "mfu_pct": 69.0, "vs_baseline": 2.88,
             "see": "PERF.md"} if variant == "merged" else None),
        # preflight is what actually shortened the run; "now" distinguishes
        # a mid-run recovery from a still-dead relay
        "tunnel_alive_preflight": preflight_alive,
        "tunnel_alive_now": relay_alive(),
        "attempts": attempts,
        "timeout_s": timeout,
    }))


if __name__ == "__main__":
    if os.environ.get(_CHILD_FLAG):
        measure()
    else:
        main()
