"""Functional ConvNeXt — the convolutional backbone of the reference's
promised model zoo (README.md:49-57, never implemented there; SURVEY.md
§2.4 item 1).

TPU design notes:

* Each stage's (homogeneous) blocks stack on a leading axis and run as one
  ``lax.scan``; ConvNeXt-B's 27-deep stage 3 compiles as a single loop body.
* The 7x7 depthwise conv is ``lax.conv_general_dilated`` with
  ``feature_group_count=dim`` (XLA maps depthwise convs to the VPU/MXU
  directly); the two pointwise convs are plain denses on the channel axis —
  MXU matmuls.
* The 1x1 "pointwise" layers double as LoRA targets (``pwconv1/pwconv2``),
  giving adapter parity on a conv backbone.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.nn import dense, dense_init, gelu, layer_norm, layer_norm_init


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    image_size: int = 224
    depths: tuple[int, ...] = (3, 3, 27, 3)
    dims: tuple[int, ...] = (128, 256, 512, 1024)
    num_classes: int = 21
    layer_norm_eps: float = 1e-6
    layer_scale_init: float = 1e-6
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Python-unroll the per-stage block loop instead of lax.scan (the scan
    # backward's residual dynamic-update-slice traffic — models/vit.py
    # round-2 trace). O(depth) compile time; on for flagship bench paths.
    unroll_layers: bool = False
    # Fold each block's channels-last LayerNorm + pointwise-MLP chain into
    # the LN2-fused MLP Pallas kernel (kernels/mlp.py:fused_ln_mlp — the
    # same kernel the ViT fully-fused block uses; the (tokens, C) layout is
    # identical). TPU + half-precision + plain pwconv denses only; stage 4
    # (dim 1024, 16.8 MB of weights) exceeds the VMEM budget and falls back
    # per the fits_vmem_ln check. Default off — unmeasured on hardware.
    fuse_ln_mlp: bool = False
    # Pallas depthwise 7x7 (kernels/dwconv.py): the round-3 trace attributes
    # 27.7% of ConvNeXt PGD wall to XLA's depthwise lowering (~3.4 TF/s on
    # pure VPU work); the kernel unrolls the 49 taps as f32 shifted FMAs
    # over a VMEM-resident image. TPU + half-precision only.
    use_dw_kernel: bool = False

    def with_classes(self, num_classes: int) -> "ConvNeXtConfig":
        return dataclasses.replace(self, num_classes=num_classes)


CONVNEXT_B = ConvNeXtConfig()
CONVNEXT_T = ConvNeXtConfig(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768))
CONVNEXT_TEST = ConvNeXtConfig(image_size=32, depths=(2, 2), dims=(16, 32),
                               num_classes=10, compute_dtype="float32")


def _block_init(rng: jax.Array, dim: int, cfg: ConvNeXtConfig, dtype) -> dict:
    r_dw, r_p1, r_p2 = jax.random.split(rng, 3)
    dw = jax.random.truncated_normal(r_dw, -2, 2, (7, 7, 1, dim), dtype) * 0.02
    return {
        "dwconv": {"w": dw, "b": jnp.zeros((dim,), dtype)},
        "norm": layer_norm_init(dim, dtype=dtype),
        "pwconv1": dense_init(r_p1, dim, 4 * dim, dtype=dtype),
        "pwconv2": dense_init(r_p2, 4 * dim, dim, dtype=dtype),
        "gamma": jnp.full((dim,), cfg.layer_scale_init, dtype),
    }


def init(rng: jax.Array, cfg: ConvNeXtConfig) -> dict:
    dtype = jnp.dtype(cfg.param_dtype)
    r_stem, r_stages, r_head = jax.random.split(rng, 3)
    stem_w = jax.random.truncated_normal(r_stem, -2, 2,
                                         (4, 4, 3, cfg.dims[0]), dtype) * 0.02
    stages = {}
    for s, depth in enumerate(cfg.depths):
        dim = cfg.dims[s]
        rngs = jax.random.split(jax.random.fold_in(r_stages, s), depth)
        blocks = jax.vmap(lambda r, _d=dim: _block_init(r, _d, cfg, dtype))(rngs)
        stage = {"blocks": blocks}
        if s > 0:
            r_ds = jax.random.fold_in(r_stages, 100 + s)
            stage["downsample"] = {
                "norm": layer_norm_init(cfg.dims[s - 1], dtype=dtype),
                "conv": {"w": jax.random.truncated_normal(
                    r_ds, -2, 2, (2, 2, cfg.dims[s - 1], dim), dtype) * 0.02,
                    "b": jnp.zeros((dim,), dtype)},
            }
        stages[str(s)] = stage
    return {
        "stem": {"conv": {"w": stem_w, "b": jnp.zeros((cfg.dims[0],), dtype)},
                 "norm": layer_norm_init(cfg.dims[0], dtype=dtype)},
        "stages": stages,
        "final_ln": layer_norm_init(cfg.dims[-1], dtype=dtype),
        "head": dense_init(r_head, cfg.dims[-1], cfg.num_classes, dtype=dtype),
    }


def _conv(x: jax.Array, w: jax.Array, b, *, stride: int, groups: int = 1,
          padding="SAME") -> jax.Array:
    # No preferred_element_type here: a float32 primitive output makes the
    # conv TRANSPOSE (backward) pair a float32 cotangent with a bfloat16
    # filter, which lax rejects. TPU convs accumulate in float32 in hardware
    # regardless; bias adds in float32 explicitly.
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if b is not None:
        out = (out.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    return out


def _block(cfg: ConvNeXtConfig, bp: dict, x: jax.Array) -> jax.Array:
    dim = x.shape[-1]
    if (cfg.use_dw_kernel and jnp.dtype(x.dtype).itemsize == 2
            and jax.default_backend() == "tpu"):
        from ..kernels import dwconv

        if dwconv.fits_vmem(x.shape[1], x.shape[2], dim, x.dtype):
            h = dwconv.dwconv7(x, bp["dwconv"]["w"].reshape(7, 7, dim))
            h = (h.astype(jnp.float32)
                 + bp["dwconv"]["b"].astype(jnp.float32)).astype(x.dtype)
            return _block_tail(cfg, bp, x, h)
    h = _conv(x, bp["dwconv"]["w"], bp["dwconv"]["b"], stride=1, groups=dim)
    return _block_tail(cfg, bp, x, h)


def _block_tail(cfg: ConvNeXtConfig, bp: dict, x: jax.Array,
                h: jax.Array) -> jax.Array:
    dim = x.shape[-1]
    cd = x.dtype
    if (cfg.fuse_ln_mlp and jnp.dtype(cd).itemsize == 2 and all(
            "lora_a" not in bp[k] and "w_q" not in bp[k]
            for k in ("pwconv1", "pwconv2"))):
        from ..kernels.mlp import fits_vmem_ln, fused_ln_mlp

        if jax.default_backend() == "tpu" and fits_vmem_ln(dim, 4 * dim, cd):
            h = fused_ln_mlp(h, bp["norm"]["scale"], bp["norm"]["bias"],
                             bp["pwconv1"]["w"], bp["pwconv1"]["b"],
                             bp["pwconv2"]["w"], bp["pwconv2"]["b"],
                             cfg.layer_norm_eps).astype(cd)
            return x + bp["gamma"].astype(cd) * h
    h = layer_norm(bp["norm"], h, eps=cfg.layer_norm_eps)
    h = gelu(dense(bp["pwconv1"], h, compute_dtype=x.dtype))
    h = dense(bp["pwconv2"], h, compute_dtype=x.dtype)
    return x + bp["gamma"].astype(x.dtype) * h


def features(cfg: ConvNeXtConfig, params: dict, images: jax.Array) -> jax.Array:
    """-> (B, H', W', C_last) pre-pool feature map."""
    cd = jnp.dtype(cfg.compute_dtype)
    x = _conv(images.astype(cd), params["stem"]["conv"]["w"],
              params["stem"]["conv"]["b"], stride=4, padding="VALID")
    x = layer_norm(params["stem"]["norm"], x, eps=cfg.layer_norm_eps)
    for s in range(len(cfg.depths)):
        if s > 0:
            ds = params["stages"][str(s)]["downsample"]
            x = layer_norm(ds["norm"], x, eps=cfg.layer_norm_eps)
            x = _conv(x, ds["conv"]["w"], ds["conv"]["b"], stride=2,
                      padding="VALID")
        blocks = params["stages"][str(s)]["blocks"]
        if cfg.unroll_layers:
            for i in range(cfg.depths[s]):
                x = _block(cfg, jax.tree.map(lambda v: v[i], blocks), x)
        else:
            def body(h, bp):
                return _block(cfg, bp, h), None
            x, _ = jax.lax.scan(body, x, blocks)
    return x


def apply(cfg: ConvNeXtConfig, params: dict, images: jax.Array) -> jax.Array:
    x = features(cfg, params, images)
    pooled = x.mean(axis=(1, 2))
    pooled = layer_norm(params["final_ln"], pooled, eps=cfg.layer_norm_eps)
    logits = dense(params["head"], pooled, compute_dtype=pooled.dtype,
                   accum_dtype=jnp.float32)
    return logits.astype(jnp.float32)


def lora_target_paths(cfg: ConvNeXtConfig) -> tuple[str, ...]:
    out = []
    for s in range(len(cfg.depths)):
        out.append(f"stages/{s}/blocks/pwconv1")
        out.append(f"stages/{s}/blocks/pwconv2")
    return tuple(out)
