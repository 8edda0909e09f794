"""Functional YOLO11-cls — the CNN+attention classifier of the reference's
promised zoo (README.md:49-57: "yolo11-cls"; never implemented there).

Implements the published YOLO11 classification architecture (ultralytics
``yolo11-cls.yaml``): Conv stem ladder (P1..P5), C3k2 CSP blocks, a C2PSA
position-sensitive attention stage, and the Classify head
(1x1 Conv to 1280 -> global average pool -> linear).

Design decisions for a functional TPU port:

* **BatchNorm runs in inference form** (scale/bias/mean/var leaves,
  normalization folded as an affine at apply time). Fine-tuning in this
  framework trains the affine (and LoRA adapters on the attention/pointwise
  convs) with frozen statistics — the standard transfer recipe; attacks and
  eval are exactly deterministic. From-scratch BN-stat training is out of
  scope (the reference never ran YOLO at all, SURVEY.md §2.4 item 1).
* Channel widths follow the published scale table (n/s/m/l/x width+depth
  multipliers, max_channels clamp).
* All convs are NHWC ``lax.conv_general_dilated`` calls; attention inside
  C2PSA is a standard scaled-dot-product over spatial tokens plus a
  depthwise positional conv.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

# (depth_mult, width_mult, max_channels)
SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


@dataclasses.dataclass(frozen=True)
class YOLO11Config:
    image_size: int = 224
    scale: str = "n"
    num_classes: int = 21
    head_width: int = 1280
    bn_eps: float = 1e-3
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    def with_classes(self, num_classes: int) -> "YOLO11Config":
        return dataclasses.replace(self, num_classes=num_classes)

    @property
    def widths(self) -> tuple[int, ...]:
        """Channel widths for the 5 Conv ladder stops + C3k2 outputs."""
        _, w, mc = SCALES[self.scale]

        def ch(c):
            return int(math.ceil(min(c, mc) * w / 8) * 8)

        return tuple(ch(c) for c in (64, 128, 256, 256, 512, 512, 512, 1024, 1024))

    @property
    def n_bottlenecks(self) -> int:
        d, _, _ = SCALES[self.scale]
        return max(round(2 * d), 1)


YOLO11N_CLS = YOLO11Config(scale="n")
YOLO11S_CLS = YOLO11Config(scale="s")
YOLO11_TEST = YOLO11Config(image_size=64, scale="n", num_classes=10,
                           head_width=128, compute_dtype="float32")


# --- primitives --------------------------------------------------------------

def silu(x):
    return x * jax.nn.sigmoid(x)


def _conv_init(rng, k, c_in, c_out, dtype, *, groups=1):
    fan_in = k * k * (c_in // groups)
    w = jax.random.truncated_normal(rng, -2, 2, (k, k, c_in // groups, c_out), dtype)
    return {
        "w": w * (2.0 / fan_in) ** 0.5,
        "bn": {"scale": jnp.ones((c_out,), dtype),
               "bias": jnp.zeros((c_out,), dtype),
               "mean": jnp.zeros((c_out,), dtype),
               "var": jnp.ones((c_out,), dtype)},
    }


def _conv(cfg, p, x, *, stride=1, groups=1, act=True):
    w = p["w"].astype(x.dtype)
    k = w.shape[0]
    pad = k // 2
    # no preferred_element_type: a f32 primitive output breaks the conv
    # transpose under bf16 params (cotangent/filter dtype mismatch); BN math
    # below runs in f32 anyway
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups).astype(jnp.float32)
    if "lora_a" in p and k == 1 and stride == 1 and groups == 1:
        # 1x1 conv == channel matmul: unmerged LoRA branch (ops/lora.py
        # factors carry the conv's (1, 1) lead axes)
        a = p["lora_a"][0, 0].astype(x.dtype)
        b = p["lora_b"][0, 0].astype(x.dtype)
        s = p["lora_s"].reshape(()).astype(jnp.float32)
        xb = x
        if "lora_rng" in p:
            # training-form lora_dropout, same semantics as ops.nn.dense:
            # inverted dropout on the adapter-branch input only
            keep = 1.0 - p["lora_p"].reshape(())
            key = p["lora_rng"].reshape(())
            mask = jax.random.bernoulli(key, keep, x.shape)
            xb = x * (mask / keep).astype(x.dtype)
        xa = jnp.einsum("bhwi,ir->bhwr", xb, a,
                        preferred_element_type=jnp.float32).astype(x.dtype)
        if "lora_rng_pa" in p:
            # post-split dropout mode (ops/lora.py dropout_mode="post_a"):
            # mask on the rank-r projection, same divergence note as
            # ops.nn.dense
            keep = 1.0 - p["lora_p"].reshape(())
            key = p["lora_rng_pa"].reshape(())
            mask = jax.random.bernoulli(key, keep, xa.shape)
            xa = xa * (mask / keep).astype(xa.dtype)
        out = out + s * jnp.einsum(
            "bhwr,ro->bhwo", xa, b, preferred_element_type=jnp.float32)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + cfg.bn_eps)
    out = (out - bn["mean"].astype(jnp.float32)) * inv \
        * bn["scale"].astype(jnp.float32) + bn["bias"].astype(jnp.float32)
    out = out.astype(x.dtype)
    return silu(out) if act else out


def _bottleneck_init(rng, c, dtype, *, k=(3, 3), e=0.5):
    r1, r2 = jax.random.split(rng)
    c_ = int(c * e)
    return {"cv1": _conv_init(r1, k[0], c, c_, dtype),
            "cv2": _conv_init(r2, k[1], c_, c, dtype)}


def _bottleneck(cfg, p, x, *, shortcut=True):
    h = _conv(cfg, p["cv1"], x)
    h = _conv(cfg, p["cv2"], h)
    return x + h if shortcut else h


def _c3k_init(rng, c, n, dtype):
    """C3k: CSP triple-conv around n bottlenecks (kernel 3, e=1 inside)."""
    rngs = jax.random.split(rng, 3 + n)
    c_ = c // 2
    return {
        "cv1": _conv_init(rngs[0], 1, c, c_, dtype),
        "cv2": _conv_init(rngs[1], 1, c, c_, dtype),
        "cv3": _conv_init(rngs[2], 1, 2 * c_, c, dtype),
        "m": {str(i): _bottleneck_init(rngs[3 + i], c_, dtype, e=1.0)
              for i in range(n)},
    }


def _c3k(cfg, p, x):
    a = _conv(cfg, p["cv1"], x)
    for i in sorted(p["m"], key=int):
        a = _bottleneck(cfg, p["m"][i], a)
    b = _conv(cfg, p["cv2"], x)
    return _conv(cfg, p["cv3"], jnp.concatenate([a, b], axis=-1))


def _c3k2_init(rng, c_in, c_out, n, dtype, *, c3k=False, e=0.25):
    rngs = jax.random.split(rng, 2 + n)
    c = int(c_out * e)
    mods = {str(i): (_c3k_init(rngs[2 + i], c, 2, dtype) if c3k
                     else _bottleneck_init(rngs[2 + i], c, dtype, e=0.5))
            for i in range(n)}
    return {
        "cv1": _conv_init(rngs[0], 1, c_in, 2 * c, dtype),
        "cv2": _conv_init(rngs[1], 1, (2 + n) * c, c_out, dtype),
        "m": mods,
    }


def _c3k2(cfg, p, x, *, c3k: bool):
    h = _conv(cfg, p["cv1"], x)
    c = h.shape[-1] // 2
    ys = [h[..., :c], h[..., c:]]
    for i in sorted(p["m"], key=int):
        bp = p["m"][i]
        ys.append(_c3k(cfg, bp, ys[-1]) if c3k else
                  _bottleneck(cfg, bp, ys[-1]))
    return _conv(cfg, p["cv2"], jnp.concatenate(ys, axis=-1))


def _attention_init(rng, dim, dtype, *, num_heads, attn_ratio=0.5):
    head_dim = dim // num_heads
    key_dim = int(head_dim * attn_ratio)
    h = dim + num_heads * key_dim * 2
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "qkv": _conv_init(r1, 1, dim, h, dtype),
        "pe": _conv_init(r2, 3, dim, dim, dtype, groups=dim),  # depthwise positional conv
        "proj": _conv_init(r3, 1, dim, dim, dtype),
    }


def _attention(cfg, p, x):
    b, hh, ww, c = x.shape
    # geometry recovered from weights (no non-array leaves in the pytree):
    # qkv emits nh*(2*key_dim + head_dim) channels with head_dim = c // nh
    num_heads = max(c // 64, 1)
    head_dim = c // num_heads
    key_dim = (p["qkv"]["w"].shape[-1] - c) // (2 * num_heads)
    n = hh * ww
    qkv = _conv(cfg, p["qkv"], x, act=False).reshape(b, n, num_heads,
                                                     2 * key_dim + head_dim)
    q = qkv[..., :key_dim]
    k = qkv[..., key_dim:2 * key_dim]
    v = qkv[..., 2 * key_dim:]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32) * key_dim ** -0.5, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(x.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, hh, ww, c)
    out = out + _conv(cfg, p["pe"], v.reshape(b, hh, ww, c), groups=c, act=False)
    return _conv(cfg, p["proj"], out, act=False)


def _psablock_init(rng, dim, dtype):
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "attn": _attention_init(r1, dim, dtype, num_heads=max(dim // 64, 1)),
        "ffn1": _conv_init(r2, 1, dim, dim * 2, dtype),
        "ffn2": _conv_init(r3, 1, dim * 2, dim, dtype),
    }


def _psablock(cfg, p, x):
    x = x + _attention(cfg, p["attn"], x)
    h = _conv(cfg, p["ffn1"], x)
    return x + _conv(cfg, p["ffn2"], h, act=False)


def _c2psa_init(rng, c, n, dtype):
    rngs = jax.random.split(rng, 2 + n)
    c_ = c // 2
    return {
        "cv1": _conv_init(rngs[0], 1, c, 2 * c_, dtype),
        "cv2": _conv_init(rngs[1], 1, 2 * c_, c, dtype),
        "m": {str(i): _psablock_init(rngs[2 + i], c_, dtype)
              for i in range(n)},
    }


def _c2psa(cfg, p, x):
    h = _conv(cfg, p["cv1"], x)
    c = h.shape[-1] // 2
    a, b = h[..., :c], h[..., c:]
    for i in sorted(p["m"], key=int):
        b = _psablock(cfg, p["m"][i], b)
    return _conv(cfg, p["cv2"], jnp.concatenate([a, b], axis=-1))


# --- model -------------------------------------------------------------------

def init(rng: jax.Array, cfg: YOLO11Config) -> dict:
    dtype = jnp.dtype(cfg.param_dtype)
    W = cfg.widths  # (64,128,256,256,512,512,512,1024,1024) scaled
    n = cfg.n_bottlenecks
    r = jax.random.split(rng, 12)
    return {
        "stem0": _conv_init(r[0], 3, 3, W[0], dtype),          # P1/2
        "stem1": _conv_init(r[1], 3, W[0], W[1], dtype),       # P2/4
        "c3k2_0": _c3k2_init(r[2], W[1], W[2], n, dtype, c3k=False, e=0.25),
        "down0": _conv_init(r[3], 3, W[2], W[3], dtype),       # P3/8
        "c3k2_1": _c3k2_init(r[4], W[3], W[4], n, dtype, c3k=False, e=0.25),
        "down1": _conv_init(r[5], 3, W[4], W[5], dtype),       # P4/16
        "c3k2_2": _c3k2_init(r[6], W[5], W[6], n, dtype, c3k=True, e=0.5),
        "down2": _conv_init(r[7], 3, W[6], W[7], dtype),       # P5/32
        "c3k2_3": _c3k2_init(r[8], W[7], W[8], n, dtype, c3k=True, e=0.5),
        "c2psa": _c2psa_init(r[9], W[8], n, dtype),
        "head": {
            "conv": _conv_init(r[10], 1, W[8], cfg.head_width, dtype),
            "linear": {
                "w": jax.random.truncated_normal(
                    r[11], -2, 2, (cfg.head_width, cfg.num_classes), dtype) * 0.02,
                "b": jnp.zeros((cfg.num_classes,), dtype)},
        },
    }


def features(cfg: YOLO11Config, params: dict, images: jax.Array) -> jax.Array:
    cd = jnp.dtype(cfg.compute_dtype)
    x = images.astype(cd)
    x = _conv(cfg, params["stem0"], x, stride=2)
    x = _conv(cfg, params["stem1"], x, stride=2)
    x = _c3k2(cfg, params["c3k2_0"], x, c3k=False)
    x = _conv(cfg, params["down0"], x, stride=2)
    x = _c3k2(cfg, params["c3k2_1"], x, c3k=False)
    x = _conv(cfg, params["down1"], x, stride=2)
    x = _c3k2(cfg, params["c3k2_2"], x, c3k=True)
    x = _conv(cfg, params["down2"], x, stride=2)
    x = _c3k2(cfg, params["c3k2_3"], x, c3k=True)
    return _c2psa(cfg, params["c2psa"], x)


def apply(cfg: YOLO11Config, params: dict, images: jax.Array) -> jax.Array:
    x = features(cfg, params, images)
    x = _conv(cfg, params["head"]["conv"], x)
    pooled = x.mean(axis=(1, 2))
    logits = jnp.dot(pooled, params["head"]["linear"]["w"].astype(pooled.dtype),
                     preferred_element_type=jnp.float32)
    return (logits + params["head"]["linear"]["b"].astype(jnp.float32)
            ).astype(jnp.float32)


def lora_target_paths(cfg: YOLO11Config) -> tuple[str, ...]:
    """LoRA on the attention stage's projections (the transformer-like part)."""
    n = cfg.n_bottlenecks
    out = []
    for i in range(n):
        out.append(f"c2psa/m/{i}/attn/qkv")
        out.append(f"c2psa/m/{i}/attn/proj")
    return tuple(out)
