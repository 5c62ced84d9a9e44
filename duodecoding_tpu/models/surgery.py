"""Model surgery for benchmark pair construction.

The reference benchmarks real checkpoint pairs whose speculative accept
rate is a measured property (BASELINE.md row 1: 56.2% for
Qwen1.5-0.5B -> 1.8B). With zero egress this sandbox has no checkpoints,
so the bench constructs a pair whose MEASURED accept rate is calibrated to
the baseline's instead:

- the draft is a *prefix slice* of the target (first k layers + the
  target's own embedding/final-norm/head) — like real draft/target pairs
  the draft is strictly cheaper (k/L of the FLOPs/bytes) and shares the
  target's representation space;
- a single scalar knob — the residual contribution scale of every layer's
  ``wo``/``w_down`` — is bisected until the measured decode-time accept
  rate matches the baseline row. Scaling residual branches mirrors what
  trained residual nets actually exhibit (later layers refine rather than
  rewrite the stream), which is precisely why real pairs reach ~56%.

Also: direct random-INT4 parameter init at 13B scale (a bf16 transient of
a 13B model would not fit one v5e's 16 GB HBM, so codes/scales are
generated already-packed).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.quant import QUANT_KEYS, is_quantized


def truncate_model(cfg: ModelConfig, params: dict, k: int):
    """Draft = first ``k`` layers of the target plus its embedding /
    final norm / head. Works on bf16 and INT4-quantized pytrees (the
    layer axis leads every stacked leaf, including packed/scales/zeros).
    Returns (draft_cfg, draft_params); arrays are sliced copies."""
    if not 0 < k <= cfg.num_layers:
        raise ValueError(f"k={k} out of range for {cfg.num_layers} layers")
    draft_cfg = dataclasses.replace(cfg, name=f"{cfg.name}-slice{k}", num_layers=k)
    layers = jax.tree.map(lambda a: a[:k], params["layers"])
    draft = dict(params)
    draft["layers"] = layers
    return draft_cfg, draft


def scale_residual(params: dict, alpha: float) -> dict:
    """Scale every layer's residual-branch output projections (``wo``,
    ``w_down``) by ``alpha``. On INT4 dicts the affine (scales, zeros) are
    scaled — exactly equivalent to scaling the dequantized weight, no
    requantization needed."""
    layers = dict(params["layers"])
    for key in ("wo", "w_down"):
        w = layers[key]
        if is_quantized(w):
            layers[key] = {
                "packed": w["packed"],
                "scales": w["scales"] * alpha,
                "zeros": w["zeros"] * alpha,
            }
        else:
            layers[key] = (w.astype(jnp.float32) * alpha).astype(w.dtype)
    out = dict(params)
    out["layers"] = layers
    return out


def init_random_quant_params(
    cfg: ModelConfig, key: jax.Array, group_size: int = 128, dtype=jnp.bfloat16
):
    """Random-init a model directly in groupwise-INT4 packed form (matmul
    weights) + ``dtype`` embeddings/norms. Codes are uniform nibbles with
    scales chosen so the dequantized std matches the dense init
    (fan_in^-0.5); never materialises a dense weight, so 13B fits in one
    v5e HBM (~7.3 GB packed vs 26 GB bf16)."""
    return _init_random_quant_jit(cfg, group_size, jnp.dtype(dtype).name, key)


@functools.partial(
    jax.jit, static_argnames=("cfg", "group_size", "dtype_name")
)
def _init_random_quant_jit(cfg: ModelConfig, group_size: int, dtype_name: str, key):
    dtype = jnp.dtype(dtype_name)
    d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    hd, h, hkv, L = cfg.head_dim_, cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
    ks = jax.random.split(key, 12)

    def qrand(k, K, N, lead=None):
        # uniform nibbles 0..15; affine (scale, zero) per (group, col) such
        # that dequantized values ~ U[-a, a] with std = K^-0.5
        # (std of U[-a,a] = a/sqrt(3); uniform 16 levels over [0,15] has
        # std sqrt((16^2-1)/12) = 4.61 in code units)
        lead = (L,) if lead is None else lead
        target_std = K**-0.5
        step = target_std / jnp.sqrt((16.0**2 - 1) / 12.0)
        packed = jax.random.randint(
            k, (*lead, K // 2, N), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        G = K // group_size
        scales = jnp.full((*lead, G, N), step, jnp.float32)
        zeros = jnp.full((*lead, G, N), -7.5 * step, jnp.float32)
        return {"packed": packed, "scales": scales, "zeros": zeros}

    def norm(k, *shape, scale=None):
        scale = scale if scale is not None else (shape[-2] ** -0.5)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, d), dtype),
        "wq": qrand(ks[0], d, h * hd),
        "wk": qrand(ks[1], d, hkv * hd),
        "wv": qrand(ks[2], d, hkv * hd),
        "wo": qrand(ks[3], h * hd, d),
        "mlp_norm": jnp.ones((L, d), dtype),
        "w_gate": qrand(ks[4], d, f),
        "w_up": qrand(ks[5], d, f),
        "w_down": qrand(ks[6], f, d),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((L, h * hd), dtype)
        layers["bk"] = jnp.zeros((L, hkv * hd), dtype)
        layers["bv"] = jnp.zeros((L, hkv * hd), dtype)
    params = {
        "embed": norm(ks[7], v, d, scale=0.02),
        "final_norm": jnp.ones((d,), dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        # INT4 head as well (GGUF drafts quantize the output projection;
        # a bf16 13B head alone is 327 MB of per-step HBM traffic). The
        # column count pads up to a 512 multiple so the kernel gets full
        # tiles (N=32000 only tiles at 256 — measured 2.5x its SoL);
        # forward slices logits back to vocab_size.
        if d % group_size == 0 and d % 2 == 0:
            vp = ((v + 511) // 512) * 512
            params["lm_head"] = qrand(ks[8], d, vp, lead=())
        else:
            params["lm_head"] = norm(ks[8], d, v)
    return params


def param_bytes(params) -> int:
    """Actual bytes of a parameter pytree (packed INT4 counted as stored)."""
    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params)
    )
