"""HF-checkpoint → stacked-pytree parameter conversion.

The reference loads models through HF ``from_pretrained`` with device maps
(reference: src/model_loading.py:160-179). Here checkpoints are converted
once into the framework's stacked-by-layer pytree (models/transformer.py)
and from then on everything is jnp. Works for Llama-family and Qwen2-family
(Qwen1.5) decoder-only checkpoints.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from duodecoding_tpu.models.config import ModelConfig


def config_from_hf(hf_cfg, name: str = "hf-model") -> ModelConfig:
    """Build a ModelConfig from a transformers PretrainedConfig."""
    return ModelConfig(
        name=name,
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=getattr(hf_cfg, "num_key_value_heads", None)
        or hf_cfg.num_attention_heads,
        head_dim=getattr(hf_cfg, "head_dim", None),
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        rms_norm_eps=getattr(hf_cfg, "rms_norm_eps", 1e-6),
        qkv_bias=hf_cfg.model_type == "qwen2"
        or bool(getattr(hf_cfg, "attention_bias", False)),
        tie_word_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", False)),
        max_position_embeddings=getattr(hf_cfg, "max_position_embeddings", 4096),
    )


def params_from_hf_state_dict(cfg: ModelConfig, sd: dict, dtype=jnp.bfloat16):
    """Convert an HF Llama/Qwen2 state dict (numpy or torch tensors) into the
    stacked parameter pytree consumed by ``transformer.forward``."""

    def get(key):
        t = sd[key]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t, dtype=np.float32)

    def stack(fmt, transpose=False):
        mats = [get(fmt.format(i)) for i in range(cfg.num_layers)]
        arr = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(arr, dtype)

    layers = {
        "attn_norm": stack("model.layers.{}.input_layernorm.weight"),
        "wq": stack("model.layers.{}.self_attn.q_proj.weight", transpose=True),
        "wk": stack("model.layers.{}.self_attn.k_proj.weight", transpose=True),
        "wv": stack("model.layers.{}.self_attn.v_proj.weight", transpose=True),
        "wo": stack("model.layers.{}.self_attn.o_proj.weight", transpose=True),
        "mlp_norm": stack("model.layers.{}.post_attention_layernorm.weight"),
        "w_gate": stack("model.layers.{}.mlp.gate_proj.weight", transpose=True),
        "w_up": stack("model.layers.{}.mlp.up_proj.weight", transpose=True),
        "w_down": stack("model.layers.{}.mlp.down_proj.weight", transpose=True),
    }
    if cfg.qkv_bias:
        layers["bq"] = stack("model.layers.{}.self_attn.q_proj.bias")
        layers["bk"] = stack("model.layers.{}.self_attn.k_proj.bias")
        layers["bv"] = stack("model.layers.{}.self_attn.v_proj.bias")

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def load_hf_model(name_or_path: str, dtype=jnp.bfloat16):
    """Load an HF checkpoint from disk/hub and convert. Returns (cfg, params)."""
    import torch  # local import: torch only needed on the conversion path
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(name_or_path)
    cfg = config_from_hf(hf_cfg, name=str(name_or_path))
    with torch.no_grad():
        model = AutoModelForCausalLM.from_pretrained(
            name_or_path, torch_dtype=torch.float32
        )
        sd = model.state_dict()
        params = params_from_hf_state_dict(cfg, sd, dtype)
        del model
    return cfg, params
