"""Model architecture configs and the model zoo.

The reference resolves model aliases to HF checkpoint paths and hard-codes
vocab sizes (reference: src/utils.py:167-246). Here the zoo maps aliases to
architecture configs directly, so every tier can also be instantiated with
random weights at the true architecture when checkpoints are unavailable
(benchmark mode), or loaded from HF checkpoints via models/loader.py.

Covers the Llama family (llama-68m, vicuna-68m/160m, TinyLlama-1.1B,
Llama-2-7B/13B, Vicuna-13B) and the Qwen1.5 family (0.5B/1.8B/4B/7B,
attention QKV bias + tied embeddings for the small ones).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    qkv_bias: bool = False  # Qwen1.5-style attention bias
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 4096

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @property
    def num_params(self) -> int:
        """Approximate parameter count (for sizing / bandwidth models)."""
        d, f, v = self.hidden_size, self.intermediate_size, self.vocab_size
        hd = self.head_dim_
        attn = d * (self.num_heads * hd) * 2 + d * (self.num_kv_heads * hd) * 2
        mlp = 3 * d * f
        per_layer = attn + mlp + 2 * d
        embed = v * d * (1 if self.tie_word_embeddings else 2)
        return self.num_layers * per_layer + embed + d


def _llama(name, vocab, d, f, layers, heads, kv=None, **kw) -> ModelConfig:
    return ModelConfig(
        name=name,
        vocab_size=vocab,
        hidden_size=d,
        intermediate_size=f,
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=kv or heads,
        **kw,
    )


MODEL_ZOO: dict[str, ModelConfig] = {
    # Llama family (reference zoo: src/utils.py:167-246)
    "llama-68m": _llama("llama-68m", 32000, 768, 3072, 2, 12),
    "vicuna-68m": _llama("vicuna-68m", 32000, 768, 3072, 2, 12),
    "vicuna-160m": _llama("vicuna-160m", 32000, 768, 3072, 12, 12),
    "tiny-llama-1.1b": _llama(
        "tiny-llama-1.1b", 32000, 2048, 5632, 22, 32, kv=4, rms_norm_eps=1e-5
    ),
    "llama-2-7b": _llama("llama-2-7b", 32000, 4096, 11008, 32, 32, rms_norm_eps=1e-5),
    "llama-2-13b": _llama("llama-2-13b", 32000, 5120, 13824, 40, 40, rms_norm_eps=1e-5),
    "vicuna-13b": _llama("vicuna-13b", 32000, 5120, 13824, 40, 40, rms_norm_eps=1e-5),
    # Qwen1.5 family
    "qwen1.5-0.5b": _llama(
        "qwen1.5-0.5b", 151936, 1024, 2816, 24, 16,
        qkv_bias=True, tie_word_embeddings=True, rope_theta=1e6, rms_norm_eps=1e-6,
        max_position_embeddings=32768,
    ),
    "qwen1.5-1.8b": _llama(
        "qwen1.5-1.8b", 151936, 2048, 5504, 24, 16,
        qkv_bias=True, tie_word_embeddings=True, rope_theta=1e6, rms_norm_eps=1e-6,
        max_position_embeddings=32768,
    ),
    "qwen1.5-4b": _llama(
        "qwen1.5-4b", 151936, 2560, 6912, 40, 20,
        qkv_bias=True, rope_theta=5e6, rms_norm_eps=1e-6,
        max_position_embeddings=32768,
    ),
    "qwen1.5-7b": _llama(
        "qwen1.5-7b", 151936, 4096, 11008, 32, 32,
        qkv_bias=True, rope_theta=1e6, rms_norm_eps=1e-6,
        max_position_embeddings=32768,
    ),
    # tiny configs for tests
    "test-tiny": _llama("test-tiny", 128, 64, 128, 2, 4, kv=2),
    "test-tiny-deep": _llama("test-tiny-deep", 128, 64, 128, 4, 4, kv=2),
}

# aliases matching the reference CLI names
_ALIASES = {
    "tinyllama": "tiny-llama-1.1b",
    "llama2-7b": "llama-2-7b",
    "llama2-13b": "llama-2-13b",
    "qwen15-0.5b": "qwen1.5-0.5b",
    "qwen15-1.8b": "qwen1.5-1.8b",
    "qwen15-7b": "qwen1.5-7b",
}


def resolve_config(name: str) -> ModelConfig:
    key = name.lower()
    key = _ALIASES.get(key, key)
    if key not in MODEL_ZOO:
        raise KeyError(f"Unknown model alias {name!r}; known: {sorted(MODEL_ZOO)}")
    return MODEL_ZOO[key]
