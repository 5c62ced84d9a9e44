from duodecoding_tpu.models.config import MODEL_ZOO, ModelConfig, resolve_config
from duodecoding_tpu.models.transformer import (
    KVCache,
    forward,
    init_cache,
    init_random_params,
    rollback,
)

__all__ = [
    "MODEL_ZOO",
    "ModelConfig",
    "resolve_config",
    "KVCache",
    "forward",
    "init_cache",
    "init_random_params",
    "rollback",
]
