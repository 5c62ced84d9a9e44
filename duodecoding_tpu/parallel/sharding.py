"""GSPMD partition specs for the stacked-transformer parameter pytree.

Megatron-style tensor parallelism, the jax.sharding equivalent of the
reference's column/row sharding + all_reduce hooks (reference:
src/tp.py:59-146):

- q/k/v projections column-sharded over heads (``model`` axis on the output
  feature dim) — attention runs head-local per shard;
- o projection row-sharded (``model`` on the input dim) — XLA inserts the
  psum the reference registered as a forward hook (src/tp.py:126);
- MLP gate/up column-sharded, down row-sharded (same sandwich);
- the KV cache shards its kv-head axis on ``model`` and batch on ``data``;
  its ``length`` scalar stays replicated (the sharded-rollback requirement,
  SURVEY §7.3);
- lm_head is vocab-sharded; norms/embeddings replicated.

Requires num_kv_heads % model_axis == 0 (pad kv heads or lower the axis
size otherwise — same constraint the reference's head-count division has,
src/tp.py:129-146).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache


def param_partition_specs(cfg: ModelConfig, params=None) -> dict:
    layers = {
        "attn_norm": P(None, None),
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
        "mlp_norm": P(None, None),
        "w_gate": P(None, None, "model"),
        "w_up": P(None, None, "model"),
        "w_down": P(None, "model", None),
    }
    # fused layouts (models/quant.py::fuse_layer_weights): column-parallel
    # over the concatenated output axis (GSPMD keeps the post-split slices
    # correct; head-aligned TP should shard the unfused layout)
    layers["wqkv"] = P(None, None, "model")
    layers["w_gateup"] = P(None, None, "model")
    if cfg.qkv_bias:
        layers["bq"] = P(None, "model")
        layers["bk"] = P(None, "model")
        layers["bv"] = P(None, "model")
    specs = {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "model")
    if params is not None:
        # adapt to the actual pytree: drop spec entries for absent keys
        # (fused vs unfused layouts) and expand specs over INT4-quantized
        # dicts — packed [.., K/2, N] and scales/zeros [.., G, N] all
        # shard on the same (output-column) axis, so the weight's spec
        # applies to every quantized leaf
        specs = {k: v for k, v in specs.items() if k in params}
        specs["layers"] = {
            k: (
                {kk: layers[k] for kk in pv}
                if isinstance(pv, dict)
                else layers[k]
            )
            for k, pv in params["layers"].items()
        }
        if isinstance(params.get("lm_head"), dict):
            specs["lm_head"] = {
                kk: specs["lm_head"] for kk in params["lm_head"]
            }
    return specs


def cache_partition_spec(data_sharded: bool = False) -> KVCache:
    # [L, B, S, H_kv, Dh]; the batch axis shards on `data` only when the
    # batch size divides the axis (single-request decoding keeps B
    # replicated — request-level data parallelism lives in the serving layer)
    kv = P(None, "data" if data_sharded else None, None, "model", None)
    return KVCache(k=kv, v=kv, length=P())


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    specs = param_partition_specs(cfg, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    batch = cache.k.shape[1]
    data_size = mesh.shape.get("data", 1)
    spec = cache_partition_spec(data_sharded=batch % data_size == 0 and batch >= data_size)
    return KVCache(
        k=jax.device_put(cache.k, NamedSharding(mesh, spec.k)),
        v=jax.device_put(cache.v, NamedSharding(mesh, spec.v)),
        length=jax.device_put(cache.length, NamedSharding(mesh, spec.length)),
    )
