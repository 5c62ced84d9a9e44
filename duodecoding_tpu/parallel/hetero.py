"""Heterogeneous tier placement: draft and target on disjoint device sets,
draft compute overlapped with target verification.

The reference's headline deployment runs the GGUF INT4 draft on host CPU
while the target occupies the GPU (reference: src/model_cpu.py:10
``KVCacheCppModel``; the original DuoDecoding design overlaps CPU drafting
with GPU verification). TPU-native equivalent (SURVEY §2.5 directive):

- ``HeteroPlacement`` splits the device set: the target is GSPMD
  tensor-sharded over its own mesh (parallel/sharding.py specs), the draft
  lives replicated on a disjoint set of devices (host CPU platform or a
  small mesh partition);
- the decode loop pipelines: the draft ALWAYS drafts one chunk ahead along
  its own greedy chain (no dependence on the pending verification), so the
  next chunk's draft compute runs concurrently with the current chunk's
  target verify — JAX async dispatch onto disjoint device sets gives real
  overlap without threads;
- verification defers the bonus token: a fully-accepted chunk commits only
  its gamma tokens and the draft-ahead chunk's first token plays the role
  of the gamma+1-th draft, so acceptance statistics match standard SD
  while the pipeline never stalls on the target's sample. On a rejection
  the in-flight draft chunk is discarded (rollback = length reset) — the
  inherent cost of speculation.

Greedy-lossless: every committed token is either a verified draft token
(equal to the target argmax) or the target's own argmax at the rejection
point.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from duodecoding_tpu.models.config import ModelConfig
from duodecoding_tpu.models.transformer import KVCache, forward, init_cache, rollback
from duodecoding_tpu.parallel.mesh import make_mesh
from duodecoding_tpu.parallel.sharding import shard_cache, shard_params


@dataclasses.dataclass
class HeteroPlacement:
    """Disjoint device sets for the two tiers."""

    target_mesh: Mesh
    draft_mesh: Mesh

    @classmethod
    def split(cls, n_draft_devices: int = 1, devices=None) -> "HeteroPlacement":
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < n_draft_devices + 1:
            raise ValueError(
                f"need >= {n_draft_devices + 1} devices, have {len(devices)}"
            )
        t_devs = devices[: len(devices) - n_draft_devices]
        d_devs = devices[len(devices) - n_draft_devices :]
        return cls(
            target_mesh=make_mesh(devices=t_devs),
            draft_mesh=make_mesh(devices=d_devs),
        )

    def place_target(self, params, cfg: ModelConfig):
        return shard_params(params, cfg, self.target_mesh)

    def place_draft(self, params):
        repl = NamedSharding(self.draft_mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, repl), params)

    def draft_replicated(self, x):
        return jax.device_put(x, NamedSharding(self.draft_mesh, P()))

    def target_replicated(self, x):
        return jax.device_put(x, NamedSharding(self.target_mesh, P()))


@functools.partial(
    jax.jit, static_argnames=("cfg", "gamma"), donate_argnames=("tokens", "cache")
)
def draft_chunk(
    params, cfg: ModelConfig, tokens: jax.Array, n: jax.Array, cache: KVCache,
    *, gamma: int,
):
    """Draft ``gamma`` greedy tokens continuing the draft's own chain.
    Requires cache.length == n-1 (lag-1); writes the chunk into ``tokens``
    at [n, n+gamma). Pure function of draft state — dispatchable before
    the previous chunk's verification resolves."""
    B = tokens.shape[0]

    def step(carry, _):
        tokens, cache, pos = carry
        cur = jax.lax.dynamic_slice(tokens, (0, pos - 1), (B, 1))
        logits, cache = forward(params, cfg, cur, cache)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos))
        return (tokens, cache, pos + 1), nxt

    (tokens, cache, _), chunk = jax.lax.scan(
        step, (tokens, cache, n), None, length=gamma
    )
    return tokens, cache, chunk[:, 0]


@functools.partial(
    jax.jit, static_argnames=("cfg", "gamma"), donate_argnames=("tokens", "cache")
)
def verify_chunk(
    params, cfg: ModelConfig, tokens: jax.Array, n: jax.Array,
    chunk: jax.Array, cache: KVCache, *, gamma: int,
):
    """Verify a draft chunk with one target forward (deferred bonus).

    Window rows = [token n-1, chunk[0..gamma-1]]; row j predicts position
    n+j. accepted = longest prefix with chunk[j] == argmax(row j);
    correction = argmax(row accepted) — the committed token at the first
    mismatch. Returns (tokens, cache, accepted, correction) with the cache
    rolled back to lag-1 of the new committed length."""
    B = tokens.shape[0]
    tokens = jax.lax.dynamic_update_slice(tokens, chunk[None, :], (0, n))
    ver = jax.lax.dynamic_slice(tokens, (0, n - 1), (B, gamma + 1))
    logits, cache = forward(params, cfg, ver, cache)
    am = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [gamma+1]
    hits = (chunk == am[:gamma]).astype(jnp.int32)
    accepted = jnp.argmin(jnp.cumprod(hits))
    accepted = jnp.where(jnp.all(hits == 1), gamma, accepted)
    correction = am[accepted]  # valid only when accepted < gamma
    new_n = jnp.where(
        accepted == gamma, n + gamma, n + accepted + 1
    ).astype(jnp.int32)
    tokens = jnp.where(
        accepted == gamma,
        tokens,
        jax.lax.dynamic_update_slice(tokens, correction[None, None], (0, n + accepted)),
    )
    cache = rollback(cache, new_n - 1)
    return tokens, cache, accepted, correction, new_n


@functools.partial(jax.jit, donate_argnames=("tokens",))
def _patch_tokens(tokens, n, committed, count):
    """Write `count` committed tokens (padded array) at position n."""
    upd = jnp.where(
        jnp.arange(committed.shape[0]) < count,
        committed,
        jax.lax.dynamic_slice(
            tokens[0], (n,), (committed.shape[0],)
        ),
    )
    return jax.lax.dynamic_update_slice(tokens, upd[None, :], (0, n))


def hetero_sd_generate(
    placement: HeteroPlacement,
    d_params,
    t_params,
    d_cfg: ModelConfig,
    t_cfg: ModelConfig,
    prompt: np.ndarray,  # [1, L]
    *,
    gamma: int = 4,
    max_new_tokens: int = 64,
    max_seq_len: int = 512,
    cache_dtype=jnp.bfloat16,
):
    """Pipelined greedy SD across the two device sets. Returns
    (tokens [1, n], stats dict)."""
    from duodecoding_tpu.engine.loops import prefill

    L = prompt.shape[1]
    S = max_seq_len
    base = jnp.zeros((1, S), jnp.int32).at[:, :L].set(
        jnp.asarray(prompt, jnp.int32)
    )
    tokens_d = placement.draft_replicated(base)
    tokens_t = placement.target_replicated(base)
    d_cache = jax.tree.map(
        placement.draft_replicated, init_cache(d_cfg, 1, S, cache_dtype)
    )
    t_cache = shard_cache(
        init_cache(t_cfg, 1, S, cache_dtype), placement.target_mesh
    )
    t0 = time.perf_counter()
    d_cache = prefill(d_params, d_cfg, d_cache, tokens_d[:, :L])
    t_cache = prefill(t_params, t_cfg, t_cache, tokens_t[:, :L])

    n = L
    limit = L + max_new_tokens
    iters = accepted_total = drafted = rejects = 0
    # first chunk (no overlap possible yet)
    tokens_d, d_cache, chunk = draft_chunk(
        d_params, d_cfg, tokens_d, jnp.int32(n), d_cache, gamma=gamma
    )
    while n < limit:
        # dispatch the NEXT draft chunk before verification blocks: it
        # depends only on draft state, so it runs on the draft devices
        # while the target verifies the current chunk.
        tokens_d2, d_cache2, chunk2 = draft_chunk(
            d_params, d_cfg, tokens_d, jnp.int32(n + gamma), d_cache,
            gamma=gamma,
        )
        chunk_t = placement.target_replicated(chunk)  # uplink
        tokens_t, t_cache, acc, corr, new_n = verify_chunk(
            t_params, t_cfg, tokens_t, jnp.int32(n), chunk_t, t_cache,
            gamma=gamma,
        )
        acc = int(acc)
        new_n = int(new_n)
        drafted += gamma
        accepted_total += acc
        iters += 1
        if acc == gamma:
            # full accept: the in-flight chunk continues the pipeline
            n = new_n
            tokens_d, d_cache, chunk = tokens_d2, d_cache2, chunk2
        else:
            # rejection: discard the draft-ahead work, sync the draft
            rejects += 1
            corr_d = placement.draft_replicated(corr)  # downlink
            tokens_d = _patch_tokens(
                tokens_d2, jnp.int32(n + acc), corr_d[None], jnp.int32(1)
            )
            n = new_n
            d_cache = rollback(d_cache2, jnp.int32(n - 1))
            tokens_d, d_cache, chunk = draft_chunk(
                d_params, d_cfg, tokens_d, jnp.int32(n), d_cache, gamma=gamma
            )
        if n >= limit:
            break
    jax.block_until_ready(tokens_t)
    wall = time.perf_counter() - t0
    n = min(n, limit)
    out = np.asarray(tokens_t[:, :n])
    return out, {
        "generated_tokens": n - L,
        "wall_time": wall,
        "iters": iters,
        "drafted": drafted,
        "accepted": accepted_total,
        "reject_resyncs": rejects,
        "target_devices": [str(d) for d in placement.target_mesh.devices.flatten()],
        "draft_devices": [str(d) for d in placement.draft_mesh.devices.flatten()],
    }
