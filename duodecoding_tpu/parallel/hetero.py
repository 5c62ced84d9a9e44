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

    @classmethod
    def colocated(cls, devices=None) -> "HeteroPlacement":
        """Both tiers on the SAME device set (single-chip deployments):
        the pipeline protocol is identical — overlap degenerates to
        stream-level interleaving on one core, but the device-resident
        verdict flow still removes every per-chunk host sync."""
        devices = list(devices if devices is not None else jax.devices())
        return cls(
            target_mesh=make_mesh(devices=devices),
            draft_mesh=make_mesh(devices=devices),
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


# Verdict kinds flowing target -> draft (device-side control protocol:
# the host never reads them inside the loop)
VKIND_NOOP = 0  # pipeline warm-up filler
VKIND_OK = 1  # a real verification verdict (acc/corr/new_n meaningful)
VKIND_STALE = 2  # the chunk was drafted on a rejected branch; ignored


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "gamma"),
    donate_argnames=("tokens", "cache"),
)
def draft_step(
    params, cfg: ModelConfig, tokens: jax.Array, cache: KVCache,
    n: jax.Array, verdict: jax.Array, corr: jax.Array, *, gamma: int,
):
    """One pipelined draft stage: apply a (two-iterations-old) verdict,
    then draft the next ``gamma``-token chunk along the draft's own greedy
    chain. Entirely device-resident — the verdict is a device array, the
    host dispatches without reading it.

    ``verdict`` = [kind, acc, new_n] int32; ``corr`` = [] int32 (the
    target's correction token, meaningful on a rejection). On a rejection
    the chain is patched at new_n - 1, the cache rolls back (pure length
    reset) and the chunk redrafts from new_n; otherwise the chain simply
    continues (full accepts need no fixup — accepted tokens ARE the
    draft's chain). Returns (tokens, cache, n', chunk [gamma])."""
    kind, acc, new_n = verdict[0], verdict[1], verdict[2]
    is_reject = (kind == VKIND_OK) & (acc < gamma)

    def rej(args):
        tokens, cache = args
        t2 = jax.lax.dynamic_update_slice(
            tokens, corr[None, None], (0, new_n - 1)
        )
        return t2, rollback(cache, new_n - 1), new_n

    def keep(args):
        tokens, cache = args
        return tokens, cache, n

    tokens, cache, base = jax.lax.cond(is_reject, rej, keep, (tokens, cache))
    B = tokens.shape[0]

    def step(carry, _):
        tokens, cache, pos = carry
        cur = jax.lax.dynamic_slice(tokens, (0, pos - 1), (B, 1))
        logits, cache = forward(params, cfg, cur, cache)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos))
        return (tokens, cache, pos + 1), nxt

    (tokens, cache, _), chunk = jax.lax.scan(
        step, (tokens, cache, base), None, length=gamma
    )
    return tokens, cache, base + gamma, chunk[:, 0], base


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "gamma"),
    donate_argnames=("tokens", "cache", "rec_acc", "rec_kind"),
)
def verify_step(
    params, cfg: ModelConfig, tokens: jax.Array, cache: KVCache,
    n: jax.Array, chunk: jax.Array, base: jax.Array,
    rec_acc: jax.Array, rec_kind: jax.Array, it: jax.Array, *, gamma: int,
):
    """One pipelined verify stage. A chunk whose ``base`` disagrees with
    the target's committed length was drafted on a branch the previous
    verdict rejected — it is skipped (VKIND_STALE, no forward, no commit).
    Otherwise one target forward verifies the chunk, commits the accepted
    prefix (+ correction on a reject), and rolls the cache back to lag-1.
    Returns (tokens, cache, n', verdict [3], corr, records, it+1)."""
    valid = base == n

    def do_verify(args):
        tokens, cache = args
        B = tokens.shape[0]
        tokens = jax.lax.dynamic_update_slice(tokens, chunk[None, :], (0, n))
        ver = jax.lax.dynamic_slice(tokens, (0, n - 1), (B, gamma + 1))
        logits, cache = forward(params, cfg, ver, cache)
        am = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [gamma+1]
        hits = (chunk == am[:gamma]).astype(jnp.int32)
        accepted = jnp.argmin(jnp.cumprod(hits))
        accepted = jnp.where(jnp.all(hits == 1), gamma, accepted)
        correction = am[accepted]
        new_n = jnp.where(accepted == gamma, n + gamma, n + accepted + 1)
        tokens = jnp.where(
            accepted == gamma,
            tokens,
            jax.lax.dynamic_update_slice(
                tokens, correction[None, None], (0, n + accepted)
            ),
        )
        cache = rollback(cache, new_n - 1)
        return (
            tokens, cache, new_n.astype(jnp.int32),
            jnp.stack([VKIND_OK, accepted, new_n]).astype(jnp.int32),
            correction,
        )

    def skip(args):
        tokens, cache = args
        return (
            tokens, cache, n,
            jnp.stack(
                [jnp.int32(VKIND_STALE), jnp.int32(0), n]
            ).astype(jnp.int32),
            jnp.int32(0),
        )

    tokens, cache, new_n, verdict, corr = jax.lax.cond(
        valid, do_verify, skip, (tokens, cache)
    )
    rec_acc = rec_acc.at[it].set(verdict[1])
    rec_kind = rec_kind.at[it].set(verdict[0])
    return tokens, cache, new_n, verdict, corr, rec_acc, rec_kind, it + 1


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
    sync_every: int = 16,
):
    """Pipelined greedy SD across the two device sets. Returns
    (tokens [1, n], stats dict).

    Device-resident pipeline (round-3 rework — the round-2 version
    host-synced ``int(acc)`` every chunk, a ~27 ms RPC per iteration on
    the remote backend): verdicts flow target-mesh -> draft-mesh as
    device arrays with a TWO-iteration delay, so the draft stage of
    iteration i depends only on verdict i-2 and runs concurrently with
    verify i-1. The draft is optimistic: a chunk drafted past a rejected
    chunk arrives at the verifier with a stale ``base`` and is skipped
    device-side (one wasted pipeline slot per rejection — the inherent
    cost of speculation, same as the reference's discarded CPU drafts).
    The host reads ONE scalar every ``sync_every`` iterations to decide
    termination; everything else stays on device."""
    from duodecoding_tpu.engine.loops import prefill

    L = prompt.shape[1]
    S = max_seq_len
    limit = L + max_new_tokens
    max_iters = 2 * max_new_tokens + 4  # worst case: alternate reject/stale
    if limit + 2 * gamma + 2 > S:
        raise ValueError(
            f"max_seq_len {S} too small: need >= {limit + 2 * gamma + 2} "
            "(the optimistic draft chain runs up to 2*gamma ahead)"
        )
    # Initial device values are built from NUMPY so each device_put
    # creates its OWN buffer: with colocated() placement the two meshes
    # share devices, and device_put of a jax array to an identical
    # sharding is a no-op ALIAS — draft_step donating tokens_d would
    # delete tokens_t out from under verify_step (hit on-chip).
    base = np.zeros((1, S), np.int32)
    base[:, :L] = np.asarray(prompt)
    tokens_d = placement.draft_replicated(base)
    tokens_t = placement.target_replicated(np.array(base))
    d_cache = jax.tree.map(
        placement.draft_replicated, init_cache(d_cfg, 1, S, cache_dtype)
    )
    t_cache = shard_cache(
        init_cache(t_cfg, 1, S, cache_dtype), placement.target_mesh
    )
    rec_acc = placement.target_replicated(np.zeros((max_iters,), np.int32))
    rec_kind = placement.target_replicated(np.zeros((max_iters,), np.int32))
    t0 = time.perf_counter()
    d_cache = prefill(d_params, d_cfg, d_cache, tokens_d[:, :L])
    t_cache = prefill(t_params, t_cfg, t_cache, tokens_t[:, :L])

    noop = jnp.asarray([VKIND_NOOP, 0, L], jnp.int32)
    zero = jnp.int32(0)
    # verdicts delayed by 2: v_prev2 feeds the draft while v_prev1's
    # verify may still be in flight
    v_prev2 = (placement.draft_replicated(noop), placement.draft_replicated(zero))
    v_prev1 = (noop, zero)
    n_d = jnp.int32(L)
    n_t = jnp.int32(L)
    it_dev = placement.target_replicated(zero)
    host_syncs = 0
    it = 0
    while it < max_iters:
        tokens_d, d_cache, n_d, chunk, cbase = draft_step(
            d_params, d_cfg, tokens_d, d_cache, n_d, v_prev2[0], v_prev2[1],
            gamma=gamma,
        )
        chunk_t = placement.target_replicated(chunk)  # uplink (tokens only)
        base_t = placement.target_replicated(cbase)
        (
            tokens_t, t_cache, n_t, verdict, corr, rec_acc, rec_kind, it_dev
        ) = verify_step(
            t_params, t_cfg, tokens_t, t_cache, n_t, chunk_t, base_t,
            rec_acc, rec_kind, it_dev, gamma=gamma,
        )
        v_prev2 = (
            placement.draft_replicated(v_prev1[0]),  # downlink (verdict)
            placement.draft_replicated(v_prev1[1]),
        )
        v_prev1 = (verdict, corr)
        it += 1
        if it % sync_every == 0 or it >= max_iters:
            host_syncs += 1
            if int(n_t) >= limit:  # ONE scalar fetch per sync_every iters
                break
    jax.block_until_ready(tokens_t)
    wall = time.perf_counter() - t0
    n = min(int(n_t), limit)
    out = np.asarray(tokens_t[:, :n])
    ra = np.asarray(rec_acc[:it])
    rk = np.asarray(rec_kind[:it])
    ok = rk == VKIND_OK
    return out, {
        "generated_tokens": n - L,
        "wall_time": wall,
        "iters": it,
        "drafted": int(ok.sum()) * gamma,
        "accepted": int(ra[ok].sum()),
        "reject_resyncs": int((ra[ok] < gamma).sum()),
        "stale_chunks": int((rk == VKIND_STALE).sum()),
        "host_syncs": host_syncs,
        "target_devices": [
            str(d) for d in placement.target_mesh.devices.flatten()
        ],
        "draft_devices": [
            str(d) for d in placement.draft_mesh.devices.flatten()
        ],
    }
