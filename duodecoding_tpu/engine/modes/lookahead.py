"""Lookahead-family modes: `pld` (prompt-lookup decoding) and `lade`.

The reference ships lookahead decoding as a vendored baseline
(reference: src/engine.py:1016-1028 delegating to
src/model/lade/decoding.py `jacobi_greedy_search_multilevel`) plus a dead
`pld` dispatch branch (eval/eval.py:70-111). Both are draft-model-free
speculation:

- `pld`: draft candidates come from matching the current token suffix
  against the sequence generated/prompted SO FAR (the self-referential
  special case of retrieval drafting);
- `lade`: pld plus an n-gram pool that self-improves from the verifier's
  own logits — every verify forward yields the model's greedy next-token
  prediction at gamma+1 positions, and those (context, prediction) pairs
  are harvested into the pool, standing in for the reference's Jacobi
  trajectory n-grams without extra forwards.

Verification reuses the deterministic-proposal machinery of the REST mode
(each candidate token accepted with probability p(x); exact-greedy match at
temperature 0).
"""

from __future__ import annotations

import time
from collections import defaultdict

import numpy as np

import jax.numpy as jnp

from duodecoding_tpu.engine.loops import prefill
from duodecoding_tpu.engine.metrics import finalize_throughput, get_empty_metrics
from duodecoding_tpu.engine.modes.rest import rest_single_step, rest_verify_step
from duodecoding_tpu.engine.registry import register_mode


def _suffix_lookup(seq: list[int], max_ngram: int, draft_len: int):
    """Find the longest suffix (2..max_ngram tokens) that re-occurs earlier
    in ``seq``; return the continuation after its most recent occurrence."""
    n = len(seq)
    for m in range(min(max_ngram, n - 1), 1, -1):
        suffix = seq[n - m :]
        # scan most-recent-first
        for start in range(n - m - 1, -1, -1):
            if seq[start : start + m] == suffix:
                cont = seq[start + m : start + m + draft_len]
                if cont:
                    return cont
    return None


class _NGramPool:
    """(n-1)-token context -> most recent continuation token chains."""

    def __init__(self, n: int = 3, draft_len: int = 8):
        self.n = n
        self.draft_len = draft_len
        self.table: dict[tuple, list[int]] = defaultdict(list)

    def put(self, context: tuple, nxt: int) -> None:
        self.table[context] = [nxt]

    def lookup_chain(self, seq: list[int]) -> list[int] | None:
        """Greedily chain pool entries starting from the current context."""
        ctx = tuple(seq[-(self.n - 1) :])
        if len(ctx) < self.n - 1 or ctx not in self.table:
            return None
        out: list[int] = []
        cur = list(ctx)
        for _ in range(self.draft_len):
            key = tuple(cur[-(self.n - 1) :])
            nxt = self.table.get(key)
            if not nxt:
                break
            out.append(nxt[0])
            cur.append(nxt[0])
        return out or None


def _lookahead_loop(engine, prefix, use_pool: bool, max_ngram: int,
                    use_early_stopping: bool):
    from duodecoding_tpu.engine.engine import Stopwatch, block

    cfg = engine.config
    target = engine.target
    tokens, L = engine.token_buffer(prefix)
    eos = cfg.eos_ids if use_early_stopping else ()
    gamma = cfg.gamma
    cache = engine.new_cache(target)
    with Stopwatch() as sw:
        cache = prefill(target.params, target.cfg, cache, tokens[:, :L])

    host_tokens = [int(t) for t in np.asarray(tokens[0, :L])]
    pool = _NGramPool(n=3, draft_len=gamma) if use_pool else None
    key = engine.next_key()
    n_now = L
    limit = L + cfg.max_tokens
    iters = drafted = accepted = 0
    compute = sw.elapsed
    done = False
    while n_now < limit and not done:
        t0 = time.perf_counter()
        cand = None
        if pool is not None:
            cand = pool.lookup_chain(host_tokens)
        if cand is None:
            cand = _suffix_lookup(host_tokens, max_ngram, gamma)
        if cand:
            g_act = min(len(cand), gamma, limit - 1 - n_now)
            buf = np.zeros((gamma,), np.int32)
            buf[: len(cand[:gamma])] = cand[:gamma]
            tokens, n_dev, cache, key, acc_cnt, emitted, _ = rest_verify_step(
                target.params,
                tokens,
                jnp.int32(n_now),
                jnp.asarray(buf),
                jnp.int32(max(g_act, 0)),
                cache,
                key,
                cfg=target.cfg,
                sampling=engine.sampling,
                gamma=gamma,
                eos_ids=eos,
            )
            drafted += max(g_act, 0)
            accepted += int(acc_cnt)
            n_new = int(n_dev)
        else:
            tokens, n_dev, cache, key = rest_single_step(
                target.params, tokens, jnp.int32(n_now), cache, key,
                cfg=target.cfg, sampling=engine.sampling,
            )
            n_new = int(n_dev)
        new_toks = [int(t) for t in np.asarray(tokens[0, n_now:n_new])]
        if pool is not None and len(host_tokens) >= pool.n - 1:
            # harvest n-grams from the freshly committed tokens
            walk = host_tokens[-(pool.n - 1) :] + new_toks
            for i in range(len(new_toks)):
                pool.put(tuple(walk[i : i + pool.n - 1]), walk[i + pool.n - 1])
        host_tokens.extend(new_toks)
        if eos and any(t in eos for t in new_toks):
            done = True
        n_now = n_new
        iters += 1
        compute += time.perf_counter() - t0

    block(tokens)
    out = np.asarray(tokens[:, :n_now])
    m = get_empty_metrics()
    m["generated_tokens"] = n_now - L
    m["target_forward_times"] = iters
    m["draft_generated_tokens"] = drafted
    m["draft_accepted_tokens"] = accepted
    m["loop_times"] = iters
    m["avg_draft_len"] = drafted / iters if iters else 0.0
    m["computation_time"] = compute
    m["wall_time"] = compute
    return out, finalize_throughput(m)


@register_mode("pld")
def prompt_lookup_decoding(engine, prefix, max_ngram=4, use_early_stopping=False, **kw):
    return _lookahead_loop(engine, prefix, False, max_ngram, use_early_stopping)


@register_mode("lade", aliases=("lookahead",))
def lookahead_decoding(engine, prefix, max_ngram=4, use_early_stopping=False, **kw):
    return _lookahead_loop(engine, prefix, True, max_ngram, use_early_stopping)
