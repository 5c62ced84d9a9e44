"""Benchmark: flagship distributed speculative decoding throughput on TPU.

Reproduces the reference's headline regime (BASELINE.md row 1:
dist_split_spec, MT-Bench-noeval protocol, edge-cloud 23.6 Mbps stochastic /
edge-end 563 Mbps, temp 0, 128 new tokens per prompt) and reports tokens/s
including simulated communication time, exactly as the reference computes
throughput (wall = compute + simulated comm + queuing).

No pretrained checkpoints are available in this environment (zero egress),
so the model pair is synthesized to match the baseline's *acceptance rate*
instead: the target is a random-weight TinyLlama-1.1B-architecture model and
the draft is the same architecture with parameter noise calibrated by
bisection until greedy argmax agreement ~= the baseline's 56.2% target
accept rate. This is conservative in the framework's favor-less direction:
the reference's draft (Qwen1.5-0.5B vs 1.8B target) costs ~0.28x the target
per forward, while this draft costs 1.0x — real checkpoints would only be
faster.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr. BENCH_TINY=1 runs a miniature CPU-sized variant
for logic validation.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_TPS = 17.07  # BASELINE.md row 1 (dist_split_spec, 0.5B->1.8B)
TARGET_ACCEPT = 0.562
MAX_NEW_TOKENS = 128
N_PROMPTS = 4
PROMPT_LEN = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@jax.jit
def perturb(params, sigma, key):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for w, k in zip(leaves, keys):
        noise = jax.random.normal(k, w.shape, jnp.float32) * jnp.std(
            w.astype(jnp.float32)
        )
        out.append((w.astype(jnp.float32) + sigma * noise).astype(w.dtype))
    return jax.tree.unflatten(treedef, out)


import functools


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_ctx", "ctx_len", "dtype_name")
)
def _argmaxes(cfg, n_ctx, ctx_len, dtype_name, p, tokens):
    from duodecoding_tpu.models import forward, init_cache

    cache = init_cache(cfg, n_ctx, ctx_len, jnp.dtype(dtype_name))
    logits, _ = forward(p, cfg, tokens, cache)
    return jnp.argmax(logits, axis=-1)


def make_eval_contexts(cfg, t_params, key, n_ctx, prompt_len, gen_len, dtype):
    """Contexts ON the target's own greedy trajectories — random-token
    contexts overestimate decode-time agreement badly (observed 0.50 static
    vs 0.22 during decoding)."""
    from duodecoding_tpu.engine.loops import ar_generate, prefill
    from duodecoding_tpu.engine.sampling_config import SamplingConfig
    from duodecoding_tpu.models import init_cache

    S = prompt_len + gen_len
    prompts = jax.random.randint(key, (n_ctx, prompt_len), 1, cfg.vocab_size, jnp.int32)
    tokens = jnp.zeros((n_ctx, S), jnp.int32).at[:, :prompt_len].set(prompts)
    cache = init_cache(cfg, n_ctx, S, dtype)
    cache = prefill(t_params, cfg, cache, tokens[:, :prompt_len])
    out, n, _, _ = ar_generate(
        t_params,
        cfg=cfg,
        tokens=tokens,
        cache=cache,
        n_tokens=jnp.int32(prompt_len),
        key=jax.random.PRNGKey(0),
        sampling=SamplingConfig(0.0),
        max_new_tokens=gen_len,
    )
    return out


def agreement(cfg, t_params, d_params, contexts, dtype=jnp.bfloat16, skip=16):
    """Greedy argmax agreement, teacher-forced on target-generated
    trajectories (decode-distribution-matched)."""
    n_ctx, ctx_len = contexts.shape
    dn = jnp.dtype(dtype).name
    a = _argmaxes(cfg, n_ctx, ctx_len, dn, t_params, contexts)
    b = _argmaxes(cfg, n_ctx, ctx_len, dn, d_params, contexts)
    return float(jnp.mean((a[:, skip:] == b[:, skip:]).astype(jnp.float32)))


def maybe_quantize_draft(d_params, tiny):
    """Optional INT4 draft tier (BENCH_INT4_DRAFT=1). OFF by default for
    this benchmark: random weights have no outlier structure, so groupwise
    4-bit noise collapses the calibrated argmax agreement (measured 0.56 ->
    0.10) in a way real trained checkpoints do not exhibit — the kernel
    itself is validated separately (tests/test_int4_quant.py and the
    on-chip parity check in ops/pallas/int4_matmul.py)."""
    if tiny or os.environ.get("BENCH_INT4_DRAFT") != "1":
        return d_params, False
    from duodecoding_tpu.models.quant import quantize_params

    return quantize_params(d_params, group_size=128), True


def measure_accept_rate(cfg, t_params, d_params, gamma, dtype, tiny):
    """Ground truth: accepted/drafted from an actual short SD run (per-
    position agreement compounds geometrically over the draft window, so
    static agreement badly overpredicts the SD accept rate)."""
    from duodecoding_tpu.engine.loops import prefill, sd_generate
    from duodecoding_tpu.engine.sampling_config import SamplingConfig
    from duodecoding_tpu.models import init_cache

    S = 128 if tiny else 256
    L = 16 if tiny else 48
    gen = 24 if tiny else 96
    prompt = jax.random.randint(jax.random.PRNGKey(5), (1, L), 1, cfg.vocab_size)
    tokens = jnp.zeros((1, S), jnp.int32).at[:, :L].set(prompt.astype(jnp.int32))
    d_cache = init_cache(cfg, 1, S, dtype)
    t_cache = init_cache(cfg, 1, S, dtype)
    d_cache = prefill(d_params, cfg, d_cache, tokens[:, :L])
    t_cache = prefill(t_params, cfg, t_cache, tokens[:, :L])
    _, _, rec, iters, d_steps, _ = sd_generate(
        d_params,
        t_params,
        tokens,
        jnp.int32(L),
        d_cache,
        t_cache,
        jax.random.PRNGKey(6),
        draft_cfg=cfg,
        target_cfg=cfg,
        gamma=gamma,
        draft_sampling=SamplingConfig(0.0),
        target_sampling=SamplingConfig(0.0),
        max_new_tokens=gen,
    )
    it = int(iters)
    import numpy as _np

    acc = _np.asarray(rec.accepted[:it]).sum()
    drafted = _np.asarray(rec.actual_gamma[:it]).sum()
    return float(acc) / max(float(drafted), 1.0)


def calibrate_draft(cfg, t_params, target_accept, dtype, tiny=False, gamma=4):
    """Bisection on noise scale until the MEASURED SD accept rate matches."""
    lo, hi = 0.0, 0.25
    best = None
    for it in range(8):
        sigma = (lo + hi) / 2
        d_params = perturb(t_params, sigma, jax.random.PRNGKey(7))
        acc = measure_accept_rate(cfg, t_params, d_params, gamma, dtype, tiny)
        log(f"[bench] calibrate sigma={sigma:.4f} sd-accept={acc:.3f}")
        if best is None or abs(acc - target_accept) < abs(best[1] - target_accept):
            best = (d_params, acc, sigma)
        if abs(acc - target_accept) < 0.02:
            break
        if acc > target_accept:
            lo = sigma
        else:
            hi = sigma
    return best


def main():
    tiny = os.environ.get("BENCH_TINY") == "1"
    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.models import init_random_params, resolve_config

    model_name = "test-tiny-deep" if tiny else "tiny-llama-1.1b"
    dtype = jnp.float32 if tiny else jnp.bfloat16
    max_new = 16 if tiny else MAX_NEW_TOKENS
    n_prompts = 2 if tiny else N_PROMPTS

    cfg_m = resolve_config(model_name)
    log(f"[bench] building target {cfg_m.name} ({cfg_m.num_params/1e6:.0f}M params)")
    t_params = init_random_params(cfg_m, jax.random.PRNGKey(0), dtype)

    d_params, agr, sigma = calibrate_draft(cfg_m, t_params, TARGET_ACCEPT, dtype, tiny)
    log(f"[bench] draft calibrated: sigma={sigma:.4f} sd-accept={agr:.3f}")
    d_params, int4_draft = maybe_quantize_draft(d_params, tiny)
    if int4_draft:
        log("[bench] draft quantized to INT4 (groupwise, Pallas fused kernel)")

    # int8 KV also opt-in for the same random-weight-sensitivity reason
    int8_kv = (not tiny) and os.environ.get("BENCH_INT8_KV") == "1"
    if int8_kv:
        log("[bench] target KV cache: INT8 (per-position scales)")
    ec = EngineConfig(
        max_tokens=max_new,
        gamma=4,
        temperature=0.0,
        transfer_top_k=1024,
        edge_cloud_bandwidth=23.6,
        edge_end_bandwidth=563.0,
        ntt_ms_edge_cloud=10.0,
        ntt_ms_edge_end=0.0,
        use_stochastic_comm=True,
        max_seq_len=512 if not tiny else 128,
        param_dtype=dtype,
        cache_dtype=dtype,
        int8_kv_target=int8_kv,
    )
    engine = Engine(
        target=Tier(cfg_m, t_params), draft=Tier(cfg_m, d_params), config=ec
    )

    rng = np.random.default_rng(0)
    prompt_len = 24 if tiny else PROMPT_LEN
    prompts = rng.integers(1, cfg_m.vocab_size, (n_prompts + 1, prompt_len))

    # warmup (compile)
    t0 = time.time()
    engine.run("dist_split_spec", prompts[0:1][0][None, :], transfer_top_k=1024)
    log(f"[bench] warmup/compile {time.time() - t0:.1f}s")

    total_tokens = 0
    total_wall = 0.0
    accept_rates = []
    for i in range(n_prompts):
        out, m = engine.run(
            "dist_split_spec", prompts[i + 1][None, :], transfer_top_k=1024
        )
        total_tokens += m["generated_tokens"]
        total_wall += m["wall_time"]
        acc = m["draft_accepted_tokens"] / max(m["draft_generated_tokens"], 1)
        accept_rates.append(acc)
        log(
            f"[bench] prompt {i}: {m['generated_tokens']} tok, "
            f"wall {m['wall_time']:.2f}s (comm {m['communication_time']:.2f}s), "
            f"accept {acc:.3f}, {m['throughput']:.2f} tok/s"
        )

    tps = total_tokens / total_wall if total_wall > 0 else 0.0
    log(
        f"[bench] total: {total_tokens} tokens in {total_wall:.2f}s, "
        f"mean accept {np.mean(accept_rates):.3f}"
    )
    print(
        json.dumps(
            {
                "metric": "dist_split_spec tokens/s (accept-rate-matched pair, "
                "23.6 Mbps stochastic edge-cloud, temp 0, 128 new tokens)",
                "value": round(tps, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tps / BASELINE_TPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
