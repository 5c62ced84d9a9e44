"""On-chip kernel profiling with dispatch-overhead cancellation.

The remote TPU backend costs ~27 ms per dispatch round-trip, so per-call
timing is useless and even a REPS=50 scan buries a ~40 us kernel under
~540 us/rep of amortized dispatch (this exact artifact produced the bogus
8.5%-of-roof INT4 number in round 2). Method here:

- each variant runs inside ONE jitted ``lax.scan`` with an
  integer-magnitude input perturbation per iteration (sub-eps perturbations
  CSE the loop away) and a max-reduction carry (sum lets XLA factor the
  matmul out of the loop);
- the same program is compiled at two scan lengths (R1 < R2) and per-rep
  time = (t(R2) - t(R1)) / (R2 - R1) — dispatch, transfer and any other
  REPS-independent overhead cancels exactly;
- the carry is fetched with ``float(...)`` (a real host transfer;
  block_until_ready has been observed not to wait for device-resident
  scans on this backend).

Usage: python tools/profile_kernels.py [mlp|attn|step|all]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from duodecoding_tpu.utils.profiler import PerformanceProfiler

R1, R2 = 128, 640


def timed_scan(build_step, x0, r):
    """build_step(x, i) -> array; scan r times with max carry."""

    @jax.jit
    def run(x):
        def step(carry, i):
            out = build_step(x, i)
            return jnp.maximum(carry, jnp.max(out).astype(jnp.float32)), None

        s, _ = jax.lax.scan(step, jnp.float32(-1e30), jnp.arange(r))
        return s

    return run


def per_rep_seconds(build_step, x0, label=""):
    outs = {}
    for r in (R1, R2):
        run = timed_scan(build_step, x0, r)
        t0 = time.perf_counter()
        float(run(x0))  # compile + first run
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        outs[r] = best
        print(f"  [{label}] R={r}: compile {compile_s:.1f}s, best {best*1e3:.2f}ms",
              file=sys.stderr, flush=True)
    return (outs[R2] - outs[R1]) / (R2 - R1)


def profile_mlp(M=8, K=5120, N=13824, group=128, only_streamed=False):
    from duodecoding_tpu.models.quant import int4_matmul_reference, quantize_int4
    from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul

    prof = PerformanceProfiler()
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
    q = quantize_int4(w, group_size=group)
    wb = w.astype(jnp.bfloat16)
    w8 = jnp.round(w / 0.02 * 4).astype(jnp.int8)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    x8 = jnp.round(
        jax.random.normal(jax.random.PRNGKey(1), (M, K)) * 4
    ).astype(jnp.int8)

    int4_bytes = K // 2 * N + 2 * 4 * (K // group) * N + M * K * 2 + M * N * 4
    bf16_bytes = K * N * 2 + M * K * 2 + M * N * 4
    int8_bytes = K * N + M * K + M * N * 4
    flops = 2 * M * K * N

    rows = []

    def add(name, per_rep, bytes_):
        sol = prof.speed_of_light(bytes_, flops)
        rows.append((name, per_rep * 1e6, sol * 1e6, sol / per_rep))

    if not only_streamed:
        t = per_rep_seconds(
            lambda x, i: int4_matmul(x + i.astype(jnp.bfloat16), q, fused=False),
            x0, "int4 per-group")
        add("int4 per-group", t, int4_bytes)
        t = per_rep_seconds(
            lambda x, i: int4_matmul(x + i.astype(jnp.bfloat16), q, fused=True),
            x0, "int4 fused")
        add("int4 fused", t, int4_bytes)
        t = per_rep_seconds(
            lambda x, i: int4_matmul_reference(x + i.astype(jnp.bfloat16), q),
            x0, "int4 xla-ref")
        add("int4 xla-ref", t, int4_bytes)
        t = per_rep_seconds(
            lambda x, i: jnp.dot(x + i.astype(jnp.bfloat16), wb,
                                 preferred_element_type=jnp.float32),
            x0, "bf16 dense")
        add("bf16 dense", t, bf16_bytes)
        t = per_rep_seconds(
            lambda x, i: jnp.dot(x + i.astype(jnp.int8), w8,
                                 preferred_element_type=jnp.int32),
            x8, "int8xint8")
        add("int8xint8", t, int8_bytes)

    # streamed variants: a reused weight can be VMEM-cached across scan
    # iterations (the bf16 row above beats its own HBM roof!), which is not
    # what the model does — each layer streams DIFFERENT weights. Stack 8
    # distinct weights (283 MB int4 — exceeds VMEM) and scan them as xs
    # inside an outer repeat loop to force true HBM streaming.
    NW = 8

    def streamed_per_rep(build, ws, x, label):
        def make(outer):
            @jax.jit
            def run(x, ws):
                def outer_step(carry, j):
                    def inner_step(c, xs):
                        w, i = xs
                        out = build(x + (i + j).astype(x.dtype), w)
                        return (
                            jnp.maximum(c, jnp.max(out).astype(jnp.float32)),
                            None,
                        )

                    c, _ = jax.lax.scan(
                        inner_step, carry, (ws, jnp.arange(NW))
                    )
                    return c, None

                s, _ = jax.lax.scan(
                    outer_step, jnp.float32(-1e30), jnp.arange(outer)
                )
                return s

            return run

        outs = {}
        for outer in (16, 64):
            run = make(outer)
            t0 = time.perf_counter()
            float(run(x, ws))
            compile_s = time.perf_counter() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(x, ws))
                best = min(best, time.perf_counter() - t0)
            outs[outer] = best
            print(f"  [{label}] outer={outer}: compile {compile_s:.1f}s, "
                  f"best {best*1e3:.2f}ms", file=sys.stderr, flush=True)
        return (outs[64] - outs[16]) / ((64 - 16) * NW)

    qs = jax.tree.map(lambda a: jnp.stack([a] * NW), q)
    t = streamed_per_rep(
        lambda x, w: int4_matmul(x, w, fused=False), qs, x0, "int4 pg streamed"
    )
    add("int4 pg streamed", t, int4_bytes)

    # layer-indexed stacked kernel: the scan passes an INDEX, the kernel
    # reads the layer's blocks straight from the whole stacked buffer
    def stacked_per_rep(label):
        def make(outer):
            @jax.jit
            def run(x, ws):
                def outer_step(carry, j):
                    def inner_step(c, i):
                        out = int4_matmul(
                            x + (i + j).astype(x.dtype), ws, layer=i
                        )
                        return (
                            jnp.maximum(c, jnp.max(out).astype(jnp.float32)),
                            None,
                        )

                    c, _ = jax.lax.scan(inner_step, carry, jnp.arange(NW))
                    return c, None

                s, _ = jax.lax.scan(
                    outer_step, jnp.float32(-1e30), jnp.arange(outer)
                )
                return s

            return run

        outs = {}
        for outer in (16, 64):
            run = make(outer)
            t0 = time.perf_counter()
            float(run(x0, qs))
            compile_s = time.perf_counter() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(x0, qs))
                best = min(best, time.perf_counter() - t0)
            outs[outer] = best
            print(f"  [{label}] outer={outer}: compile {compile_s:.1f}s, "
                  f"best {best*1e3:.2f}ms", file=sys.stderr, flush=True)
        return (outs[64] - outs[16]) / ((64 - 16) * NW)

    add("int4 stacked idx", stacked_per_rep("int4 stacked idx"), int4_bytes)
    wbs = jnp.stack([wb] * NW)
    t = streamed_per_rep(
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32),
        wbs, x0, "bf16 streamed",
    )
    add("bf16 streamed", t, bf16_bytes)

    print(f"\nMLP matmul M={M} K={K} N={N} (flops {flops/1e9:.2f}G)")
    print(f"{'variant':18s} {'us':>9s} {'SoL us':>9s} {'SoL frac':>9s}")
    for name, us, sol_us, frac in rows:
        print(f"{name:18s} {us:9.1f} {sol_us:9.1f} {frac:9.2%}")
    return rows


def profile_step():
    """Full 13B AR decode step (T=1) per-rep cost vs the 9.5 ms SoL."""
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.kv_quant import init_quant_cache
    from duodecoding_tpu.models.surgery import init_random_quant_params, param_bytes
    from duodecoding_tpu.models.transformer import forward, set_cache_length

    cfg = resolve_config("llama-2-13b")
    S = 256
    params = init_random_quant_params(cfg, jax.random.PRNGKey(0), 128)
    jax.block_until_ready(params["embed"])
    pbytes = param_bytes(params)
    cache0 = init_quant_cache(cfg, 1, S)
    prof = PerformanceProfiler()

    for r in (4, 16):
        @jax.jit
        def run(params, cache):
            def step(carry, i):
                tok, cache = carry
                logits, cache = forward(
                    params, cfg, tok, set_cache_length(cache, 64 + (i % 8)))
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                return (nxt[:, None], cache), None

            (tok, cache), _ = jax.lax.scan(
                step, (jnp.ones((1, 1), jnp.int32), cache), jnp.arange(r))
            return tok

        t0 = time.perf_counter()
        out = run(params, cache0)
        float(out[0, 0])
        print(f"  [ar step] R={r}: compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, cache0)[0, 0])
            best = min(best, time.perf_counter() - t0)
        if r == 4:
            t_lo = best
        else:
            t_hi = best
    per = (t_hi - t_lo) / 12
    sol = prof.speed_of_light(pbytes)
    print(f"\nAR decode step (13B, INT4+INT8KV, S=256): {per*1e3:.2f} ms "
          f"(SoL {sol*1e3:.2f} ms -> {sol/per:.1%} of roof)")


def profile_sd_parts():
    """Decompose the SD iteration: draft-slice T=1 step, draft T=2
    catch-up, target verify T=5 step — each in a scan, difference-timed."""
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.kv_quant import init_quant_cache
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, truncate_model,
    )
    from duodecoding_tpu.models.transformer import (
        forward, init_cache, set_cache_length,
    )

    cfg = resolve_config("llama-2-13b")
    S = 256
    params = init_random_quant_params(cfg, jax.random.PRNGKey(0), 128)
    jax.block_until_ready(params["embed"])
    dcfg, dparams = truncate_model(cfg, params, 3)

    def step_time(pp, cc, cache0, T, label, B=1):
        for r in (4, 16):
            @jax.jit
            def run(pp, cache):
                def step(carry, i):
                    tok, cache = carry
                    logits, cache = forward(
                        pp, cc, tok, set_cache_length(cache, 64 + (i % 8)))
                    nxt = jnp.argmax(
                        logits[:, -1:, :], axis=-1).astype(jnp.int32)
                    return (jnp.broadcast_to(nxt, (B, T)), cache), None

                (tok, cache), _ = jax.lax.scan(
                    step, (jnp.ones((B, T), jnp.int32), cache),
                    jnp.arange(r))
                return tok

            t0 = time.perf_counter()
            float(run(pp, cache0)[0, 0])
            c = time.perf_counter() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(pp, cache0)[0, 0])
                best = min(best, time.perf_counter() - t0)
            print(f"  [{label}] R={r}: compile {c:.1f}s best {best*1e3:.2f}ms",
                  file=sys.stderr, flush=True)
            if r == 4:
                lo = best
            else:
                hi = best
        per = (hi - lo) / 12
        print(f"{label}: {per*1e3:.2f} ms/step")
        return per

    d_cache = init_cache(dcfg, 1, S)
    step_time(dparams, dcfg, d_cache, 1, "draft T=1")
    step_time(dparams, dcfg, d_cache, 2, "draft T=2 catchup")
    d_cache2 = init_cache(dcfg, 2, S)
    step_time(dparams, dcfg, d_cache2, 1, "draft T=1 B=2", B=2)
    t_cache = init_quant_cache(cfg, 1, S)
    step_time(params, cfg, t_cache, 5, "verify T=5 int8kv")

    # tree-mask verify (dense path, window_mask + position_offsets)
    from duodecoding_tpu.engine.tree_loops import tree_layout
    offs, msk = tree_layout(3, 4)
    T = len(offs)

    for r in (4, 16):
        @jax.jit
        def run_tree(pp, cache):
            def step(carry, i):
                tok, cache = carry
                logits, cache = forward(
                    pp, cfg, tok, set_cache_length(cache, 64 + (i % 8)),
                    position_offsets=jnp.asarray(offs),
                    window_mask=jnp.asarray(msk),
                )
                nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
                return (jnp.broadcast_to(nxt, (1, T)), cache), None

            (tok, cache), _ = jax.lax.scan(
                step, (jnp.ones((1, T), jnp.int32), cache), jnp.arange(r))
            return tok

        t0 = time.perf_counter()
        float(run_tree(params, t_cache)[0, 0])
        c = time.perf_counter() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_tree(params, t_cache)[0, 0])
            best = min(best, time.perf_counter() - t0)
        print(f"  [tree verify T={T}] R={r}: compile {c:.1f}s best "
              f"{best*1e3:.2f}ms", file=sys.stderr, flush=True)
        if r == 4:
            lo = best
        else:
            hi = best
    print(f"tree verify T={T} int8kv: {(hi-lo)/12*1e3:.2f} ms/step")

    # top_k fork + relocate micro-costs (suspects for the tree gap)
    from duodecoding_tpu.engine.tree_loops import _relocate_rows

    for name, fn, args in (
        (
            "top_k(32000, 3)",
            lambda q0, i: jax.lax.top_k(q0 + i.astype(q0.dtype), 3)[1],
            (jax.random.normal(jax.random.PRNGKey(0), (32000,), jnp.float32),),
        ),
        (
            "argmax fork x3",
            lambda q0, i: _argmax_fork(q0 + i.astype(q0.dtype), 3),
            (jax.random.normal(jax.random.PRNGKey(0), (32000,), jnp.float32),),
        ),
    ):
        for r in (16, 128):
            @jax.jit
            def run_m(x):
                def step(c, i):
                    out = fn(x, i)
                    return jnp.maximum(c, jnp.max(out).astype(jnp.float32)), None

                s, _ = jax.lax.scan(step, jnp.float32(-1e30), jnp.arange(r))
                return s

            float(run_m(*args))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_m(*args))
                best = min(best, time.perf_counter() - t0)
            if r == 16:
                lo = best
            else:
                hi = best
        print(f"{name}: {(hi-lo)/112*1e3:.3f} ms/call")

    cache0 = init_quant_cache(cfg, 1, S)
    for r in (16, 128):
        @jax.jit
        def run_rel(cache):
            def step(carry, i):
                cache = carry
                cache = _relocate_rows(cache, 100 + (i % 8), 90, 4)
                return cache, None

            cache, _ = jax.lax.scan(step, cache, jnp.arange(r))
            return cache.k

        float(run_rel(cache0)[0, 0, 0, 0, 0])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_rel(cache0)[0, 0, 0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        if r == 16:
            lo = best
        else:
            hi = best
    print(f"relocate int8 cache (4 rows): {(hi-lo)/112*1e3:.3f} ms/call")


def _argmax_fork(q0, k):
    idxs = []
    q = q0
    for _ in range(k):
        i = jnp.argmax(q)
        idxs.append(i)
        q = q.at[i].set(-jnp.inf)
    return jnp.stack(idxs)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "mlp"
    if which in ("mlp", "all"):
        profile_mlp(M=8)
        profile_mlp(M=1)
    if which == "streamed":
        profile_mlp(M=8, only_streamed=True)
    if which in ("step", "all"):
        profile_step()
    if which == "sd_parts":
        profile_sd_parts()
