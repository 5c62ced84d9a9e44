"""Benchmark: 13B-class speculative decoding speedup vs own AR on TPU.

Round-2 headline (BASELINE.json north star): tokens/s at a 13B target and
speedup vs the framework's OWN autoregressive baseline measured on the
same chip, with the flagship bit-widths in the measured path — INT4
weight-only model (groupwise, fused Pallas dequant+matmul) and INT8 KV
cache — plus speed-of-light accounting.

Pair construction (no checkpoints in this sandbox — zero egress): the
target is a random-weight llama-2-13b-architecture model initialised
directly in packed INT4 (a bf16 13B would not fit one v5e's 16 GB HBM);
the draft is a 3-of-40-layer prefix slice of the target (0.075x cost,
matching the reference's TinyVicuna-1B/13B = 0.077 ratio), and a single
residual-scale knob is bisected — ON the full final measurement — until
the MEASURED decode-time SD accept rate matches the baseline row's 56.2%
(BASELINE.md row 1; see models/surgery.py for why this mirrors real
pairs). AR throughput is architecture-determined, so the AR baseline is
unaffected by the calibration.

Also measured (stderr + BENCH_DETAILS.json): the round-1 regime —
dist_split_spec with comm simulation at the baseline row's shapes
(Qwen1.5-1.8B-architecture target, INT4 7-of-24-layer slice draft at
~0.29x cost = the reference pair's 0.5/1.8 ratio) vs the reference's
17.07 tok/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr. BENCH_TINY=1 runs a miniature CPU-sized variant.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

TARGET_ACCEPT = 0.562  # BASELINE.md row 1 measured target-accept
SPEEDUP_GOAL = 2.5  # BASELINE.json north star vs own AR at 13B
DSSD_BASELINE_TPS = 17.07  # BASELINE.md row 1 (dist_split_spec 0.5B->1.8B)
MAX_NEW_TOKENS = 256  # part A generation length (amortizes prefill/dispatch
# like the reference's MT-Bench regime; part B keeps the row's 128)
MAX_NEW_TOKENS_B = 128
PROMPT_LEN = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_engine(cfg_t, t_params, cfg_d, d_params, *, gamma, max_tokens,
                max_seq_len, int8_kv, comm=False):
    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier

    ec = EngineConfig(
        max_tokens=max_tokens,
        gamma=gamma,
        temperature=0.0,
        transfer_top_k=1024,
        edge_cloud_bandwidth=23.6,
        edge_end_bandwidth=563.0,
        ntt_ms_edge_cloud=10.0,
        ntt_ms_edge_end=0.0,
        use_stochastic_comm=comm,
        max_seq_len=max_seq_len,
        param_dtype=jnp.bfloat16,
        cache_dtype=jnp.bfloat16,
        int8_kv_target=int8_kv,
    )
    return Engine(
        target=Tier(cfg_t, t_params), draft=Tier(cfg_d, d_params), config=ec
    )


def calibrate_on_measurement(measure, *, iters=8, tol=0.04, tag="",
                             lo=1e-4, hi=0.5):
    """Log-space bisection on the residual scale where each probe IS the
    full final measurement — the reported run's accept rate is the
    calibrated one, with zero calibration-vs-measurement drift.
    ``measure(alpha) -> dict`` must contain an ``accept`` key (decreasing
    in alpha). Returns the best measurement dict. ``lo``/``hi`` may be
    warm-started: the pair is seed-deterministic, so a previously found
    bracket stays valid and saves remote-compile-bound iterations (the
    reported accept is still measured, never assumed)."""
    best = None
    for it in range(iters):
        alpha = math.sqrt(lo * hi)
        res = measure(alpha)
        acc = res["accept"]
        log(f"[bench]{tag} calibrate alpha={alpha:.5f} accept={acc:.3f}")
        if best is None or abs(acc - TARGET_ACCEPT) < abs(
            best["accept"] - TARGET_ACCEPT
        ):
            best = res
        if abs(acc - TARGET_ACCEPT) <= tol:
            break
        if acc > TARGET_ACCEPT:
            lo = alpha
        else:
            hi = alpha
    return best


DEGENERATE_ACCEPT = 0.95


def run_prompts(engine, mode, prompts, warm=None, seq=False, **kw):
    """Run ``mode`` over the prompt set; returns (tok/s, accept,
    per-prompt dict with the spread — the round-2 headline was noisy at
    exactly the pass/fail margin because accept varied 0.65-0.76 over 3
    prompts).

    SUITE-FUSED (round 5, VERDICT r4 item 1): modes with a registered
    suite runner (`large`, `sd_tree`) run the WHOLE equal-length prompt
    set as ONE device program (Engine.run_suite), paying the ~90-100 ms
    remote launch/completion floor once instead of once per prompt —
    the floor hit the short SD runs ~2.3x harder than the long AR runs
    and structurally depressed the speedup ratio. Per-prompt walls are
    the measured suite wall attributed by loop-iteration share, so they
    sum to the suite wall and the aggregation below is unchanged.
    ``seq=True`` forces the old sequential per-run path (the fixed-cost
    diagnostic, BENCH_SEQ_DIAG); ``warm`` is a single prompt row used to
    compile the measured program shape untimed before measuring.

    DEGENERATE prompts (accept > 0.95) are excluded from the aggregates:
    random-weight models occasionally collapse a random prompt into a
    short repeating cycle the draft predicts perfectly (measured: one of
    8 prompts at accept 0.99-1.0 across every mode while the other 7 sat
    at ~0.5) — a synthetic artifact, not decoding skill. They stay listed
    in the spread (flagged) so nothing is hidden; AR throughput is
    sequence-independent either way."""
    from duodecoding_tpu.engine.registry import get_suite_runner

    fused_path = get_suite_runner(mode) is not None and not seq
    if warm is not None:
        if fused_path:
            # compile the SUITE program shape (P prompts) untimed; for a
            # dynamic-spec fallback inside run_suite this degenerates to
            # P sequential warmups (opt-in BENCH_DYN_SPECS only)
            wp = np.broadcast_to(np.asarray(warm), prompts.shape)
            engine.run_suite(mode, np.array(wp), **kw)
        else:
            engine.run(mode, np.asarray(warm)[None, :], **kw)
    if seq:
        results = [
            engine.run(mode, prompts[i][None, :], **kw)
            for i in range(prompts.shape[0])
        ]
    else:
        results = engine.run_suite(mode, prompts, **kw)
    per = []
    suite_wall = None
    for out, m in results:
        acc = (
            m["draft_accepted_tokens"] / m["draft_generated_tokens"]
            if m["draft_generated_tokens"]
            else None
        )
        per.append((m["generated_tokens"], m["wall_time"], acc))
        suite_wall = m.get("suite_wall_time", suite_wall)
    is_sd = any(a is not None for _, _, a in per)
    keep = [
        (t, w, a) for t, w, a in per
        if not (is_sd and a is not None and a > DEGENERATE_ACCEPT)
    ] or per
    toks = sum(t for t, _, _ in keep)
    wall = sum(w for _, w, _ in keep)
    accepts = [a for _, _, a in keep if a is not None]
    tps_each = [t / max(w, 1e-9) for t, w, _ in per]
    toks_all = sum(t for t, _, _ in per)
    wall_all = sum(w for _, w, _ in per)
    spread = {
        # unfiltered aggregate next to the filtered headline so the
        # 0.95-threshold sensitivity is visible in the artifact itself
        "tps_unfiltered": round(toks_all / max(wall_all, 1e-9), 2),
        "tps_per_prompt": [round(t, 2) for t in tps_each],
        "tps_sd": round(float(np.std(tps_each)), 2),
        "accept_per_prompt": [
            round(a, 3) for _, _, a in per if a is not None
        ],
        "accept_sd": round(float(np.std(accepts)), 3) if accepts else 0.0,
        "degenerate_excluded": len(per) - len(keep),
        "fused": suite_wall is not None,
    }
    if suite_wall is not None:
        spread["suite_wall_time"] = round(suite_wall, 3)
    return (
        toks / max(wall, 1e-9),
        (float(np.mean(accepts)) if accepts else 0.0),
        spread,
    )


def int4_kernel_sol(cfg, tiny):
    """Micro-benchmark the stacked layer-indexed INT4 kernel at the model's
    MLP shape under TRUE weight streaming and report the achieved fraction
    of the HBM-bandwidth roof.

    Methodology (tools/profile_kernels.py, every rule hit in round 2):
    kernels run inside a jitted lax.scan with integer-magnitude input
    perturbations and a max-reduction carry; 8 DISTINCT stacked weights
    (283 MB — exceeds VMEM) force HBM streaming (a reused weight gets
    VMEM-cached and measures above the roof); the same program is compiled
    at two outer-repeat counts and per-rep time is the difference (the
    ~27 ms remote dispatch cancels exactly — a single scan length buried
    the kernel under amortized dispatch and produced a bogus 8%-of-roof
    figure in round 2)."""
    from duodecoding_tpu.models.quant import quantize_int4
    from duodecoding_tpu.ops.pallas.int4_matmul import int4_matmul
    from duodecoding_tpu.utils.profiler import PerformanceProfiler as Profiler

    if tiny:
        return None
    K, N = cfg.hidden_size, cfg.intermediate_size
    NW = 8
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
    q = quantize_int4(w, group_size=128)
    qs = jax.tree.map(lambda a: jnp.stack([a] * NW), q)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, K), jnp.bfloat16)

    def make(outer):
        @jax.jit
        def run(x, packed, scales, zeros):
            ws = {"packed": packed, "scales": scales, "zeros": zeros}

            def outer_step(carry, j):
                def inner_step(c, i):
                    out = int4_matmul(x + (i + j).astype(x.dtype), ws, layer=i)
                    return jnp.maximum(c, jnp.max(out).astype(jnp.float32)), None

                c, _ = jax.lax.scan(inner_step, carry, jnp.arange(NW))
                return c, None

            s, _ = jax.lax.scan(outer_step, jnp.float32(-1e30), jnp.arange(outer))
            return s

        return run

    outs = {}
    # best-of-6 at each length: 3 reps showed 65-80% run-to-run swing in
    # the reported SoL fraction (remote-backend timing noise on ~100 ms
    # walls); more minima tighten the difference estimate
    for outer in (16, 64):
        run = make(outer)
        float(run(x0, qs["packed"], qs["scales"], qs["zeros"]))  # compile
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            float(run(x0, qs["packed"], qs["scales"], qs["zeros"]))
            best = min(best, time.perf_counter() - t0)
        outs[outer] = best
    med = (outs[64] - outs[16]) / ((64 - 16) * NW)
    prof = Profiler()
    bytes_accessed = K // 2 * N + 2 * 4 * (K // 128) * N + 8 * K * 2 + 8 * N * 4
    sol = prof.speed_of_light(bytes_accessed, 2 * 8 * K * N)
    return {"median_s": med, "sol_s": sol, "sol_frac": sol / med}


def part_a_13b(tiny):
    """13B-class AR vs SD on one chip, INT4 weights + INT8 KV."""
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, param_bytes, scale_residual, truncate_model,
    )
    from duodecoding_tpu.utils.profiler import PerformanceProfiler as Profiler

    name = "test-tiny-deep" if tiny else "llama-2-13b"
    cfg = resolve_config(name)
    group = 16 if tiny else 128
    # 3/40 layers = 0.075x the target's per-forward cost — matching the
    # reference pair's TinyVicuna-1B / Vicuna-13B = 1/13 ratio
    k_draft = 1 if tiny else 3
    gamma = 3 if tiny else 4
    max_new = 16 if tiny else MAX_NEW_TOKENS
    plen = 16 if tiny else PROMPT_LEN
    S = 64 if tiny else 512
    # 8 prompts: the round-2 headline on 3 prompts was noisy at exactly
    # the pass/fail margin (accept spread 0.65-0.76); runs are cheap
    # (~2 s each) next to the program compiles
    n_prompts = 1 if tiny else 8
    int8_kv = not tiny

    log(f"[bench] A: target {cfg.name} ({cfg.num_params/1e9:.1f}B params, "
        f"INT4 group={group}, INT8 KV={int8_kv}), draft = first {k_draft}/"
        f"{cfg.num_layers} layers")
    t0 = time.time()
    # fused QKV / gate-up: exact (bitwise-identical outputs — the warm
    # calibration bracket below stays valid), one kernel launch per
    # projection group
    qparams = fuse_params(init_random_quant_params(cfg, jax.random.PRNGKey(0), group))
    jax.block_until_ready(qparams["embed"])
    pbytes = param_bytes(qparams)
    log(f"[bench] A: init {time.time()-t0:.1f}s, {pbytes/1e9:.2f} GB packed")

    # BENCH_PROMPT_SEED: seed-sensitivity runs (the calibration bisects
    # accept per prompt set, so any seed is measured on equal terms)
    rng = np.random.default_rng(int(os.environ.get("BENCH_PROMPT_SEED", "0")))
    prompts = rng.integers(1, cfg.vocab_size, (n_prompts + 1, plen))

    seq_diag = os.environ.get("BENCH_SEQ_DIAG") == "1"

    def measure_sd(alpha, g=gamma, mode="sd", seq=False, **mode_kw):
        tp = scale_residual(qparams, alpha)
        dcfg, dp = truncate_model(cfg, tp, k_draft)
        eng = make_engine(cfg, tp, dcfg, dp, gamma=g, max_tokens=max_new,
                          max_seq_len=S, int8_kv=int8_kv)
        # warm=prompts[0] compiles the measured (suite) program untimed
        tps, acc, spread = run_prompts(
            eng, mode, prompts[1:], warm=prompts[0], seq=seq, **mode_kw
        )
        res = {"alpha": alpha, "tps": tps, "accept": acc, "gamma": g,
               "mode": mode, "spread": spread, **mode_kw}
        if seq:
            res["seq"] = True
        return res

    # warm bracket around the known-good region for seed 0 (alpha* ~5.2e-4
    # measured round 3 on the degeneracy-filtered 8-prompt set);
    # BENCH_ALPHA_LO/HI pin it for spec sweeps (the geometric midpoint is
    # the first probe). tol is tight: a 0.04-tolerance early-exit left the
    # pair at accept 0.525 vs the 0.562 contract and cost the tree runs
    # ~5% tok/s.
    lo = float(os.environ.get("BENCH_ALPHA_LO", 1e-4 if tiny else 2.6e-4))
    hi = float(os.environ.get("BENCH_ALPHA_HI", 0.5 if tiny else 1.05e-3))
    best = calibrate_on_measurement(
        measure_sd, iters=3 if tiny else 7, tag=" A:", lo=lo, hi=hi,
        tol=0.04 if tiny else 0.015,
    )
    alpha = best["alpha"]
    log(f"[bench] A: calibrated alpha={alpha:.5f} accept={best['accept']:.3f} "
        f"sd {best['tps']:.2f} tok/s (gamma={gamma})")
    tp = scale_residual(qparams, alpha)
    dcfg, dp = truncate_model(cfg, tp, k_draft)

    results = {}
    # AR baseline (own, on-chip, same INT4+INT8KV target; weights do not
    # affect AR throughput)
    eng = make_engine(cfg, tp, dcfg, dp, gamma=gamma, max_tokens=max_new,
                      max_seq_len=S, int8_kv=int8_kv)
    t0 = time.time()
    ar_tps, _, ar_spread = run_prompts(
        eng, "large", prompts[1:], warm=prompts[0]
    )
    log(f"[bench] A: AR {ar_tps:.2f} tok/s (warm+run {time.time()-t0:.1f}s)")
    results["ar_tps"] = ar_tps
    results["ar_spread"] = ar_spread
    if seq_diag:
        # fixed-cost diagnostic: the old per-prompt sequential path next
        # to the fused suite number (one extra remote compile)
        seq_tps, _, seq_spread = run_prompts(
            eng, "large", prompts[1:], warm=prompts[0], seq=True
        )
        results["ar_seq_diag"] = {"tps": seq_tps, "spread": seq_spread}
        log(f"[bench] A: AR sequential diagnostic {seq_tps:.2f} tok/s")

    # speed-of-light accounting for the AR decode step (weights-bound)
    prof = Profiler()
    kv_elt = 1 if int8_kv else 2
    kv_bytes = (
        2 * cfg.num_layers * S * cfg.num_kv_heads * cfg.head_dim_ * kv_elt
    )
    step_bytes = pbytes + kv_bytes
    sol_tps = 1.0 / prof.speed_of_light(step_bytes)
    results["ar_sol_tps"] = sol_tps
    results["ar_sol_frac"] = ar_tps / sol_tps
    log(f"[bench] A: AR speed-of-light {sol_tps:.1f} tok/s -> "
        f"{100*results['ar_sol_frac']:.0f}% of roof")

    # calibrated-gamma run already measured; at the SAME calibrated pair,
    # also measure the k-chain tree mode (DuoDecoding k-sequence drafting:
    # same gamma drafting cost, the fork hedges the first position) and
    # optionally a second gamma
    runs = [best]
    # branch-spec trees (engine/tree_loops.py): per-level top-k hedging
    # raises tokens-per-target-pass past the chain ceiling. Round-3
    # on-chip sweep (tools/profile_iter.py, after the budget-aware INT4
    # M-tiling): (2,2,1,1,1,1,1) is the new best — 226.5 tok/s loop at
    # 6.40 tok/iter (28.25 ms/iter) vs 215.7 for round-2's
    # (3,2,1,1,1,1,1); 4 lanes + 27 verify rows beat 6 lanes + 40 rows
    # at equal accept. Wider roots lose: (4,2,1,1,1,1,1) = 174 loop.
    # depth hedging: the best depth depends on the measured accept (deep
    # specs win when accept is high, shallow when low), so the default
    # runs one of each from the on-chip sweep at the calibrated pair
    tree_specs = (
        [(3, 2, 1, 1, 1), (2, 2, 1, 1, 1, 1, 1)]
        if not tiny
        else [(3, 1, 1)]
    )
    env_specs = os.environ.get("BENCH_TREE_SPECS")
    if env_specs:
        tree_specs = [
            tuple(int(x) for x in s.split(",") if x)
            for s in env_specs.split(";")
            if s
        ]
    elif os.environ.get("BENCH_TREE_SWEEP") == "1":
        tree_specs = [
            (3, 1, 1, 1), (4, 2, 1, 1), (4, 2, 2, 1), (4, 2, 2, 1, 1),
        ]
    for sp in tree_specs:
        runs.append(
            measure_sd(alpha, g=len(sp), mode="sd_tree", tree_spec=sp)
        )
        log(f"[bench] A: sd_tree spec={sp}: {runs[-1]['tps']:.2f} tok/s "
            f"accept={runs[-1]['accept']:.3f}")
    # DYNAMIC tree width (generate_k_seq parity, engine/tree_loops.py) is
    # opt-in (BENCH_DYN_SPECS="a;b"): measured on-chip at 13B, the
    # lax.switch iteration costs ~the SUM of the branch bodies (57 vs
    # 30 ms/iter — XLA executes both branches inside the while program),
    # so the static deep-narrow spec wins on TPU; the dynamic mode remains
    # a correctness/parity capability. Gap threshold (BENCH_DYN_GAP) is in
    # LOGIT units of the calibrated synthetic pair (~1e-2 of a real
    # pair's).
    dyn = os.environ.get("BENCH_DYN_SPECS")
    if dyn:
        gap = float(os.environ.get("BENCH_DYN_GAP", "0.006"))
        dyn_specs = [tuple(int(x) for x in s.split(",") if x)
                     for s in dyn.split(";") if s]
        runs.append(
            measure_sd(alpha, g=max(len(sp) for sp in dyn_specs),
                       mode="sd_tree", tree_spec=dyn, tree_gap=gap)
        )
        log(f"[bench] A: sd_tree dynamic [{dyn}] gap={gap}: "
            f"{runs[-1]['tps']:.2f} tok/s accept={runs[-1]['accept']:.3f}")
    if seq_diag and not tiny:
        tree_runs = [r for r in runs if r["mode"] == "sd_tree"
                     and not r.get("seq")]
        if tree_runs:
            bt = max(tree_runs, key=lambda r: r["tps"])
            runs.append(measure_sd(alpha, g=bt["gamma"], mode="sd_tree",
                                   seq=True, tree_spec=bt["tree_spec"]))
            log(f"[bench] A: sd_tree sequential diagnostic "
                f"spec={bt['tree_spec']}: {runs[-1]['tps']:.2f} tok/s")
    if not tiny and os.environ.get("BENCH_GAMMA_SWEEP") == "1":
        for g in (8,):
            runs.append(measure_sd(alpha, g=g))
            log(f"[bench] A: sd gamma={g}: {runs[-1]['tps']:.2f} tok/s "
                f"accept={runs[-1]['accept']:.3f}")
    # heterogeneous tier pipeline (parallel/hetero.py) at the same pair —
    # colocated() on one chip: no true overlap is possible (one core), so
    # this measures the device-resident pipeline protocol's overhead vs
    # the fused chain-sd while program; the split() placement is the
    # multi-chip deployment (dryrun_multichip step 3). BENCH_HETERO=1.
    if not tiny and os.environ.get("BENCH_HETERO", "1") == "1":
        from duodecoding_tpu.parallel.hetero import (
            HeteroPlacement, hetero_sd_generate,
        )

        pl_ = HeteroPlacement.colocated()
        h_toks = h_wall = h_drafted = h_acc = 0
        for i in range(1, min(4, n_prompts + 1)):
            out_h, st = hetero_sd_generate(
                pl_, dp, tp, dcfg, cfg, prompts[i][None, :], gamma=gamma,
                max_new_tokens=max_new, max_seq_len=S,
            )
            h_toks += st["generated_tokens"]
            h_wall += st["wall_time"]
            h_drafted += st["drafted"]
            h_acc += st["accepted"]
        results["hetero_tps"] = h_toks / max(h_wall, 1e-9)
        results["hetero_accept"] = h_acc / max(h_drafted, 1)
        log(f"[bench] A: hetero (colocated 1-chip) "
            f"{results['hetero_tps']:.2f} tok/s "
            f"accept={results['hetero_accept']:.3f}")

    top = max((r for r in runs if not r.get("seq")), key=lambda r: r["tps"])
    results["sd_tps"] = top["tps"]
    results["sd_gamma"] = top["gamma"]
    results["sd_accept"] = top["accept"]
    results["sd_mode"] = top["mode"] + (
        f" spec={top['tree_spec']}" if "tree_spec" in top else ""
    )
    results["sd_spread"] = top.get("spread")
    results["sd_chain_tps"] = best["tps"]
    results["sd_runs"] = [
        {k: v for k, v in r.items()} for r in runs
    ]
    results["speedup"] = top["tps"] / ar_tps if ar_tps else 0.0
    results["alpha"] = alpha
    results["param_bytes"] = pbytes

    ksol = int4_kernel_sol(cfg, tiny)
    if ksol:
        results["int4_mlp_kernel_sol_frac"] = ksol["sol_frac"]
        log(f"[bench] A: int4 kernel ({cfg.hidden_size}x"
            f"{cfg.intermediate_size}) {1e6*ksol['median_s']:.0f}us = "
            f"{100*ksol['sol_frac']:.0f}% of roof")
    log(f"[bench] A: speedup {results['speedup']:.2f}x vs own AR "
        f"(goal {SPEEDUP_GOAL}x)")
    return results


def part_b_dssd(tiny):
    """Round-1 regime at the baseline row's shapes: dist_split_spec with
    stochastic 23.6 Mbps comm, Qwen1.5-1.8B-arch target, INT4 slice draft
    (~0.29x cost = the 0.5B/1.8B ratio), INT8 KV target."""
    from duodecoding_tpu.models import init_random_params, resolve_config
    from duodecoding_tpu.models.quant import fuse_params, quantize_params
    from duodecoding_tpu.models.surgery import scale_residual, truncate_model

    name = "test-tiny-deep" if tiny else "qwen1.5-1.8b"
    cfg = resolve_config(name)
    k_draft = 1 if tiny else 7
    gamma = 3 if tiny else 4
    max_new = 16 if tiny else MAX_NEW_TOKENS_B
    plen = 16 if tiny else PROMPT_LEN
    S = 64 if tiny else 512
    n_prompts = 1 if tiny else 4
    group = 16 if tiny else 128
    int8_kv = not tiny

    log(f"[bench] B: target {cfg.name} bf16, draft = INT4 first "
        f"{k_draft}/{cfg.num_layers} layers, INT8 KV={int8_kv}")
    t_params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)

    rng = np.random.default_rng(1)
    prompts = rng.integers(1, cfg.vocab_size, (n_prompts + 1, plen))

    # calibration probes ARE the full dssd measurement, with the
    # INT4-quantized draft in the loop (post-quant accept matching — the
    # quantization error is inside the measurement)
    def measure_dssd(alpha):
        tp = scale_residual(t_params, alpha)
        dcfg, dp = truncate_model(cfg, tp, k_draft)
        dp = fuse_params(quantize_params(dp, group_size=group))
        eng = make_engine(cfg, tp, dcfg, dp, gamma=gamma, max_tokens=max_new,
                          max_seq_len=S, int8_kv=int8_kv, comm=True)
        eng.run("dist_split_spec", prompts[0][None, :], transfer_top_k=1024)
        toks = 0
        wall = comm = data = 0.0
        connects = tgt_fwd = iters = rejects = 0
        accepts = []
        for i in range(n_prompts):
            out, m = eng.run(
                "dist_split_spec", prompts[i + 1][None, :],
                transfer_top_k=1024,
            )
            toks += m["generated_tokens"]
            wall += m["wall_time"]
            comm += m["communication_time"]
            data += m["edge_cloud_data_bytes"]
            connects += m["connect_times"]["edge_cloud"]
            tgt_fwd += m["target_forward_times"]
            iters += m["loop_times"]
            rejects += sum(
                1 for r in m["draft_accept_rate_history"] if r < 1.0
            )
            accepts.append(
                m["draft_accepted_tokens"]
                / max(m["draft_generated_tokens"], 1)
            )
        return {
            "alpha": alpha,
            "tps": toks / max(wall, 1e-9),
            "accept": float(np.mean(accepts)),
            "comm_time": comm,
            "wall_time": wall,
            "tokens": toks,
            "data_bytes": data,
            "transfers": connects,
            "target_forwards": tgt_fwd,
            "iters": iters,
            "reject_iters": rejects,
        }

    # tol matches part A's contract (a 0.04-tol early exit landed round 3
    # at accept 0.592 vs the 0.562 contract, inflating dssd throughput);
    # warm bracket from the round-3 probes (0.562 lies in [0.102, 0.104])
    best = calibrate_on_measurement(
        measure_dssd, iters=3 if tiny else 10, tag=" B:",
        tol=0.04 if tiny else 0.015,
        lo=1e-4 if tiny else 0.09, hi=0.5 if tiny else 0.13,
    )
    log(f"[bench] B: dssd {best['tps']:.2f} tok/s at accept "
        f"{best['accept']:.3f} (comm {best['comm_time']:.1f}s of "
        f"{best['wall_time']:.1f}s) vs reference {DSSD_BASELINE_TPS}")

    # --- comm-schedule reconciliation vs the reference's own row ---
    # (VERDICT r4 item 3.) Reference row (experiment_results_table.md:7):
    # 20,480 tokens, comm 318.24 s, queuing 319.70 s, wall 1200.03 s,
    # edge-cloud data 7,827,776 B, 6,394 target forwards. Decomposition:
    # 7.8 MB at 23.6 Mbps is only ~2.5 s — the row's comm time is
    # NTT-DOMINATED (~31.8k transfers x 10 ms = ~318 s; ~5 transfers per
    # iteration, matching the 5-call protocol in src/baselines.py:632-718).
    # Its data column (382 B/token) therefore EXCLUDES the reject-path
    # full-vocab P(x) downlink its own protocol documents
    # (docs/baselines.md:48, src/baselines.py:694-695): at V=151936 x 2 B
    # that path alone would be ~1.2 GB =~ 410 s of transfer time,
    # exceeding the row's whole comm budget. Our row implements the
    # documented protocol faithfully (full row on reject, modes/dssd.py),
    # which is exactly the flagged ~3x per-token divergence. The row also
    # carried 50 ms/target-forward of batch_delay queuing our runs set
    # to 0. `ref_like_tps` applies the reference row's EMPIRICAL
    # accounting to our measured run — reject-row bytes excluded from
    # transfer time, 50 ms/forward queuing added — for a like-for-like
    # comparison at nominal bandwidth.
    ntt_s = 0.010  # make_engine ntt_ms_edge_cloud=10
    prob_bytes = 2
    bw_bytes = 23.6 * (1024 * 1024 / 8)  # nominal Mbps -> B/s
    ntt_time = best["transfers"] * ntt_s
    reject_row_bytes = best["reject_iters"] * cfg.vocab_size * prob_bytes
    compute_time = best["wall_time"] - best["comm_time"]
    uplink_bytes_time = max(
        best["data_bytes"] - reject_row_bytes, 0
    ) / bw_bytes
    ref_like_wall = (
        compute_time + ntt_time + uplink_bytes_time
        + 0.05 * best["target_forwards"]
    )
    toks = max(best["tokens"], 1)
    recon = {
        "bytes_per_token": best["data_bytes"] / toks,
        "transfers_per_iter": best["transfers"] / max(best["iters"], 1),
        "reject_iters": best["reject_iters"],
        "iters": best["iters"],
        "comm_ntt_time_s": ntt_time,
        "comm_bytes_time_s": best["comm_time"] - ntt_time,
        "reject_row_bytes": reject_row_bytes,
        "ref_row": {
            "bytes_per_token": 7827776 / 20480,
            "comm_s": 318.24,
            "queuing_s": 319.70,
            "implied_transfers": 318.24 / ntt_s,
            "transfers_per_iter": (318.24 / ntt_s) / 6394,
            "batch_delay_s": 319.70 / 6394,
        },
        "ref_like_tps": toks / ref_like_wall,
        "ref_like_vs_reference": (toks / ref_like_wall) / DSSD_BASELINE_TPS,
        "note": (
            "our row transfers the documented reject-path full-vocab row "
            "(docs/baselines.md:48); the reference ROW's data column "
            "excludes it (382 B/token, NTT-dominated comm) and carries "
            "50 ms/forward queuing — ref_like_tps applies that empirical "
            "accounting to our measured run"
        ),
    }
    log(f"[bench] B: recon bytes/tok {recon['bytes_per_token']:.0f} "
        f"(ref row {recon['ref_row']['bytes_per_token']:.0f}), "
        f"transfers/iter {recon['transfers_per_iter']:.2f} "
        f"(ref {recon['ref_row']['transfers_per_iter']:.2f}), "
        f"ref-like {recon['ref_like_tps']:.2f} tok/s "
        f"({recon['ref_like_vs_reference']:.3f}x ref)")
    return {
        "dssd_tps": best["tps"],
        "dssd_accept": best["accept"],
        "dssd_vs_reference": best["tps"] / DSSD_BASELINE_TPS,
        "alpha": best["alpha"],
        "reconciliation": recon,
    }


def run_smoke():
    """BENCH_SMOKE=1 — on-chip regression smoke (VERDICT r3 item 7).

    Guards the chip path between full bench runs: (1) the INT4 stacked
    kernel's fraction-of-roof at the 13B MLP shape, (2) a short sd_tree
    generation at the RECORDED calibrated alpha, both asserted within
    tolerance of the recorded BENCH_DETAILS.json numbers. Wall time is
    dominated by the two remote compiles (~1-2 min kernel, ~5-10 min
    sd_tree program — the persistent compile cache does not cover the
    remote backend), so expect ~10 min, vs 18-25 for the full bench.
    Exit code 1 on regression."""
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, scale_residual, truncate_model,
    )

    with open(os.path.join(os.path.dirname(__file__) or ".",
                           "BENCH_DETAILS.json")) as f:
        rec = json.load(f)["speedup_13b"]
    tol = float(os.environ.get("BENCH_SMOKE_TOL", "0.15"))

    cfg = resolve_config("llama-2-13b")
    qparams = fuse_params(
        init_random_quant_params(cfg, jax.random.PRNGKey(0), 128)
    )
    jax.block_until_ready(qparams["embed"])

    checks = {}
    ksol = int4_kernel_sol(cfg, tiny=False)
    rec_sol = rec.get("int4_mlp_kernel_sol_frac")
    checks["int4_kernel_sol_frac"] = {
        "value": ksol["sol_frac"], "recorded": rec_sol,
        "ok": bool(rec_sol and ksol["sol_frac"] >= rec_sol * (1 - tol)),
    }
    log(f"[smoke] int4 kernel {100*ksol['sol_frac']:.0f}% of roof "
        f"(recorded {100*(rec_sol or 0):.0f}%)")

    alpha = rec["alpha"]
    tp = scale_residual(qparams, alpha)
    dcfg, dp = truncate_model(cfg, tp, 3)
    eng = make_engine(cfg, tp, dcfg, dp, gamma=7, max_tokens=128,
                      max_seq_len=512, int8_kv=True)
    spec = (2, 2, 1, 1, 1, 1, 1)
    rng = np.random.default_rng(0)
    prompts = rng.integers(1, cfg.vocab_size, (3, PROMPT_LEN))
    t0 = time.time()
    tps, acc, _ = run_prompts(
        eng, "sd_tree", prompts[1:], warm=prompts[0], tree_spec=spec
    )
    log(f"[smoke] sd_tree warm+run {time.time()-t0:.0f}s")
    # recorded per-prompt numbers are at max_new=256; the 128-token smoke
    # pays the fixed cost over half the tokens, so compare against a
    # fixed-cost-adjusted floor rather than the raw recorded tok/s
    rec_tps = rec.get("sd_tps", 0.0)
    floor = rec_tps * (1 - tol) / (1 + rec_tps * 0.1 / 128)
    checks["sd_tree_tps"] = {
        "value": tps, "accept": acc, "recorded": rec_tps,
        "floor": floor, "ok": bool(tps >= floor),
    }
    log(f"[smoke] sd_tree {tps:.1f} tok/s accept={acc:.3f} "
        f"(recorded {rec_tps:.1f}, floor {floor:.1f})")

    ok = all(c["ok"] for c in checks.values())
    print(json.dumps({
        "metric": "on-chip smoke (int4 kernel roof + short sd_tree)",
        "value": 1.0 if ok else 0.0,
        "unit": "pass",
        "vs_baseline": 1.0 if ok else 0.0,
        "checks": checks,
    }))
    if not ok:
        sys.exit(1)


def main():
    tiny = os.environ.get("BENCH_TINY") == "1"
    # flash decode self-gates: the stacked kernel engages only for B>=2
    # forwards (tree-draft lanes — where the dense einsum measured ~5x raw
    # cache bandwidth), so B=1 chain/nested modes keep their proven dense
    # path and compile times (models/transformer.py gating)
    # persistent compilation cache: the 13B nested decode programs cost
    # minutes each on the remote compiler; cache them across runs
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/.cache/jax_comp"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    if tiny:
        # CPU smoke variant (the sandbox force-registers the remote TPU
        # backend; only an explicit config update overrides it)
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("BENCH_SMOKE") == "1":
        run_smoke()
        return
    details = {"tiny": tiny}

    if os.environ.get("BENCH_SKIP_13B") != "1":
        details["speedup_13b"] = part_a_13b(tiny)
    if os.environ.get("BENCH_SKIP_DSSD") != "1":
        details["dssd_baseline_row"] = part_b_dssd(tiny)

    # tiny (CPU smoke) runs write a SEPARATE file: a smoke must never
    # clobber the real on-chip artifact. Real runs MERGE into the existing
    # file so rows produced by side benches (serving_13b from
    # tools/serving_bench.py) survive a re-run of this script.
    name = "BENCH_DETAILS_TINY.json" if tiny else "BENCH_DETAILS.json"
    path = os.path.join(os.path.dirname(__file__) or ".", name)
    # provenance: stamp each section with the producing commit + time so
    # merged artifacts can't silently mix results from different code
    try:
        import subprocess
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(__file__) or ".",
        ).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"
    prov = {
        k: {"commit": commit, "time": time.strftime("%Y-%m-%dT%H:%M:%S")}
        for k in details if k != "tiny"
    }
    if not tiny and os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
        prov = {**merged.get("provenance", {}), **prov}
        merged.update(details)
        details = merged
    details["provenance"] = prov
    with open(path, "w") as f:
        json.dump(details, f, indent=2)

    a = details.get("speedup_13b")
    if a:
        speedup = a["speedup"]
        print(json.dumps({
            "metric": (
                "13B-class SD speedup vs own AR on 1 chip "
                f"(llama-2-13b arch INT4+INT8KV, accept-matched "
                f"{TARGET_ACCEPT}, suite-fused prompt-set runs (one "
                f"device program per mode), {a['sd_mode']} "
                f"gamma={a['sd_gamma']}; "
                f"AR {a['ar_tps']:.1f} tok/s at "
                f"{100*a['ar_sol_frac']:.0f}% of HBM roof, "
                f"SD {a['sd_tps']:.1f} tok/s; goal >= {SPEEDUP_GOAL}x)"
            ),
            "value": round(speedup, 3),
            "unit": "x vs own AR",
            "vs_baseline": round(speedup / SPEEDUP_GOAL, 3),
        }))
    else:
        b = details["dssd_baseline_row"]
        print(json.dumps({
            "metric": "dist_split_spec tokens/s (baseline row regime)",
            "value": round(b["dssd_tps"], 2),
            "unit": "tokens/s",
            "vs_baseline": round(b["dssd_vs_reference"], 3),
        }))


if __name__ == "__main__":
    main()
