"""Additive stage decomposition of the 13B tree-serving iteration.

VERDICT r3 #3: tree serving iterates at ~99 ms vs the engine loop's
~28 ms, and the round-3 DUODEC_SERVE_PROBE stage-SKIP bisection left a
~30 ms "non-additive" residue — but skip-based bisection measures
iteration-minus-stage under DCE, which can silently remove shared
subcomputations and misattribute cost. This probe measures each stage
STANDALONE (the same code objects production runs: serving/batched.py
``_draft_tree`` / ``_tree_verify_commit``), inside one device-resident
while-loop per stage with constant per-iteration work:

- full:    _spec_tree_core with n/lengths reset per iteration
- draft:   _draft_tree only (catch-up + gamma-1 fork forwards)
- verify:  _tree_verify_commit on fixed chains (verify fwd + walk +
           commit + relocation + EOS)
- ver_fwd: ONLY the batched tree-attention target forward
- dr_fwd:  ONE 16-row single-token draft forward
- reloc:   ONLY the per-slot winning-row relocation gathers/scatters

Timing rules (CLAUDE.md micro-bench traps): while-loop bound passed as
an ARGUMENT (one compile per stage, two loop lengths), per-iteration
integer-magnitude perturbation of the token inputs, outputs folded into
a max carry, one float() host fetch.

Usage: python tools/serving_stage_probe.py [stage ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

S = 512
SPEC = (2, 2, 1, 1, 1)
SLOTS = 4
P0 = 100  # tokens already in every slot
ALPHA = 5.2e-4


def main():
    import jax
    import jax.numpy as jnp

    from duodecoding_tpu.engine.tree_loops import spec_layout
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, scale_residual, truncate_model,
    )
    from duodecoding_tpu.models.transformer import forward
    from duodecoding_tpu.serving.batched import (
        _draft_tree, _spec_tree_core, _tree_verify_commit,
        init_batched_cache,
    )

    stages = sys.argv[1:] or ["full", "draft", "verify", "ver_fwd",
                              "dr_fwd", "reloc"]
    tiny = os.environ.get("PROBE_TINY") == "1"
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    cfg = resolve_config("test-tiny" if tiny else "llama-2-13b")
    qparams = fuse_params(
        init_random_quant_params(cfg, jax.random.PRNGKey(0),
                                 32 if tiny else 128)
    )
    jax.block_until_ready(qparams["embed"])
    tp = scale_residual(qparams, ALPHA)
    dcfg, dp = truncate_model(cfg, tp, 2 if tiny else 3)

    gamma = len(SPEC)
    lanes = int(np.prod(SPEC))
    lay = spec_layout(SPEC)
    T = int(lay.offsets.shape[0])
    B = SLOTS

    rng = np.random.default_rng(0)
    token_buf = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (B, S)), jnp.int32
    )
    n0 = jnp.full((B,), P0, jnp.int32)
    active = jnp.ones((B,), bool)
    lane_active = jnp.repeat(active, lanes)
    t_cache = init_batched_cache(cfg, B, S, jnp.bfloat16, quantized=True)
    t_cache = t_cache._replace(length=n0 - 1)
    d_cache = init_batched_cache(dcfg, B * lanes, S, jnp.bfloat16)
    d_cache = d_cache._replace(length=jnp.repeat(n0, lanes) - 1)
    chains0 = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (B, lanes, gamma)), jnp.int32
    )
    vv = cfg.vocab_size

    def reset_t(tc):
        return tc._replace(length=n0 - 1)

    def reset_d(dc):
        return dc._replace(length=jnp.repeat(n0, lanes) - 1)

    def perturb(buf, i):
        return jnp.where(
            jnp.arange(S)[None, :] < P0,
            (buf + i) % (vv - 2) + 1,
            buf,
        )

    # stage bodies: (params, carry caches..., i) -> (new caches..., sink).
    # dp/tp ride through as ARGUMENTS — closing over 13B params bakes
    # them into the program as constants (the round-2 compile trap).
    def body_full(dp, tp, tb, dc, tc, i):
        tb2, n2, dc, tc, e, a, d, f = _spec_tree_core(
            dp, tp, perturb(tb, i), n0, dc, tc, active,
            draft_cfg=dcfg, target_cfg=cfg, spec=SPEC, eos_ids=(),
        )
        return reset_d(dc), reset_t(tc), jnp.max(n2).astype(jnp.float32)

    def body_draft(dp, tp, tb, dc, tc, i):
        chains, dc = _draft_tree(
            dp, perturb(tb, i), n0, dc, lane_active,
            draft_cfg=dcfg, spec=SPEC, verify_vocab=vv,
        )
        return reset_d(dc), tc, jnp.max(chains).astype(jnp.float32)

    def body_verify(dp, tp, tb, dc, tc, i):
        tb2, n2, dc, tc, e, a, d, f = _tree_verify_commit(
            tp, perturb(tb, i), n0, dc, tc, active,
            (chains0 + i) % vv,
            target_cfg=cfg, spec=SPEC, eos_ids=(), verify_vocab=vv,
        )
        return reset_d(dc), reset_t(tc), jnp.max(n2).astype(jnp.float32)

    def body_ver_fwd(dp, tp, tb, dc, tc, i):
        ver_in = (chains0[:, 0, :] + i) % vv  # [B, gamma]
        ver_in = jnp.concatenate(
            [ver_in, (ver_in * 3 + 1) % vv], axis=1
        )[:, :T]
        pad = T - ver_in.shape[1]
        if pad > 0:
            ver_in = jnp.concatenate(
                [ver_in, jnp.broadcast_to(ver_in[:, :1], (B, pad))], axis=1
            )
        lg, tc = forward(
            tp, cfg, ver_in, tc,
            position_offsets=jnp.asarray(lay.offsets),
            window_mask=jnp.asarray(lay.mask),
            active=active,
        )
        return dc, reset_t(tc), jnp.max(lg[:, -1, :8]).astype(jnp.float32)

    def body_dr_fwd(dp, tp, tb, dc, tc, i):
        toks = ((chains0[:, :, 0] + i) % vv).reshape(B * lanes, 1)
        lg, dc = forward(dp, dcfg, toks, dc, active=lane_active)
        return reset_d(dc), tc, jnp.max(lg[:, -1, :8]).astype(jnp.float32)

    def body_reloc(dp, tp, tb, dc, tc, i):
        start = n0 - 1
        perm = (
            jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
            + i
        ) % T

        def move_row(a, st, pm):
            win = jax.lax.dynamic_slice_in_dim(a, st, T, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(
                a, jnp.take(win, pm, axis=1), st, axis=1
            )

        kw = {}
        for f in tc._fields:
            if f == "length":
                continue
            kw[f] = jax.vmap(move_row, in_axes=(1, 0, 0), out_axes=1)(
                getattr(tc, f), start, perm
            )
        tc = tc._replace(**kw)
        return dc, tc, jnp.sum(tc.length).astype(jnp.float32)

    bodies = {
        "full": body_full, "draft": body_draft, "verify": body_verify,
        "ver_fwd": body_ver_fwd, "dr_fwd": body_dr_fwd, "reloc": body_reloc,
    }

    res = {}
    for name in stages:
        stage = bodies[name]

        @jax.jit
        def prog(dp_, tp_, tb, dc, tc, steps, stage=stage):
            def body(c):
                dc, tc, sink, i = c
                dc, tc, s = stage(dp_, tp_, tb, dc, tc, i)
                return dc, tc, jnp.maximum(sink, s), i + 1

            def cond(c):
                return c[-1] < steps

            dc, tc, sink, _ = jax.lax.while_loop(
                cond, body, (dc, tc, jnp.float32(-1e30), jnp.int32(0))
            )
            return sink

        t0 = time.time()
        outs = {}
        for steps in (4, 24):
            float(prog(dp, tp, token_buf, d_cache, t_cache,
                       jnp.int32(steps)))
            best = float("inf")
            for _ in range(4):
                t1 = time.perf_counter()
                float(prog(dp, tp, token_buf, d_cache, t_cache,
                           jnp.int32(steps)))
                best = min(best, time.perf_counter() - t1)
            outs[steps] = best
        ms = 1e3 * (outs[24] - outs[4]) / 20
        res[name] = round(ms, 3)
        print(
            f"[stage] {name}: {ms:.2f} ms/iter "
            f"(compile+run {time.time()-t0:.0f}s)",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
