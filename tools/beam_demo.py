"""sd_beam winnable demonstration (VERDICT r4 weak #4).

Round-4 measured `sd_beam` LOSING to static `sd_tree` on the bench's
calibrated 13B pair and root-caused why: that pair's draft logprob gaps
are near-degenerate, so cumulative-logprob selection goes breadth-first
while the true acceptance structure rewards deep narrow chains that the
swept static specs already encode. Nothing yet showed the dynamic tree
(reference: src/model/eagle2/cnets.py:660-800 ``topK_genrate`` beam
expansion + global top-N) winning anywhere. This tool constructs the
setting dynamic trees are FOR — context-dependent branch points the
draft can see in its own scores — and shows it winning:

1. A first-order Markov process over tokens 1..127: 60% of states have
   a deterministic successor, 40% have TWO equally-likely successors
   (branch states). Train a 4-layer tiny target and an INDEPENDENT
   1-layer draft on fresh walks (different seeds/data order): both
   learn the table, but at branch states their argmaxes decorrelate
   (each breaks the 50/50 tie by its own training noise), so a chain
   draft mispredicts ~half of all branch encounters.
2. At an equal 17-verify-row budget, run greedy:
   - chain `sd` at gamma=16,
   - static `sd_tree` over a swept spec family (best one reported),
   - dynamic `sd_beam` (K=4, D=8, N=16).
3. Branch positions are CONTEXT-DEPENDENT (they depend on which state
   the walk is in), so no static spec can place its forks where the
   ties are. The beam draft's cumulative-logprob selection forks
   exactly at branch states (two ~0.5 children outscore any further
   extension of a dead path) and runs deep through deterministic
   stretches — verify rows go where this iteration's probability mass
   actually is.

All modes are greedy-lossless vs `large` (asserted here too), so the
comparison is pure tokens-per-iteration at equal verify rows. Writes
BEAM_DEMO.json. CPU, ~2-4 min.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier  # noqa: E402
from duodecoding_tpu.models import (  # noqa: E402
    forward,
    init_cache,
    init_random_params,
    resolve_config,
)

VOCAB_LO, VOCAB_HI = 1, 128  # token 0 stays the pad id
BRANCH_FRAC = 0.4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_table(rng: np.random.Generator):
    """Per-state successor table: ``succ[s] = (a, b)`` with a == b for
    deterministic states and a != b (each taken w.p. 0.5) for branch
    states. First-order: the next token depends only on the current one,
    so even a 1-layer model can represent the process exactly — what it
    CANNOT do is know which way a 50/50 tie will break for the target."""
    n = VOCAB_HI
    succ = rng.integers(VOCAB_LO, VOCAB_HI, (n, 2))
    det = rng.random(n) >= BRANCH_FRAC
    succ[det, 1] = succ[det, 0]
    # ensure branch successors are distinct
    same = (~det) & (succ[:, 0] == succ[:, 1])
    succ[same, 1] = VOCAB_LO + (succ[same, 1] - VOCAB_LO + 1) % (VOCAB_HI - VOCAB_LO)
    return succ, ~det


def make_walks(succ: np.ndarray, rng: np.random.Generator, n: int, T: int):
    out = np.empty((n, T), np.int64)
    out[:, 0] = rng.integers(VOCAB_LO, VOCAB_HI, n)
    for t in range(1, T):
        pick = rng.integers(0, 2, n)
        out[:, t] = succ[out[:, t - 1], pick]
    return out.astype(np.int32)


def train_model(cfg, succ, *, data_seed, init_seed, steps=500, batch=128,
                T=32, lr=2e-3):
    rng = np.random.default_rng(data_seed)
    params = init_random_params(cfg, jax.random.PRNGKey(init_seed), jnp.float32)
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, tokens):
        def loss_fn(p):
            cache = init_cache(cfg, tokens.shape[0], T, jnp.float32)
            logits, _ = forward(p, cfg, tokens, cache)
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tgt = tokens[:, 1:]
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            return nll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(p, updates), opt, loss

    loss = None
    for i in range(steps):
        toks = jnp.asarray(make_walks(succ, rng, batch, T))
        params, opt, loss = step(params, opt, toks)
        if (i + 1) % 100 == 0:
            log(f"[beam-demo] {cfg.name} train step {i+1}/{steps} "
                f"loss {float(loss):.4f}")
    return params


def state_argmax(params, cfg):
    """Greedy successor the model picks for every single-token context."""
    states = jnp.arange(VOCAB_HI, dtype=jnp.int32)[:, None]
    cache = init_cache(cfg, VOCAB_HI, 4, jnp.float32)
    logits, _ = forward(params, cfg, states, cache)
    return np.asarray(jnp.argmax(logits[:, 0], -1))


def run_mode(engine, mode, prompts, **kw):
    toks = acc_n = acc_d = iters = 0
    for i in range(prompts.shape[0]):
        out, m = engine.run(mode, prompts[i][None, :], **kw)
        toks += m["generated_tokens"]
        acc_n += m["draft_accepted_tokens"]
        acc_d += m["draft_generated_tokens"]
        iters += m["loop_times"]
    return {
        "generated": toks,
        "accept": round(acc_n / max(acc_d, 1), 4),
        "tok_per_iter": round(toks / max(iters, 1), 4),
        "iters": iters,
    }, out


def main():
    t_start = time.time()
    rng = np.random.default_rng(0)
    succ, is_branch = make_table(rng)
    log(f"[beam-demo] Markov table: {int(is_branch.sum())}/{VOCAB_HI} "
        f"branch states")

    cfg = resolve_config("test-tiny-deep")
    dcfg = dataclasses.replace(cfg, name="markov-draft-1l", num_layers=1)
    log("[beam-demo] training 4-layer target + independent 1-layer draft…")
    params = train_model(cfg, succ, data_seed=10, init_seed=0)
    dparams = train_model(dcfg, succ, data_seed=20, init_seed=1)

    # --- structural diagnostics ------------------------------------------
    t_pick, d_pick = state_argmax(params, cfg), state_argmax(dparams, dcfg)
    valid = np.zeros(VOCAB_HI, bool)
    valid[VOCAB_LO:] = True
    det, br = valid & ~is_branch, valid & is_branch
    t_det_acc = float((t_pick[det] == succ[det, 0]).mean())
    d_det_acc = float((d_pick[det] == succ[det, 0]).mean())
    t_br_legal = float(
        ((t_pick[br] == succ[br, 0]) | (t_pick[br] == succ[br, 1])).mean())
    agree_det = float((t_pick[det] == d_pick[det]).mean())
    agree_br = float((t_pick[br] == d_pick[br]).mean())
    log(f"[beam-demo] det-state acc: target {t_det_acc:.3f} draft "
        f"{d_det_acc:.3f}; target branch-legal {t_br_legal:.3f}")
    log(f"[beam-demo] draft-target argmax agreement: det {agree_det:.3f} "
        f"vs branch {agree_br:.3f}  <- the tie-break decorrelation")

    # --- equal-verify-budget comparison (17 rows/iter) -------------------
    L, P, max_new = 12, 8, 48
    eval_prompts = make_walks(succ, np.random.default_rng(999), P, L)
    ec = EngineConfig(
        max_tokens=max_new, gamma=16, temperature=0.0, max_seq_len=128,
        param_dtype=jnp.float32, cache_dtype=jnp.float32,
    )
    eng = Engine(target=Tier(cfg, params), draft=Tier(dcfg, dparams),
                 config=ec)

    ar_outs = [eng.run("large", eval_prompts[i][None, :])[0]
               for i in range(P)]

    chain_res, _ = run_mode(eng, "sd", eval_prompts)
    log(f"[beam-demo] chain sd gamma=16 (17 rows): {chain_res}")

    static_specs = [
        (2, 1, 1, 1, 1, 1, 1, 1),   # 17 rows, depth 8
        (3, 1, 1, 1, 1),            # 16 rows, depth 5
        (4, 1, 1, 1),               # 17 rows, depth 4
        (2, 2, 1, 1),               # 15 rows, depth 4
    ]
    static_results = {}
    best_spec, best = None, None
    for spec in static_specs:
        res, _ = run_mode(eng, "sd_tree", eval_prompts, tree_spec=spec)
        static_results[",".join(map(str, spec))] = res
        log(f"[beam-demo] static sd_tree {spec}: {res}")
        if best is None or res["tok_per_iter"] > best["tok_per_iter"]:
            best_spec, best = spec, res

    beam_res, _ = run_mode(eng, "sd_beam", eval_prompts,
                           beam_k=4, beam_depth=8, n_nodes=16)
    log(f"[beam-demo] dynamic sd_beam K=4 D=8 N=16 (17 rows): {beam_res}")

    # losslessness: every mode's greedy output == AR over the run horizon
    for mode, kw in [("sd", {}), ("sd_tree", {"tree_spec": best_spec}),
                     ("sd_beam", {"beam_k": 4, "beam_depth": 8,
                                  "n_nodes": 16})]:
        for i in range(P):
            out, _ = eng.run(mode, eval_prompts[i][None, :], **kw)
            n = min(out.shape[1], ar_outs[i].shape[1])
            assert (np.asarray(out[:, :n]) ==
                    np.asarray(ar_outs[i][:, :n])).all(), (mode, i)

    wins = (beam_res["tok_per_iter"] > best["tok_per_iter"]
            and beam_res["tok_per_iter"] > chain_res["tok_per_iter"])
    out = {
        "pair": "first-order Markov walks (60% deterministic states, 40% "
                "two-way 50/50 branch states); 4-layer target vs "
                "independently trained 1-layer draft",
        "verify_rows_per_iter": 17,
        "diagnostics": {
            "target_det_state_acc": round(t_det_acc, 4),
            "draft_det_state_acc": round(d_det_acc, 4),
            "target_branch_pick_legal": round(t_br_legal, 4),
            "argmax_agreement_det_states": round(agree_det, 4),
            "argmax_agreement_branch_states": round(agree_br, 4),
        },
        "chain_sd_gamma16": chain_res,
        "static_sd_tree": static_results,
        "best_static_spec": ",".join(map(str, best_spec)),
        "dynamic_sd_beam_K4_D8_N16": beam_res,
        "beam_wins_at_equal_budget": bool(wins),
        "all_modes_lossless_vs_ar": True,
        "contrast_synthetic_13b_pair": {
            "sd_beam_tok_per_iter": 2.98,
            "sd_tree_tok_per_iter": 6.4,
            "note": "on the degenerate calibrated pair (BENCH_DETAILS "
                    "sd_beam_13b) score-driven selection goes breadth-first "
                    "and loses; here branch points are context-dependent "
                    "and draft scores see them — the setting, not the "
                    "implementation, decides which tree wins",
        },
        "wall_s": round(time.time() - t_start, 1),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BEAM_DEMO.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
