"""EAGLE-2 winnable demonstration (VERDICT r4 item 5 / missing #3).

The bench's calibrated 13B synthetic pair is feature-structure-free (its
next-argmax map is near-degenerate noise), so eagle2 distillation there
memorizes (train agreement 1.000, held-out 0.049 — BENCH_DETAILS
eagle2_13b) and nothing showed feature-level drafting CAN win in this
sandbox. This tool constructs a pair WITH learnable structure and shows
it winning:

1. TRAIN a tiny target (test-tiny-deep, 4 layers) on a structured
   process — per-sequence repeated patterns (the classic induction-head
   task: x_t = x_{t-K} for a per-sequence random K-token pattern) —
   until its next-token accuracy is high. Induction provably needs >= 2
   composed attention layers (a previous-token head feeding an induction
   head), so the 1-layer slice draft CANNOT express the task, while the
   trained target's final features fully determine the next token.
2. Draft A (the reference framework's default): the layer-slice prefix
   (1 of 4 layers of the SAME trained target, models/surgery.py) driving
   chain SD at gamma=6 — 7 verify rows per iteration.
3. Draft B (the reference's flagship, cnets.py:660-800 equivalent):
   an EAGLE head self-distilled from the target's own rollouts
   (adaptive/eagle.py), driving eagle2_fused at top_k=2, depth=5,
   n_nodes=6 — the SAME 7 verify rows per iteration.
4. Measure decode-time accept and tokens/iteration on HELD-OUT prompts,
   plus train-vs-held-out static agreement (the memorization check).

Expected result (and the point): the slice draft's layer-1 features are
not aligned with the full model's head, while the EAGLE head reads the
target's own final features — on a structured pair it generalizes
(held-out agreement ~= train agreement) and wins at equal verify budget.
Writes EAGLE2_DEMO.json. CPU, ~2-4 min.
"""

from __future__ import annotations

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

from duodecoding_tpu.adaptive.eagle import (  # noqa: E402
    collect_eagle_data,
    eagle_forward,
    init_eagle_cache,
    init_eagle_params,
    train_eagle,
)
from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier  # noqa: E402
from duodecoding_tpu.models import (  # noqa: E402
    forward,
    init_cache,
    init_random_params,
    resolve_config,
)
from duodecoding_tpu.models.surgery import truncate_model  # noqa: E402

K_PATTERN = 8  # per-sequence pattern length


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_sequences(rng: np.random.Generator, n: int, T: int) -> np.ndarray:
    """Per-sequence random K-token pattern, repeated: x_t = x_{t-K}.
    The induction-head task: predicting x_t requires matching the
    current context against its earlier occurrence and copying the
    successor — a two-layer attention composition (previous-token head
    feeding an induction head; Olsson et al. 2022), structurally beyond
    any 1-layer model. Tokens drawn from 1..127 (0 stays the pad id)."""
    pat = rng.integers(1, 128, (n, K_PATTERN))
    reps = -(-T // K_PATTERN)
    return np.tile(pat, (1, reps))[:, :T].astype(np.int32)


def train_target(cfg, rng, *, steps=600, batch=128, T=32, lr=2e-3):
    params = init_random_params(cfg, jax.random.PRNGKey(0), jnp.float32)
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
            # nll[:, t] scores predicting x_{t+1}: determined once the
            # pattern has been seen in full (t+1 >= K_PATTERN)
            w = jnp.zeros_like(nll).at[:, K_PATTERN - 1:].set(1.0)
            return (nll * w).sum() / w.sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(p, updates), opt, loss

    loss = None
    for i in range(steps):
        toks = jnp.asarray(make_sequences(rng, batch, T))
        params, opt, loss = step(params, opt, toks)
        if (i + 1) % 100 == 0:
            log(f"[demo] target train step {i+1}/{steps} loss {float(loss):.4f}")
    return params


def next_token_accuracy(params, cfg, seqs: np.ndarray) -> float:
    cache = init_cache(cfg, seqs.shape[0], seqs.shape[1], jnp.float32)
    logits, _ = forward(params, cfg, jnp.asarray(seqs), cache)
    pred = np.asarray(jnp.argmax(logits[:, :-1], -1))
    tgt = seqs[:, 1:]
    mask = np.zeros_like(tgt, np.float32)
    mask[:, K_PATTERN - 1:] = 1.0
    return float(((pred == tgt) * mask).sum() / mask.sum())


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
        "accept": acc_n / max(acc_d, 1),
        "tok_per_iter": toks / max(iters, 1),
        "iters": iters,
    }


def static_agreement(eparams, cfg, embed, head, data, num_layers) -> float:
    ph, pt, fl, tl, w = data
    cache = init_eagle_cache(
        cfg, pt.shape[0], pt.shape[1], num_layers=num_layers,
        dtype=jnp.float32,
    )
    feats, _ = eagle_forward(
        eparams, cfg, embed, jnp.asarray(pt),
        jnp.asarray(ph, jnp.float32), cache,
    )
    pred = np.asarray(
        jnp.argmax(feats.astype(jnp.float32) @ head.astype(jnp.float32), -1)
    )
    return float(((pred == tl) * w).sum() / max(w.sum(), 1.0))


def main():
    t_start = time.time()
    cfg = resolve_config("test-tiny-deep")
    rng = np.random.default_rng(0)

    log("[demo] training the structured tiny target (4 layers)…")
    params = train_target(cfg, rng)
    heldout = make_sequences(np.random.default_rng(1000), 64, 32)
    acc = next_token_accuracy(params, cfg, heldout)
    log(f"[demo] target held-out next-token accuracy: {acc:.3f}")

    # --- drafts -----------------------------------------------------------
    dcfg, dparams = truncate_model(cfg, params, 1)

    L, P, max_new = 10, 8, 32
    eval_prompts = make_sequences(np.random.default_rng(2000), P, L)
    ec = EngineConfig(
        max_tokens=max_new, gamma=6, temperature=0.0, max_seq_len=128,
        param_dtype=jnp.float32, cache_dtype=jnp.float32,
    )
    eng = Engine(target=Tier(cfg, params), draft=Tier(dcfg, dparams),
                 config=ec)

    slice_res = run_mode(eng, "sd", eval_prompts)
    log(f"[demo] slice draft chain SD (gamma=6, 7 verify rows): accept "
        f"{slice_res['accept']:.3f}, {slice_res['tok_per_iter']:.2f} tok/iter")

    # --- eagle distillation on the target's OWN rollouts ------------------
    # FRESH rollouts every round: a fixed distillation set memorizes
    # (16 prompts: train 1.000 / held-out 0.016; 256 prompts with 300
    # full-batch epochs: held-out 0.09 — the copy circuit is never the
    # cheapest fit to a finite set). The target itself generalized
    # precisely because it saw fresh sequences each step; distilling the
    # drafter the same way makes the transition map the only stable
    # optimum. Token CE upweighted (w_tok=1): this demo's contract is
    # next-TOKEN agreement, and the feature-regression term is the
    # memorization-prone one on a tiny hidden size.
    eparams = init_eagle_params(jax.random.PRNGKey(7), cfg, num_layers=1,
                                dtype=jnp.float32)
    embed, head = params["embed"], params["lm_head"]
    loss = float("nan")
    for rnd in range(8):
        train_prompts = make_sequences(
            np.random.default_rng(123 + rnd), 256, L
        )
        data = collect_eagle_data(params, cfg, train_prompts, max_new=40)
        eparams, loss = train_eagle(eparams, cfg, embed, head, *data,
                                    epochs=80, lr=1e-3, w_tok=1.0)
        log(f"[demo] distill round {rnd+1}/8 loss {loss:.4f}")
    agree_train = static_agreement(eparams, cfg, embed, head, data, 1)
    ev_prompts = make_sequences(np.random.default_rng(2001), 8, L)
    ev_data = collect_eagle_data(params, cfg, ev_prompts, max_new=40)
    agree_held = static_agreement(eparams, cfg, embed, head, ev_data, 1)
    log(f"[demo] eagle distill loss {loss:.4f}; agreement train "
        f"{agree_train:.3f} / held-out {agree_held:.3f}")

    eagle_res = run_mode(
        eng, "eagle2_fused", eval_prompts, eagle_params=eparams,
        depth=5, top_k=2, n_nodes=6,
    )
    log(f"[demo] eagle2_fused (K=2 D=5 N=6, 7 verify rows): accept "
        f"{eagle_res['accept']:.3f}, {eagle_res['tok_per_iter']:.2f} tok/iter")

    wins = eagle_res["tok_per_iter"] > slice_res["tok_per_iter"]
    out = {
        "pair": "test-tiny-deep trained on per-sequence repeated patterns "
                f"(induction task, K={K_PATTERN})",
        "target_heldout_next_token_acc": round(acc, 4),
        "verify_rows_per_iter": 7,
        "slice_draft_sd": {k: round(v, 4) for k, v in slice_res.items()},
        "eagle2_fused": {k: round(v, 4) for k, v in eagle_res.items()},
        "eagle_agreement_train": round(agree_train, 4),
        "eagle_agreement_heldout": round(agree_held, 4),
        "eagle_wins_at_equal_budget": bool(wins),
        "contrast_synthetic_13b_pair": {
            "train_agreement": 1.0,
            "heldout_agreement": 0.049,
            "note": "the calibrated 13B pair memorizes (no feature "
                    "structure); this structured pair generalizes — the "
                    "capability, not the implementation, was the limit",
        },
        "wall_s": round(time.time() - t_start, 1),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EAGLE2_DEMO.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
