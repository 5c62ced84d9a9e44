"""RL-stack efficacy run: online DDQN tuning beats the fixed default.

The reference's whole training lifecycle exists to produce tuned-TPS
checkpoints (reference auto_train_manager.py; BASELINE.md tuned rows).
This experiment demonstrates the same on the TPU-native stack, end to end
on CPU (the decision problem lives in the comm/adaptive layer, not the
accelerator):

1. build a calibrated draft/target pair (models/surgery.py — a layer
   slice with a bisected residual scale, the bench construction);
2. train an ARP acceptance head for the pair (adaptive/collect.py);
3. baseline: `adaptive_decoding` with the FIXED default config
   (transfer_top_k=300, threshold 0.6 — reference defaults) over held-out
   prompts;
4. train the DDQN online (adaptive/rl.py, the reference DRA) over
   training prompts at a bandwidth where (top_k, threshold) genuinely
   move tokens/s;
5. evaluate the tuned greedy policy (epsilon=0, updates off) on the SAME
   held-out prompts.

Writes RL_EFFICACY.json: before/after tokens-per-second, the reward
curve, chosen-config histogram, and the ARP/pair construction details.

Usage: python tools/rl_efficacy.py  (CPU, ~2-4 min)
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BANDWIDTH_MBPS = 1.0  # slow uplink: reject-row transfers dominate at big k
MAX_NEW = 48
GAMMA = 4
SEED = 0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_engine(cfg, tp, dcfg, dp, max_tokens=MAX_NEW):
    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier

    ec = EngineConfig(
        max_tokens=max_tokens,
        gamma=GAMMA,
        temperature=0.0,
        transfer_top_k=300,
        edge_cloud_bandwidth=BANDWIDTH_MBPS,
        ntt_ms_edge_cloud=1.0,
        use_stochastic_comm=False,  # precise mode: deterministic comparison
        max_seq_len=256,
        param_dtype=jnp.float32,
        cache_dtype=jnp.float32,
    )
    return Engine(target=Tier(cfg, tp), draft=Tier(dcfg, dp), config=ec)


def run_set(engine, prompts, rl_adapter=None, disable_rl_update=False,
            arp_params=None, task="gsm8k"):
    toks = wall = 0.0
    accepts = []
    for p in prompts:
        out, m = engine.run(
            "adaptive_decoding",
            p[None, :],
            transfer_top_k=300,
            arp_threshold=0.6,
            arp_params=arp_params,
            rl_adapter=rl_adapter,
            disable_rl_update=disable_rl_update,
            task_name=task,
        )
        toks += m["generated_tokens"]
        wall += m["wall_time"]
        accepts.append(
            m["draft_accepted_tokens"] / max(m["draft_generated_tokens"], 1)
        )
    return toks / max(wall, 1e-9), float(np.mean(accepts))


def main():
    from duodecoding_tpu.adaptive.rl import RLNetworkAdapter
    from duodecoding_tpu.models import init_random_params, resolve_config
    from duodecoding_tpu.models.surgery import scale_residual, truncate_model

    cfg = resolve_config("test-tiny-deep")
    params = init_random_params(cfg, jax.random.PRNGKey(SEED), jnp.float32)
    rng = np.random.default_rng(SEED)
    prompts = rng.integers(1, cfg.vocab_size, (46, 12)).astype(np.int32)
    train_prompts, eval_prompts = prompts[:40], prompts[40:]

    # --- calibrated pair: bisect the residual scale on measured sd accept
    lo, hi = 1e-3, 0.8
    accept = 0.0
    alpha = None
    for _ in range(6):
        a = math.sqrt(lo * hi)
        tp = scale_residual(params, a)
        dcfg, dp = truncate_model(cfg, tp, 2)
        eng = build_engine(cfg, tp, dcfg, dp, max_tokens=24)
        _, m = eng.run("sd", prompts[-1][None, :])
        acc = m["draft_accepted_tokens"] / max(m["draft_generated_tokens"], 1)
        log(f"[rl] calibrate alpha={a:.4f} accept={acc:.3f}")
        if alpha is None or abs(acc - 0.6) < abs(accept - 0.6):
            alpha, accept = a, acc
        if 0.5 <= acc <= 0.7:
            break
        if acc > 0.6:
            lo = a
        else:
            hi = a
    tp = scale_residual(params, alpha)
    dcfg, dp = truncate_model(cfg, tp, 2)

    # --- ARP head for the pair (the reference collect->fit lifecycle)
    from duodecoding_tpu.adaptive.arp import init_arp_head, train_arp_head
    from duodecoding_tpu.adaptive.collect import collect_confidence

    engine = build_engine(cfg, tp, dcfg, dp)
    hiddens, labels = collect_confidence(engine, prompts[30:38])
    arp_params = init_arp_head(jax.random.PRNGKey(SEED), dcfg.hidden_size, 128)
    arp_params, arp_loss = train_arp_head(arp_params, hiddens, labels, epochs=30)
    log(f"[rl] ARP head trained: loss {float(arp_loss):.4f}")

    # --- baseline: fixed default config
    base_tps, base_acc = run_set(
        build_engine(cfg, tp, dcfg, dp), eval_prompts, arp_params=arp_params
    )
    log(f"[rl] baseline (fixed top_k=300, thr=0.6): {base_tps:.2f} tok/s "
        f"accept={base_acc:.3f}")

    # --- online DDQN training
    ad = RLNetworkAdapter(
        model_path="/tmp/rl_efficacy_ckpt/dra/latest.pkl",
        best_model_path="/tmp/rl_efficacy_ckpt/dra/best.pkl",
        seed=SEED,
    )
    ad.agent.epsilon_decay = 0.988  # demo-scale schedule (~600 updates)
    rewards = []
    orig_step = ad.step

    def step_and_record(r):
        rewards.append(float(r))
        orig_step(r)

    ad.step = step_and_record

    engine = build_engine(cfg, tp, dcfg, dp)
    passes = 2
    for ep in range(passes):
        tps, acc = run_set(
            engine, train_prompts, rl_adapter=ad, arp_params=arp_params
        )
        log(f"[rl] train pass {ep}: {tps:.2f} tok/s accept={acc:.3f} "
            f"eps={ad.agent.epsilon:.3f} updates={ad.agent.update_count}")

    # --- tuned greedy policy on the held-out set
    ad.agent.epsilon = 0.0
    chosen = []
    orig_select = ad.select_config

    def select_and_record(*a, **kw):
        out = orig_select(*a, **kw)
        chosen.append(out)
        return out

    ad.select_config = select_and_record
    tuned_tps, tuned_acc = run_set(
        build_engine(cfg, tp, dcfg, dp), eval_prompts, rl_adapter=ad,
        disable_rl_update=True, arp_params=arp_params,
    )
    log(f"[rl] tuned: {tuned_tps:.2f} tok/s accept={tuned_acc:.3f}")

    hist = {}
    for k, t in chosen:
        hist[f"k={k},thr={t}"] = hist.get(f"k={k},thr={t}", 0) + 1
    w = max(len(rewards) // 20, 1)
    curve = [
        round(float(np.mean(rewards[i : i + w])), 3)
        for i in range(0, len(rewards) - w + 1, w)
    ]
    out = {
        "pair": {"target": cfg.name, "draft_layers": 2,
                 "alpha": float(alpha), "sd_accept": float(accept)},
        "bandwidth_mbps": BANDWIDTH_MBPS,
        "arp_loss": float(arp_loss),
        "baseline": {"tps": round(base_tps, 3), "accept": round(base_acc, 3),
                     "top_k": 300, "threshold": 0.6},
        "tuned": {"tps": round(tuned_tps, 3), "accept": round(tuned_acc, 3),
                  "config_histogram": hist},
        "improvement": round(tuned_tps / base_tps, 3),
        "rl_updates": ad.agent.update_count,
        "reward_curve_smoothed": curve,
    }
    path = os.path.join(REPO, "RL_EFFICACY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"baseline_tps": out["baseline"]["tps"],
                      "tuned_tps": out["tuned"]["tps"],
                      "improvement": out["improvement"],
                      "artifact": path}))


if __name__ == "__main__":
    main()
