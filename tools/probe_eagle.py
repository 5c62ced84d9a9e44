"""On-chip probe: self-distill an EAGLE feature draft against the
calibrated 13B target and measure `eagle2_fused` end-to-end.

Methodology (honest-accept): the TARGET is the bench part-A pair's
calibrated model (fixed residual scale alpha from BENCH_DETAILS.json) —
the same model whose chain-SD accept matches the 0.562 baseline contract.
The eagle draft is trained ONLY on the target's own greedy rollouts over
TRAINING prompts (seed 123), disjoint from the bench measurement prompts
(seed 0); its measured decode-time accept is whatever distillation
achieves — reported, never assumed. AR throughput is unaffected either
way, so speedup comparisons stay apples-to-apples.

Env: PROBE_ALPHA, PROBE_DEPTH, PROBE_TOPK, PROBE_N, PROBE_EPOCHS,
PROBE_TRAIN_PROMPTS, PROBE_LAYERS (eagle decoder layers), PROBE_PROMPTS.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PROMPT_LEN, make_engine, log  # noqa: E402
from duodecoding_tpu.models import resolve_config  # noqa: E402
from duodecoding_tpu.models.quant import fuse_params  # noqa: E402
from duodecoding_tpu.models.surgery import (  # noqa: E402
    init_random_quant_params,
    scale_residual,
    truncate_model,
)


def main():
    alpha = float(os.environ.get("PROBE_ALPHA", "5.2249e-4"))
    depth = int(os.environ.get("PROBE_DEPTH", "6"))
    top_k = int(os.environ.get("PROBE_TOPK", "8"))
    n_nodes = int(os.environ.get("PROBE_N", "32"))
    epochs = int(os.environ.get("PROBE_EPOCHS", "120"))
    n_train = int(os.environ.get("PROBE_TRAIN_PROMPTS", "8"))
    e_layers = int(os.environ.get("PROBE_LAYERS", "1"))
    n_prompts = int(os.environ.get("PROBE_PROMPTS", "4"))
    max_new = int(os.environ.get("PROBE_MAX_NEW", "256"))

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    cfg = resolve_config("llama-2-13b")
    t0 = time.time()
    qparams = fuse_params(
        init_random_quant_params(cfg, jax.random.PRNGKey(0), 128)
    )
    jax.block_until_ready(qparams["embed"])
    tp = scale_residual(qparams, alpha)
    log(f"[eagle] init {time.time()-t0:.0f}s")

    # ---- collect self-distillation data on TRAINING prompts -------------
    from duodecoding_tpu.adaptive.eagle import (
        collect_eagle_data,
        init_eagle_params,
        train_eagle,
    )

    rng_train = np.random.default_rng(123)
    train_prompts = rng_train.integers(
        1, cfg.vocab_size, (n_train, PROMPT_LEN)
    )
    t0 = time.time()
    cache_path = f"/tmp/eagle_data_{alpha:.6g}_{n_train}_{max_new}.npz"
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        data = tuple(z[k] for k in ("ph", "pt", "fl", "tl", "w"))
        log(f"[eagle] collect cache hit {cache_path}")
    else:
        data = collect_eagle_data(tp, cfg, train_prompts, max_new=max_new)
        np.savez(cache_path, ph=data[0], pt=data[1], fl=data[2],
                 tl=data[3], w=data[4])
    log(f"[eagle] collect {time.time()-t0:.0f}s "
        f"(pairs {data[0].shape})")

    from duodecoding_tpu.models.quant import dequantize_int4, is_quantized

    head = qparams["lm_head"]
    if is_quantized(head):
        # eagle training/selection needs the dense unembedding (the INT4
        # dict only feeds the fused matmul kernel); bf16 keeps it at 330 MB
        head = dequantize_int4(head, jnp.bfloat16)
        if head.shape[-1] > cfg.vocab_size:  # tile-padded columns
            head = head[:, : cfg.vocab_size]
    embed = qparams["embed"]
    ev = None
    if os.environ.get("PROBE_EVAL_AGREE") == "1":
        rng_e = np.random.default_rng(
            int(os.environ.get("BENCH_PROMPT_SEED", "0"))
        )
        ev_prompts = rng_e.integers(1, cfg.vocab_size, (8, PROMPT_LEN))
        ev_cache = f"/tmp/eagle_eval_{alpha:.6g}_{max_new}.npz"
        if os.path.exists(ev_cache):
            z = np.load(ev_cache)
            ev = tuple(z[k] for k in ("ph", "pt", "fl", "tl", "w"))
        else:
            ev = collect_eagle_data(tp, cfg, ev_prompts, max_new=max_new)
            np.savez(ev_cache, ph=ev[0], pt=ev[1], fl=ev[2], tl=ev[3],
                     w=ev[4])

    # free the 7 GB INT4 target during training (adam states + CE logits
    # at 13B width OOM'd a 16 GB chip next to it); re-init after — the
    # seed makes it bit-identical
    del qparams, tp
    import gc

    gc.collect()

    eparams = init_eagle_params(
        jax.random.PRNGKey(7), cfg, num_layers=e_layers, dtype=jnp.float32
    )
    t0 = time.time()
    eparams, loss = train_eagle(
        eparams, cfg, embed, head, *data, epochs=epochs, lr=1e-3
    )
    log(f"[eagle] train {time.time()-t0:.0f}s loss={loss:.4f}")

    # static top-1 agreement on the training data (upper-bound indicator)
    from duodecoding_tpu.adaptive.eagle import eagle_forward, init_eagle_cache

    ph, pt, fl, tl, w = data
    B, T = pt.shape
    cache = init_eagle_cache(cfg, B, T, num_layers=e_layers, dtype=jnp.float32)

    @jax.jit
    def agree(ep, embed_, head_, pt_, ph_, tl_, w_):
        feats, _ = eagle_forward(
            ep, cfg, embed_, pt_, ph_.astype(jnp.float32), cache
        )
        pred = jnp.argmax(
            feats.astype(jnp.float32) @ head_.astype(jnp.float32), -1
        )
        return jnp.sum((pred == tl_) * w_) / jnp.maximum(jnp.sum(w_), 1)

    a = float(agree(eparams, embed, head, jnp.asarray(pt), jnp.asarray(ph),
                    jnp.asarray(tl), jnp.asarray(w)))
    log(f"[eagle] static top-1 agreement (train rollouts): {a:.3f}")

    a_eval = None
    if ev is not None:
        # held-out agreement: rollouts from the EVAL prompt seed separate
        # generalization failure (low here too) from a decode-path bug
        # (high here, low decode accept). Batch dims differ from the
        # train cache -> dedicated jit
        ev_c = init_eagle_cache(
            cfg, ev[0].shape[0], ev[0].shape[1], num_layers=e_layers,
            dtype=jnp.float32,
        )

        @jax.jit
        def agree_ev(ep, embed_, head_, pt_, ph_, tl_, w_):
            feats, _ = eagle_forward(
                ep, cfg, embed_, pt_, ph_.astype(jnp.float32), ev_c
            )
            pred = jnp.argmax(
                feats.astype(jnp.float32) @ head_.astype(jnp.float32), -1
            )
            return jnp.sum((pred == tl_) * w_) / jnp.maximum(jnp.sum(w_), 1)

        a_eval = float(
            agree_ev(eparams, embed, head, jnp.asarray(ev[1]),
                     jnp.asarray(ev[0]), jnp.asarray(ev[3]),
                     jnp.asarray(ev[4]))
        )
        log(f"[eagle] static top-1 agreement (HELD-OUT rollouts): "
            f"{a_eval:.3f}")

    # ---- run eagle2_fused on the bench measurement prompts --------------
    e_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, eparams,
    )
    if os.environ.get("PROBE_SKIP_RUN") == "1":
        print(json.dumps(dict(
            mode="eagle2_fused-agreement-only", alpha=alpha,
            distill_loss=loss, static_agreement=a,
            static_agreement_heldout=a_eval,
        )))
        return

    del eparams, head, embed, agree
    gc.collect()
    # rebuild the calibrated target (same seed — bit-identical)
    qparams = fuse_params(
        init_random_quant_params(cfg, jax.random.PRNGKey(0), 128)
    )
    tp = scale_residual(qparams, alpha)
    dcfg, dp = truncate_model(cfg, tp, 3)  # unused tier (engine needs one)
    eng = make_engine(cfg, tp, dcfg, dp, gamma=4, max_tokens=max_new,
                      max_seq_len=640, int8_kv=True)
    rng = np.random.default_rng(int(os.environ.get("BENCH_PROMPT_SEED", "0")))
    prompts = rng.integers(1, cfg.vocab_size, (9, PROMPT_LEN))
    kw = dict(eagle_params=e_bf16, depth=depth, top_k=top_k, n_nodes=n_nodes)

    t0 = time.time()
    eng.run("eagle2_fused", prompts[0][None, :], **kw)
    log(f"[eagle] compile+warmup {time.time()-t0:.0f}s")
    per = []
    for i in range(1, 1 + n_prompts):
        out, m = eng.run("eagle2_fused", prompts[i][None, :], **kw)
        acc = m["draft_accepted_tokens"] / max(m["draft_generated_tokens"], 1)
        per.append(
            dict(
                tps=m["generated_tokens"] / m["wall_time"],
                accept=acc,
                tok_per_iter=m["generated_tokens"] / max(m["loop_times"], 1),
                ms_per_iter=1e3 * m["wall_time"] / max(m["loop_times"], 1),
                iters=m["loop_times"],
            )
        )
        log(f"[eagle] prompt {i}: {per[-1]}")
    keep = [p for p in per if p["accept"] <= 0.95] or per
    res = dict(
        mode="eagle2_fused",
        depth=depth,
        top_k=top_k,
        n_nodes=n_nodes,
        e_layers=e_layers,
        alpha=alpha,
        distill_loss=loss,
        static_agreement=a,
        static_agreement_heldout=a_eval,
        tps=float(np.mean([p["tps"] for p in keep])),
        accept=float(np.mean([p["accept"] for p in keep])),
        tok_per_iter=float(np.mean([p["tok_per_iter"] for p in keep])),
        ms_per_iter=float(np.mean([p["ms_per_iter"] for p in keep])),
        excluded=len(per) - len(keep),
        per_prompt=per,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
