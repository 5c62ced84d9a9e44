"""On-chip probe: `sd_beam` dynamic-tree SD at the calibrated 13B pair.

Builds the bench part-A pair at a FIXED residual scale (default = the
round-3 calibrated alpha for prompt seed 0, BENCH_DETAILS.json) and
measures sd_beam end-to-end: tok/s, measured accept, tokens/iteration,
ms/iteration. One (K, D, N) config per process (remote-backend hygiene —
CLAUDE.md round-3 worker-crash notes).

Env: PROBE_ALPHA, PROBE_K, PROBE_D, PROBE_N, PROBE_PROMPTS, PROBE_MODE
(sd_beam|sd_tree for an apples-to-apples control), PROBE_SPEC.
"""

import json
import os
import sys
import time

import numpy as np

import jax

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
    K = int(os.environ.get("PROBE_K", "8"))
    D = int(os.environ.get("PROBE_D", "6"))
    N = int(os.environ.get("PROBE_N", "32"))
    n_prompts = int(os.environ.get("PROBE_PROMPTS", "4"))
    mode = os.environ.get("PROBE_MODE", "sd_beam")
    spec = tuple(
        int(x) for x in os.environ.get("PROBE_SPEC", "2,2,1,1,1,1,1").split(",")
    )
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
    log(f"[probe] init {time.time()-t0:.0f}s")
    tp = scale_residual(qparams, alpha)
    dcfg, dp = truncate_model(cfg, tp, 3)
    eng = make_engine(
        cfg, tp, dcfg, dp, gamma=len(spec), max_tokens=max_new,
        max_seq_len=512, int8_kv=True,
    )
    kw = (
        dict(beam_k=K, beam_depth=D, n_nodes=N)
        if mode == "sd_beam"
        else dict(tree_spec=spec)
    )

    rng = np.random.default_rng(int(os.environ.get("BENCH_PROMPT_SEED", "0")))
    prompts = rng.integers(1, cfg.vocab_size, (9, PROMPT_LEN))

    t0 = time.time()
    eng.run(mode, prompts[0][None, :], **kw)
    log(f"[probe] compile+warmup {time.time()-t0:.0f}s")

    per = []
    for i in range(1, 1 + n_prompts):
        out, m = eng.run(mode, prompts[i][None, :], **kw)
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
        log(f"[probe] prompt {i}: {per[-1]}")
    keep = [p for p in per if p["accept"] <= 0.95] or per
    res = dict(
        mode=mode,
        K=K,
        D=D,
        N=N,
        spec=list(spec),
        alpha=alpha,
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
