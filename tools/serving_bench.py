"""13B multi-slot TREE speculative serving throughput on the real chip.

SpecTreeBatchedServer at the bench's calibrated 13B pair (INT4 weights,
INT8 KV target, 3-of-40-layer draft), 4 slots, fused multi-iteration
dispatch — the serving-scale counterpart of the single-stream headline.
Writes the aggregate tok/s into BENCH_DETAILS.json under
``serving_13b`` (merged, other keys preserved).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/serving_bench.py \
    [alpha] [slots] [steps_per_dispatch]
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
PROMPT = 64
MAX_NEW = 128
SPEC = (2, 2, 1, 1, 1)


def main():
    import jax
    import jax.numpy as jnp

    from duodecoding_tpu.engine.sampling_config import SamplingConfig
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, scale_residual, truncate_model,
    )
    from duodecoding_tpu.serving import Request
    from duodecoding_tpu.serving.scheduler import SpecTreeBatchedServer

    alpha = float(sys.argv[1]) if len(sys.argv) > 1 else 4.6e-4
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spd = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = resolve_config("llama-2-13b")
    qparams = fuse_params(
        init_random_quant_params(cfg, jax.random.PRNGKey(0), 128)
    )
    jax.block_until_ready(qparams["embed"])
    tp = scale_residual(qparams, alpha)
    dcfg, dp = truncate_model(cfg, tp, 3)

    from duodecoding_tpu.engine.tree_loops import spec_layout

    verify_rows = int(spec_layout(SPEC).offsets.shape[0])

    def run_one(slots):
        rng = np.random.default_rng(0)
        n_req = 2 * slots
        prompts = rng.integers(
            1, cfg.vocab_size, (n_req, PROMPT)
        ).astype(np.int32)

        def make_server():
            return SpecTreeBatchedServer(
                dp, dcfg, tp, cfg, tree_spec=SPEC, batch_size=slots,
                max_seq_len=S, steps_per_dispatch=spd,
                sampling=SamplingConfig(0.0), dtype=jnp.bfloat16,
                int8_kv=True,
            )

        # warmup/compile pass (prefill + fused multi-step programs)
        t0 = time.time()
        srv = make_server()
        srv.submit(Request(0, prompts[0], max_new_tokens=16))
        srv.run_until_drained()
        print(f"[serving] slots={slots} warm/compile {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)

        srv = make_server()
        for i in range(n_req):
            srv.submit(Request(i, prompts[i], max_new_tokens=MAX_NEW))
        stats = srv.run_until_drained()
        accept = srv.total_accepted / max(srv.total_drafted, 1)
        wall = stats["wall_time"]
        return {
            "slots": slots,
            "spec": list(SPEC),
            "steps_per_dispatch": spd,
            "requests": n_req,
            "max_new_tokens": MAX_NEW,
            "alpha": alpha,
            "tokens_per_second": round(stats["tokens_per_second"], 2),
            "accept": round(accept, 3),
            "mean_batch_occupancy": round(stats["mean_batch_occupancy"], 2),
            "generated_tokens": stats["generated_tokens"],
            "wall_time": round(wall, 2),
            "dispatches": stats["steps"],
            "device_steps": srv._steps,
            # verify forward M = active slots x tree window rows — walks
            # the INT4 kernel's M-scaling wall (CLAUDE.md known gaps)
            "verify_rows_per_slot": verify_rows,
            "verify_m_full": slots * verify_rows,
            # throughput-regime request latency: the batch completes
            # n_req requests in `wall`, so a request's expected
            # completion time at full occupancy
            "mean_request_latency_s": round(wall * slots / n_req, 2),
        }

    if os.environ.get("SERVING_SCALING") == "1":
        # VERDICT r4 item 6: tok/s, latency, occupancy at 4/6/8 slots —
        # where does the verify M-wall become binding
        slot_list = [int(x) for x in os.environ.get(
            "SERVING_SLOTS", "4,6,8").split(",")]
        rows = [run_one(b) for b in slot_list]
        for r in rows:
            print(f"[serving] slots={r['slots']}: "
                  f"{r['tokens_per_second']} tok/s accept {r['accept']} "
                  f"occupancy {r['mean_batch_occupancy']} "
                  f"latency {r['mean_request_latency_s']}s "
                  f"(verify M={r['verify_m_full']})",
                  file=sys.stderr, flush=True)
        out = {
            "rows": rows,
            "note": (
                "2x-oversubscribed request load, 64-token prompts, "
                "128 new tokens each; verify forward batches "
                "slots x rows tree windows through the INT4 kernel"
            ),
        }
        path = os.path.join(REPO, "BENCH_DETAILS.json")
        try:
            details = json.load(open(path))
        except Exception:
            details = {}
        details["serving_scaling"] = out
        try:
            import subprocess

            commit = subprocess.run(
                ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
            prov = details.setdefault("provenance", {})
            prov["serving_scaling"] = {
                "commit": commit,
                "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
        except Exception:
            pass
        with open(path, "w") as f:
            json.dump(details, f, indent=2)
        print(json.dumps(out))
        return

    out = run_one(slots)
    if os.environ.get("DUODEC_SERVE_PROBE"):
        # stage-skip diagnostics produce WRONG outputs — never record them
        print(json.dumps(out))
        return
    path = os.path.join(REPO, "BENCH_DETAILS.json")
    try:
        details = json.load(open(path))
    except Exception:
        details = {}
    details["serving_13b"] = out
    try:
        import subprocess

        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        prov = details.setdefault("provenance", {})
        prov["serving_13b"] = {
            "commit": commit,
            "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
    except Exception:
        pass
    with open(path, "w") as f:
        json.dump(details, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
