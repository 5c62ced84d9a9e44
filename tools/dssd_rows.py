"""Measure the reference's remaining dist_split_spec baseline rows.

BASELINE.md carries three published dssd rows
(/root/reference/experiment_results_table.md:7-9); the bench's part B
covers row 1 (0.5B->1.8B, 17.07 tok/s). This tool measures rows 2-3 at
their shapes on one TPU chip:

  row 2: Qwen1.5-1.8B-Chat -> Qwen1.5-7B-Chat, accept 39.59%, 12.70 tok/s
  row 3: Qwen1.5-0.5B-Chat -> Qwen1.5-7B-Chat, accept 33.65%, 11.63 tok/s

Construction mirrors bench part A/B (zero egress, random weights): the
target is the real qwen1.5-7b architecture in INT4 (the 7B bf16 + its
151936-vocab embed/head does not fit 16 GB HBM; ACCURACY_PARITY.json
pins the INT4/INT8-KV bit-width deltas), the draft is a layer-sliced
prefix at the reference draft's per-forward cost ratio (k = round(
params_draft / params_target * layers), the same convention as part B's
7/24), and a residual-scale knob is bisected ON the full dssd
measurement until the measured accept matches the row's contract. Comm
is the stochastic 23.6 Mbps edge-cloud trace with 10 ms NTT, identical
to part B; the faithful row transfers the documented reject-path
full-vocab downlink, and `ref_like_tps` applies the reference rows'
empirical accounting (reject rows excluded, 50 ms/forward queuing) —
see bench.py:part_b_dssd's reconciliation.

Writes DSSD_ROWS.json. Real chip, ~30-60 min (two remote compiles +
calibration probes). Usage: python tools/dssd_rows.py [row2|row3]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import make_engine  # noqa: E402

GAMMA = 4
MAX_NEW = 128
PLEN = 64
S = 512
N_PROMPTS = 4
GROUP = 128

ROWS = {
    "row2": {
        "draft_ref": "qwen1.5-1.8b",
        "accept": 0.3959,
        "ref_tps": 12.70,
        "ref_row": "experiment_results_table.md:8 (wall 1612.05s, comm "
                   "391.72s, 12,761,274 B, accept 39.59%)",
        # deep slices of a quantized target calibrate in part A's alpha
        # regime (~1e-4..1e-2), NOT part B's bf16-pair ~0.1: the first
        # run's [0.05, 0.6] bracket measured accept 0.000 everywhere
        "lo": 1e-5, "hi": 0.05,
    },
    "row3": {
        "draft_ref": "qwen1.5-0.5b",
        "accept": 0.3365,
        "ref_tps": 11.63,
        "ref_row": "experiment_results_table.md:9 (wall 1761.41s, comm "
                   "423.92s, 14,923,620 B, accept 33.65%)",
        "lo": 1e-5, "hi": 0.05,
    },
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_row(spec):
    from duodecoding_tpu.models import resolve_config
    from duodecoding_tpu.models.quant import fuse_params
    from duodecoding_tpu.models.surgery import (
        init_random_quant_params, param_bytes, scale_residual, truncate_model,
    )

    cfg = resolve_config("qwen1.5-7b")
    dref = resolve_config(spec["draft_ref"])
    k_draft = max(1, round(dref.num_params / cfg.num_params * cfg.num_layers))
    log(f"[dssd-rows] target {cfg.name} INT4 ({cfg.num_params/1e9:.2f}B), "
        f"draft = first {k_draft}/{cfg.num_layers} layers "
        f"(~{dref.name} cost ratio {dref.num_params/cfg.num_params:.3f})")

    t0 = time.time()
    qparams = fuse_params(
        init_random_quant_params(cfg, jax.random.PRNGKey(0), GROUP))
    jax.block_until_ready(qparams["embed"])
    log(f"[dssd-rows] init {time.time()-t0:.1f}s, "
        f"{param_bytes(qparams)/1e9:.2f} GB packed")

    rng = np.random.default_rng(1)
    prompts = rng.integers(1, cfg.vocab_size, (N_PROMPTS + 1, PLEN))

    def measure(alpha):
        tp = scale_residual(qparams, alpha)
        dcfg, dp = truncate_model(cfg, tp, k_draft)
        eng = make_engine(cfg, tp, dcfg, dp, gamma=GAMMA, max_tokens=MAX_NEW,
                          max_seq_len=S, int8_kv=True, comm=True)
        eng.run("dist_split_spec", prompts[0][None, :], transfer_top_k=1024)
        toks = 0
        wall = comm = data = 0.0
        connects = tgt_fwd = iters = rejects = 0
        accepts = []
        for i in range(N_PROMPTS):
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
                1 for r in m["draft_accept_rate_history"] if r < 1.0)
            accepts.append(m["draft_accepted_tokens"]
                           / max(m["draft_generated_tokens"], 1))
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

    # bisect on THIS row's accept contract (bench.calibrate_on_measurement
    # is pinned to part A's 0.562)
    lo, hi, best = spec["lo"], spec["hi"], None
    for it in range(12):
        alpha = math.sqrt(lo * hi)
        res = measure(alpha)
        log(f"[dssd-rows] calibrate alpha={alpha:.5f} "
            f"accept={res['accept']:.3f} tps={res['tps']:.2f}")
        if best is None or abs(res["accept"] - spec["accept"]) < abs(
                best["accept"] - spec["accept"]):
            best = res
        if abs(res["accept"] - spec["accept"]) <= 0.015:
            break
        if res["accept"] > spec["accept"]:
            lo = alpha
        else:
            hi = alpha

    # ref-like accounting (see bench.py part_b_dssd reconciliation):
    # reject-path full-vocab rows excluded from transfer time, the
    # reference regime's 50 ms/forward batch_delay queuing added
    ntt_s = 0.010
    bw_bytes = 23.6 * (1024 * 1024 / 8)
    ntt_time = best["transfers"] * ntt_s
    reject_row_bytes = best["reject_iters"] * cfg.vocab_size * 2
    compute_time = best["wall_time"] - best["comm_time"]
    uplink_time = max(best["data_bytes"] - reject_row_bytes, 0) / bw_bytes
    ref_like_wall = (compute_time + ntt_time + uplink_time
                     + 0.05 * best["target_forwards"])
    toks = max(best["tokens"], 1)
    return {
        "target": cfg.name,
        "draft_layers": k_draft,
        "draft_cost_of": spec["draft_ref"],
        "accept_contract": spec["accept"],
        "accept_measured": round(best["accept"], 4),
        "alpha": best["alpha"],
        "tps": round(best["tps"], 3),
        "reference_tps": spec["ref_tps"],
        "vs_reference": round(best["tps"] / spec["ref_tps"], 3),
        "comm_time_s": round(best["comm_time"], 2),
        "wall_time_s": round(best["wall_time"], 2),
        "bytes_per_token": round(best["data_bytes"] / toks, 1),
        "transfers_per_iter": round(
            best["transfers"] / max(best["iters"], 1), 3),
        "ref_like_tps": round(toks / ref_like_wall, 3),
        "ref_like_vs_reference": round(
            (toks / ref_like_wall) / spec["ref_tps"], 3),
        "reference_row": spec["ref_row"],
    }


def main():
    which = sys.argv[1:] or list(ROWS)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DSSD_ROWS.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name in which:
        log(f"[dssd-rows] === {name}: {ROWS[name]['ref_row']}")
        results[name] = measure_row(ROWS[name])
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        log(f"[dssd-rows] {name}: {results[name]['tps']} tok/s at accept "
            f"{results[name]['accept_measured']} = "
            f"{results[name]['vs_reference']}x ref "
            f"(ref-like {results[name]['ref_like_vs_reference']}x)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
