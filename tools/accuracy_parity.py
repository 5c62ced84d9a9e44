"""Produce ACCURACY_PARITY.json — the measured accuracy-parity artifact.

BASELINE.json's north star includes "accuracy parity" at the flagship
bit-widths. With zero egress (no real checkpoints), the strongest
measurable substantiation is: build a REAL tiny HF Llama (torch), load
the same weights into this framework, and show the END-TASK metric
(GSM8K-style answer extraction) agrees with the independent HF stack for
every flagship engine variant — bf16 AR, chain SD, INT4-draft SD,
INT4-draft + INT8-KV tree SD, and beam-tree SD. Greedy losslessness makes
these deltas exactly zero when the stack is correct; this artifact
measures it end-to-end through the real extraction machinery instead of
asserting it.

Runs on CPU (~1-2 min): ``python tools/accuracy_parity.py``.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from duodecoding_tpu.engine.engine import Engine, EngineConfig, Tier
    from duodecoding_tpu.evalkit.ground_truth import task_metric_parity
    from duodecoding_tpu.models.loader import (
        config_from_hf,
        params_from_hf_state_dict,
    )
    from duodecoding_tpu.models.quant import quantize_params
    from duodecoding_tpu.models.surgery import truncate_model

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, "parity-tiny")
    params = params_from_hf_state_dict(cfg, model.state_dict(), jnp.float32)

    # draft = 2-layer prefix slice of the target; INT4 variant quantized
    dcfg, dparams = truncate_model(cfg, params, 2)
    dparams_int4 = quantize_params(dparams, group_size=32)

    def make(int8_kv=False):
        return lambda d, dc: Engine(
            target=Tier(cfg, params),
            draft=Tier(dc, d),
            config=EngineConfig(
                max_tokens=24, gamma=3, max_seq_len=256,
                param_dtype=jnp.float32, cache_dtype=jnp.float32,
                int8_kv_target=int8_kv,
            ),
        )

    eng_bf = make()(dparams, dcfg)
    eng_i4 = make()(dparams_int4, dcfg)
    eng_i4_i8 = make(int8_kv=True)(dparams_int4, dcfg)

    variants = {
        "ar": (eng_bf, "large", {}),
        "sd": (eng_bf, "sd", {}),
        "sd_int4_draft": (eng_i4, "sd", {}),
        "sd_tree_int4_int8kv": (
            eng_i4_i8, "sd_tree", {"tree_spec": (2, 2, 1)},
        ),
        "sd_beam_int4_int8kv": (
            eng_i4_i8, "sd_beam",
            {"beam_k": 4, "beam_depth": 3, "n_nodes": 10},
        ),
    }
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, 12) for _ in range(6)]
    report = task_metric_parity(model, variants, prompts, max_new_tokens=24)
    report["model"] = "real tiny HF LlamaForCausalLM (random init, seed 0)"
    report["note"] = (
        "gold = independent HF torch greedy output; agreement is the "
        "GSM8K-extraction end-task metric match rate; 1.0 across variants "
        "substantiates the accuracy-parity clause within sandbox limits "
        "(no checkpoints; zero egress)"
    )
    path = os.path.join(os.path.dirname(__file__), "..", "ACCURACY_PARITY.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
