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

    # draft = 2-layer prefix slice of the target; INT4 variant quantized;
    # little = 1-layer slice (the 3-tier modes' end tier)
    dcfg, dparams = truncate_model(cfg, params, 2)
    dparams_int4 = quantize_params(dparams, group_size=32)
    lcfg, lparams = truncate_model(cfg, params, 1)

    MAX_NEW = 64  # round 5: was 24 (VERDICT r4 item 8)

    def make(int8_kv=False, little=None):
        return lambda d, dc: Engine(
            target=Tier(cfg, params),
            draft=Tier(dc, d),
            little=Tier(lcfg, lparams) if little else None,
            config=EngineConfig(
                max_tokens=MAX_NEW, gamma=3, max_seq_len=256,
                param_dtype=jnp.float32, cache_dtype=jnp.float32,
                int8_kv_target=int8_kv,
            ),
        )

    eng_bf = make()(dparams, dcfg)
    eng_i4 = make()(dparams_int4, dcfg)
    eng_i4_i8 = make(int8_kv=True)(dparams_int4, dcfg)
    eng_tri = make(little=True)(dparams, dcfg)

    # eagle2_fused: a briefly self-distilled feature head on the target's
    # own rollouts — losslessness (and hence metric parity) holds at ANY
    # head quality, so a short distillation suffices for this artifact
    from duodecoding_tpu.adaptive.eagle import (
        collect_eagle_data, init_eagle_params, train_eagle,
    )

    e_rng = np.random.default_rng(77)
    e_prompts = e_rng.integers(1, cfg.vocab_size, (8, 12))
    e_data = collect_eagle_data(params, cfg, e_prompts, max_new=32)
    eparams = init_eagle_params(
        jax.random.PRNGKey(7), cfg, num_layers=1, dtype=jnp.float32
    )
    eparams, _ = train_eagle(
        eparams, cfg, params["embed"], params["lm_head"], *e_data,
        epochs=40, lr=1e-3,
    )

    variants = {
        "ar": (eng_bf, "large", {}),
        # int8-KV AR control: its HF divergence is the pure bit-width
        # effect — the SD variants on the same engine must match it
        # exactly (lossless_vs_own_ar 1.0) for speculation to be exact
        "ar_int8kv": (eng_i4_i8, "large", {}),
        "sd": (eng_bf, "sd", {}),
        "sd_int4_draft": (eng_i4, "sd", {}),
        "sd_tree_int4_int8kv": (
            eng_i4_i8, "sd_tree", {"tree_spec": (2, 2, 1)},
        ),
        "sd_beam_int4_int8kv": (
            eng_i4_i8, "sd_beam",
            {"beam_k": 4, "beam_depth": 3, "n_nodes": 10},
        ),
        # round-5 additions: the staged 3-tier family + feature drafting
        "tridecoding": (eng_tri, "tridecoding", {"transfer_top_k": 32}),
        "cee_sd": (
            eng_tri, "adaptive_tridecoding", {"transfer_top_k": 32},
        ),
        "eagle2_fused": (
            eng_bf, "eagle2_fused",
            {"eagle_params": eparams, "depth": 3, "top_k": 4,
             "n_nodes": 10},
        ),
    }
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, 12) for _ in range(16)]
    report = task_metric_parity(model, variants, prompts,
                                max_new_tokens=MAX_NEW)
    report["model"] = "real tiny HF LlamaForCausalLM (random init, seed 0)"
    report["note"] = (
        "gold = independent HF torch greedy output over a fixed 64-token "
        "horizon; agreement is the GSM8K-extraction end-task metric match "
        "rate. lossless_vs_own_ar = exact token identity vs the same "
        "engine's AR output (the greedy-losslessness contract): 1.0 "
        "everywhere means the decoding stack is exact; the INT8-KV "
        "variants' HF deltas equal the ar_int8kv control's, i.e. they "
        "are the cache bit-width, not speculation"
    )
    path = os.path.join(os.path.dirname(__file__), "..", "ACCURACY_PARITY.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
