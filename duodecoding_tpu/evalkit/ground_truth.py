"""Independent accuracy ground-truthing outside the SD engine.

The reference ships a separate vLLM harness (reference:
test/eval_gsm8k_vllm.py, test/eval_humaneval_vllm.py) to verify task
accuracy with an engine that shares no code with the speculative stack.
The TPU-framework analog runs the same checkpoints through HF transformers
(torch CPU) greedy generation and compares outputs/accuracy — an
end-to-end cross-check that the jnp model, loader, and harness agree with
an independent implementation.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def hf_greedy_generate(
    model, input_ids: np.ndarray, max_new_tokens: int, eos_token_id: Optional[int] = None
) -> np.ndarray:
    """Greedy generation via HF transformers (torch, CPU)."""
    import torch

    with torch.no_grad():
        out = model.generate(
            torch.tensor(input_ids, dtype=torch.long),
            max_new_tokens=max_new_tokens,
            do_sample=False,
            num_beams=1,
            eos_token_id=eos_token_id,
            pad_token_id=eos_token_id if eos_token_id is not None else 0,
        )
    return out.numpy()


def cross_check_greedy(
    hf_model,
    engine,
    prompts: List[np.ndarray],
    max_new_tokens: int,
    mode: str = "large",
) -> dict:
    """Run the same prompts through HF generate and the engine's mode;
    return prefix-agreement statistics (1.0 = token-identical)."""
    from duodecoding_tpu.orchestrate.consistency import prefix_consistency

    ours, theirs = [], []
    for p in prompts:
        p = np.asarray(p, np.int64)
        hf_out = hf_greedy_generate(hf_model, p[None, :], max_new_tokens)
        out, _ = engine.run(mode, p[None, :].astype(np.int32))
        theirs.append(" ".join(str(t) for t in hf_out[0]))
        ours.append(" ".join(str(t) for t in np.asarray(out)[0]))
    return {
        "n_prompts": len(prompts),
        "prefix_consistency": prefix_consistency(ours, theirs),
    }
