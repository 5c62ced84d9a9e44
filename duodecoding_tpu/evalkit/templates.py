"""Chat prompt templates (fastchat-free).

The reference builds multi-turn conversations with fastchat templates
(reference: eval/eval_mt_bench_noeval.py:252-306). Equivalent templates for
the model families in the zoo, as plain functions.
"""

from __future__ import annotations


def vicuna_prompt(turns: list[tuple[str, str | None]]) -> str:
    """turns: [(user_msg, assistant_msg_or_None)] — last assistant None."""
    sys = (
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions."
    )
    out = sys + " "
    for user, asst in turns:
        out += f"USER: {user} ASSISTANT:"
        if asst is not None:
            out += f" {asst}</s>"
    return out


def qwen_prompt(turns: list[tuple[str, str | None]]) -> str:
    out = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    for user, asst in turns:
        out += f"<|im_start|>user\n{user}<|im_end|>\n<|im_start|>assistant\n"
        if asst is not None:
            out += f"{asst}<|im_end|>\n"
    return out


def plain_prompt(turns: list[tuple[str, str | None]]) -> str:
    out = ""
    for user, asst in turns:
        out += f"Q: {user}\nA:"
        if asst is not None:
            out += f" {asst}\n"
    return out


TEMPLATES = {
    "vicuna": vicuna_prompt,
    "qwen": qwen_prompt,
    "plain": plain_prompt,
}


def get_template(name: str):
    return TEMPLATES.get(name, plain_prompt)
