"""Tokenizer resolution with an offline fallback.

The reference loads HF tokenizers per model with a sharing special case for
Llama-2 pairs (reference: src/engine.py:500-535). Here ``get_tokenizer``
tries HF AutoTokenizer and falls back to a deterministic byte-level
tokenizer when no checkpoint is reachable (zero-egress environments), so
the full eval harness stays runnable end-to-end with random-weight models.
"""

from __future__ import annotations


class ByteTokenizer:
    """UTF-8 byte tokenizer: token = byte value + 3 (0=pad, 1=bos, 2=eos)."""

    pad_token_id = 0
    bos_token_id = 1
    eos_token_id = 2
    _OFFSET = 3

    def __init__(self, vocab_size: int = 512):
        self.vocab_size = max(vocab_size, 256 + self._OFFSET)

    def encode(self, text: str, add_bos: bool = True) -> list[int]:
        ids = [b + self._OFFSET for b in text.encode("utf-8")]
        return ([self.bos_token_id] + ids) if add_bos else ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        bs = bytearray()
        for i in ids:
            i = int(i)
            if i >= self._OFFSET and i < 256 + self._OFFSET:
                bs.append(i - self._OFFSET)
            elif not skip_special_tokens:
                bs.extend(f"<{i}>".encode())
        return bs.decode("utf-8", errors="replace")

    def __call__(self, text: str, return_tensors=None):
        import numpy as np

        ids = self.encode(text)
        if return_tensors == "np":
            return {"input_ids": np.array([ids], dtype=np.int64)}
        return {"input_ids": [ids]}


def get_tokenizer(name_or_path: str | None, vocab_size: int = 512):
    """HF tokenizer if loadable, else the byte fallback."""
    if name_or_path:
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(name_or_path)
        except Exception:
            pass
    return ByteTokenizer(vocab_size=vocab_size)
