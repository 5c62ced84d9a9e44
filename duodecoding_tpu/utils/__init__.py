from duodecoding_tpu.utils.tokenizer import ByteTokenizer, get_tokenizer

__all__ = ["ByteTokenizer", "get_tokenizer"]
