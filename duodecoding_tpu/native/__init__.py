from duodecoding_tpu.native.draft_retriever import DraftReader, DraftWriter

__all__ = ["DraftReader", "DraftWriter"]
