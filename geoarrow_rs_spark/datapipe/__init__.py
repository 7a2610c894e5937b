from . import corpus, dedup, multimodal, sampling, similarity, text

__all__ = ["corpus", "dedup", "sampling", "similarity", "text", "multimodal"]
