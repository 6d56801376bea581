from . import dedup, multimodal, similarity, textanalysis

__all__ = ["dedup", "multimodal", "similarity", "textanalysis"]
