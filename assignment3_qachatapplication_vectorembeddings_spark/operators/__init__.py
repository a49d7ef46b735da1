from .topk import topk_cosine

__all__ = ["topk_cosine"]
