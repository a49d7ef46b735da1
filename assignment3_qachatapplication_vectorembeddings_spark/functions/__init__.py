from .similarity import cosine_sim, dot_product, l2_norm
from .textfns import (
    classify_paragraph,
    clean_markdown,
    filename_from_url,
    form_name_from_path,
    token_count_col,
)

__all__ = [
    "cosine_sim",
    "dot_product",
    "l2_norm",
    "classify_paragraph",
    "clean_markdown",
    "filename_from_url",
    "form_name_from_path",
    "token_count_col",
]
