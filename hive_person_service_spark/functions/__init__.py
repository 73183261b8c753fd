from .text import shingles_expr, tokens_expr
from .vectors import cosine_expr, to_double_array

__all__ = ["shingles_expr", "tokens_expr", "cosine_expr", "to_double_array"]
