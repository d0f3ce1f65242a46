from homemade_vector_db_spark.functions.vector import (
    as_double,
    squared_l2,
    dot,
    l2_norm,
    cosine,
    l2_to_similarity,
)
from homemade_vector_db_spark.functions.text import tokenize, tokenize_expr

__all__ = [
    "as_double",
    "squared_l2",
    "dot",
    "l2_norm",
    "cosine",
    "l2_to_similarity",
    "tokenize",
    "tokenize_expr",
]
