from picdexer_spark.functions.tokenize import (
    TOKEN_PATTERN,
    tokenize_py,
    tokens_col,
    term_freqs_py,
)

__all__ = ["TOKEN_PATTERN", "tokenize_py", "tokens_col", "term_freqs_py"]
