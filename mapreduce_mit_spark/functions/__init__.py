from .textfns import TOKEN_SPLIT_RE, tokens_col, tokens_sql, words_df
from .hashing import minhash_cols, minhash_sql_exprs, norm_text_col, norm_text_sql

__all__ = [
    "TOKEN_SPLIT_RE",
    "tokens_col",
    "tokens_sql",
    "words_df",
    "minhash_cols",
    "minhash_sql_exprs",
    "norm_text_col",
    "norm_text_sql",
]
