from .hashing import (
    HASH_PRIME,
    MINHASH_PARAMS,
    md5_long,
    md5_long_sql,
    rademacher_planes,
)
from .text import (
    STOPWORDS,
    clean_html,
    tokens_col,
)

__all__ = [
    "HASH_PRIME",
    "MINHASH_PARAMS",
    "md5_long",
    "md5_long_sql",
    "rademacher_planes",
    "STOPWORDS",
    "clean_html",
    "tokens_col",
]
