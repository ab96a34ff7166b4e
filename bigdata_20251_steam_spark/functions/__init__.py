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
from .timeutil import (
    epoch_seconds,
    epoch_seconds_sql,
    normalize_ntz,
)

__all__ = [
    "epoch_seconds",
    "epoch_seconds_sql",
    "normalize_ntz",
    "HASH_PRIME",
    "MINHASH_PARAMS",
    "md5_long",
    "md5_long_sql",
    "rademacher_planes",
    "STOPWORDS",
    "clean_html",
    "tokens_col",
]
