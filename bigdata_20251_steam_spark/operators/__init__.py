from .core import (
    sentiment_windows,
    review_bomb,
    explode_counts,
    activity_windows,
)

__all__ = [
    "sentiment_windows",
    "review_bomb",
    "explode_counts",
    "activity_windows",
]
