"""Text-processing column helpers (JVM-side, no Python UDFs).

``clean_html`` re-expresses the reference's producer-side ``clean_html``
(``producers/steam_utils.py:38-42``: regex tag strip + html.unescape +
trim) as a builtin-function chain so it runs inside whole-stage codegen.
Entity unescape covers the named entities that actually occur in review
text; a full HTML5 entity table would need a pandas UDF — deliberately
avoided in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small per-language stopword lists for the heuristic language identifier.
#: Deliberately tiny and inlined into both engines' plans — this is an
#: n-gram/stopword heuristic, not a trained model.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
}

_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]


def clean_html(col: Column) -> Column:
    """Strip tags, unescape common entities, trim (steam_utils.py:38-42)."""
    out = F.regexp_replace(col, "<[^>]*>", "")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(out)


def clean_html_sql(expr: str) -> str:
    """DuckDB twin of :func:`clean_html`."""
    out = f"regexp_replace({expr}, '<[^>]*>', '', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim({out})"


def tokens_col(col: Column) -> Column:
    """Whitespace tokenization of already-clean text."""
    return F.split(F.trim(col), "\\s+")
