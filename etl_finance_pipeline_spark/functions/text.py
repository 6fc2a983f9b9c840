"""Text primitives for the training-data pipeline operators —
tokenization, shingling, and metric expressions.

Everything is a pure Catalyst expression (JVM-side, whole-stage
codegen): no Python UDFs anywhere in the text path. All expressions
are *portable* — the identical computation is expressible in ANSI-ish
SQL (DuckDB) so every operator built on these can be verified against
the driver's oracle bit-for-bit (see plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword lists per language for the lang-ID heuristic and quality
#: scoring. Deliberately small + hardcoded: they are part of the
#: operator's deterministic contract (the oracle SQL embeds the same
#: lists), not a linguistic resource.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "los", "se"),
    "fr": ("le", "la", "de", "et", "est", "un", "une", "les", "des", "que"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "men5"),
}

#: Deterministic language priority for score ties (first wins).
LANG_PRIORITY: tuple[str, ...] = ("en", "de", "es", "fr", "zh")

#: BPE-ish token pattern: letter runs, digit runs, single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (lowercased). SQL twin:
    ``regexp_split_to_array(lower(trim(text)), '\\s+')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles joined by single spaces; empty array when the
    document has fewer than *k* tokens.

    SQL twin (1-based lists):
    ``list_transform(generate_series(1, len(toks)-k+1),
    i -> array_to_string(toks[i:i+k-1], ' '))``.
    """
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    return F.when(F.size(toks) >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]))
    ).otherwise(F.array().cast("array<string>"))


def stopword_hits(toks: Column, lang: str) -> Column:
    """Count of tokens present in *lang*'s stopword list.
    SQL twin: ``len(list_filter(toks, t -> t IN (...)))``."""
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def digit_ratio(col: Column | str) -> Column:
    """Fraction of characters that are digits. SQL twin:
    ``len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.length(c)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", "")) / F.length(c)


def bpe_ish_token_count(col: Column | str) -> Column:
    """Count of BPE-ish tokens (letter runs / digit runs / single
    punctuation) — a cheap proxy for subword token counts.
    SQL twin: ``len(regexp_extract_all(text, pattern))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))
