"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side column expressions where possible (regexp/size/aggregate —
whole-stage codegen, no Python), so each one is also SQL-expressible
for the DuckDB oracle. Only the n-gram language scorer drops to a
vectorized pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ela_lib_spark.functions.text import tokenize_col

# Deterministic stopword profiles for the n-gram/stopword language
# heuristic (public common-word lists, truncated).
LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on", "with", "as", "at"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich", "des", "dem", "zu", "von"},
    "fr": {"le", "la", "les", "et", "des", "est", "un", "une", "du", "que", "pour", "dans", "qui", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "del", "que", "por", "con", "para", "no"},
}


def token_count(text_col) -> Column:
    """Token count with the engine tokenizer — JVM-side."""
    return F.size(tokenize_col(text_col)).cast("long")


def whitespace_token_count(text_col) -> Column:
    return F.size(F.filter(F.split(text_col, r"\s+"), lambda t: t != F.lit(""))).cast("long")


def bpe_ish_token_count(text_col) -> Column:
    """A BPE-ish proxy: count of sub-word units under the GPT-2-style
    pre-tokenization regex family — contiguous letter runs, digit runs,
    and single non-space punctuation marks."""
    units = F.regexp_extract_all(
        text_col, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), F.lit(1)
    )
    return F.size(units).cast("long")


def punct_ratio(text_col) -> Column:
    n = F.length(text_col)
    p = n - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def alpha_ratio(text_col) -> Column:
    n = F.length(text_col)
    a = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", ""))
    return F.when(n > 0, a.cast("double") / n).otherwise(F.lit(0.0))


def mean_token_len(text_col) -> Column:
    toks = tokenize_col(text_col)
    total = F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(text_col, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in sorted(LANG_STOPWORDS[lang])])
    toks = tokenize_col(text_col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text_col) -> Column:
    """Composite heuristic quality score in [0, 1]: length band +
    low punctuation + alpha density + stopword presence."""
    n_tok = token_count(text_col).cast("double")
    len_ok = F.when((n_tok >= 20) & (n_tok <= 5000), F.lit(1.0)).otherwise(
        F.when(n_tok > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    score = (
        0.4 * len_ok
        + 0.2 * (1.0 - F.least(punct_ratio(text_col) * 4.0, F.lit(1.0)))
        + 0.2 * alpha_ratio(text_col)
        + 0.2 * F.least(stopword_ratio(text_col) * 5.0, F.lit(1.0))
    )
    return F.round(score, 6)


def doc_fingerprint(text_col) -> Column:
    """64-bit content fingerprint over the *analyzed* token stream —
    robust to case/punctuation changes (vs operators.diff.content_hash
    which fingerprints the raw row)."""
    return F.xxhash64(F.concat_ws("\x1f", tokenize_col(text_col)))


@F.pandas_udf(T.StringType())
def detect_lang(text: pd.Series) -> pd.Series:
    """Stopword-profile language ID (deterministic heuristic).

    Returns the language whose stopword hit-count over the first 200
    tokens is highest; 'und' (undetermined) when nothing hits.
    """
    langs = sorted(LANG_STOPWORDS)
    out = []
    for t in text:
        if t is None:
            out.append(None)
            continue
        toks = t.lower().split()[:200]
        if not toks:
            out.append("und")
            continue
        best, best_n = "und", 0
        for lg in langs:
            n = sum(1 for tok in toks if tok in LANG_STOPWORDS[lg])
            if n > best_n:
                best, best_n = lg, n
        out.append(best)
    return pd.Series(out)


def rolling_hashes(tokens: list[str], window: int = 8, base: int = 1000003,
                   mod: int = (1 << 61) - 1) -> np.ndarray:
    """Karp–Rabin rolling hashes over token hash stream (numpy,
    vectorized) — building block for winnowing fingerprints."""
    if len(tokens) < window:
        return np.zeros(0, np.uint64)
    h = np.array([hash_token(t) for t in tokens], dtype=np.uint64)
    powers = np.array([pow(base, window - 1 - i, mod) for i in range(window)],
                      dtype=object)
    vals = np.lib.stride_tricks.sliding_window_view(h, window).astype(object)
    return ((vals * powers).sum(axis=1) % mod).astype(np.uint64)


def hash_token(t: str) -> int:
    import zlib

    return zlib.crc32(t.encode("utf-8"))
