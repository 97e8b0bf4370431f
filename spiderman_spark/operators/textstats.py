"""Text-analysis operators for large-scale corpus curation.

Beyond the reference's operator set (SURVEY.md §2 marks these as engine
additions for training-data pipelines): language ID, quality scoring, token
counting, document fingerprinting.  All are pure Column expressions — they
stay inside whole-stage codegen; no Python in the hot path.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic language ID
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "with"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "de": ["der", "die", "das", "und", "ist", "mit", "ein", "eine"],
}


def tokens(col) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def stopword_hits(col, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (higher-order fn, JVM)."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def lang_id(col) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when no list scores > 0."""
    scores = [
        F.struct(stopword_hits(col, lang).alias("s"), F.lit(lang).alias("l"))
        for lang in LANG_STOPWORDS
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def punct_count(col) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))


def quality_score_components(col):
    """Length / punctuation / stopword-ratio quality components, scaled to
    integer basis points (deterministic cross-engine comparison)."""
    n_tok = token_count(col)
    n_chars = F.length(col)
    sw = stopword_hits(col, "en")
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_bp": (punct_count(col) * 10000 / F.greatest(n_chars, F.lit(1)))
        .cast("long"),
        "stopword_bp": (sw * 10000 / F.greatest(n_tok, F.lit(1))).cast("long"),
        "avg_token_len_x100": (
            (n_chars - n_tok + 1) * 100 / F.greatest(n_tok, F.lit(1))
        ).cast("long"),
    }


def fingerprint(col) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text."""
    return F.md5(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")))
