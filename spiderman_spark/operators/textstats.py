"""Text-analysis operators for large-scale corpus curation.

Beyond the reference's operator set (SURVEY.md §2 marks these as engine
additions for training-data pipelines): language ID, quality scoring, token
counting, document fingerprinting.  All are pure Column expressions — they
stay inside whole-stage codegen; no Python in the hot path.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language stopword lists for the stopword-ratio heuristic language ID —
# 14 whitespace-tokenized languages (Latin + Cyrillic scripts; CJK needs a
# segmenter and is out of scope for the whitespace tokenizer).  Lists are
# deliberately UNEQUAL in length: the score is hits normalized by list size
# (basis points), so a longer list never wins just by having more chances.
# Cross-language collisions (fr/es 'la', sv/da/tr 'en', pt/nl/ro 'de', …) are
# expected and resolved by the normalized argmax.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "with", "that", "it",
           "was", "for", "on", "as", "his", "are"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans",
           "pour", "que", "pas", "sur"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para",
           "pero", "más", "como", "sus"],
    "de": ["der", "die", "das", "und", "ist", "mit", "ein", "eine", "nicht",
           "auf", "sich", "dem", "auch", "für"],
    "it": ["il", "di", "che", "per", "del", "sono", "anche", "come", "più",
           "della", "nel", "alla"],
    "pt": ["o", "os", "de", "que", "não", "uma", "para", "com", "mais", "por",
           "como", "dos"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "met", "voor",
           "zijn", "aan", "ook"],
    "sv": ["och", "att", "det", "som", "en", "är", "på", "för", "med", "inte",
           "av", "han"],
    "da": ["og", "det", "at", "en", "den", "til", "er", "som", "på", "med",
           "han", "ikke"],
    "pl": ["nie", "się", "na", "jest", "do", "że", "z", "po", "jak", "ale",
           "co", "tak"],
    "tr": ["bir", "ve", "bu", "da", "ne", "için", "ile", "ama", "gibi",
           "daha", "çok", "en"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini",
           "dari", "dalam", "akan", "pada"],
    "ro": ["și", "de", "în", "la", "cu", "pe", "este", "un", "care", "nu",
           "mai", "din"],
    "ru": ["и", "в", "не", "на", "что", "он", "с", "как", "это", "по", "но",
           "она", "они", "его"],
}


def tokens(col) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(col), r"\s+")


# Simplified GPT-2 pre-tokenizer: contraction suffixes, space-prefixed letter
# runs, digit runs, punctuation runs.  No lookahead, so the SAME pattern runs
# under Java regex (Spark) and RE2 (DuckDB oracle) with identical matches;
# whitespace runs are simply not extracted, so the count is non-whitespace
# tokens — a ~chars/4 LLM-token estimate without a vocab file.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(col) -> Column:
    """BPE-ish pre-tokenization (array of token strings, JVM regex engine)."""
    return F.regexp_extract_all(col, F.lit(BPE_SPLIT_RE), 0)


def bpe_token_count(col) -> Column:
    return F.size(bpe_tokens(col))


def token_count(col) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def stopword_hits(col, lang: str) -> Column:
    """Number of (lowercased) tokens that are stopwords of ``lang``
    (higher-order fn, JVM)."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, F.lower(t))))


def stopword_score_bp(col, lang: str) -> Column:
    """Ratio-normalized stopword score in basis points of the LIST size:
    floor(hits × 10000 / |stopword list|) — list lengths vary, so raw hit
    counts are not comparable across languages but this is."""
    n = len(LANG_STOPWORDS[lang])
    return F.floor(stopword_hits(col, lang) * 10000 / F.lit(n)).cast("long")


def _stopword_mask_map():
    """Literal map token → 14-bit language-membership mask (bit i set when
    the token is a stopword of language i in ``LANG_STOPWORDS`` order).
    Cross-language shared words ('de' in de/pt/nl/ro) carry multiple bits."""
    langs = list(LANG_STOPWORDS)
    mask: dict[str, int] = {}
    for i, lang in enumerate(langs):
        for w in LANG_STOPWORDS[lang]:
            mask[w] = mask.get(w, 0) | (1 << i)
    # ONE parsed expression for the whole literal map, not 2 py4j lit()
    # round trips per stopword (~320 at 159 distinct words) — the same
    # plan-assembly hotspot with_hist_rank / _lit_dvec removed.  Values are
    # identical: a parsed '...' string IS the same UTF8String literal, and
    # the masks are int literals either way (see functions.sqllit).
    from ..functions.sqllit import lit_str_map

    return lit_str_map(mask), langs


def lang_id(col) -> Column:
    """Heuristic language ID over 14 languages: argmax of ratio-normalized
    per-language stopword scores (ties break to the lexicographically larger
    language code — a total order both engines share); 'und' (undetermined)
    when no list scores > 0.

    SINGLE pass over the token array (round-4 verdict #5): one ``aggregate``
    folds every token through a token→language-bitmask map literal into a
    14-wide hit-count array — the previous shape ran 14 independent
    filter scans of the token array (one per language), visible as a 2×
    q21 wall regression when the language set grew.  Score semantics are
    bit-identical to ``stopword_score_bp`` (hits normalized by list size in
    basis points).  Pure Column exprs, whole-stage codegen."""
    mask_map, langs = _stopword_mask_map()
    zeros = F.array_repeat(F.lit(0), len(langs))
    powers = F.array(*[F.lit(1 << i) for i in range(len(langs))])
    # per token: ONE map lookup (bound via a single-element transform — the
    # Column API has no let), then 14 bit tests folded into the count array.
    # Non-stopword tokens (the overwhelming majority of web text) short-
    # circuit on the null lookup and return acc untouched — no array rebuild
    counts = F.aggregate(
        tokens(col),
        zeros,
        lambda acc, t: F.element_at(
            F.transform(
                F.array(F.element_at(mask_map, F.lower(t))),
                lambda m: F.when(m.isNull(), acc).otherwise(
                    F.zip_with(
                        acc,
                        powers,
                        lambda c, p: c
                        + F.when(m.bitwiseAND(p) > 0, F.lit(1)).otherwise(F.lit(0)),
                    )
                ),
            ),
            1,
        ),
    )
    scores = [
        F.struct(
            F.floor(
                F.element_at(counts, i + 1) * 10000 / F.lit(len(LANG_STOPWORDS[lang]))
            )
            .cast("long")
            .alias("s"),
            F.lit(lang).alias("l"),
        )
        for i, lang in enumerate(langs)
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


def winnow_fingerprints(df, id_col: str, text_col: str, k: int = 8, w: int = 4):
    """MOSS-style winnowing fingerprints: (did, fp) — the rolling-hash
    document fingerprint set used for plagiarism/overlap detection.

    Every character k-gram is hashed (first 16 hex chars of md5 — the
    fixed-width family whose lexicographic min equals numeric min and which
    DuckDB reproduces verbatim), then each window of ``w`` consecutive
    hashes contributes its minimum; the distinct minima are the document's
    fingerprint set.  Guarantees: any shared substring of length >= k+w-1
    yields at least one shared fingerprint (the winnowing theorem), with a
    ~2/(w+1) sampling density.

    Scale posture: the whole pipeline is higher-order Column expressions
    (sequence → transform → slice → array_min) inside whole-stage codegen —
    one narrow projection per document, no Python, no shuffle; output is
    fingerprint-set-proportional.  Cost is O(len·k) hashing + O(len·w)
    window minima per doc, embarrassingly row-parallel."""
    c = F.col(text_col)
    n = F.greatest(F.length(c) - (k - 1), F.lit(0))
    m = F.greatest(n - (w - 1), F.lit(0))
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard empties
    empty_s = F.array().cast("array<string>")
    hs = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.substring(F.md5(c.substr(i, F.lit(k))), 1, 16),
        ),
    ).otherwise(empty_s)
    staged = df.select(F.col(id_col).alias("did"), m.alias("m"), hs.alias("hs"))
    fps = F.when(
        F.col("m") >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.col("m")),
                lambda j: F.array_min(F.slice(F.col("hs"), j, w)),
            )
        ),
    ).otherwise(empty_s)
    return staged.select("did", F.explode(fps).alias("fp"))
