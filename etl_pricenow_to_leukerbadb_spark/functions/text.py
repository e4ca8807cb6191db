"""Text-analysis column builders for large-scale document pipelines.

All pure Catalyst expressions (split/transform/filter/aggregate array
lambdas, regexp_count, md5) — JVM-side, no Python in the hot path.
Shared building blocks for quality scoring, language ID, token
counting, fingerprinting, and the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword-vote
#: language heuristic; order = tie-break priority.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "des"),
    "es": ("el", "los", "las", "y", "es", "una"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}

#: BPE-style pre-tokenizer: word pieces or single non-space symbols.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_text(c: Column | str) -> Column:
    """Canonical form for fingerprinting: collapse whitespace, trim, lower."""
    c = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalize_text(c), " ")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column | str) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def stopword_count(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def word_shingles(toks: Column, k: int, sep: str = " ") -> Column:
    """All k-gram word shingles of a token array (empty if < k tokens)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + F.lit(1), F.lit(k)), sep))
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def char_shingles_min_md5(c: Column | str, k: int = 8) -> Column:
    """Winnowing-style fingerprint: the minimum md5 over all k-char
    shingles of the normalized text (deterministic, order-free)."""
    t = normalize_text(c)
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_min(F.transform(idx, lambda i: F.md5(t.substr(i, F.lit(k)).cast("binary"))))


def content_fingerprint(c: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(c).cast("binary"))


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_count(toks, words) for lang, words in LANG_STOPWORDS.items()}


def lang_predict(toks: Column) -> Column:
    """Stopword-vote language ID with deterministic priority-order
    tie-breaking (the dict order of LANG_STOPWORDS)."""
    scores = lang_scores(toks)
    langs = list(scores)
    expr = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        cond = cond if cond is not None else F.lit(True)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr


def quality_features(c: Column | str) -> dict[str, Column]:
    """Deterministic quality features: all ratios are double divisions
    of integer counts, so they compare exactly across engines.

    ``try_divide``, not ``/``: an empty document has n_chars = 0 (and
    a punctuation-only one n_tokens = 0), and 0.0/0 is NaN under IEEE
    double division — NaN then poisons averages and behaves
    surprisingly in comparisons. try_divide yields NULL for exactly
    those rows, which is also what DuckDB's default division-by-zero
    semantics produce, keeping the oracle comparison aligned on
    degenerate inputs."""
    c = F.col(c) if isinstance(c, str) else c
    toks = tokens(c)
    n_chars = F.length(c)
    n_toks = F.size(toks)
    return {
        "n_chars_calc": n_chars,
        "n_tokens": n_toks,
        "avg_token_len": F.try_divide(n_chars.cast("double"), n_toks),
        "punct_ratio": F.try_divide(
            F.regexp_count(c, F.lit(r"[.,!?;:]")).cast("double"), n_chars
        ),
        "stop_ratio": F.try_divide(
            stopword_count(toks, LANG_STOPWORDS["en"]).cast("double"), n_toks
        ),
    }


def quality_rule_flags(c: Column | str) -> dict[str, Column]:
    """The Gopher/MassiveText-style rule gate as reusable column
    expressions — the single source of truth shared by the
    ``tx_quality_filter`` registry query and the composed
    ``orchestrate.curate_corpus_daily`` job (so the gate a pipeline
    applies is exactly the gate the oracle verifies): length bounds,
    mean-token-length bounds, must-contain-stopwords, repetition
    ceiling, each as its own boolean (audit: which rule killed a doc)
    plus the ``keep`` conjunction. One expression-only pass, zero
    shuffle."""
    c = F.col(c) if isinstance(c, str) else c
    toks = tokens(c)
    n_tokens = F.size(toks)
    avg_tok = F.length(c).cast("double") / n_tokens
    n_stop = stopword_count(toks, LANG_STOPWORDS["en"])
    tri = word_shingles(toks, 3)
    dup_ratio = F.lit(1.0) - F.size(F.array_distinct(tri)).cast(
        "double"
    ) / F.greatest(F.size(tri), F.lit(1)).cast("double")
    ok_length = n_tokens.between(5, 1000)
    ok_token_len = avg_tok.between(2.0, 12.0)
    ok_stop = n_stop > 0
    ok_rep = dup_ratio < 0.5
    return {
        "ok_length": ok_length,
        "ok_token_len": ok_token_len,
        "ok_stopwords": ok_stop,
        "ok_repetition": ok_rep,
        "keep": ok_length & ok_token_len & ok_stop & ok_rep,
    }


def repetition_features(c: Column | str) -> dict[str, Column]:
    """Word-level repetition features (Gopher/MassiveText-style
    filters use these alongside the n-gram dup ratio the
    ``tx_repetition`` query computes):

    - ``dup_word_ratio``: 1 - distinct/total over whitespace tokens,
    - ``dup_2gram_ratio``: same over word 2-grams (NULL when the doc
      has fewer than 2 tokens — try_divide, matching DuckDB's
      division-by-zero NULL),
    - ``top_word_frac``: frequency of the most common token / total.

    All pure array-lambda expressions. ``top_word_frac`` counts each
    distinct token's occurrences with a nested filter — O(distinct x
    n_tokens) per row, fine through book-length documents; for
    pathological inputs (millions of tokens of near-unique words) an
    ``array_sort`` + run-length ``aggregate`` form is the O(n log n)
    alternative, at the cost of a DuckDB-inexpressible oracle."""
    toks = tokens(c)
    n = F.size(toks)
    grams2 = word_shingles(toks, 2)
    top_count = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda w: F.size(F.filter(toks, lambda x: x == w)),
        )
    )
    return {
        "dup_word_ratio": F.lit(1.0)
        - F.try_divide(F.size(F.array_distinct(toks)).cast("double"), n),
        "dup_2gram_ratio": F.lit(1.0)
        - F.try_divide(F.size(F.array_distinct(grams2)).cast("double"), F.size(grams2)),
        "top_word_frac": F.try_divide(top_count.cast("double"), n),
    }


#: PII patterns, applied in this order (emails first — they contain
#: dots and digits that the later patterns could otherwise nibble at).
#: Kept to syntax both Java regex (Spark) and RE2 (DuckDB) agree on:
#: no backreferences, no lookaround.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\+\d[\d -]{7,}\d"),
)


def scrub_pii(c: Column | str) -> Column:
    """Redact emails, IPv4 addresses and international phone numbers
    with ``[EMAIL]``/``[IP]``/``[PHONE]`` placeholders — the standard
    pre-training scrub pass. Pure chained ``regexp_replace`` (JVM-side,
    streaming-safe, no shuffle)."""
    c = F.col(c) if isinstance(c, str) else c
    for label, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"[{label}]")
    return c


def pii_counts(c: Column | str) -> dict[str, Column]:
    """Per-category PII hit counts (for scrub audits / doc filtering).
    Counted on the raw text, before any replacement."""
    c = F.col(c) if isinstance(c, str) else c
    return {
        f"n_{label.lower()}": F.regexp_count(c, F.lit(pat))
        for label, pat in PII_PATTERNS
    }


def chunk_windows_udtf():
    """Spark 4 Python UDTF form of context-window chunking — one input
    row fans out to one row per (chunk_size, stride) window. The
    expression form (plans: tx_chunk_windows) is the production path
    (JVM-side, no Python); this demonstrates the lateral-join UDTF API
    for chunkers that need real tokenizers (BPE libraries) and is
    pytest-verified to agree with the expression form on whitespace
    tokens.

    Returns the registered-callable; use with
    ``udtf_fn(lit(chunk), lit(stride), col("doc_id"), col("text"))``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, chunk_text string, n_tokens int")
    class ChunkWindows:
        def eval(self, chunk_size: int, stride: int, doc_id: int, text: str):
            toks = [t for t in (text or "").lower().split() if t]
            if not toks:
                toks = [""]
            for start in range(0, len(toks), stride):
                window = toks[start : start + chunk_size]
                yield doc_id, start + 1, " ".join(window), len(window)

    return ChunkWindows
