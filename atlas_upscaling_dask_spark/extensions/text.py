"""Text analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length/
punctuation/stopword ratios), token counting (whitespace + a BPE-ish
regex), and document fingerprinting — all expressed with built-in
``pyspark.sql.functions`` (JVM-side, codegen'd; no Python UDFs in the
hot path), so they cost one narrow pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "et", "est", "de"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

# BPE-ish tokenization: words, numbers, or any single non-space symbol —
# the classic pre-tokenizer split (GPT-2-style word/number/punct classes).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

FINGERPRINT_P = 2_147_483_647


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality statistics.

    All-integer (or exactly-derived double) outputs: token count by
    whitespace split, BPE-ish token count by regex, character count,
    punctuation count, stopword count, and ratios computed as one
    division of exact integers (portable to the oracle bitwise).
    """
    toks = F.split(F.col(text_col), " ")
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[^A-Za-z0-9\\s]"), 0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        (n_stop / F.size(toks)).alias("stopword_ratio"),
        (F.length(text_col) / F.size(toks)).alias("chars_per_token"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1] from the text_stats signals.

    A doc scores high when it has a sane length, some stopwords (real
    prose), and low punctuation density — the standard cheap pre-filter
    before expensive model-based quality scoring.
    """
    s = text_stats(docs, text_col, id_col)
    len_ok = F.when((F.col("n_chars") >= 64) & (F.col("n_chars") <= 100_000), 1.0).otherwise(0.0)
    stop_ok = F.when(F.col("stopword_ratio") >= 0.05, 1.0).otherwise(0.0)
    punct_ok = F.when(F.col("n_punct") * 4 <= F.col("n_tokens"), 1.0).otherwise(0.0)
    return s.select(
        "doc_id",
        ((len_ok + stop_ok + punct_ok) / 3).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-word hits.

    Deterministic tiebreak: higher hit count wins, then lexicographic
    language code; 'und' (undetermined) when nothing hits.
    """
    toks = F.split(F.col(text_col), " ")

    def hits(words: list[str]) -> Column:
        # single-arg lambda via closure: a default-arg lambda would be
        # misread by PySpark as the (element, index) two-arg form.
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        *[hits(words).alias(f"hits_{lang}") for lang, words in sorted(LANG_MARKERS.items())],
    )
    langs = sorted(LANG_MARKERS)
    m = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred: Column = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(F.col(f"hits_{lang}") == m, F.lit(lang)).otherwise(pred)
    pred = F.when(m == 0, F.lit("und")).otherwise(pred)
    return scored.select("doc_id", pred.alias("lang_pred"), m.alias("lang_hits"))


def doc_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive positional fingerprint mod p.

    fp = Σ_pos (len(token)·(pos+1) + pos) mod p — cheap, portable (pure
    integer SQL), and order-sensitive like a rolling hash: permuted
    documents fingerprint differently, unlike bag-of-words hashes.  The
    scale variant swaps len(token) for xxhash64(token) (not
    oracle-replayable; same shape).
    """
    toks = F.split(F.col(text_col), " ")
    contrib = F.aggregate(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda t, p: (F.length(t) * p + (p - 1)) % FINGERPRINT_P,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: (acc + v) % FINGERPRINT_P,
    )
    return docs.select(F.col(id_col).alias("doc_id"), contrib.alias("fingerprint"))


def normalize_text(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical text normalization: lowercase, strip non-alphanumerics
    to spaces, collapse whitespace runs, trim — the usual step before
    exact dedup so near-identical formatting collapses to one key."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(F.col(id_col).alias("doc_id"), cleaned.alias("norm_text"))
