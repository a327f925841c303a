"""End-to-end document-preparation pipeline as ONE composed plan.

What a training-data run actually executes is not six separate jobs —
it is normalize + language-ID + quality + token stats + fingerprint +
exact-dedup over one corpus.  Composed naively (each operator its own
frame, joined back on doc_id) that costs a shuffle per operator; at
100 TB the joins dominate everything.

``doc_pipeline`` composes the *expression builders* from
``extensions.text`` into a single narrow select — one pass over the
corpus, every per-row signal computed in the same whole-stage-codegen
span — followed by exactly ONE shuffle: the window over ``norm_text``
that elects each exact-duplicate group's canonical (minimum-id)
document.  Catalyst's subexpression elimination dedups the repeated
tokenizations across the composed expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import spread_small_input
from .text import (
    fingerprint_expr,
    lang_exprs,
    normalize_expr,
    quality_expr,
    stats_exprs,
)


def doc_pipeline(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document enrichment + exact-dedup canonical election.

    Returns (doc_id, norm_text, n_tokens, n_bpe_tokens, lang_pred,
    quality, fingerprint, canonical_id, is_canonical): one narrow pass
    for the signals, one shuffle (window on norm_text) for the
    canonical flag.  Downstream consumers filter
    ``is_canonical AND quality >= τ`` to materialize the training set.
    """
    docs = spread_small_input(docs, id_col)
    s = stats_exprs(text_col)
    pred, _hits = lang_exprs(text_col)
    enriched = docs.select(
        F.col(id_col).alias("doc_id"),
        normalize_expr(text_col).alias("norm_text"),
        s["n_tokens"].alias("n_tokens"),
        s["n_bpe_tokens"].alias("n_bpe_tokens"),
        pred.alias("lang_pred"),
        quality_expr(text_col).alias("quality"),
        fingerprint_expr(text_col).alias("fingerprint"),
    )
    # Window key: a 128-bit fingerprint of norm_text, NOT the text
    # itself — the shuffle hash/sort then works on two fixed-width
    # longs instead of arbitrarily long strings (same dedup semantics;
    # collision expectation ~1e-15 even at 1e12 docs, like exact_dedup).
    w = Window.partitionBy(
        F.xxhash64("norm_text"), F.xxhash64(F.lit("fp2"), "norm_text")
    )
    return enriched.withColumn(
        "canonical_id", F.min("doc_id").over(w)
    ).withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
