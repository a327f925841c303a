"""Text analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length/
punctuation/stopword ratios), token counting (whitespace + a BPE-ish
regex), and document fingerprinting — all expressed with built-in
``pyspark.sql.functions`` (JVM-side, codegen'd; no Python UDFs in the
hot path), so they cost one narrow pass over the corpus.

Each operator is split into an *expression builder* (returns Columns)
and the DataFrame wrapper around it.  The builders are what
``pipeline.doc_pipeline`` composes into one single-pass select —
keeping one source of truth per expression (a hand-copied stoplist
once drifted from this module and silently weakened the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def _hits(toks: Column, words: list[str]) -> Column:
    # single-arg lambda via closure: a default-arg lambda would be
    # misread by PySpark as the (element, index) two-arg form.
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stats_exprs(text_col: str = "text") -> dict[str, Column]:
    """The per-document statistic expressions, keyed by output name.
    All-integer (or exactly-derived double): portable to the oracle
    bitwise.  Catalyst's subexpression elimination dedups the repeated
    split/filter when several of these appear in one select."""
    toks = F.split(F.col(text_col), " ")
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
    n_stop = _hits(toks, STOPWORDS)
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[^A-Za-z0-9\\s]"), 0)
    )
    return {
        "n_chars": F.length(text_col),
        "n_tokens": F.size(toks),
        "n_bpe_tokens": F.size(bpe),
        "n_punct": n_punct,
        "n_stopwords": n_stop,
        "stopword_ratio": n_stop / F.size(toks),
        "chars_per_token": F.length(text_col) / F.size(toks),
    }


def quality_expr(text_col: str = "text") -> Column:
    """Composite quality score in [0,1] from the stats signals: sane
    length, some stopwords (real prose), low punctuation density — the
    standard cheap pre-filter before model-based quality scoring."""
    s = stats_exprs(text_col)
    len_ok = F.when((s["n_chars"] >= 64) & (s["n_chars"] <= 100_000), 1.0).otherwise(0.0)
    stop_ok = F.when(s["stopword_ratio"] >= 0.05, 1.0).otherwise(0.0)
    punct_ok = F.when(s["n_punct"] * 4 <= s["n_tokens"], 1.0).otherwise(0.0)
    return (len_ok + stop_ok + punct_ok) / 3


def lang_exprs(text_col: str = "text") -> tuple[Column, Column]:
    """(lang_pred, lang_hits) expressions: argmax of per-language
    marker-word hits; tiebreak lexicographic; 'und' when nothing hits."""
    toks = F.split(F.col(text_col), " ")
    langs = sorted(LANG_MARKERS)
    hits = {lang: _hits(toks, LANG_MARKERS[lang]) for lang in langs}
    m = F.greatest(*[hits[lang] for lang in langs])
    pred: Column = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(hits[lang] == m, F.lit(lang)).otherwise(pred)
    pred = F.when(m == 0, F.lit("und")).otherwise(pred)
    return pred, m


def fingerprint_expr(text_col: str = "text") -> Column:
    """Order-sensitive positional fingerprint mod p:
    fp = Σ_pos (len(token)·(pos+1) + pos) mod p — cheap, portable (pure
    integer SQL), order-sensitive like a rolling hash: permuted
    documents fingerprint differently, unlike bag-of-words hashes.  The
    scale variant swaps len(token) for xxhash64(token) (not
    oracle-replayable; same shape)."""
    toks = F.split(F.col(text_col), " ")
    return F.aggregate(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda t, p: (F.length(t) * p + (p - 1)) % FINGERPRINT_P,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: (acc + v) % FINGERPRINT_P,
    )


def normalize_expr(text_col: str = "text") -> Column:
    """Canonical text normalization: lowercase, strip non-alphanumerics
    to spaces, collapse whitespace runs, trim — the usual step before
    exact dedup so near-identical formatting collapses to one key."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )


#: named HTML entities decoded after tag stripping (&amp; last, the
#: standard order, so "&amp;lt;" yields a literal "&lt;").  Numeric
#: character references are NOT decoded — that needs codepoint
#: construction SQL engines don't express; crawl text extraction
#: treats them as rare residue (documented operator contract).
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_title_expr(html_col: str = "html") -> Column:
    """The <title> contents (first match), entity-decoded + trimmed."""
    t = F.regexp_extract(F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, rep in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_text_expr(html_col: str = "html") -> Column:
    """Visible-text extraction from HTML markup as ONE codegen'd
    expression chain: drop <script>/<style> subtrees and comments,
    every remaining tag becomes a space, named entities decode, then
    whitespace collapses.  Regex-based by design — a crawl-scale text
    extractor wants a cheap deterministic JVM pass, not a DOM; the
    boilerplate/quality screens downstream do the semantic filtering."""
    t = F.regexp_replace(
        F.col(html_col), r"(?is)<(script|style)[^>]*>.*?</\1\s*>", " "
    )
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_html_text(
    docs: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    title_col: str = "title",
) -> DataFrame:
    """Add extracted ``title`` and visible ``text`` columns — the
    WARC→documents bridge (pair with ``sources.warc.warc_records`` and
    the URL family for the full crawl-ingestion path).  Pure built-in
    expressions: no Python, no shuffle, codegen end to end."""
    return docs.withColumn(title_col, html_title_expr(html_col)).withColumn(
        text_col, html_text_expr(html_col)
    )


def _attr_extract(col, pat1: str, pat2: str):
    """First non-empty of two attribute-order variants (HTML attribute
    order is unspecified, so each tag is probed both ways)."""
    a = F.regexp_extract(col, pat1, 1)
    b = F.regexp_extract(col, pat2, 1)
    return F.when(a != "", a).otherwise(F.when(b != "", b))


def extract_page_metadata(
    docs: DataFrame, html_col: str = "html"
) -> DataFrame:
    """The crawl-side page-metadata block as codegen'd extractions:

    * ``og_title`` / ``og_description`` — OpenGraph ``<meta property>``
      tags (both attribute orders),
    * ``meta_description`` — the classic ``<meta name=description>``,
    * ``canonical_link`` — ``<link rel=canonical href>``, the
      publisher's OWN dedup signal (pair it with `urls.url_dedup`:
      group by the canonical link when present, the canonicalized
      fetch URL otherwise),
    * ``page_lang`` — the ``<html lang>`` attribute, lower-cased (the
      declared-language prior a lang-id model starts from).

    Entity-decoded, whitespace-collapsed, NULL when absent; one narrow
    projection, no Python, no shuffle."""

    h = F.col(html_col)

    def clean(c):
        for ent, rep in HTML_ENTITIES:
            c = F.replace(c, F.lit(ent), F.lit(rep))
        return F.nullif(F.trim(F.regexp_replace(c, r"\s+", " ")), F.lit(""))

    def og(prop: str):
        return clean(
            F.coalesce(
                _attr_extract(
                    h,
                    r"(?is)<meta\s[^>]*property\s*=\s*[\"']og:" + prop
                    + r"[\"'][^>]*content\s*=\s*[\"']([^\"']*)",
                    r"(?is)<meta\s[^>]*content\s*=\s*[\"']([^\"']*)[\"']"
                    + r"[^>]*property\s*=\s*[\"']og:" + prop + r"[\"']",
                ),
                F.lit(""),
            )
        )

    meta_desc = clean(
        F.coalesce(
            _attr_extract(
                h,
                r"(?is)<meta\s[^>]*name\s*=\s*[\"']description[\"'][^>]*"
                r"content\s*=\s*[\"']([^\"']*)",
                r"(?is)<meta\s[^>]*content\s*=\s*[\"']([^\"']*)[\"'][^>]*"
                r"name\s*=\s*[\"']description[\"']",
            ),
            F.lit(""),
        )
    )
    canonical = clean(
        F.coalesce(
            _attr_extract(
                h,
                r"(?is)<link\s[^>]*rel\s*=\s*[\"']canonical[\"'][^>]*"
                r"href\s*=\s*[\"']([^\"']*)",
                r"(?is)<link\s[^>]*href\s*=\s*[\"']([^\"']*)[\"'][^>]*"
                r"rel\s*=\s*[\"']canonical[\"']",
            ),
            F.lit(""),
        )
    )
    lang = F.lower(
        F.nullif(
            F.regexp_extract(
                h, r"(?is)<html\s[^>]*lang\s*=\s*[\"']([A-Za-z\-]+)", 1
            ),
            F.lit(""),
        )
    )
    return (
        docs.withColumn("og_title", og("title"))
        .withColumn("og_description", og("description"))
        .withColumn("meta_description", meta_desc)
        .withColumn("canonical_link", canonical)
        .withColumn("page_lang", lang)
    )


def extract_main_content(
    docs: DataFrame,
    html_col: str = "html",
    out_col: str = "main_text",
    min_chars: int = 40,
    max_link_density: float = 0.5,
) -> DataFrame:
    """Boilerplate removal by the classic text/link-density heuristic
    (the Kohlschütter-style signal trafilatura/jusText build on): the
    page splits at block-level tags; a block survives if its visible
    text is long enough AND links contribute at most
    ``max_link_density`` of its characters.  Navigation bars, footers
    and tag clouds are short and link-saturated — they drop; article
    prose survives.  Pure built-in/HOF expressions (split → transform →
    filter → array_join): no Python, no shuffle, codegen end to end.
    """
    t = F.regexp_replace(
        F.col(html_col), r"(?is)<(script|style)[^>]*>.*?</\1\s*>", " "
    )
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    blocks = F.split(
        t,
        r"(?i)</?(?:p|div|section|article|main|aside|li|h[1-6]|td|th|"
        r"blockquote|nav|footer|header|ul|ol|table|tr|br)[^>]*>",
    )

    def visible(b):
        s = F.regexp_replace(b, r"(?s)<[^>]*>", " ")
        for ent, rep in HTML_ENTITIES:
            s = F.replace(s, F.lit(ent), F.lit(rep))
        return F.trim(F.regexp_replace(s, r"\s+", " "))

    def link_chars(b):
        return F.aggregate(
            F.regexp_extract_all(
                b, F.lit(r"(?is)<a[^>]*>(.*?)</a>"), F.lit(1)
            ),
            F.lit(0),
            lambda acc, x: acc
            + F.length(
                F.trim(F.regexp_replace(x, r"(?s)<[^>]*>", " "))
            ),
        )

    scored = F.transform(
        blocks,
        lambda b: F.struct(
            visible(b).alias("text"), link_chars(b).alias("link_chars")
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["text"]) >= min_chars)
        & (
            s["link_chars"].cast("double")
            <= F.length(s["text"]) * F.lit(max_link_density)
        ),
    )
    main = F.array_join(F.transform(kept, lambda s: s["text"]), "\n")
    return docs.withColumn(out_col, main)


#: PII scrub rules applied in order: (pattern, replacement).  Patterns
#: stay inside the regex subset that Java (Spark) and RE2-ish engines
#: (the DuckDB oracle) treat identically — no backrefs, no lookaround.
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^ ]+", "<URL>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    (r"[0-9]{7,}", "<NUMBER>"),
]


def redact_expr(text_col: str = "text") -> Column:
    """PII / boilerplate redaction as one chained ``regexp_replace``
    expression (emails, URLs, SSN-shaped and long digit runs →
    placeholder tokens) — the standard scrub pass before publishing or
    training on crawled text.  A narrow, codegen'd projection: zero
    shuffle at any corpus size, and Catalyst pipelines it with whatever
    filter/dedup stage follows."""
    out = F.col(text_col)
    for pat, rep in PII_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document redacted text plus a flag for audit sampling."""
    red = redact_expr(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        red.alias("text"),
        (red != F.col(text_col)).alias("was_redacted"),
    )


# --------------------------------------------------------------------------
# DataFrame wrappers
# --------------------------------------------------------------------------


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality statistics (one narrow pass)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(name) for name, c in stats_exprs(text_col).items()],
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1] per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"), quality_expr(text_col).alias("quality")
    )


# Deterministic example weights for the linear quality model — in
# production these come from a trained classifier (fasttext-style);
# the *shape* (broadcast constants folded into one codegen'd
# expression) is the point.
DEFAULT_QUALITY_WEIGHTS = {
    "bias": -0.4,
    "n_chars": 0.0005,
    "n_tokens": 0.004,
    "n_punct": -0.06,
    "n_stopwords": 0.09,
    "stopword_ratio": 2.5,
    "chars_per_token": -0.08,
}


def model_quality_margin_expr(
    text_col: str = "text", weights: dict[str, float] | None = None
) -> Column:
    """Linear-model margin w·f + b over the per-document stat features.

    The model is tiny (a handful of floats), so it is not broadcast
    state at all — the weights fold into the expression as literals and
    the whole scorer runs inside one whole-stage-codegen span.  The sum
    is a FIXED left-to-right chain so the oracle can reproduce it
    bitwise (IEEE ops in identical order).
    """
    w = {**DEFAULT_QUALITY_WEIGHTS, **(weights or {})}
    s = stats_exprs(text_col)
    return (
        F.lit(w["bias"])
        + F.lit(w["n_chars"]) * s["n_chars"]
        + F.lit(w["n_tokens"]) * s["n_tokens"]
        + F.lit(w["n_punct"]) * s["n_punct"]
        + F.lit(w["n_stopwords"]) * s["n_stopwords"]
        + F.lit(w["stopword_ratio"]) * s["stopword_ratio"]
        + F.lit(w["chars_per_token"]) * s["chars_per_token"]
    )


def model_quality_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality screening: (doc_id, margin, score, keep).

    ``score`` is the sigmoid of the margin; ``keep`` is decided on the
    margin against logit(threshold) so the decision is exact (no
    transcendental in the cut)."""
    import math

    margin = model_quality_margin_expr(text_col, weights)
    cut = math.log(threshold / (1.0 - threshold))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        margin.alias("margin"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("score"),
        (margin >= F.lit(cut)).alias("keep"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-word hits."""
    pred, m = lang_exprs(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        m.alias("lang_hits"),
    )


def doc_fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive positional fingerprint mod p per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"), fingerprint_expr(text_col).alias("fingerprint")
    )


def normalize_text(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical normalized text per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"), normalize_expr(text_col).alias("norm_text")
    )


def corpus_report(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-pass corpus summary with a language rollup — the dashboard
    row every pipeline run logs: docs, tokens, quality points, distinct
    texts, per detected language plus the ALL total.

    Exactness discipline: quality enters as integer POINTS (the three
    0/1 gate signals summed) rather than the composite double —
    ``(k/3)*3`` in floating point is not ``k``, and a double sum is
    order-dependent across partitionings.  One rollup aggregate with
    map-side partials; ``countDistinct`` adds the usual two-level
    expand, still bounded.
    """
    s = stats_exprs(text_col)
    pred, _ = lang_exprs(text_col)
    qpts = (
        F.when((s["n_chars"] >= 64) & (s["n_chars"] <= 100_000), 1).otherwise(0)
        + F.when(s["stopword_ratio"] >= 0.05, 1).otherwise(0)
        + F.when(s["n_punct"] * 4 <= s["n_tokens"], 1).otherwise(0)
    )
    base = docs.select(
        pred.alias("lang_pred"),
        s["n_tokens"].alias("n_tokens"),
        qpts.alias("qpts"),
        F.col(text_col).alias("__text"),
    )
    return (
        base.rollup("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("qpts").alias("quality_points"),
            F.countDistinct("__text").alias("n_distinct_texts"),
        )
        .select(
            F.coalesce("lang_pred", F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_tokens",
            "quality_points",
            "n_distinct_texts",
        )
    )


def vocab_topk(
    docs: DataFrame, k: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary induction: the ``k`` most frequent whitespace
    tokens with counts and ranks — the first step of tokenizer
    training.

    Plan: explode → one partial-aggregated count shuffle → top-k via
    ``orderBy().limit(k)``, which Spark plans as TakeOrderedAndProject
    (per-partition heaps merged once) — NOT a row_number window, which
    would funnel every distinct token through a single partition.  The
    rank window runs only on the k surviving rows.  The order is TOTAL
    (count desc, token asc) so the boundary is deterministic under
    ties.
    """
    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    order = [F.col("n").desc(), F.col("token").asc()]
    topk = counts.orderBy(*order).limit(k)
    w = Window.orderBy(*order)  # ≤ k rows by now — single partition is fine
    return topk.select(
        "token", "n", F.row_number().over(w).cast("int").alias("rank")
    )


def oov_rate(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary token fraction against an induced
    vocabulary — the standard coverage check before committing to a
    tokenizer.

    The vocabulary is small by construction (top-k), so it broadcasts
    as an array into a single codegen'd expression: scoring 100 TB is
    one narrow pass, no join.  (For vocabularies too large to inline,
    swap the array for a broadcast join on the exploded tokens.)
    """
    vocab_tokens = [r["token"] for r in vocab.select("token").collect()]
    arr = F.array(*[F.lit(t) for t in vocab_tokens])
    toks = F.split(F.col(text_col), " ")
    n_oov = F.size(F.filter(toks, lambda t: ~F.array_contains(arr, t)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        n_oov.alias("n_oov"),
        (n_oov / F.size(toks)).alias("oov_frac"),
    )


def bigram_coherence(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-grounded fluency signal: mean corpus frequency of the
    document's word bigrams.

    Two passes: (1) global bigram counts — one partial-aggregated
    shuffle; (2) per-doc mean of its bigrams' corpus counts — join on
    the bigram + one groupBy.  Gibberish scores ~1 (its bigrams appear
    only in itself); templated/boilerplate text scores high.  The
    score is an exact integer sum divided once — portable bitwise.
    A language model replaces the count table without changing the
    plan shape.
    """
    # r12: zip two shifted bulk slices (see lm_score) instead of a
    # per-bigram interpreted lambda
    bi = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("w")
    ).select(
        "doc_id",
        F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "arrays_zip(slice(w, 1, size(w)-1), slice(w, 2, size(w)-1)) "
            "ELSE CAST(array() AS array<struct<`0`:string,`1`:string>>) END"
        ).alias("bs"),
    ).select(
        "doc_id",
        F.explode("bs").alias("b"),
    ).select("doc_id", F.concat_ws(" ", "b.0", "b.1").alias("bigram"))
    corpus_counts = bi.groupBy("bigram").agg(F.count("*").alias("cnt"))
    return (
        bi.join(corpus_counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("cnt").alias("sum_cnt"),
            (F.sum("cnt") / F.count("*")).alias("coherence"),
        )
    )


def rare_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` rarest corpus terms per document — the integer-exact
    stand-in for TF-IDF top terms (document frequency ranks replace the
    log-idf weighting, so the oracle matches bitwise; ties break
    lexicographically).  Plan: distinct (doc, token) → token document
    frequencies (one shuffle) → per-doc rank window."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).distinct()
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("tok").asc())
    return (
        toks.join(dfreq, "tok")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "tok", "df", F.col("rk").cast("int").alias("rk"))
    )


def lm_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-trained **bigram language-model score** per document — the
    perplexity-style quality filter of LLM data pipelines (CCNet trains
    a 5-gram KenLM and keeps the low-perplexity tail; this is the same
    screen with the corpus itself as the model).

    Model: add-one-smoothed conditional probability
    ``P(w2|w1) = (B(w1,w2) + 1) / (U(w1) + V)`` with bigram counts B,
    unigram counts U and vocabulary size V; the document score is the
    arithmetic mean of its bigram probabilities.  Production LM filters
    average *log* probs; the linear mean ranks documents identically
    for the screening cut and keeps every arithmetic step bitwise
    portable to the SQL oracle (same contract as BM25's rational
    ``idf_mode``): each term is one IEEE division of exact integers —
    identical in any engine — rounded to 12 places and summed as
    DECIMAL, so the aggregate is order-independent.

    Plan shape (100 TB): one narrow bigram explode feeds (a) the count
    tables — two partial-aggregated exchanges, outputs bounded by
    vocab², not corpus size — and (b) the scoring joins keyed on the
    bigram / unigram (stopword-pair skew = the AQE skew-join case);
    V arrives as a broadcast 1-row frame, never a driver collect.
    Returns (doc_id, n_bigrams, lm_score); docs with < 2 tokens have no
    bigram row and are absent, mirroring the oracle.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("w")
    )
    # r12: zip two shifted bulk slices instead of a per-element
    # interpreted element_at lambda (the word_shingles lesson — bulk
    # slices are one allocation per doc, the lambda was one per bigram;
    # proven exceptAll-identical, 0.62 → 0.32 s isolated at sf0.1)
    pairs = F.when(
        F.size("w") >= 2,
        F.expr("arrays_zip(slice(w, 1, size(w)-1), slice(w, 2, size(w)-1))"),
    ).otherwise(F.expr("CAST(array() AS array<struct<`0`:string,`1`:string>>)"))
    bi = base.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.`0`").alias("w1"), F.col("p.`1`").alias("w2")
    )
    # Measured: pre-partitioning bi on w1 to collapse the count/join
    # exchanges (w1 ⊂ (w1,w2)) times 1.04 s vs 0.92 s at sf0.1 — the
    # explicit exchange costs more than AQE's plan here, so keep the
    # declarative form and let AQE size the exchanges.
    uni = (
        base.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("u_cnt"))
    )
    vocab = uni.agg(F.count("*").alias("v_cnt"))
    bcounts = bi.groupBy("w1", "w2").agg(F.count("*").alias("b_cnt"))
    term = F.round(
        (F.col("b_cnt") + 1).cast("double")
        / (F.col("u_cnt") + F.col("v_cnt")).cast("double"),
        12,
    ).cast("decimal(24,12)")
    scored = (
        bi.join(bcounts, ["w1", "w2"])
        .join(uni, bi.w1 == uni.tok)
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", term.alias("p"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("p").cast("double") / F.count("*")).alias("lm_score"),
    )


def hash_features(
    docs: DataFrame,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick featurization (HashingTF): tokens hash into
    ``n_features`` buckets, per-doc bucket counts L2-normalize into
    sparse tf vectors — the no-vocabulary text→vector step that feeds
    clustering / ANN / linear probes without ever building (or
    shipping) a dictionary.

    Long-form output (doc_id, bucket, weight): sparse, oracle-checkable
    scalar rows rather than an array column.  The bucket hash is the
    first 8 hex digits of md5 mod ``n_features`` — portable to the SQL
    oracle verbatim (`CAST('0x'||substr(md5(tok),1,8) AS BIGINT)`).
    Exactness: the squared-norm is an integer sum (exact at any
    parallelism); sqrt + one division are IEEE-identical everywhere.

    Plan: narrow explode, then ONE exchange on doc_id — partitioning
    by the doc key up front lets BOTH the (doc, bucket) count
    aggregation and the per-doc norm window reuse it (a partitioning on
    a subset of the group keys satisfies the aggregation's clustering;
    the reverse order would pay two exchanges).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).repartition(F.col("doc_id"))
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
        % n_features
    )
    cnt = toks.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("doc_id")
    norm = F.sqrt(F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("double"))
    return cnt.select(
        "doc_id", "bucket", (F.col("cnt") / norm).alias("weight")
    )


def tfidf_topterms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: top-``k`` terms by a
    TF·IDF-style rarity-weighted frequency, as (doc_id, term, tf, df,
    score, rank).

    The idf factor is the RATIONAL surrogate the BM25 operator uses
    (``(2N − 2df + 1) / (2df + 1)`` — strictly decreasing in df, same
    ranking as ln-idf) so the score is ONE division of exact integers
    and the DuckDB twin matches bitwise; a libm ``ln`` would make the
    ranking engine-dependent in the last ulp (retrieval.py's exactness
    contract).

    Plan: token explode → per-(doc, term) tf count → per-term df count
    → one join keyed by term → per-doc rank window.  The df join's hot
    keys are stopwords — exactly the rows whose idf is lowest; at
    100 TB, pre-filtering terms with df ≈ N (they can never reach a
    top-k) cuts the join's skew before AQE even sees it.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfx = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfx, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                (
                    F.col("tf")
                    * (2 * F.col("n_docs") - 2 * F.col("df") + 1)
                ).cast("double")
                / (2 * F.col("df") + 1).cast("double")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
