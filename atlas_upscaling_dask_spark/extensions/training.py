"""Training-set assembly operators: deterministic shuffle, token-budget
sequence packing, repetition signals, and benchmark-contamination
checks.

These are the steps between "filtered corpus" and "batches on the
trainer": give every document a reproducible pseudo-random position,
pack documents into fixed token budgets, and flag documents that leak
evaluation data.  Everything is built from integer arithmetic and
built-in functions so the DuckDB oracle replays it bitwise, and every
plan is shuffle-budgeted for the 100 TB case (see SCALE.md):

* the shuffle position is a pure per-row expression (no global sort —
  ordering is the *consumer's* cheap merge of already-ordered shards);
* packing windows are partitioned by shard, never global;
* contamination joins explode only the (tiny) benchmark side's shingles
  against a semi-joined candidate subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# LCG constants (glibc): a ≡ 1 (mod 4), c odd → for modulus 2^31 the map
# id → (a·id + c) mod 2^31 is a bijection on [0, 2^31), i.e. a true
# permutation — no collisions, unlike a truncated hash.
LCG_A = 1_103_515_245
LCG_C = 12_345
LCG_M = 2_147_483_648  # 2^31


def shuffle_pos_expr(id_col: str = "doc_id", seed: int = 0) -> Column:
    """Deterministic pseudo-random position for stable training-data
    shuffles: pos = (a·(id + seed) + c) mod 2^31.  A different ``seed``
    yields a different epoch order.  Pure BIGINT arithmetic — the id
    is reduced mod M before the multiply (A·(x mod M) ≡ A·x (mod M)),
    bounding the product by A·(M−1) ≈ 2.4e18 < 2^63 for ANY doc_id,
    so 64-bit snowflake-style ids can't overflow the draw — replayable
    in any engine, and a *narrow* projection: reshuffling 100 TB costs
    zero shuffle; consumers read shards ordered by (shard,
    shuffle_pos) from the writer's ``sortWithinPartitions``."""
    return (
        F.lit(LCG_A) * F.pmod(F.col(id_col) + F.lit(seed), F.lit(LCG_M))
        + F.lit(LCG_C)
    ) % F.lit(LCG_M)


def train_shuffle(
    docs: DataFrame,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a reproducible shuffle position and shard.

    shard = pos mod n_shards balances shards to within the LCG's
    near-uniformity; within a shard the consumer orders by pos.  The
    whole operator is one narrow select — the global permutation is
    never materialized as a sort."""
    pos = shuffle_pos_expr(id_col, seed)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pos.alias("shuffle_pos"),
        (pos % F.lit(n_shards)).cast("int").alias("shard"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous token-budget packing: stream each shard in shuffle
    order, accumulate whitespace-token counts, and cut a new pack every
    ``budget`` tokens — pack_id = floor(starting_offset / budget), the
    deterministic streaming-concat packing used when documents are
    concatenated and split into fixed-length contexts (boundary
    documents span two packs; nothing is dropped).

    The running sum's window is partitioned by shard — the 100 TB plan
    is n_shards independent sorted streams, not one global ORDER BY.
    """
    toks = F.size(F.split(F.col(text_col), " "))
    pos = shuffle_pos_expr(id_col, seed)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        pos.alias("shuffle_pos"),
        (pos % F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("shuffle_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "shard",
        "shuffle_pos",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start_offset"),
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).alias("pack_id"),
    )


def assemble_packs(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the packed training rows: concatenate each pack's
    documents in shuffle order — the actual (shard, pack_id, text)
    records a trainer reads, downstream of :func:`pack_sequences`'
    offset plan.

    Ordering inside a pack is deterministic without an ORDER BY:
    ``sort_array(collect_list(struct(shuffle_pos, text)))`` sorts by
    the unique shuffle position inside the aggregate, so the result is
    partitioning-independent.  Two exchanges total (the per-shard
    offset window, then the per-pack aggregate) — no global sort at
    any corpus size.
    """
    toks = F.size(F.split(F.col(text_col), " "))
    pos = shuffle_pos_expr(id_col, seed)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        toks.alias("n_tokens"),
        pos.alias("shuffle_pos"),
        (pos % F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("shuffle_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    packed = base.select(
        "shard",
        "shuffle_pos",
        "n_tokens",
        "__text",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).alias("pack_id"),
    )
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col("shuffle_pos"), F.col("__text")))
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.concat_ws(
                " ", F.transform(ordered, lambda s: s["__text"])
            ).alias("text"),
        )
    )


def repetition_exprs(text_col: str = "text") -> dict[str, Column]:
    """Gopher-style repetition signals, computed array-side (no
    explode/shuffle): duplicate-word fraction and the fraction of the
    document taken by its single most frequent word.  The per-word
    count is O(distinct·len) inside one codegen'd expression — document
    lengths bound it, not corpus size."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    top = F.array_max(
        F.transform(
            F.array_distinct(words),
            lambda w: F.size(F.filter(words, lambda x: x == w)),
        )
    )
    return {
        "n_words": n,
        "n_distinct_words": n_distinct,
        "dup_word_frac": (n - n_distinct) / n,
        "top_word_frac": top / n,
    }


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition statistics (one narrow pass)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(k) for k, c in repetition_exprs(text_col).items()],
    )


def hash_split_expr(
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split",
    hex_digits: int = 8,
) -> Column:
    """Deterministic train/val/test assignment from a content-stable
    hash: split = which band of md5-hex space the key falls in.

    Engine-portable by construction — md5 lowercase hex is identical
    everywhere, and band edges are *hex-string* thresholds compared
    lexicographically (uniform over keys since hex digits of md5 are
    uniform), so no base-16 integer conversion is needed on either
    side.  A narrow per-row expression: splitting 100 TB is zero
    shuffle, re-runs are stable under insertion/deletion of other rows
    (unlike row_number-based splits), and the same row always lands in
    the same split across engines and re-crawls.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = F.substring(
        F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))),
        1,
        hex_digits,
    )
    space = 16**hex_digits
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        edge = format(min(int(cum * space), space - 1), f"0{hex_digits}x")
        cond = h < F.lit(edge)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return (last if expr is None else expr.otherwise(last)).alias("split")


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Attach the deterministic ``split`` column (see
    :func:`hash_split_expr`)."""
    return docs.select("*", hash_split_expr(key_col, fractions, salt))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sample: the ``n`` rows of each stratum
    whose salted md5 hash is smallest — a reproducible stand-in for
    per-group reservoir sampling (every row's rank is a pure function
    of (seed, key), so the sample is stable across runs and engines).

    Plan: one hash partial-aggregation-friendly window per stratum
    (rank over hash).  At 100 TB the shuffle ships only (stratum, hash,
    key) plus payload; for heavy-hitter strata Spark's AQE skew split
    applies because the window partitions by the stratum key alone.
    """
    h = F.md5(
        F.concat(F.lit(seed).cast("string"), F.lit(":"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def mixture_resample(
    docs: DataFrame,
    weights: dict[str, float],
    total: int,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample each source
    to its target share of a ``total``-row training mix.

    The standard corpus-mixing step (web 60% / code 20% / books 20%…):
    each source's quota is ``floor(total · weight)``; the quota rows are
    the ones with the smallest salted md5 of the key — a pure function
    of (seed, key), so the mix is reproducible across runs, engines,
    and partitionings.  Sources absent from ``weights`` are dropped;
    a source smaller than its quota contributes everything it has
    (upweighting by repetition is a separate op — see train_shuffle for
    epoch-style repetition).

    Plan shape: ONE window shuffle keyed by the source column (AQE skew
    split applies for heavy-hitter sources); the quota lookup folds into
    the projection as a CASE literal — no join against a quota table.
    """
    quota: Column = F.lit(0)
    for s, w in weights.items():
        quota = F.when(F.col(stratum_col) == s, int(total * w)).otherwise(quota)
    h = F.md5(
        F.concat(F.lit(seed).cast("string"), F.lit(":"), F.col(key_col).cast("string"))
    )
    win = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        docs.withColumn("_q", quota)
        .filter(F.col("_q") > 0)
        .withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") <= F.col("_q"))
        .drop("_q", "_rk")
    )


def mixture_upsample(
    docs: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Epoch-style repetition for under-represented domains: weight 2.3
    emits every row twice plus a deterministic 30% of rows a third time
    (an ``epoch`` column numbers the copies).

    The fractional epoch reuses the hash-band trick from
    :func:`hash_split_expr`: membership is ``md5-prefix < hex(frac)`` —
    engine-portable, stable under insertion/deletion of other rows, and
    zero-shuffle (the whole op is a narrow projection + explode; 100 TB
    of repetition costs no exchange, the copies materialize lazily in
    the scan's own tasks).  Sources absent from ``weights`` are
    dropped.  Pair with :func:`mixture_resample` (downsampling) to hit
    an arbitrary target mix.
    """
    hex_digits = 8
    space = 16**hex_digits
    h = F.substring(
        F.md5(
            F.concat(F.lit(f"up{seed}"), F.lit(":"), F.col(key_col).cast("string"))
        ),
        1,
        hex_digits,
    )
    copies: Column = F.lit(0)
    for s, wt in weights.items():
        n_full = int(wt)
        frac = wt - n_full
        edge = format(min(int(frac * space), space - 1), f"0{hex_digits}x")
        c = F.lit(n_full) + F.when(h < F.lit(edge), 1).otherwise(0)
        copies = F.when(F.col(stratum_col) == s, c).otherwise(copies)
    return (
        docs.withColumn("_c", copies)
        .filter(F.col("_c") >= 1)
        .select("*", F.explode(F.sequence(F.lit(1), F.col("_c"))).alias("epoch"))
        .drop("_c")
    )


def _shingle_rows(
    docs: DataFrame, n: int, text_col: str, id_col: str, out_id: str
) -> DataFrame:
    """Distinct word n-gram shingles per document, one row each.

    Per-document distinctness is computed ARRAY-SIDE (``array_distinct``
    before the explode) — a row-level ``.distinct()`` after the explode
    would be a full shuffle of every corpus shingle for a dedup whose
    scope is one document; this way the explode output is already
    unique and the whole builder stays narrow.

    r13 (guide §1.2 — the word_shingles lesson applied here too): the
    gram builder used to run one interpreted Catalyst lambda per gram
    (``transform(sequence(..), i -> concat_ws(' ', slice(w, i+1, n)))``,
    ~25 µs/gram); it is now ``arrays_zip`` of n shifted bulk slices
    with the per-doc distinct on the STRUCT array and one codegen'd
    ``concat_ws`` per exploded row.  Struct-distinct equals
    string-distinct because tokens come from ``split(text, ' ')`` and
    so cannot contain the separator — the tuple→string map is
    injective (proven exceptAll-identical; contamination oracle-green
    at two SFs)."""
    words = F.split(F.col(text_col), " ")
    zipped = ", ".join(f"slice(w, {j + 1}, size(w) - {n - 1})" for j in range(n))
    empty_t = ", ".join(f"`{j}`:string" for j in range(n))
    structs = docs.select(
        F.col(id_col).alias(out_id), words.alias("w")
    ).select(
        out_id,
        F.expr(
            f"CASE WHEN size(w) >= {n} THEN array_distinct(arrays_zip({zipped})) "
            f"ELSE CAST(array() AS array<struct<{empty_t}>>) END"
        ).alias("z"),
    )
    return structs.select(out_id, F.explode("z").alias("s")).select(
        out_id,
        F.concat_ws(" ", *[f"s.{j}" for j in range(n)]).alias("shingle"),
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination scores: for every corpus document, the
    number and fraction of its distinct word ``n``-grams that also
    appear anywhere in the benchmark set — the standard decontamination
    screen run before training.

    Plan: the benchmark's smallness is the operator's CONTRACT
    (thousands of eval documents vs billions of training docs), so its
    distinct shingle set BROADCASTS and the corpus shingles flow
    through ONE pass — a broadcast left join marking hits, then a
    single per-doc aggregate computing totals and hit counts together
    (totals and hits as separate aggregates would scan and shuffle the
    corpus shingles twice).  Returns only contaminated documents
    (overlap > 0) — the common case is a tiny fraction, so the output
    stays small at any corpus size.
    """
    cs = _shingle_rows(corpus, n, text_col, id_col, "doc_id")
    bs = F.broadcast(
        _shingle_rows(benchmark, n, text_col, id_col, "bench_id")
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        cs.join(bs, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") > 0)
        .select(
            "doc_id",
            "n_contaminated",
            "n_shingles",
            (F.col("n_contaminated") / F.col("n_shingles")).alias(
                "contamination_frac"
            ),
        )
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: the k rows
    with the highest Efraimidis–Spirakis priority ``u^(1/w)``, where
    ``u`` is a salted-md5 uniform derived from the row key.

    Inclusion probability is proportional to weight (A-ES, Inf.
    Process. Lett. 2006), and because ``u`` is a pure function of
    (seed, key) the sample is stable across runs, engines, and
    insertions of unrelated rows — the property reservoir sampling
    (RDD-style, partition-order-dependent) cannot give.  Plan: a
    narrow priority projection + ``orderBy().limit(k)`` which Spark
    executes as TakeOrderedAndProject (per-partition heaps, one tiny
    merge) — sampling 100 TB ships k rows, never a global sort.

    The priority is rounded to 9 digits and tie-broken by the key so
    libm ``pow`` last-ulp drift can't reorder the cut across engines
    (same discipline as the IVF cosine ranking).
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed).cast("string"),
                    F.lit(":"),
                    F.col(key_col).cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(16**13 + 1).cast("double")
    prio = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9
    )
    return (
        df.withColumn("priority", prio)
        .orderBy(F.col("priority").desc(), F.col(key_col).asc())
        .limit(k)
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into overlapping context-window chunks —
    the RAG-ingestion / long-doc-pretraining counterpart of
    ``pack_sequences`` (which packs SHORT docs up to a budget; this
    cuts LONG docs down to one).

    Chunk ``i`` starts at token ``i*(max_tokens-overlap)`` and carries
    up to ``max_tokens`` tokens, so consecutive chunks share
    ``overlap`` tokens and no token is lost; a document shorter than
    ``max_tokens`` yields exactly one chunk.  Chunk counts use pure
    integer ceiling arithmetic (engine-portable, no float division).

    Fully narrow — one array build + one explode per document, zero
    shuffles at any scale.  Returns (doc_id, chunk_id, start_token,
    n_tokens, chunk_text).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks).cast("long")
    # integer ceil: (n - max + stride - 1) div stride + 1
    n_chunks = F.when(n <= max_tokens, F.lit(1).cast("long")).otherwise(
        F.expr(
            f"CAST((size(split({text_col}, ' ')) - {max_tokens} + {stride - 1}) "
            f"div {stride} AS BIGINT) + 1"
        )
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            (i * stride).alias("start_token"),
            F.least(F.lit(max_tokens).cast("long"), n - i * stride).alias(
                "n_tokens"
            ),
            F.concat_ws(
                " ", F.slice(toks, (i * stride + 1).cast("int"), max_tokens)
            ).alias("chunk_text"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.start_token").alias("start_token"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def negative_samples(
    docs: DataFrame,
    k: int = 4,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic in-batch negative mining for contrastive training:
    each document draws ``k`` pseudo-random partners (≠ itself) from the
    corpus via the LCG, as (doc_id, j, neg_doc_id).

    Contrastive objectives (CLIP/DPR-style) need negatives per anchor;
    sampling them with engine randomness would be irreproducible across
    retries and engines, so the draw is the same affine-LCG arithmetic
    ``train_shuffle`` uses: candidate index = ``((A·(idx·k + j + seed)
    + C) mod M) mod N``, bumped by one (mod N) on self-collision.  Every
    epoch/seed yields a different but fully reproducible draw.

    The dense 0..N−1 index comes from a global row_number over
    ``id_col`` — the same oracle-portability price ``token_dictionary``
    pays, and the same escape hatch at 100 TB: swap the global window
    for the range-partition + broadcast-offset rank machinery
    (``dedup.sorted_neighborhood_pairs``) — the downstream plan
    (explode k, one equi-join back to the index table) is unchanged.
    N arrives via a broadcast 1-row frame; the index table is
    checkpointed once and consumed by both the anchor and the
    negative-resolution side of the join.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.orderBy(id_col)
    idx = (
        docs.select(F.col(id_col).alias("doc_id"))
        .withColumn("idx", (F.row_number().over(w) - 1).cast("long"))
        .localCheckpoint(eager=False)
    )
    n = idx.agg(F.count("*").alias("n"))
    pos = (
        idx.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "idx",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        )
        .withColumn(
            # Reduce the argument mod M BEFORE the multiply: A·(x mod M)
            # ≡ A·x (mod M) and A·(M−1) ≈ 2.4e18 < 2^63, so the product
            # never overflows int64 — whereas A·x directly wraps once
            # idx·k+j ≥ ~8.4e9 (≈2.1e9 docs at k=4), aborting under
            # ANSI mode and silently corrupting the draw without it.
            "cand",
            (
                (
                    F.lit(LCG_A)
                    * F.pmod(
                        F.col("idx") * k + F.col("j") + F.lit(seed), F.lit(LCG_M)
                    )
                    + F.lit(LCG_C)
                )
                % F.lit(LCG_M)
            )
            % F.col("n"),
        )
        .withColumn(
            "cand",
            F.when(F.col("cand") == F.col("idx"), (F.col("cand") + 1) % F.col("n"))
            .otherwise(F.col("cand")),
        )
    )
    neg = idx.select(F.col("idx").alias("cand"), F.col("doc_id").alias("neg_doc_id"))
    return pos.join(neg, "cand").select(
        "doc_id", F.col("j").cast("int").alias("j"), "neg_doc_id"
    )
