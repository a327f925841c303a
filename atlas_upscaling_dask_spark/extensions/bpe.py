"""Byte-pair-encoding tokenizer induction, Spark-first.

The classic BPE trainer (Sennrich et al., "Neural Machine Translation
of Rare Words with Subword Units") never touches the corpus after one
pass: it operates on the **word-frequency table** — distinct words with
counts — merging the most frequent adjacent symbol pair per iteration.
That structure is exactly right for 100 TB: the corpus-size-dependent
work is ONE aggregation (word counts); every training iteration then
runs over the distinct-word frame (bounded by vocabulary, millions of
rows, not the corpus), with pair counting as a weighted narrow explode
+ one partial-aggregated exchange, and the winning pair reduced to the
driver as a single row (an ``orderBy(...).limit(1)`` action per merge —
the only driver traffic).

Merge application is a fold-left over each word's symbol array
(``F.aggregate`` with a struct accumulator) — greedy left-to-right,
non-overlapping, the reference semantics: ``a a a`` under merge
``(a,a)`` becomes ``aa a``, and the merged token is not re-eligible
within the same iteration.  Everything stays in Catalyst expressions;
no Python UDF anywhere.

Correctness: ``bpe_train`` is verified in tests/ against a pure-Python
reference trainer (merge list AND final segmentations); the
first-iteration pair-count table is SQL-expressible and oracle-checked
as the ``bpe_pair_counts`` suite query (integer-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: end-of-word marker symbol (kept printable and un-splittable: it is
#: appended as its OWN list element, never concatenated into the word).
EOW = "</w>"

_SYM_STRUCT = "struct<out:array<string>,prev:string>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-wide pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def to_symbols(words: DataFrame) -> DataFrame:
    """Attach the initial symbol sequence: characters + the EOW marker.

    Characters come from a ``substring`` transform (portable to the SQL
    oracle; ``split(w, '')`` edge behavior differs across engines).
    """
    chars = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    syms = F.concat(chars, F.array(F.lit(EOW)))
    return words.select("word", "freq", syms.alias("syms"))


def pair_counts(symframe: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol column.

    Narrow explode (≤ len(word) rows per distinct word) + one
    partial-aggregated exchange keyed on the pair.
    """
    pairs = F.when(
        F.size("syms") >= 2,
        F.expr(
            "transform(sequence(0, size(syms) - 2),"
            " i -> struct(syms[i] AS s1, syms[i + 1] AS s2))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<s1:string,s2:string>>)"))
    ex = symframe.select(F.col("freq"), F.explode(pairs).alias("p"))
    return (
        ex.groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def top_pairs(symframe: DataFrame, k: int = 20) -> DataFrame:
    """Top-``k`` merge candidates: (s1, s2, pair_count, rank) ordered by
    (count desc, s1 asc, s2 asc) — the deterministic tie-break the
    trainer uses, so rank 1 IS the next merge."""
    from pyspark.sql import Window

    ordered = [F.col("pair_count").desc(), F.col("s1").asc(), F.col("s2").asc()]
    w = Window.orderBy(*ordered)  # ≤ k rows survive: single partition ok
    return (
        pair_counts(symframe)
        .orderBy(*ordered)
        .limit(k)
        .select("s1", "s2", "pair_count", F.row_number().over(w).cast("int").alias("rank"))
    )


def apply_merge(symframe: DataFrame, s1: str, s2: str) -> DataFrame:
    """Replace every adjacent (s1, s2) with the concatenation, greedy
    left-to-right — one narrow fold-left per word, no shuffle."""
    merged = F.concat(F.lit(s1), F.lit(s2))
    init = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        hit = acc["prev"].isNotNull() & (acc["prev"] == s1) & (s == s2)
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(merged)))
            .otherwise(
                F.when(
                    acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
                ).otherwise(acc["out"])
            )
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s).alias("prev"),
        )

    def finish(acc):
        return F.when(
            acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"])

    return symframe.withColumn("syms", F.aggregate("syms", init, step, finish))


#: Vocabulary size at or below which training runs driver-local (r12).
#: A BPE trainer's per-round state is the DISTINCT-WORD table, not the
#: corpus; below this bound the table is a few MB and every distributed
#: round would spend ~0.5 s of pure job overhead (pair-count collect +
#: checkpointed fold) on a frame that fits in L2.  Real 100 TB corpora
#: have 10^6–10^8 distinct words and keep the distributed path.
LOCAL_VOCAB_THRESHOLD = 65536


def _apply_batch_local(syms: list, mapping: dict) -> list:
    """Pure-Python twin of the ``apply_merges_batch`` fold: greedy
    left-to-right, merged token not re-eligible within the pass."""
    out: list = []
    prev = None
    for s in syms:
        m = mapping.get((prev, s)) if prev is not None else None
        if m is not None:
            out.append(m)
            prev = None
        else:
            if prev is not None:
                out.append(prev)
            prev = s
    if prev is not None:
        out.append(prev)
    return out


def _train_local(
    table: list, n_merges: int, max_batch: int
) -> tuple[list, list]:
    """Driver-local exact twin of the batched trainer's round loop over
    a collected (freq, syms) table.  Candidate ordering, the non-
    conflicting greedy batch rule, and the fold semantics are identical
    to the distributed forms (pytest-pinned both ways), so the merge
    list is the same whichever path ran."""
    merges: list = []
    while len(merges) < n_merges:
        counts: dict = {}
        for _w, freq, syms in table:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + freq
        if not counts:
            break
        want = min(max_batch, n_merges - len(merges))
        cands = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: want * 4]
        used: set = set()
        batch: list = []
        for (s1, s2), _ in cands:
            if len(batch) >= want:
                break
            if s1 in used or s2 in used or (s1 + s2) in used:
                continue
            batch.append((s1, s2))
            used.update((s1, s2, s1 + s2))
        merges.extend(batch)
        mapping = {(a, b): a + b for a, b in batch}
        table = [(w, f, _apply_batch_local(s, mapping)) for w, f, s in table]
    return merges, table


#: Input-size ceiling for even ATTEMPTING the local-path probe.  The
#: probe's ``limit`` caps rows AFTER the aggregation, so it costs one
#: full word-count corpus pass; on a large corpus that pass is exactly
#: the cost the local path exists to avoid — and (Heaps' law) a corpus
#: beyond a few hundred MB essentially never has a <=65536-word
#: vocabulary.  Gating on the optimizer's driver-side size estimate
#: (file-size metadata, no job) makes the production-scale path pay
#: ZERO probe overhead: it goes straight to the one-pass distributed
#: loop.  (r13; measured: the alternative — localCheckpoint the
#: word-frequency table and probe it — cost +0.65 s of materialization
#: at bench scale, strictly worse at both scales than not probing.)
_LOCAL_PROBE_MAX_BYTES = 256 << 20


def _plan_size_bytes(df: DataFrame) -> int:
    """Optimizer size estimate (driver-side metadata; for file scans
    this is the input file bytes — no job runs)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — conservative: treat as huge
        return 1 << 62


def _collect_local_table(
    docs: DataFrame, text_col: str, threshold: int
) -> list | None:
    """Collect the (freq, initial-syms) table when the vocabulary is at
    most ``threshold`` distinct words; None ⇒ stay distributed.

    Inputs past ``_LOCAL_PROBE_MAX_BYTES`` skip the probe entirely
    (see above) — the over-threshold recompute this probe used to
    inflict on the distributed path can then only happen on SMALL
    inputs, where the second corpus pass is cheap by construction."""
    if _plan_size_bytes(docs) > _LOCAL_PROBE_MAX_BYTES:
        return None
    wf = word_frequencies(docs, text_col)
    # limit+1 probe: never counts (or collects) an over-threshold vocab
    probe = wf.limit(threshold + 1).collect()
    if len(probe) > threshold:
        return None
    return [
        (r["word"], int(r["freq"]), list(r["word"]) + [EOW])
        for r in probe
    ]


def _local_symframe(spark: SparkSession, table: list) -> DataFrame:
    return spark.createDataFrame(
        table, "word string, freq bigint, syms array<string>"
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    local_threshold: int = LOCAL_VOCAB_THRESHOLD,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges; returns (merge list, final symbol
    frame).  One corpus pass for word counts, then per-iteration work is
    bounded by the distinct-word table (cached); each iteration's driver
    traffic is ONE (s1, s2) row.

    r12: vocabularies of at most ``local_threshold`` distinct words
    train driver-local on the collected word-frequency table (exact
    same ordering/fold semantics — one corpus pass, zero per-round
    jobs); pass ``local_threshold=0`` to force the distributed loop.
    """
    if local_threshold:
        table = _collect_local_table(docs, text_col, local_threshold)
        if table is not None:
            merges, table = _train_local(table, n_merges, max_batch=1)
            return merges, _local_symframe(docs.sparkSession, table)
    # localCheckpoint per round, NOT cache: caching does not truncate
    # the logical plan, so each round's fold-left would re-analyze an
    # ever-growing expression tree — at 256 merges that is minutes of
    # Catalyst analysis for a 31-row frame (the components.py iterative
    # pitfall, measured here too).
    syms = to_symbols(word_frequencies(docs, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            pair_counts(syms)
            .orderBy(F.col("pair_count").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        s1, s2 = best[0]["s1"], best[0]["s2"]
        merges.append((s1, s2))
        syms = apply_merge(syms, s1, s2).localCheckpoint(eager=True)
    return merges, syms


def apply_merges_batch(
    symframe: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Apply a SYMBOL-DISJOINT batch of merges in ONE fold pass.

    When no two pairs in the batch share a symbol (and no pair's merged
    token collides with another pair's symbol), sequential application
    in any order equals simultaneous application — a merged token's
    neighbors can never complete a different accepted pair.  The fold
    looks each (prev, cur) adjacency up in a literal struct-keyed map,
    so a 64-merge batch costs exactly one narrow pass over the
    distinct-word frame instead of 64.
    """
    if not pairs:
        return symframe
    entries = []
    for s1, s2 in pairs:
        entries.append(F.struct(F.lit(s1).alias("a"), F.lit(s2).alias("b")))
        entries.append(F.lit(s1 + s2))
    merge_map = F.create_map(*entries)
    init = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        m = F.element_at(
            merge_map, F.struct(acc["prev"].alias("a"), s.alias("b"))
        )
        hit = acc["prev"].isNotNull() & m.isNotNull()
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(m)))
            .otherwise(
                F.when(
                    acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
                ).otherwise(acc["out"])
            )
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s).alias("prev"),
        )

    def finish(acc):
        return F.when(
            acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"])

    return symframe.withColumn("syms", F.aggregate("syms", init, step, finish))


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int = 256,
    max_batch: int = 64,
    text_col: str = "text",
    local_threshold: int = LOCAL_VOCAB_THRESHOLD,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Production-vocab BPE training: batch NON-CONFLICTING merges per
    corpus pass (the standard scalable-trainer heuristic — e.g.
    SentencePiece's frequent-pair batching).

    Each round counts pairs ONCE, takes the rank-ordered candidates,
    and greedily accepts pairs that share no symbol with (and whose
    merged token does not collide with) any pair already accepted this
    round; the whole batch then applies in one fold pass
    (:func:`apply_merges_batch`).  Driver rounds drop from
    ``n_merges`` to ``~n_merges / max_batch`` — a 32k vocab costs
    ~500 passes instead of 32k, which is what makes training tractable
    when each pass is a distributed job.

    Heuristic vs exact: later pairs in a batch are accepted on counts
    measured BEFORE the earlier merges applied, so a pair formed by an
    earlier merge (count ≤ its parent's) can in principle overtake
    them; ``max_batch=1`` reproduces :func:`bpe_train` exactly
    (property-tested), and larger batches trade that edge case for a
    ``max_batch``× cut in corpus passes.
    """
    if max_batch < 1:
        raise ValueError("max_batch must be >= 1")
    # r12: small vocabularies train driver-local (see bpe_train) — the
    # per-round state is the distinct-word table, and below the
    # threshold every distributed round is pure job overhead.
    if local_threshold:
        table = _collect_local_table(docs, text_col, local_threshold)
        if table is not None:
            merges, table = _train_local(table, n_merges, max_batch)
            return merges, _local_symframe(docs.sparkSession, table)
    # localCheckpoint per round (see bpe_train): plan stays one fold deep
    syms = to_symbols(word_frequencies(docs, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        want = min(max_batch, n_merges - len(merges))
        cands = (
            pair_counts(syms)
            .orderBy(F.col("pair_count").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(want * 4)
            .collect()
        )
        if not cands:
            break
        used: set[str] = set()
        batch: list[tuple[str, str]] = []
        # the rank-1 candidate is always accepted (used is empty), so
        # every round makes progress — batch is non-empty here
        for r in cands:
            if len(batch) >= want:
                break
            s1, s2 = r["s1"], r["s2"]
            if s1 in used or s2 in used or (s1 + s2) in used:
                continue
            batch.append((s1, s2))
            used.update((s1, s2, s1 + s2))
        merges.extend(batch)
        syms = apply_merges_batch(syms, batch).localCheckpoint(eager=True)
    return merges, syms


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a trained merge list — narrow,
    corpus-wide, the inference half of the tokenizer.  Returns
    (doc_id, word, pieces).

    Merges apply in training order, but CONSECUTIVE merges that share
    no symbol (and no merged-token collision) fuse into one
    :func:`apply_merges_batch` fold — order-preserving, semantics
    identical (disjoint pairs cannot interact), and it keeps the plan
    at ~n_batches fold expressions instead of one per merge: a
    256-merge tokenizer would otherwise chain 256 folds and stall in
    Catalyst analysis (the same blowup the trainers hit before
    localCheckpoint), where segmentation must stay a single narrow
    plan — no materialization — because it runs over the full corpus.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.col("word") != "")
    sym = words.withColumn(
        "syms",
        F.concat(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
            F.array(F.lit(EOW)),
        ),
    )
    batch: list[tuple[str, str]] = []
    used: set[str] = set()
    for s1, s2 in merges:
        if s1 in used or s2 in used or (s1 + s2) in used:
            sym = apply_merges_batch(sym, batch)
            batch, used = [], set()
        batch.append((s1, s2))
        used.update((s1, s2, s1 + s2))
    sym = apply_merges_batch(sym, batch)
    return sym.select("doc_id", "word", F.col("syms").alias("pieces"))
