"""Association-rule mining over basket tables (market-basket analysis).

The reference has no co-occurrence surface at all (SURVEY §2.8); this
rounds out the event/e-commerce analytics family (funnels, attribution,
transitions) with the remaining staple: which items appear in the same
basket more often than independence predicts.  ``lift(a,b) =
P(ab) / (P(a)·P(b))`` — lift > 1 means genuine association, and ranking
by lift surfaces the surprising pairs rather than the merely popular.

Plan shape (all narrow until the keyed aggregations):

* distinct (basket, item) — one exchange keyed by the pair;
* pair generation is a SELF-EQUI-JOIN on basket_id with ``a < b`` —
  output volume is Σ c(c−1)/2 over basket sizes, bounded by the square
  of the LARGEST basket, never by corpus size.  TPC-H-ish orders hold
  ≤ 7 items; real carts are similarly tiny.  At 100 TB the guard for
  pathological baskets (a crawler "basket" with 10⁶ items) is the
  ``max_basket`` filter: drop baskets above the cap BEFORE the join —
  standard practice (they carry no associative signal) and it converts
  a quadratic worst case into a hard bound;
* per-pair count, per-item count: two aggregation exchanges;
* the two item-frequency joins key on single items, N arrives as a
  broadcast 1-row frame (no driver round-trip), and the final lift is
  pure codegen arithmetic — double products in a FIXED order so the
  DuckDB oracle reproduces it bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(
    df: DataFrame, basket_col: str, item_col: str, max_basket: int = 64
) -> DataFrame:
    """Distinct (basket, item) pairs with oversized baskets dropped.

    ``max_basket`` bounds the pair-join blowup: a basket of c items
    emits c(c−1)/2 pairs, so the cap turns the worst case from
    quadratic-in-the-hottest-key into a constant.  Dropping the whole
    oversized basket (not truncating it) keeps the semantics honest —
    a truncated basket would silently under-count its pairs.
    """
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    sizes = items.groupBy("basket").agg(F.count("*").alias("_c"))
    return (
        items.join(sizes.filter(F.col("_c") <= max_basket), "basket")
        .select("basket", "item")
    )


def pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    top_k: int = 20,
    max_basket: int = 64,
) -> DataFrame:
    """Top-``top_k`` item pairs by lift, with support ≥ ``min_support``
    baskets: (a, b, cnt_ab, cnt_a, cnt_b, lift), a < b, ordered by
    (lift DESC, a, b) — a total order, so the top-k set is
    deterministic.

    Lift is computed as ``(double(cnt_ab) · double(N)) /
    (double(cnt_a) · double(cnt_b))`` — double products, never an
    int64 product that could overflow at corpus scale (cnt·N can pass
    2⁶³ long before the counts themselves do).
    """
    items = basket_items(df, basket_col, item_col, max_basket)
    # one checkpoint: three consumers (pair join both sides + item counts)
    items = items.localCheckpoint(eager=False)
    n_baskets = items.select("basket").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    item_cnt = items.groupBy("item").agg(F.count("*").alias("cnt"))
    a = items.select("basket", F.col("item").alias("a"))
    b = items.select("basket", F.col("item").alias("b"))
    pair_cnt = (
        a.join(b, "basket")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= min_support)
    )
    out = (
        pair_cnt.join(
            item_cnt.select(F.col("item").alias("a"), F.col("cnt").alias("cnt_a")),
            "a",
        )
        .join(
            item_cnt.select(F.col("item").alias("b"), F.col("cnt").alias("cnt_b")),
            "b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "a",
            "b",
            "cnt_ab",
            "cnt_a",
            "cnt_b",
            (
                (F.col("cnt_ab").cast("double") * F.col("n_baskets").cast("double"))
                / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double"))
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "a", "b").limit(top_k)
