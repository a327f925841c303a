"""Connected-component labeling over the 6-neighborhood.

Finds maximal face-connected sets of equal-label voxels (region
"islands" — e.g. a region split across hemispheres), assigning each
component the minimum linear index of its members as a canonical id.

No reference implementation exists (SURVEY.md §2.8 — the reference has
no iterative operators at all); this is the canonical *iterative*
distributed algorithm on the engine, the same shape as GraphX/Pregel
connected components:

repeat: ``comp[v] = min(comp[v], min over same-label neighbors)``
until a fixpoint.  Each round is one self-join + aggregate (shuffles on
the coordinate key); rounds needed = the largest component's graph
diameter.  Every round ``localCheckpoint``s its result: caching alone
does NOT truncate the logical plan, so Catalyst would re-analyze an
exponentially growing lineage each round (the classic iterative-
DataFrame pitfall — measured: unbounded planning time by round ~10).
Checkpointing keeps each round's plan one step deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    voxels: DataFrame,
    shape: tuple[int, int, int],
    max_iters: int = 64,
) -> DataFrame:
    """Label face-connected equal-label components.

    Returns (z, y, x, label, comp) with ``comp`` = min linear index
    (z·Y·X + y·X + x) over the component.  Deterministic; converges in
    at most the largest component diameter rounds (guarded by
    ``max_iters``).
    """
    zdim, ydim, xdim = shape
    lin = (F.col("z") * ydim * xdim + F.col("y") * xdim + F.col("x")).alias("comp")
    comp = voxels.select("z", "y", "x", "label", lin).localCheckpoint(eager=True)
    base = voxels.select("z", "y", "x", "label").localCheckpoint(eager=True)

    shifts = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    converged = False
    for _ in range(max_iters):
        neigh = None
        for dz, dy, dx in shifts:
            n = comp.select(
                (F.col("z") + dz).alias("z"),
                (F.col("y") + dy).alias("y"),
                (F.col("x") + dx).alias("x"),
                F.col("label"),
                F.col("comp"),
            )
            neigh = n if neigh is None else neigh.unionByName(n)
        # min over self ∪ same-label neighbors, per voxel
        # group by (coord, label): a shifted neighbor row only merges with
        # the real voxel at that coordinate when labels match; groups for
        # coordinates/labels that are not actual voxels are dropped by the
        # semi-join on ALL four columns.
        merged = (
            comp.unionByName(neigh)
            .groupBy("z", "y", "x", "label")
            .agg(F.min("comp").alias("comp"))
            .join(base, ["z", "y", "x", "label"], "left_semi")
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.alias("m")
            .join(comp.alias("c"), ["z", "y", "x"])
            .filter(F.col("m.comp") != F.col("c.comp"))
            .limit(1)
            .count()
        )
        comp = merged
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters) - raise max_iters"
        )
    return comp


def component_sizes(components: DataFrame) -> DataFrame:
    """Per-component voxel counts (for island-size filtering)."""
    return components.groupBy("label", "comp").agg(F.count("*").alias("n_voxels"))


def connected_components_edges(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 64,
) -> DataFrame:
    """Generic connected components on an undirected edge list.

    Same fixpoint as the voxel variant, but neighbors come from an edge
    table instead of coordinate shifts — min component id propagates
    across edges until convergence.  Returns (id, comp).  This is the
    clustering primitive behind near-duplicate *groups*: feed it the
    pair output of MinHash/Jaccard dedup and every transitive family of
    near-dups collapses to one cluster id (its minimum member id).
    """
    comp = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("comp")
    ).localCheckpoint(eager=True)
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        neigh = (
            und.join(comp, und["b"] == comp["id"])
            .select(F.col("a").alias("id"), "comp")
        )
        merged = (
            comp.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.alias("m")
            .join(comp.alias("c"), "id")
            .filter(F.col("m.comp") != F.col("c.comp"))
            .limit(1)
            .count()
        )
        comp = merged
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_edges did not converge in {max_iters} "
            "rounds (graph diameter exceeds max_iters) - raise max_iters"
        )
    return comp
