"""The oracle-checked query suite — the driver's correctness contract.

Every entry pairs a PySpark builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI SQL string DuckDB runs on the same parquet
tables.  The driver hash-compares unordered results at sf0.01
(``__spark_entry__.py`` contract), so:

* every computed column is aliased identically on both sides;
* double-typed aggregates are summed via DECIMAL casts (exact,
  order-independent) and cast back to DOUBLE at the end — a plain
  double sum is order-dependent and would hash-mismatch between
  engines;
* timestamps are projected as epoch seconds (BIGINT) where they appear
  in results, sidestepping timezone/format drift.

Volume-semantics queries (`vox_*`) generate the FIXTURES.md §1 cube
deterministically *inside both engines* (range cross-products), so the
reference's actual operator semantics (upscale/outline/pyramid/decode)
are oracle-checked end-to-end, not just analogized onto TPC-H tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import relational as R
from .operators import outline as O
from .operators import pyramid as P
from .operators import upscale as U
from .operators import verify as V
from .tables import load_table
from .volume import FIXTURE_META, synthetic_voxels

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect, ANSI-compatible subset)
# ---------------------------------------------------------------------------

# FIXTURES.md §1 cube — identical generation rule as volume.synthetic_voxels.
VOX_CTE = """
voxels AS (
  SELECT t1.range AS z, t2.range AS y, t3.range AS x,
         15564 + (t1.range // 4) * 16 + (t2.range // 4) * 4 + (t3.range // 4) AS label
  FROM range(16) t1, range(16) t2, range(16) t3
)
"""

# FIXTURES.md §2 ontology — identical rule as relational.synthetic_regions.
REGIONS_CTE = """
regions AS (
  SELECT CAST(15500 AS BIGINT) AS region, 'ROOT' AS region_abbr, 'mouse' AS region_name,
         CAST(-1 AS INTEGER) AS level, CAST(0 AS BIGINT) AS parent
  UNION ALL
  SELECT CAST(15540 + i.range AS BIGINT), 'M' || i.range, 'mid node ' || i.range,
         CAST(0 AS INTEGER), CAST(15500 AS BIGINT)
  FROM range(4) i
  UNION ALL
  SELECT CAST(j.range AS BIGINT), 'R' || j.range, 'region ' || j.range,
         CAST(1 AS INTEGER), CAST(15540 + (j.range % 4) AS BIGINT)
  FROM range(15564, 15638) j
)
"""


QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, fn: QueryFn, sql: str | None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


# ---------------------------------------------------------------------------
# vox_* — reference volume semantics, oracle-checked end-to-end
# ---------------------------------------------------------------------------


def _vox_upscale2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return U.upscale_coo(synthetic_voxels(spark), 2)


_register(
    "vox_upscale2",
    _vox_upscale2,
    f"""
WITH {VOX_CTE}
SELECT v.z * 2 + a.range AS z, v.y * 2 + b.range AS y, v.x * 2 + c.range AS x, v.label
FROM voxels v, range(2) a, range(2) b, range(2) c
""",
)


def _vox_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.decimate(synthetic_voxels(spark), 2)


_register(
    "vox_decimate",
    _vox_decimate,
    f"""
WITH {VOX_CTE}
SELECT z // 2 AS z, y // 2 AS y, x // 2 AS x, label
FROM voxels WHERE z % 2 = 0 AND y % 2 = 0 AND x % 2 = 0
""",
)


def _vox_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.build_pyramid(synthetic_voxels(spark), levels=3, cache_base=False)


_register(
    "vox_pyramid",
    _vox_pyramid,
    f"""
WITH {VOX_CTE}
SELECT z, y, x, label, 0 AS level FROM voxels
UNION ALL
SELECT z // 2, y // 2, x // 2, label, 1 AS level
FROM voxels WHERE z % 2 = 0 AND y % 2 = 0 AND x % 2 = 0
UNION ALL
SELECT z // 4, y // 4, x // 4, label, 2 AS level
FROM voxels WHERE z % 4 = 0 AND y % 4 = 0 AND x % 4 = 0
""",
)


def _vox_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return O.outline_window(synthetic_voxels(spark), wrap=False)


_OUTLINE_SQL = """
WITH {vox},
nb AS (
  SELECT z, y, x, label,
         coalesce(lag(label)  OVER (PARTITION BY z, y ORDER BY x), label) AS xp,
         coalesce(lead(label) OVER (PARTITION BY z, y ORDER BY x), label) AS xn,
         coalesce(lag(label)  OVER (PARTITION BY z, x ORDER BY y), label) AS yp,
         coalesce(lead(label) OVER (PARTITION BY z, x ORDER BY y), label) AS yn,
         coalesce(lag(label)  OVER (PARTITION BY y, x ORDER BY z), label) AS zp,
         coalesce(lead(label) OVER (PARTITION BY y, x ORDER BY z), label) AS zn
  FROM voxels
)
SELECT z, y, x,
       CASE WHEN label != xp OR label != xn OR label != yp OR label != yn
                 OR label != zp OR label != zn THEN label ELSE 0 END AS label
FROM nb
"""

_register("vox_outline", _vox_outline, _OUTLINE_SQL.format(vox=VOX_CTE.strip()))


def _vox_outline_wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return O.outline_window(synthetic_voxels(spark), wrap=True)


# wrap=True reproduces the reference's da.roll torus semantics
# (upscale_streaming_enhance.py:107-119): out-of-range neighbors read the
# opposite face — first/last value over the full scanline.
_OUTLINE_WRAP_SQL = """
WITH {vox},
nb AS (
  SELECT z, y, x, label,
         coalesce(lag(label)  OVER (PARTITION BY z, y ORDER BY x),
                  last_value(label) OVER (PARTITION BY z, y ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS xp,
         coalesce(lead(label) OVER (PARTITION BY z, y ORDER BY x),
                  first_value(label) OVER (PARTITION BY z, y ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS xn,
         coalesce(lag(label)  OVER (PARTITION BY z, x ORDER BY y),
                  last_value(label) OVER (PARTITION BY z, x ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS yp,
         coalesce(lead(label) OVER (PARTITION BY z, x ORDER BY y),
                  first_value(label) OVER (PARTITION BY z, x ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS yn,
         coalesce(lag(label)  OVER (PARTITION BY y, x ORDER BY z),
                  last_value(label) OVER (PARTITION BY y, x ORDER BY z
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS zp,
         coalesce(lead(label) OVER (PARTITION BY y, x ORDER BY z),
                  first_value(label) OVER (PARTITION BY y, x ORDER BY z
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS zn
  FROM voxels
)
SELECT z, y, x,
       CASE WHEN label != xp OR label != xn OR label != yp OR label != yn
                 OR label != zp OR label != zn THEN label ELSE 0 END AS label
FROM nb
"""

_register("vox_outline_wrap", _vox_outline_wrap, _OUTLINE_WRAP_SQL.format(vox=VOX_CTE.strip()))


def _vox_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.decode_labels(synthetic_voxels(spark), R.synthetic_regions(spark))


_register(
    "vox_decode",
    _vox_decode,
    f"""
WITH {VOX_CTE}, {REGIONS_CTE}
SELECT v.z, v.y, v.x, v.label,
       coalesce(r.region_name, 'Unknown') AS region_name,
       coalesce(r.region_abbr, '?') AS region_abbr,
       r.level
FROM voxels v LEFT JOIN regions r ON v.label = r.region
""",
)


def _vox_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Golden point style of lookup_test2.py:31-32 ((100,200,200)→15857→name),
    # shrunk to the fixture cube: (4,4,4) → 15585 → 'region 15585'.
    return R.lookup_region_at(
        synthetic_voxels(spark), R.synthetic_regions(spark), 4, 4, 4
    )


_register(
    "vox_point_lookup",
    _vox_point_lookup,
    f"""
WITH {VOX_CTE}, {REGIONS_CTE}
SELECT v.z, v.y, v.x, v.label,
       coalesce(r.region_name, 'Unknown') AS region_name,
       coalesce(r.region_abbr, '?') AS region_abbr,
       r.level
FROM voxels v LEFT JOIN regions r ON v.label = r.region
WHERE v.z = 4 AND v.y = 4 AND v.x = 4
""",
)


def _vox_verify_upscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    vox = synthetic_voxels(spark)
    return V.upscale_mismatches(vox, U.upscale_coo(vox, 2), 2)


_register(
    "vox_verify_upscale",
    _vox_verify_upscale,
    f"""
WITH {VOX_CTE},
up AS (
  SELECT v.z * 2 + a.range AS z, v.y * 2 + b.range AS y, v.x * 2 + c.range AS x, v.label
  FROM voxels v, range(2) a, range(2) b, range(2) c
)
SELECT v.z, v.y, v.x, v.label, u.label AS up_label
FROM voxels v LEFT JOIN up u ON u.z = v.z * 2 AND u.y = v.y * 2 AND u.x = v.x * 2
WHERE u.label IS NULL OR u.label != v.label
""",
)


def _vox_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return V.volume_extents(synthetic_voxels(spark))


_register(
    "vox_extents",
    _vox_extents,
    f"""
WITH {VOX_CTE}
SELECT max(z) + 1 AS dim_z, max(y) + 1 AS dim_y, max(x) + 1 AS dim_x,
       count(*) AS n_voxels, count(DISTINCT label) AS n_labels
FROM voxels
""",
)


def _vox_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Region-volume histogram (SURVEY §2.8; README.md:11-12 figures).
    return (
        synthetic_voxels(spark)
        .groupBy("label")
        .agg(F.count("*").alias("n_voxels"))
    )


_register(
    "vox_histogram",
    _vox_histogram,
    f"""
WITH {VOX_CTE}
SELECT label, count(*) AS n_voxels FROM voxels GROUP BY label
""",
)


def _vox_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.parent_join(R.synthetic_regions(spark))


_register(
    "vox_hierarchy",
    _vox_hierarchy,
    f"""
WITH {REGIONS_CTE}
SELECT r.region, r.region_name, r.level, r.parent,
       p.region_name AS parent_name, p.level AS parent_level
FROM regions r LEFT JOIN regions p ON r.parent = p.region
""",
)


def _vox_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.ancestor_closure(R.synthetic_regions(spark))


_register(
    "vox_closure",
    _vox_closure,
    f"""
WITH RECURSIVE {REGIONS_CTE},
closure AS (
  SELECT region, parent AS ancestor, 1 AS depth FROM regions
  WHERE parent IS NOT NULL AND parent != 0
  UNION ALL
  SELECT c.region, r.parent AS ancestor, c.depth + 1
  FROM closure c JOIN regions r ON c.ancestor = r.region
  WHERE r.parent IS NOT NULL AND r.parent != 0
)
SELECT region, ancestor, depth FROM closure
""",
)


def _vox_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # T2 — non-integer floor resize 16³ → 24³ (anno_upsampling.py:60-67).
    return U.resize_floor(synthetic_voxels(spark), (16, 16, 16), (24, 24, 24))


_register(
    "vox_resize",
    _vox_resize,
    f"""
WITH {VOX_CTE},
grid AS (
  SELECT t1.range AS tz, t2.range AS ty, t3.range AS tx,
         (t1.range * 16) // 24 AS sz_, (t2.range * 16) // 24 AS sy_, (t3.range * 16) // 24 AS sx_
  FROM range(24) t1, range(24) t2, range(24) t3
)
SELECT g.tz AS z, g.ty AS y, g.tx AS x, v.label
FROM grid g JOIN voxels v ON g.sz_ = v.z AND g.sy_ = v.y AND g.sx_ = v.x
""",
)


def _vox_rotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return U.rotate90(synthetic_voxels(spark), axes=("z", "y"))


_register(
    "vox_rotate",
    _vox_rotate,
    f"""
WITH {VOX_CTE}
SELECT y AS z, z AS y, x, label FROM voxels
""",
)
