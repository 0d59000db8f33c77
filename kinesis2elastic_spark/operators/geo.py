"""Geospatial radius self-join via cell bucketing (B175).

The proximity query an event/entity table serves at 100 TB — "all
pairs of points within R of each other" (store catchment overlap,
nearby-entity resolution, co-location mining) — is quadratic done
naively.  The distributed shape is the standard grid-cell blocking
(the spatial sibling of B33's LSH banding and B61's blocked fuzzy
join): bucket every point into a cell of width == R, equi-join each
point's cell against its 9-cell neighborhood, and run the EXACT
distance predicate only on those candidates.  A pair within R is
never farther than one cell apart (cell width == R guarantees it), so
blocking loses nothing; candidate count scales with local density,
not n².

Plan shape: one map-side explode (9 offsets — rows×9, no shuffle), one
equi-join on (cell_x, cell_y) — hash-partitioned, skew governed by the
densest cell, the documented knob being cell width — then the exact
filter and a canonical a<b dedup that is structural (each unordered
pair meets in EXACTLY one (offset, cell) combination, so no
dropDuplicates pass is needed).

Exactness doctrine: the hashed contract uses INTEGER planar
coordinates and BIGINT squared distance — cross-engine exact (the
repo's no-transcendentals-in-the-hash rule: libm sin/cos differ in
ULPs between engines, so a haversine threshold could flip a boundary
pair).  ``haversine_km`` ships as the production metric for real
lat/lon (JVM-side column expression, no UDF); same plan, float
distance, documented as not-hash-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.hashing import md5_hex_sql, md5_prefix_long

# deterministic synthetic coordinates: customers scattered over a
# 20000x20000 integer grid by md5 of the key (linear multipliers make a
# degenerate lattice — every qualifying pair lands at the same few
# distances; the hash scatter is uniform and BOTH engines state it
# verbatim via the md5-prefix convention)
GEO_GRID = 20000
GEO_RADIUS = 150          # cell width == radius: 9-cell neighborhood exact
GEO_R2 = GEO_RADIUS * GEO_RADIUS


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km — the production metric for real
    lat/lon columns.  Pure JVM column arithmetic (no UDF), but float:
    transcendental ULPs differ across engines, so NEVER hash a
    haversine value or threshold verdict (use the planar-integer form
    for oracle-checked contracts)."""
    r1, o1, r2, o2 = (F.radians(c) for c in (lat1, lon1, lat2, lon2))
    a = (
        F.sin((r2 - r1) / 2) ** 2
        + F.cos(r1) * F.cos(r2) * F.sin((o2 - o1) / 2) ** 2
    )
    return F.lit(6371.0088) * 2 * F.asin(F.sqrt(a))


GEO_HOT_CELL_THRESHOLD = 4096  # build-side rows per (cell, salt-group)


def hot_cell_splits(
    pts: DataFrame,
    radius: int,
    x: str = "x",
    y: str = "y",
    threshold: int = GEO_HOT_CELL_THRESHOLD,
) -> DataFrame:
    """Per-cell split factor for cells ABOVE the skew threshold:
    (cx, cy, nsplit=ceil(count/threshold)).  One map-combinable agg;
    the result is tiny by construction (≤ n/threshold rows) and is
    BROADCAST into the join — the skew governor the r12 verdict asked
    to gate rather than narrate."""
    cell_x = F.floor(F.col(x) / radius).cast("long")
    cell_y = F.floor(F.col(y) / radius).cast("long")
    return (
        pts.groupBy(cell_x.alias("cx"), cell_y.alias("cy"))
        .agg(F.count("*").alias("__cnt"))
        .filter(F.col("__cnt") > threshold)
        .select(
            "cx",
            "cy",
            F.ceil(F.col("__cnt") / threshold).cast("int").alias("nsplit"),
        )
    )


def radius_join_planar(
    pts: DataFrame,
    radius: int,
    key: str = "k",
    x: str = "x",
    y: str = "y",
    hot_cell_threshold: int = GEO_HOT_CELL_THRESHOLD,
) -> DataFrame:
    """All unordered pairs of ``pts`` rows within ``radius`` (planar
    integer metric, inclusive) → (a, b, dist2), a < b.  Cell width ==
    radius, 9-cell neighbor equi-join, exact BIGINT filter.

    Skew gate (r13, closing the r12 'densest-cell knob is narrative'
    item): a cell holding more than ``hot_cell_threshold`` points is
    SUB-SPLIT — its points get a deterministic salt group
    g = crc32(key) mod nsplit, nsplit = ceil(count/threshold), and the
    probe side explodes per neighbor cell to ALL that cell's groups, so
    every ordered candidate pair still meets exactly once while the
    join's build side per (cell, group) key is bounded by ~threshold
    rows.  The explode factor is exactly the split factor — total
    candidate volume is unchanged, only the straggler task is cut into
    nsplit parallel tasks (the block-split self-join discipline, same
    family as B142's no-hot-key rule).  Cold tables pay one extra
    map-combinable count + an (empty) broadcast join."""
    cell_x = F.floor(F.col(x) / radius).cast("long")
    cell_y = F.floor(F.col(y) / radius).cast("long")
    splits = hot_cell_splits(pts, radius, x, y, hot_cell_threshold)
    right = (
        pts.select(
            F.col(key).alias("b"),
            F.col(x).alias("bx"),
            F.col(y).alias("by"),
            cell_x.alias("jcx"),
            cell_y.alias("jcy"),
        )
        .join(
            F.broadcast(splits),
            (F.col("jcx") == F.col("cx")) & (F.col("jcy") == F.col("cy")),
            "left",
        )
        .select(
            "b",
            "bx",
            "by",
            "jcx",
            "jcy",
            F.pmod(
                F.crc32(F.col("b").cast("string")),
                F.coalesce(F.col("nsplit"), F.lit(1)),
            )
            .cast("int")
            .alias("jg"),
        )
    )
    left = (
        pts.select(
            F.col(key).alias("a"),
            F.col(x).alias("ax"),
            F.col(y).alias("ay"),
            cell_x.alias("acx"),
            cell_y.alias("acy"),
        )
        .withColumn("off", F.explode(F.array(*[F.lit(i) for i in range(9)])))
        .select(
            "a",
            "ax",
            "ay",
            (F.col("acx") + F.col("off") % 3 - 1).alias("jcx"),
            (F.col("acy") + F.floor(F.col("off") / 3) - 1)
            .cast("long")
            .alias("jcy"),
        )
        .join(
            F.broadcast(splits),
            (F.col("jcx") == F.col("cx")) & (F.col("jcy") == F.col("cy")),
            "left",
        )
        .select(
            "a",
            "ax",
            "ay",
            "jcx",
            "jcy",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("nsplit"), F.lit(1)) - 1
                )
            ).alias("jg_raw"),
        )
        .withColumn("jg", F.col("jg_raw").cast("int"))
        .drop("jg_raw")
    )
    dx = F.col("ax") - F.col("bx")
    dy = F.col("ay") - F.col("by")
    return (
        left.join(right, ["jcx", "jcy", "jg"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("dist2", (dx * dx + dy * dy).cast("long"))
        .filter(F.col("dist2") <= radius * radius)
        .select("a", "b", "dist2")
    )


def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B175 contract query: customers at deterministic integer grid
    positions; all pairs within GEO_RADIUS via the cell-blocked join.
    Reduction: one row per distance-squared BAND (dist2 div 2500) with
    pair count, md5-prefix pair checksum, min/max pair key — a pair
    found twice (dedup bug), missed at a cell boundary (blocking bug),
    or mis-measured (arithmetic drift) flips a band's row.  DuckDB
    recomputes the same pairs QUADRATICALLY (a.k < b.k cross filter) —
    a different algorithm shape, same exact integers."""
    c = load(spark, sf_dir, "customer")
    kx = F.concat(F.lit("x"), F.col("c_custkey").cast("string"))
    ky = F.concat(F.lit("y"), F.col("c_custkey").cast("string"))
    pts = c.select(
        F.col("c_custkey").cast("long").alias("k"),
        (md5_prefix_long(kx, 8) % GEO_GRID).cast("long").alias("x"),
        (md5_prefix_long(ky, 8) % GEO_GRID).cast("long").alias("y"),
    )
    pairs = radius_join_planar(pts, GEO_RADIUS)
    pair_key = F.concat_ws("|", F.col("a"), F.col("b"))
    return pairs.groupBy(
        F.expr("dist2 div 2500").cast("long").alias("band")
    ).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(md5_prefix_long(pair_key, 12)).cast("long").alias("pair_checksum"),
        F.min("a").cast("long").alias("min_a"),
        F.max("b").cast("long").alias("max_b"),
    )


QUERIES = {"q_geo_radius_join": q_geo_radius_join}

ORACLE = {
    "q_geo_radius_join": f"""
        WITH pts AS (
            SELECT c_custkey AS k,
                   {md5_hex_sql("'x' || CAST(c_custkey AS VARCHAR)", 8)}
                       % {GEO_GRID} AS x,
                   {md5_hex_sql("'y' || CAST(c_custkey AS VARCHAR)", 8)}
                       % {GEO_GRID} AS y
            FROM customer
        ),
        pairs AS (
            SELECT a.k AS a, b.k AS b,
                   (a.x - b.x) * (a.x - b.x)
                 + (a.y - b.y) * (a.y - b.y) AS dist2
            FROM pts a JOIN pts b ON a.k < b.k
            WHERE (a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) <= {GEO_R2}
        )
        SELECT CAST(dist2 // 2500 AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum({md5_hex_sql("CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR)", 12)})
                    AS BIGINT) AS pair_checksum,
               CAST(min(a) AS BIGINT) AS min_a,
               CAST(max(b) AS BIGINT) AS max_b
        FROM pairs
        GROUP BY 1
    """,
}

ROWS_ONLY: set[str] = set()
