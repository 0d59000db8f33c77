"""Geo radius join (B175): blocking completeness at cell boundaries,
inclusive radius, brute-force equivalence, haversine sanity."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kinesis2elastic_spark.operators import geo


def test_radius_join_planted_boundaries(spark):
    pts = spark.createDataFrame(
        [
            (1, 100, 100),
            (2, 100, 250),   # dy=150 == R: inclusive, crosses cell rows
            (3, 100, 251),   # dy=151 > R: out
            (4, 299, 100),   # dx=199: out vs 1, in vs nothing
            (5, 249, 100),   # dx=149 vs 1: in, same-row neighbor cells
        ],
        "k long, x long, y long",
    )
    got = sorted(
        (r.a, r.b, r.dist2)
        for r in geo.radius_join_planar(pts, 150).collect()
    )
    assert got == [(1, 2, 150 * 150), (1, 5, 149 * 149), (2, 3, 1), (4, 5, 50 * 50)]


def test_radius_join_matches_bruteforce(spark):
    """md5-scattered points: the blocked join equals the quadratic
    reference exactly (no boundary loss, no duplicate pairs)."""
    n, grid, r = 300, 2000, 120

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = [(k, h(f"x{k}") % grid, h(f"y{k}") % grid) for k in range(n)]
    pts = spark.createDataFrame(rows, "k long, x long, y long")
    got = sorted(
        (r_.a, r_.b, r_.dist2)
        for r_ in geo.radius_join_planar(pts, r).collect()
    )
    want = sorted(
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for i, a in enumerate(rows)
        for b in rows[i + 1 :]
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= r * r
    )
    assert got == want and len(got) > 0
    assert len(got) == len(set((a, b) for a, b, _ in got))  # no dup pairs


def test_haversine_known_distance(spark):
    """Paris (48.8566, 2.3522) to London (51.5074, -0.1278) ≈ 343.5 km."""
    df = spark.createDataFrame([(48.8566, 2.3522, 51.5074, -0.1278)],
                               "lat1 double, lon1 double, lat2 double, lon2 double")
    d = df.select(
        geo.haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).first()["d"]
    assert d == pytest.approx(343.5, abs=1.5)
    # zero distance, antipodal ~ half circumference
    z = spark.createDataFrame([(10.0, 20.0)], "lat double, lon double")
    assert z.select(
        geo.haversine_km(F.col("lat"), F.col("lon"), F.col("lat"), F.col("lon"))
    ).first()[0] == pytest.approx(0.0, abs=1e-9)


def test_hot_cell_subsplit_bounds_build_side(spark):
    """r12 verdict item 3: the densest-cell skew knob is GATED, not
    narrative.  Adversarial fixture: 1000 points piled into one cell
    (plus a sparse background).  With threshold 100 the hot cell must
    split ~10 ways, every (cell, group) build-side key must stay
    bounded, and the pair set must equal the quadratic reference
    exactly (sub-splitting must lose no pair and duplicate none)."""
    import itertools

    from kinesis2elastic_spark.operators import geo

    R = 100
    thr = 100
    # 1000 points inside one R-cell (cell 0,0), pairwise mostly within R
    hot = [(i, (i * 37) % 97, (i * 53) % 97) for i in range(1000)]
    # sparse background two cells away, incl. a cross-boundary pair
    bg = [(2000, 205, 5), (2001, 199, 5), (2002, 950, 950)]
    pts_rows = hot + bg
    pts = spark.createDataFrame(pts_rows, "k long, x long, y long")

    splits = geo.hot_cell_splits(pts, R, threshold=thr).collect()
    assert len(splits) == 1 and splits[0].cx == 0 and splits[0].cy == 0
    assert splits[0].nsplit == 10
    # build-side bound: no (cell, group) bucket exceeds threshold by
    # more than hash-imbalance slack (2x is generous at n/m = 100)
    from pyspark.sql import functions as F

    per_group = (
        pts.withColumn("cx", F.floor(F.col("x") / R).cast("long"))
        .withColumn("cy", F.floor(F.col("y") / R).cast("long"))
        .withColumn(
            "g", F.pmod(F.crc32(F.col("k").cast("string")), F.lit(10))
        )
        .filter((F.col("cx") == 0) & (F.col("cy") == 0))
        .groupBy("g")
        .count()
        .collect()
    )
    assert len(per_group) == 10  # the split actually fans out
    assert max(r["count"] for r in per_group) <= 2 * thr

    got = {
        (r.a, r.b, r.dist2)
        for r in geo.radius_join_planar(
            pts, R, hot_cell_threshold=thr
        ).collect()
    }
    want = set()
    for (ka, xa, ya), (kb, xb, yb) in itertools.combinations(pts_rows, 2):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= R * R:
            a, b = (ka, kb) if ka < kb else (kb, ka)
            want.add((a, b, d2))
    assert got == want
    assert (2000, 2001, None) not in got  # sanity: dist2 always present
    assert any(a == 2000 or b == 2000 for a, b, _ in got)  # boundary pair found
