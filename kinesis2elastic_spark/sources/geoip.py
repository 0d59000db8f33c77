"""GeoIP enrichment dimension (SURVEY §2 A28).

The reference calls the OpenSearch ``geoip`` processor twice on ``source.ip``
(city db → source.geo, ASN db → source.as; ingest/axway-ingest.json:90-108).
Spark-first equivalent: a **broadcast range join** against a CIDR-range
dimension table (ip_lo..ip_hi as int64).  At 100 TB the dim stays a few MB
(GeoLite2 scale: ~4M ranges ≈ 200 MB — still broadcastable; if not,
bucket by /8 prefix and equi-join on the bucket before the range filter).

No MaxMind data ships here; :func:`synthetic_geoip_dim` provides the
deterministic stand-in ranges (FIXTURES.md §5) used by tests and oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# (ip_lo, ip_hi, country, city, as_number, as_org) — 10.0.0.0-based ranges so
# the synthesized test IPs (10.{user_id%200}.x.7) hit ~3/4 of the space and
# leave the rest NULL (ignore_missing semantics).
SYNTH_RANGES = [
    (167772160, 173015039, "US", "Springfield", 64500, "Acme Backbone"),
    (173015040, 177602559, "DE", "Berlin", 64501, "Beta Net"),
    (177602560, 179568639, "JP", "Osaka", 64502, "Gamma Corp"),
]


def synthetic_geoip_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        SYNTH_RANGES,
        "ip_lo bigint, ip_hi bigint, geo_country string, geo_city string, as_number bigint, as_org string",
    )


def ip_to_int(col: Column) -> Column:
    """Dotted-quad IPv4 string → int64 (JVM-side split/cast, no UDF)."""
    p = F.split(col, r"\.")
    return (
        F.element_at(p, 1).cast("long") * 16777216
        + F.element_at(p, 2).cast("long") * 65536
        + F.element_at(p, 3).cast("long") * 256
        + F.element_at(p, 4).cast("long")
    )


def geoip_enrich(df: DataFrame, dim: DataFrame, ip_col: str = "source.ip") -> DataFrame:
    """Left broadcast range-join enrichment.  Output columns follow the
    post-rename names of the reference chain (asn → source.as.number,
    organization_name → source.as.organization.name,
    ingest/axway-ingest.json:109-122)."""
    ipint = ip_to_int(F.col(f"`{ip_col}`")).alias("_ip_int")
    joined = df.withColumn("_ip_int", ipint).join(
        F.broadcast(dim),
        (F.col("_ip_int") >= F.col("ip_lo")) & (F.col("_ip_int") <= F.col("ip_hi")),
        "left",
    )
    return (
        joined.withColumn("source.geo.country_iso_code", F.col("geo_country"))
        .withColumn("source.geo.city_name", F.col("geo_city"))
        .withColumn("source.as.number", F.col("as_number"))
        .withColumn("source.as.organization.name", F.col("as_org"))
        .drop("_ip_int", "ip_lo", "ip_hi", "geo_country", "geo_city", "as_number", "as_org")
    )


def write_fixture_mmdb(path: str) -> None:
    """Build the deterministic test .mmdb (r11 VERDICT #8): the
    SYNTH_RANGES dimension encoded as a spec-conformant MaxMind DB —
    records shaped like GeoLite2-City + ASN fields so the dim loader
    exercises the same key paths a real database needs."""
    from .mmdb import build_mmdb

    build_mmdb(
        path,
        [
            (
                lo,
                hi,
                {
                    "country": {"iso_code": c},
                    "city": {"names": {"en": ci}},
                    "autonomous_system_number": asn,
                    "autonomous_system_organization": org,
                },
            )
            for lo, hi, c, ci, asn, org in SYNTH_RANGES
        ],
    )


def mmdb_geoip_dim(spark: SparkSession, path: str) -> DataFrame:
    """GeoIP dimension table FROM a .mmdb binary (A28's real-artifact
    leg): parse the search tree driver-side (the db is metadata-scale),
    emit one row per stored network with the GeoLite2 field paths
    flattened to the join schema.  Ranges arrive CIDR-granular — finer
    than SYNTH_RANGES but covering the identical IP space, so the
    broadcast range join enriches identically."""
    from .mmdb import read_mmdb_ranges

    def g(rec: dict, *path_, default=None):
        cur = rec
        for p in path_:
            if not isinstance(cur, dict) or p not in cur:
                return default
            cur = cur[p]
        return cur

    rows = [
        (
            lo,
            hi,
            g(rec, "country", "iso_code"),
            g(rec, "city", "names", "en"),
            g(rec, "autonomous_system_number"),
            g(rec, "autonomous_system_organization"),
        )
        for lo, hi, rec in read_mmdb_ranges(path)
    ]
    return spark.createDataFrame(
        rows,
        "ip_lo bigint, ip_hi bigint, geo_country string, geo_city string, as_number bigint, as_org string",
    )


# The same dim as an inline SQL VALUES clause, for the DuckDB oracle.
SQL_VALUES = (
    "(VALUES "
    + ", ".join(f"({lo}, {hi}, '{c}', '{ci}', {asn}, '{org}')" for lo, hi, c, ci, asn, org in SYNTH_RANGES)
    + ") AS geoip(ip_lo, ip_hi, geo_country, geo_city, as_number, as_org)"
)
