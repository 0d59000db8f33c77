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


# The same dim as an inline SQL VALUES clause, for the DuckDB oracle.
SQL_VALUES = (
    "(VALUES "
    + ", ".join(f"({lo}, {hi}, '{c}', '{ci}', {asn}, '{org}')" for lo, hi, c, ci, asn, org in SYNTH_RANGES)
    + ") AS geoip(ip_lo, ip_hi, geo_country, geo_city, as_number, as_org)"
)
