"""Multimodal-column operators (driver-contract extension).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata structs, processed by Arrow-batched ``mapInPandas`` stages — the
Spark-side plumbing (schema, batch shape, partitioning) is real and tested;
the actual codecs are STUBBED (no image/audio libraries in this container):

- ``decode_image`` raises NotImplementedError by design when asked for a
  real decode, and provides a deterministic fake (seeded by the payload
  digest) so downstream feature/resize/frame-sample plumbing is testable.

Scale posture: payload bytes never hit the driver; each mapInPandas batch
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for
multi-MB media lower it (e.g. 64) so a batch stays within executor memory.
Feature vectors come back as ``array<float>`` ready for the B34 similarity
operators (llmops.q_cosine_topk).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: each document's text bytes stand in
    for an encoded payload; metadata derived from doc fields."""
    d = load(spark, sf_dir, "documents")
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    meta = F.struct(
        (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
        F.lit(3).cast("int").alias("channels"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.col("n_chars") % 120 + 1).cast("int").alias("n_frames"),
    )
    return d.select(
        "doc_id",
        media_type.alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        meta.alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = True) -> np.ndarray:
    """STUB: real decode needs an image library not present here.
    ``fake=True`` returns a deterministic array seeded by the payload
    digest (same payload → same pixels, any worker)."""
    if not fake:
        raise NotImplementedError(
            "real image decode requires an imaging library (not in this environment); "
            "use fake=True for deterministic test pixels"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(media: DataFrame, feature_dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction: payload → float feature vector.
    The features are a deterministic digest-fold of the payload (stub for
    a real encoder); the dataflow — Arrow batches in, ``array<float>``
    out, partition-parallel — is the production shape."""
    out_schema = f"doc_id bigint, media_type string, features array<float>"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                arr = np.frombuffer((digest * ((feature_dim * 4) // len(digest) + 1))[: feature_dim * 4], dtype=np.uint32)
                feats.append((arr.astype(np.float32) / np.float32(2**32)).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": pdf["media_type"], "features": feats}
            )

    return media.mapInPandas(_extract, schema=out_schema)


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """'Resize' planning pass: computes target dimensions JVM-side (the
    pixel work would live in the decode stub); shows metadata-only column
    math stays out of Python entirely."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("meta.width"), F.col("meta.height")),
    )
    return media.select(
        "doc_id",
        "media_type",
        "meta",
        F.round(F.col("meta.width") * scale).cast("int").alias("target_width"),
        F.round(F.col("meta.height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sample planning: one output row per sampled frame index —
    the explode-style cardinality change a video pipeline needs."""
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return media.filter(F.col("media_type") == "video/mp4").select(
        "doc_id",
        F.explode(idx).alias("frame_index"),
    )


FRAME_STRIDE = 10  # sample every Nth frame
FRAME_FPS = 24  # timestamp base for the synthetic videos


def q_frame_sample(
    spark: SparkSession,
    sf_dir: str,
    every_n: int = FRAME_STRIDE,
    fps: int = FRAME_FPS,
) -> DataFrame:
    """Per-frame video sampling — the cardinality-CHANGING mapInPandas
    shape (one media row in, one row per sampled frame out) that actual
    frame extraction needs, complementing the 1:1 feature extractor and
    the JVM-side frame-count planning (``sample_frames``).

    Each video payload is 'opened' once in Python and emits one row per
    sampled frame index: (doc_id, frame_index, ts_ms, frame_digest).  The
    decode itself is the documented stub (no video codec in this
    container): the frame digest is a deterministic fold of
    (payload md5, frame index), so the Spark-side plumbing — binary
    payloads through Arrow batches, per-row fan-out in Python, exact
    timestamps in integer milliseconds — is real and oracle-checkable
    end to end (DuckDB recomputes every column closed-form).

    Scale notes: payloads reach Python once per media row (never
    shuffled — the fan-out happens inside the worker); output carries
    ids + digests only.  For multi-MB frames the emitted payload slice
    would stream back per batch with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` lowered; timestamps
    use integer DIV so engines can't disagree on float rounding."""
    media = synth_media(spark, sf_dir).filter(F.col("media_type") == "video/mp4")
    src = media.select("doc_id", "payload", F.col("meta.n_frames").alias("n_frames"))

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            idxs: list[int] = []
            ts: list[int] = []
            digs: list[str] = []
            for did, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                base = hashlib.md5(bytes(payload)).hexdigest()
                for i in range(0, int(n_frames), every_n):
                    doc_ids.append(int(did))
                    idxs.append(i)
                    ts.append(i * 1000 // fps)
                    digs.append(hashlib.md5(f"{base}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int64"),
                    "ts_ms": pd.Series(ts, dtype="int64"),
                    "frame_digest": pd.Series(digs, dtype="object"),
                }
            )

    return src.mapInPandas(
        _sample, "doc_id bigint, frame_index bigint, ts_ms bigint, frame_digest string"
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal plumbing, oracle-checked (est_ok pattern):
    synth media → mapInPandas feature extraction → resize planning →
    frame sampling counts.  The digest-fold feature VALUES are float32
    and engine-local, but everything around them is exact — per-row
    media type, feature dimension, resize targets, and sampled-frame
    counts are recomputed by the oracle, and the feature vector itself
    is flag-checked (right dim, every component in [0,1), non-degenerate
    sum) so a broken UDF (empty vectors, NaNs, unscaled ints) fails the
    hash on FALSE."""
    media = synth_media(spark, sf_dir)
    feats = extract_features(media)
    resized = resize_meta(media)
    frames = sample_frames(media).groupBy("doc_id").agg(F.count("*").alias("n_sampled_frames"))
    fsum = F.aggregate(
        F.col("features"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    in_unit = F.size(
        F.filter("features", lambda x: (x >= 0.0) & (x < 1.0))
    ) == F.size("features")
    return (
        feats.join(resized.select("doc_id", "target_width", "target_height"), "doc_id")
        .join(frames, "doc_id", "left")
        .select(
            "doc_id",
            "media_type",
            F.size("features").cast("long").alias("feature_dim"),
            in_unit.alias("features_in_unit_ok"),
            ((fsum > 0.0) & (fsum < F.size("features"))).alias("feature_sum_sane_ok"),
            "target_width",
            "target_height",
            F.coalesce("n_sampled_frames", F.lit(0)).alias("n_sampled_frames"),
        )
    )


def q_multimodal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked: the deterministic metadata-side of the multimodal
    pipeline — media typing, resize planning, and frame-sample counts are
    pure column arithmetic, so an external engine can verify them exactly
    (the digest-fold feature vectors stay rows-only in
    q_multimodal_features)."""
    media = synth_media(spark, sf_dir)
    resized = resize_meta(media)
    frames = sample_frames(media).groupBy("doc_id").agg(
        F.count("*").alias("n_frames_sampled")
    )
    return (
        resized.join(frames, "doc_id", "left")
        .select(
            "doc_id",
            "media_type",
            "target_width",
            "target_height",
            F.coalesce("n_frames_sampled", F.lit(0)).alias("n_frames_sampled"),
        )
    )


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup: group payloads by (media_type, content digest,
    byte length) and keep-first — the first stage of any media pipeline
    (identical uploads, re-crawls, mirrored assets).  The digest is
    computed JVM-side over the binary column, so at 100 TB the shuffle
    carries (16-byte digest, type, length, ids) — never payload bytes.
    Perceptual near-dup is the downstream stage and reuses the B34
    cosine machinery over real encoder features (the digest-fold stub
    features are deliberately not used for similarity — they are random
    by construction).  Oracle: DuckDB recomputes md5/strlen over the
    same synthesized payloads."""
    media = synth_media(spark, sf_dir)
    return media.groupBy(
        "media_type",
        F.md5("payload").alias("content_digest"),
        F.length("payload").cast("long").alias("n_bytes"),
    ).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").cast("long").alias("n_copies"),
    )


QUERIES = {
    "q_multimodal_features": q_multimodal_features,
    "q_multimodal_plan": q_multimodal_plan,
    "q_media_dedup": q_media_dedup,
    "q_frame_sample": q_frame_sample,
}
ORACLE: dict[str, str] = {
    "q_multimodal_plan": """
        WITH m AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                      WHEN doc_id % 3 = 1 THEN 'audio/wav'
                      ELSE 'video/mp4' END AS media_type,
                 n_chars % 640 + 16 AS width,
                 n_chars % 480 + 16 AS height,
                 n_chars % 120 + 1  AS n_frames
          FROM documents),
        r AS (
          SELECT *, least(1.0, 256.0 / greatest(width, height)) AS scale FROM m)
        SELECT doc_id, media_type,
               CAST(round(width * scale) AS INT)  AS target_width,
               CAST(round(height * scale) AS INT) AS target_height,
               CASE WHEN media_type = 'video/mp4'
                    THEN (n_frames - 1) // 10 + 1 ELSE 0 END AS n_frames_sampled
        FROM r
    """,
    "q_media_dedup": """
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_type,
               md5(text)                  AS content_digest,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               min(doc_id)                AS keep_doc_id,
               CAST(count(*) AS BIGINT)   AS n_copies
        FROM documents
        GROUP BY 1, 2, 3
    """,
}
# q_multimodal_features: the exact parts (typing, dims, resize targets,
# frame counts) recomputed from the documents table; the engine-local
# float32 feature values are flag-checked in-engine (all-TRUE expected).
ORACLE["q_multimodal_features"] = f"""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             n_chars % 640 + 16 AS width,
             n_chars % 480 + 16 AS height,
             n_chars % 120 + 1  AS n_frames
      FROM documents),
    r AS (
      SELECT *, least(1.0, 256.0 / greatest(width, height)) AS scale FROM m)
    SELECT doc_id, media_type,
           CAST({FEATURE_DIM} AS BIGINT) AS feature_dim,
           TRUE AS features_in_unit_ok,
           TRUE AS feature_sum_sane_ok,
           CAST(round(width * scale) AS INT)  AS target_width,
           CAST(round(height * scale) AS INT) AS target_height,
           CASE WHEN media_type = 'video/mp4'
                THEN (n_frames - 1) // 10 + 1 ELSE 0 END AS n_sampled_frames
    FROM r
"""

# q_frame_sample: the stub "decode" derives every emitted column
# deterministically from (payload md5, frame index), so DuckDB recomputes
# the full per-frame row set closed-form — the plumbing is Python
# mapInPandas, the contract is exact.
ORACLE["q_frame_sample"] = f"""
    WITH v AS (
      SELECT doc_id, text, n_chars % 120 + 1 AS n_frames
      FROM documents WHERE doc_id % 3 = 2),
    f AS (
      SELECT doc_id, text, unnest(range(0, n_frames, {FRAME_STRIDE})) AS i
      FROM v)
    SELECT doc_id,
           CAST(i AS BIGINT) AS frame_index,
           CAST(i * 1000 // {FRAME_FPS} AS BIGINT) AS ts_ms,
           md5(md5(text) || ':' || CAST(i AS VARCHAR)) AS frame_digest
    FROM f
"""

ROWS_ONLY: set[str] = set()
