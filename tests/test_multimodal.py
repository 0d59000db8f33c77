"""Multimodal plumbing tests (B42): the per-frame sampler's fan-out
cardinality, timestamp arithmetic, and stub-digest determinism."""

from pyspark.sql import functions as F

from kinesis2elastic_spark.operators import multimodal as mm


def test_frame_sample_cardinality_and_timestamps(spark, sf_dir):
    frames = mm.q_frame_sample(spark, sf_dir)
    per_doc = {
        r.doc_id: r.n
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    meta = {
        r.doc_id: r.n_frames
        for r in mm.synth_media(spark, sf_dir)
        .filter(F.col("media_type") == "video/mp4")
        .select("doc_id", F.col("meta.n_frames").alias("n_frames"))
        .collect()
    }
    assert set(per_doc) == set(meta)
    for did, n_frames in meta.items():
        assert per_doc[did] == (n_frames - 1) // mm.FRAME_STRIDE + 1

    sample = frames.filter(F.col("frame_index") > 0).limit(5).collect()
    assert sample, "expected multi-frame videos in the fixture"
    for r in sample:
        assert r.ts_ms == r.frame_index * 1000 // mm.FRAME_FPS


def test_frame_sample_digests_deterministic_and_unique(spark, sf_dir):
    a = {(r.doc_id, r.frame_index): r.frame_digest
         for r in mm.q_frame_sample(spark, sf_dir).collect()}
    b = {(r.doc_id, r.frame_index): r.frame_digest
         for r in mm.q_frame_sample(spark, sf_dir).collect()}
    assert a == b  # same payloads -> same digests on any worker/run
    # distinct frames of the SAME video get distinct digests (identical
    # payloads across videos legitimately share digests per frame)
    by_doc: dict[int, set[str]] = {}
    for (did, _), dig in a.items():
        by_doc.setdefault(did, set()).add(dig)
    per_doc_counts = {did: len([k for k in a if k[0] == did]) for did in by_doc}
    for did, digs in by_doc.items():
        assert len(digs) == per_doc_counts[did]
