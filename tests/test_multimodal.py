"""Multimodal plumbing: schema, Arrow batch flow, deterministic stub."""

from geocrawl_spark.multimodal import (
    _decode_stub,
    extract_features,
    media_dedup,
    synth_media,
)


def test_feature_extraction_plumbing(spark):
    media = synth_media(spark, 64).repartition(4)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 64
    for r in rows:
        assert len(r["feature"]) == 16
        assert len(r["sha256"]) == 64
        assert r["n_bytes"] > 0
    # determinism: same media bytes -> same features
    again = {r["media_id"]: r["sha256"] for r in extract_features(media).collect()}
    assert again == {r["media_id"]: r["sha256"] for r in rows}


def test_stub_is_deterministic():
    a = _decode_stub(b"same-bytes", "image")
    b = _decode_stub(b"same-bytes", "image")
    assert a["sha256"] == b["sha256"]
    assert (a["feature"] == b["feature"]).all()


def test_media_dedup(spark):
    media = synth_media(spark, 32)
    dup = media.union(media)  # every payload twice
    d = media_dedup(extract_features(dup))
    rows = d.collect()
    assert all(r["n_copies"] == 2 for r in rows)
    assert len(rows) == 32
