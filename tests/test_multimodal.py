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


def test_fit_box_integer_math():
    from geocrawl_spark.multimodal import _fit_box

    assert _fit_box(100, 50, 256) == (100, 50)  # already fits: unchanged
    assert _fit_box(512, 256, 256) == (256, 128)
    assert _fit_box(1000, 10, 256) == (256, 2)  # floor, aspect preserved
    assert _fit_box(100000, 3, 256) == (256, 1)  # never below 1
    assert _fit_box(256, 256, 256) == (256, 256)  # boundary: no-op


def test_resize_media_plumbing(spark):
    import hashlib

    from geocrawl_spark.multimodal import (
        _RESIZE_PAYLOAD_CAP,
        _fit_box,
        resize_media,
        synth_media,
    )

    media = synth_media(spark, 48).repartition(5)  # multi-batch Arrow flow
    src = {r["media_id"]: r for r in media.collect()}
    out = {r["media_id"]: r for r in resize_media(media, max_px=256).collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        s = src[mid]
        assert (r["src_width"], r["src_height"]) == (s["width"], s["height"])
        assert (r["width"], r["height"]) == _fit_box(
            s["width"], s["height"], 256
        )
        assert max(r["width"], r["height"]) <= 256
        n = min(r["width"] * r["height"] * 3, _RESIZE_PAYLOAD_CAP)
        assert len(r["media"]) == n
        # stub payload is the sha256 keystream of the SOURCE bytes
        key = hashlib.sha256(bytes(s["media"])).digest()
        assert bytes(r["media"]) == (key * (n // 32 + 1))[:n]


def test_sample_frames_fanout_and_determinism(spark):
    import hashlib

    from geocrawl_spark.multimodal import sample_frames, synth_media

    media = synth_media(spark, 60).repartition(4)
    src = {r["media_id"]: r for r in media.collect()}
    frames = sample_frames(media, every_ms=500).collect()
    # only video rows fan out; each yields duration//500 + 1 frames
    expect = {
        mid: s["duration_ms"] // 500 + 1
        for mid, s in src.items()
        if s["kind"] == "video"
    }
    got: dict[int, int] = {}
    for f in frames:
        got[f["media_id"]] = got.get(f["media_id"], 0) + 1
        assert f["ts_ms"] == f["frame_idx"] * 500
        hx = hashlib.sha256(bytes(src[f["media_id"]]["media"])).hexdigest()
        d = hashlib.sha256(f"{hx}:{f['frame_idx']}".encode())
        assert f["frame_sha"] == d.hexdigest()
        assert bytes(f["frame"]) == d.digest()
    assert got == expect
    assert any(v > 1 for v in expect.values())  # real fan-out exercised
