"""Multimodal (image/audio/video) column support.

Design: media are opaque ``binary`` columns + typed metadata structs; all
transforms run as Arrow-batched ``mapInPandas`` over (id, media, meta)
batches so media bytes never round-trip through Python row objects.

The actual codecs (image decode, resample, frame sampling) are STUBBED —
this container ships no PIL/ffmpeg — behind ``_decode_stub``, which is a
deterministic fake keyed on the media bytes.  The Spark-side plumbing
(schemas, batch shapes, partition sizing, UDF signatures) is real and
tested (tests/test_multimodal.py); swapping the stub for a real codec is
a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feature array<float>, thumb_width int, thumb_height int"
)

_FEATURE_DIM = 16


def _decode_stub(media: bytes, kind: str) -> dict:
    """DETERMINISTIC FAKE decode — stands in for PIL/librosa/ffmpeg.

    A real deployment replaces this with the actual codec; everything
    else (batching, schema, partitioning) is production-shaped.
    """
    digest = hashlib.sha256(media).digest()
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    feat = np.resize(rng / 255.0, _FEATURE_DIM)
    return {
        "sha256": hashlib.sha256(media).hexdigest(),
        "feature": feat,
        "thumb_width": 32 + digest[0] % 4 * 16,
        "thumb_height": 32 + digest[1] % 4 * 16,
    }


def extract_features(df: DataFrame) -> DataFrame:
    """media rows -> feature rows via mapInPandas (Arrow batches).

    Batches stream through the iterator (never materializing the whole
    partition), which is what keeps memory bounded when media cells are
    megabytes each; pair with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` sized to the media.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_stub(m, k) for m, k in zip(pdf["media"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "sha256": [d["sha256"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                    "thumb_width": [d["thumb_width"] for d in decoded],
                    "thumb_height": [d["thumb_height"] for d in decoded],
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media|{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (i, kinds[i % 3], payload, 640 + i % 3 * 160, 480, 1000 * (i % 30))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (same shape as dedup_exact)."""
    return features.groupBy("sha256").agg(
        F.min("media_id").alias("keeper"),
        F.count("*").alias("n_copies"),
        F.first("kind").alias("kind"),
    )


# ---------------------------------------------------------------------------
# resize + frame-sample (stub pixel ops, REAL Arrow batch plumbing)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = (
    "media_id long, kind string, media binary, width int, height int, "
    "src_width int, src_height int"
)

#: stub resample payload cap — a real codec writes out_w*out_h*channels;
#: the deterministic fake truncates so test media stay small
_RESIZE_PAYLOAD_CAP = 4096


def _fit_box(w: int, h: int, max_px: int) -> tuple[int, int]:
    """Integer fit-within-box dims (aspect preserved, floor division,
    never below 1).  Pure integer math so the DuckDB oracle twin computes
    the identical dims."""
    m = max(w, h)
    if m <= max_px:
        return w, h
    return max(1, w * max_px // m), max(1, h * max_px // m)


def resize_media(df: DataFrame, max_px: int = 256) -> DataFrame:
    """Downscale media to fit ``max_px`` on the long edge.

    The pixel resample is the documented deterministic stub (payload =
    sha256 keystream of the source bytes, truncated to
    ``min(out_w*out_h*3, _RESIZE_PAYLOAD_CAP)``); the dataflow is the
    production shape — Arrow-batched ``mapInPandas`` streaming batches
    through the iterator, binary in / binary out, dims computed in exact
    integer math (:func:`_fit_box`).  Input needs (media_id, kind, media,
    width, height)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_w, out_h, blobs = [], [], []
            for m, w, h in zip(pdf["media"], pdf["width"], pdf["height"]):
                ow, oh = _fit_box(int(w), int(h), max_px)
                out_w.append(ow)
                out_h.append(oh)
                n = min(ow * oh * 3, _RESIZE_PAYLOAD_CAP)
                key = hashlib.sha256(m).digest()
                blobs.append((key * (n // len(key) + 1))[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "media": blobs,
                    "width": np.array(out_w, dtype=np.int32),
                    "height": np.array(out_h, dtype=np.int32),
                    "src_width": pdf["width"].astype("int32"),
                    "src_height": pdf["height"].astype("int32"),
                }
            )

    return df.mapInPandas(fn, RESIZED_SCHEMA)


FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms int, frame binary, frame_sha string"
)


def sample_frames(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Sample video frames every ``every_ms`` — one OUTPUT ROW PER FRAME
    (``mapInPandas`` with fan-out: output cardinality != input, the
    explode-shaped batch contract).  Frames at ts = 0, every_ms, ... <=
    duration_ms, so a clip yields ``duration_ms // every_ms + 1`` frames.

    The frame decode is the deterministic stub: frame bytes/sha derive
    from ``sha256(media_sha_hex + ':' + frame_idx)`` — portable enough
    that a DuckDB oracle reproduces ``frame_sha`` exactly, which is what
    makes the fan-out plumbing oracle-gateable.  Non-video rows emit
    nothing (documented).  Input needs (media_id, kind, media,
    duration_ms)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, blobs, shas = [], [], [], [], []
            for mid, kind, m, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["media"], pdf["duration_ms"]
            ):
                if kind != "video" or dur is None or dur < 0:
                    continue
                hx = hashlib.sha256(m).hexdigest()
                for i in range(int(dur) // every_ms + 1):
                    key = f"{hx}:{i}".encode()
                    d = hashlib.sha256(key)
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    blobs.append(d.digest())
                    shas.append(d.hexdigest())
            if ids:
                yield pd.DataFrame(
                    {
                        "media_id": np.array(ids, dtype=np.int64),
                        "frame_idx": np.array(idxs, dtype=np.int32),
                        "ts_ms": np.array(tss, dtype=np.int32),
                        "frame": blobs,
                        "frame_sha": shas,
                    }
                )

    return df.mapInPandas(fn, FRAME_SCHEMA)
