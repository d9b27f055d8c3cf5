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
