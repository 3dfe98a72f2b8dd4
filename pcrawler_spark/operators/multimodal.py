"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct, exactly like ``pages.html`` does for HTML.  The Spark-side
plumbing (schema, batch iteration, partition sizing) is real and tested;
the actual codec work is STUBBED — the decode libraries (PIL/ffmpeg/etc.)
are not in this container — behind a deterministic fake that preserves
shapes, clearly marked below.

Pattern: ``mapInPandas`` so each Arrow batch is decoded once per partition
(bounded memory: tune spark.sql.execution.arrow.maxRecordsPerBatch down for
large blobs; at 100 TB the table is partitioned by content-size bucket so a
batch of 4K thumbnails and a batch of videos get different parallelism).
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat array<float>, decode_ok boolean"
)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """STUB: deterministic stand-in for a real decoder+featurizer.
    Derives `dim` floats from a blake2b of the payload so tests are exact.
    Replace with PIL/torchvision/ffmpeg feature extraction in production."""
    d = blake2b(payload or b"", digest_size=dim * 2).digest()
    return [int.from_bytes(d[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(dim)]


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media(binary payload) → per-item feature vector via mapInPandas."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_fake_decode_features(payload, dim))
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract (the decode itself is the stub
    above).  Pure JVM-side sequence/explode — demonstrates the row-expansion
    shape without Python."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ),
        )
        .select("media_id", "frame_ms")
    )
