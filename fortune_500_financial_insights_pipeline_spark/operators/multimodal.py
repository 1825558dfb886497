"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (SURVEY.md §2.11).

The Spark-side contract is real and tested — schema, Arrow batch shape,
partition-preserving mapInPandas — while the actual media decode is stubbed:
this container has no image/audio libraries, so ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic fake
"decoder" derives metadata/features from the bytes alone. Swapping in a real
decoder (PIL/torchaudio) changes only the inner function body; the Spark
plumbing (mapInPandas over Arrow record batches, binary in / struct out) is
exactly what production would run.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, n_bytes int, sha string"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, "
    "feature array<double>"
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload column + typed metadata from text
    (stand-in for reading real media bytes from an object store)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        blob.alias("media"),
        F.when(F.col(id_col) % 2 == 0, "image/png").otherwise("audio/wav").alias("media_type"),
        F.octet_length(blob).alias("n_bytes"),
        F.lower(F.sha2(blob, 256)).alias("sha"),
    )


def _fake_decode(media: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder: metadata + an 8-dim 'feature' derived
    from a sha256 of the payload. Replace with a real decoder in prod."""
    digest = hashlib.sha256(media).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    feature = [b / 255.0 for b in digest[2:10]]
    return width, height, feature


def decode_image(media: bytes, fake: bool = False):
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present in this "
            "container; pass fake=True for the deterministic stub"
        )
    return _fake_decode(media)


def extract_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow-batched,
    partition-preserving (no shuffle), binary in / struct+array out."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image(m, fake=fake) for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return media_df.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)
