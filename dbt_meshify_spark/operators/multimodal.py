"""Multimodal column plumbing (N5): opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernels are stubbed
behind ``NotImplementedError`` or a deterministic fake — but the Spark-side
plumbing is real: schemas, Arrow-batched ``mapInPandas`` signatures, batch
shaping, and partition sizing are exactly what a production pipeline uses.

Scale notes:
- Payloads travel as parquet ``binary`` columns; never collect them. Feature
  extraction is ``mapInPandas`` (Arrow batches), sized by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of blobs fits
  executor memory.
- Metadata (width/height/duration/codec) lives in a struct column so filters
  on it push down without touching payload bytes (parquet column pruning
  skips the blob pages entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_digest", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text, metadata
    derived from its length. Stands in for real blobs in tests; the plumbing
    downstream is payload-agnostic."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("fake").alias("format"),
            (F.length(text_col) % 1024).cast("int").alias("width"),
            (F.length(text_col) % 768).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder entry point — unavailable in this container.

    Production: swap in PIL/libvips here; the mapInPandas harness around it
    (``extract_features``) is unchanged.
    """
    raise NotImplementedError("image codecs not present in this environment")


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pass over binary payloads (Arrow-batched; stub kernel).

    The STUB kernel deterministically re-buckets payload bytes to a
    width*height buffer (real implementation: PIL/libvips resample replaces
    ``_resize_bytes`` only). Everything around it — batch iteration, schema
    preservation, metadata rewrite without touching unrelated columns — is
    the production shape.
    """
    target = width * height

    def _resize_bytes(b: bytes | None) -> bytes:
        if not b:
            return b""
        # deterministic fake: cycle the source bytes into the target size
        reps = (target // len(b)) + 1
        return (b * reps)[:target]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(_resize_bytes)
            out["meta"] = out["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield out

    from dbt_meshify_spark.operators.util import spread

    return spread(media).mapInPandas(_resize, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 64, stride: int = 2) -> DataFrame:
    """One-to-many frame sampling over video payloads (stub kernel).

    Emits every ``stride``-th fixed-size chunk of the payload as a 'frame' —
    the deterministic stand-in for a real keyframe decoder. The one-row-in /
    many-rows-out mapInPandas shape (batch explosion without driver
    involvement) is exactly what a production frame sampler uses; swap the
    chunker for an ffmpeg/PyAV call and nothing else changes.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload or b""
                n_chunks = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_chunks, stride):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    from dbt_meshify_spark.operators.util import spread

    return spread(media).mapInPandas(_sample, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The stub 'feature' is a deterministic byte-histogram projection — a real
    model embedding drops in by replacing ``_featurize`` only; batch shape,
    schema, and partitioning stay identical.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b))
            digest = payloads.map(
                lambda b: hashlib.md5(b or b"").hexdigest()
            )
            feats = []
            for b in payloads:
                arr = np.frombuffer(b or b"", dtype=np.uint8)
                hist = np.zeros(feature_dim, dtype=np.float32)
                if arr.size:
                    idx = arr % feature_dim
                    np.add.at(hist, idx, 1.0)
                    hist /= arr.size
                feats.append(hist.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes,
                    "payload_digest": digest,
                    "feature": feats,
                }
            )

    from dbt_meshify_spark.operators.util import spread

    # Small local scans arrive as one split; spread so Arrow batches hit all
    # Python workers. No-op on a cluster where splits >= defaultParallelism.
    return spread(media).mapInPandas(_featurize, schema=FEATURE_SCHEMA)
