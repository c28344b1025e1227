"""Multimodal column handling: opaque binary payloads with typed metadata.

Design (the standard lakehouse pattern for image/audio/video at scale):
media lives in a ``binary`` column (or object-store URI) next to typed
metadata; decode / feature-extraction run as Arrow-batched Pandas
functions over ``mapInPandas`` so bytes never round-trip through Python
row objects.  Real codec work needs PIL/av/librosa — not available in
this environment — so the decode step is STUBBED (NotImplementedError or
a clearly-marked deterministic fake) while the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata carried next to every payload
MEDIA_META = T.StructType(
    [
        T.StructField("mime_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

FEATURE_BINS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text", mime: str = "text/plain") -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata —
    the ingest shape for any media type (for images/audio, the bytes come
    from the object store instead of ``encode``)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime_type"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("media_meta"),
    )


def decode_media(payload_df: DataFrame) -> DataFrame:
    """Decode binary payloads into pixel/sample arrays.

    STUB: real decoding requires media libraries (PIL / pyav / soundfile)
    that are not installed here.  The Spark plumbing this would use is
    exactly `extract_features` below (mapInPandas over the payload
    column); only the pandas-side body differs.
    """
    raise NotImplementedError(
        "media decode requires PIL/pyav/soundfile; use extract_features for "
        "the deterministic stand-in with identical Spark plumbing"
    )


def extract_features(payload_df: DataFrame, bins: int = FEATURE_BINS) -> DataFrame:
    """Deterministic stand-in feature extractor: normalized byte histogram
    (``bins`` buckets) per payload, via Arrow-batched mapInPandas.

    This is the REAL distributed plumbing a decoder would use: payloads
    arrive as pandas batches (zero-copy via Arrow), the loop is
    per-partition not per-row, and output is a typed array column.  A
    production image pipeline swaps the histogram body for
    PIL.Image.open + resize + tensorize; the Spark side doesn't change.
    """

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for raw in pdf["payload"]:
                # byte histogram fully vectorized: frombuffer is zero-copy,
                # bincount is one C pass — never iterate payload bytes in
                # Python (this body is the template real decoders copy)
                arr = np.frombuffer(raw, dtype=np.uint8)
                counts = np.bincount(arr % bins, minlength=bins)
                total = max(1, len(arr))
                feats.append([round(c / total, 6) for c in counts.tolist()])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return payload_df.select("doc_id", "payload").mapInPandas(per_batch, FEATURE_SCHEMA)


def frame_sample(payload_df: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every Nth frame from video payloads.

    STUB: needs a container demuxer (pyav).  Production shape: mapInPandas
    yielding one row per sampled frame — (doc_id, frame_idx, frame_payload)
    — i.e. a flatMap over payloads, which mapInPandas supports natively
    (output row count is free to differ from input)."""
    raise NotImplementedError("frame sampling requires pyav; plumbing mirrors extract_features")


def resize_images(payload_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads.

    STUB: needs PIL.  Production shape: mapInPandas, payload column in /
    payload column out, metadata struct updated with the new dimensions."""
    raise NotImplementedError("image resize requires PIL; plumbing mirrors extract_features")
