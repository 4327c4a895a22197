"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition-preserving mapInPandas
with Arrow batches, deterministic batch shapes — is real and tested.
The actual media decoding is STUBBED (the image/audio libraries are not
in this container): ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (byte-length
statistics + seeded pseudo-features) exercises the identical plumbing.

At 100 TB the pattern is: binary payloads stay columnar in parquet,
feature extraction is a mapInPandas pass (Arrow batches, no row-at-a-
time Python), and downstream ops consume the extracted feature columns
— the payload column is pruned away unless explicitly selected.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record schema.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("source", T.StringType()),
            T.StructField("declared_bytes", T.LongType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic multimodal frame from a text table: payload
    = utf-8 bytes of the text (a stand-in for real image/audio bytes),
    kind round-robins by id. Used by tests and the corpus entry."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("source"),
            F.length(F.col(text_col)).cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str, fake: bool = False) -> dict:
    """Decode one media payload → raw sample array.

    STUB: real decoding requires PIL/ffmpeg/librosa, not present in this
    environment. ``fake=True`` substitutes a deterministic
    byte-statistics decoder with the same output contract.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    n = len(payload)
    features = [
        float(n),
        float(sum(payload[:64]) % 997),
        float(payload[0] if n else 0),
        float(payload[-1] if n else 0),
    ]
    return {"n_bytes": n, "features": features}


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Partition-preserving (no shuffle); each pandas batch is processed
    vectorized. Output is FEATURE_SCHEMA — the payload column does not
    survive, so downstream plans never carry the heavy bytes.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            decoded = [decode_media(p, k, fake=True) for p, k in zip(payloads, pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [d["n_bytes"] for d in decoded],
                    "head_hex": [bytes(p[:8]).hex() for p in payloads],
                    "checksum": [sum(bytes(p)) % 1_000_003 for p in payloads],
                    "features": [d["features"] for d in decoded],
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)
