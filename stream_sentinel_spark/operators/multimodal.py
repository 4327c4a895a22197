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


def _pil():
    """Import probe for Pillow — the one real codec this module can use.
    Returns the Image module or None; callers turn None into the
    actionable NotImplementedError (same gating style as the Kafka
    connector and protobuf probes)."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_media(payload: bytes, kind: str, fake: bool = False) -> dict:
    """Decode one media payload → feature contract
    ``{"n_bytes": int, "features": list[float]}``.

    The real path decodes ``kind == "image"`` via Pillow WHEN it is
    importable (features: width, height, channel count, mean pixel
    value); audio/video decoding requires ffmpeg/librosa and stays a
    declared stub. Without Pillow (this container) the real path raises
    the actionable NotImplementedError; ``fake=True`` always substitutes
    the deterministic byte-statistics decoder with the same output
    contract, which is what the oracle-checked corpus entry (x10)
    exercises."""
    if not fake:
        Image = _pil()
        if kind == "image" and Image is not None:
            import io

            import numpy as np

            img = Image.open(io.BytesIO(payload))
            arr = np.asarray(img.convert("RGB"), dtype=np.float64)
            return {
                "n_bytes": len(payload),
                "features": [
                    float(img.width),
                    float(img.height),
                    float(arr.shape[2]),
                    float(arr.mean()) if arr.size else 0.0,
                ],
            }
        raise NotImplementedError(
            "real media decoding needs Pillow for images (pip install "
            "pillow) and ffmpeg/librosa for audio/video — not present in "
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("resized_bytes", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image resize (PIL absent): the
    output length is exactly width*height bytes, derived from the input
    by tiling — same contract shape (bytes in → bytes out, size set by
    target dims), reproducible across runs and partitionings."""
    target = width * height
    if not payload:
        return bytes(target)
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """mapInPandas image resize: image rows resized to (width, height),
    non-image rows passed through untouched with NULL dims.

    Real resize via Pillow when importable (decode → RGB resize →
    re-encode PNG); without it (this container) the real path raises an
    actionable NotImplementedError at plan BUILD time — not mid-query in
    an executor — and ``fake=True`` runs the deterministic stub. Either
    way the Spark plumbing is identical and real: partition-preserving,
    no shuffle, Arrow-batched, payload replaced in place so downstream
    size is bounded by the target dims, not the source."""
    if not fake and _pil() is None:
        raise NotImplementedError(
            "real image resize needs Pillow (pip install pillow) — not "
            "present in this environment; pass fake=True for the "
            "deterministic stub"
        )

    def _real_resize(payload: bytes) -> bytes:
        import io

        Image = _pil()
        img = Image.open(io.BytesIO(payload)).convert("RGB")
        out = io.BytesIO()
        img.resize((width, height)).save(out, format="PNG")
        return out.getvalue()

    one_resize = _fake_resize if fake else (
        lambda p, w=width, h=height: _real_resize(p)
    )

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            out_payload = [
                one_resize(p, width, height) if img else p
                for p, img in zip(pdf["payload"], is_img)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [width if i else None for i in is_img],
                    "height": [height if i else None for i in is_img],
                    "payload": out_payload,
                    "resized_bytes": [len(p) for p in out_payload],
                }
            )

    return media.mapInPandas(do_resize, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """mapInPandas video frame sampling: each video row EXPANDS to up to
    ``max_frames`` frame rows (one per ``every_ms`` of fake duration) —
    the flatMap shape real frame extraction has. Non-video rows produce
    no output.

    STUB decode (real path needs ffmpeg); the fake derives a
    deterministic duration from the payload length and slices the
    payload per frame, so row counts and sizes are stable for tests.
    Output rows stay in their input partition (no shuffle); downstream
    repartition only if frame fan-out skews partition sizes."""
    if not fake:
        raise NotImplementedError(
            "frame sampling requires a video library not present in this "
            "environment; pass fake=True for the deterministic stub"
        )

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "payload": []}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or not len(payload):
                    continue
                duration_ms = len(payload) * 10  # fake: 10 ms per byte
                n = min(max_frames, max(1, duration_ms // every_ms))
                step = max(1, len(payload) // n)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["payload"].append(bytes(payload[i * step : i * step + step]))
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(do_sample, FRAME_SCHEMA)
