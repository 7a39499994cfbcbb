"""Multimodal column plumbing [EXT].

Images / audio / video are carried as opaque ``binary`` columns plus a
typed metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` so each Python
worker sees a columnar batch, never a Python row loop.

The decode step itself is STUBBED: the real image/audio libraries are not
in this container. ``decode_image_batch`` raises NotImplementedError
unless ``fake=True``, in which case a clearly-marked deterministic fake
parses the bytes header we wrote at encode time. Everything around it —
schema handling, batching, partition sizing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Metadata struct carried alongside every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature_norm", T.DoubleType(), True),
    ]
)


def encode_as_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as a binary payload + metadata struct — stands in
    for reading real media with ``spark.read.format("binaryFile")``."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.xxhash64(payload).alias("checksum"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC FAKE decoder (the real decoder needs image libs not in
    this container): derives a plausible (width, height, feature_norm)
    from the byte length alone."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + (n % 48)
    return width, height, round((n % 1000) / 1000.0, 6)


def decode_image_batch(
    media: DataFrame, fake: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Decode/feature-extract binary payloads via Arrow-batched
    ``mapInPandas``. Set ``fake=False`` once a real decoder (PIL/ffmpeg)
    is available on the executors.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires image/audio libraries on executors; "
            "run with fake=True for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["media_meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature_norm": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized_bytes", T.LongType(), False),
    ]
)


def resize_batch(
    media: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Resize plumbing: mapInPandas batch transform to a fixed target
    geometry (model-input shape). The pixel work is STUBBED (no image
    libs in this container) — the fake emits the post-resize byte size a
    real RGB resize would produce (w*h*3), so downstream sizing logic
    (partition planning, batch memory budgets) is exercised for real."""
    if not fake:
        raise NotImplementedError("real resize requires image libraries")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [target_w] * n,
                    "height": [target_h] * n,
                    "resized_bytes": [target_w * target_h * 3] * n,
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, fps_keep: int = 1, clip_secs: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per kept
    frame. Frame *indices* are pure JVM (sequence + posexplode — no
    Python); per-frame decode would chain ``decode_image_batch`` after.
    Fake frame count is derived from payload size (1 'frame' per 64
    bytes, capped at clip_secs * fps_keep)."""
    n_frames = F.least(
        (F.col("media_meta.n_bytes") / 64).cast("int") + 1,
        F.lit(clip_secs * fps_keep),
    )
    return media.select(
        "doc_id",
        "media_meta",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_i"),
    ).select("doc_id", "media_meta", "frame_no")


EMBED_DIM = 16


def extract_embedding_batch(media: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extraction plumbing: binary payload → ``array<float>``
    embedding via mapInPandas (the shape a real vision encoder would
    have: Arrow batch in, fixed-dim vector column out, feeding the
    similarity operators). The DETERMINISTIC FAKE hashes byte windows
    into a 16-dim unit-normalized vector."""
    if not fake:
        raise NotImplementedError("real feature extraction requires a model runtime")

    import numpy as np

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
                chunks = np.array_split(b, EMBED_DIM) if len(b) else []
                v = np.array(
                    [c.sum() % 997 for c in chunks] + [0.0] * (EMBED_DIM - len(chunks)),
                    dtype=np.float64,
                )[:EMBED_DIM]
                norm = np.linalg.norm(v)
                vecs.append([float(x) for x in (v / norm if norm else v)])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "embedding": vecs}
            )

    return media.mapInPandas(embed, schema="doc_id long, embedding array<float>")
