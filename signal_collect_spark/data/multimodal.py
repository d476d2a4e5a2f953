"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, partition-size control, Arrow batch
shape, vectorized UDF signatures) is REAL and tested; the codec step is
STUBBED — this container has no image/audio libraries, so decode is a
deterministic fake behind ``decoder=`` (production swaps in
PIL/torchaudio/av without touching the plumbing) and
``decode_image(..., decoder=None)`` raises NotImplementedError.

Scale notes:
  * binary payloads ride in their own column — never group/sort by it;
    metadata predicates (width/height/codec) push down on the typed
    struct columns and prune parquet row groups.
  * ``maxRecordsPerBatch`` bounds Arrow batch bytes when payloads are
    MBs; per-file streaming would use binaryFile source + mapInPandas,
    identical UDF shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, feat array<float>"


def fake_decoder(payload: bytes, meta) -> "object":
    """Deterministic stand-in codec: payload bytes → (h, w) uint8 array
    derived from a seeded generator keyed on the payload hash. Replaces
    PIL.Image.open in this container."""
    import numpy as np  # noqa: PLC0415

    h = meta["height"] or 4
    w = meta["width"] or 4
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def decode_image(payload: bytes, meta, decoder: Callable | None = fake_decoder):
    if decoder is None:
        raise NotImplementedError(
            "no image codec available in this environment; pass decoder="
            "PIL-backed callable in production"
        )
    return decoder(payload, meta)


def extract_features(
    media: DataFrame, decoder: Callable | None = fake_decoder, pool: int = 2
) -> DataFrame:
    """Vectorized feature extraction: decode each payload, {pool×pool}
    average-pool, emit a flat float feature vector. One Arrow batch in,
    one out — the exact shape a real CNN-preprocessing stage uses."""

    def _featurize(batches: Iterator) -> Iterator:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            ids, feats = [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = decode_image(bytes(payload), meta, decoder=decoder).astype(np.float32)
                h, w = img.shape
                hh, ww = h // pool * pool, w // pool * pool
                pooled = img[:hh, :ww].reshape(hh // pool, pool, ww // pool, pool).mean((1, 3))
                ids.append(mid)
                feats.append(pooled.ravel() / 255.0)
            yield pd.DataFrame({"media_id": ids, "feat": feats})

    return media.select("media_id", "payload", "meta").mapInPandas(
        _featurize, FEATURE_SCHEMA
    )


def resize_meta(media: DataFrame, max_side: int) -> DataFrame:
    """Pure-metadata resize plan: target dims preserving aspect ratio —
    expression-only (the decode+resample happens in extract_features-
    shaped UDFs); shows predicate-pushdown-friendly typed metadata."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.withColumn(
        "target",
        F.struct(
            F.floor(w * scale).cast("int").alias("width"),
            F.floor(h * scale).cast("int").alias("height"),
        ),
    )


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """(media_id, frame_idx) plan for videos: frames 0, n, 2n, ... —
    sequence() expression, no UDF; the decode of chosen frames is the
    extract_features stage."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


def make_media_fixture(spark, n: int = 16) -> DataFrame:
    """Deterministic binary fixture (no external data)."""
    import hashlib

    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (i, kind, bytearray(payload), (8 + i % 4, 8 + (i * 3) % 4, 10 + i, "fake"))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
