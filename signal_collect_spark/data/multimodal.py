"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, plus REAL built-in codecs for all three modalities —
BMP images, PCM WAV audio, and Y4M (YUV4MPEG2 Cmono) video (pure
numpy — codecs.py) — so decode → feature-extract / frame-sample runs
end to end in this container. Formats with no in-container codec
(JPEG/PNG, compressed video containers) raise NotImplementedError from
the dispatch; richer codecs are injected via ``decoder=`` (e.g. a
PIL/ffmpeg-backed callable) without touching the Spark plumbing.

Scale notes:
  * binary payloads ride in their own column — never group/sort by it;
    metadata predicates (width/height/codec) push down on the typed
    struct columns and prune parquet row groups.
  * all decode stages are Arrow-batched mapInPandas; ``spark.sql.
    execution.arrow.maxRecordsPerBatch`` bounds batch bytes when
    payloads are MBs. Per-file ingest at scale uses the binaryFile
    source with the identical UDF shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from signal_collect_spark.data.codecs import (
    decode_bmp_gray,
    decode_wav_pcm16,
    decode_y4m_mono,
    encode_bmp_gray,
    encode_wav_pcm16,
    encode_y4m_mono,
)

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
IMAGE_STATS_SCHEMA = "media_id long, width int, height int, pixel_sum long, row0_sum long"
AUDIO_STATS_SCHEMA = (
    "media_id long, n_samples int, sample_rate int, sample_sum long, max_sample int"
)
VIDEO_STATS_SCHEMA = (
    "media_id long, n_frames int, width int, height int, pixel_sum long, frame0_sum long"
)
FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, frame_sum long, frame_bmp binary"
)


def builtin_image_decoder(payload: bytes, meta) -> "object":
    """Magic-byte dispatch to the built-in codecs: BMP decodes for real;
    formats without an in-container codec raise NotImplementedError
    (inject a PIL/torchvision-backed ``decoder=`` in production)."""
    if payload[:2] == b"BM":
        return decode_bmp_gray(payload)
    magic = bytes(payload[:4])
    name = {b"\xff\xd8\xff": "JPEG", b"\x89PNG": "PNG"}.get(magic[:3], repr(magic))
    raise NotImplementedError(
        f"no {name} codec available in this environment; pass decoder= "
        "(e.g. a PIL-backed callable) for formats beyond BMP"
    )


def fake_decoder(payload: bytes, meta) -> "object":
    """Deterministic TEST stand-in codec: payload bytes → (h, w) uint8
    array from a seeded generator keyed on the payload hash. Used to
    exercise the plumbing with arbitrary payload bytes."""
    import numpy as np  # noqa: PLC0415

    h = meta["height"] or 4
    w = meta["width"] or 4
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def decode_image(payload: bytes, meta, decoder: Callable | None = None):
    """payload → (h, w) uint8 array; ``decoder=None`` uses the built-in
    magic-byte dispatch (BMP real, others NotImplementedError)."""
    return (decoder or builtin_image_decoder)(bytes(payload), meta)


def extract_features(
    media: DataFrame, decoder: Callable | None = None, pool: int = 2
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
                img = decode_image(payload, meta, decoder=decoder).astype(np.float32)
                h, w = img.shape
                hh, ww = h // pool * pool, w // pool * pool
                pooled = img[:hh, :ww].reshape(hh // pool, pool, ww // pool, pool).mean((1, 3))
                ids.append(mid)
                feats.append(pooled.ravel() / 255.0)
            yield pd.DataFrame({"media_id": ids, "feat": feats})

    return media.select("media_id", "payload", "meta").mapInPandas(
        _featurize, FEATURE_SCHEMA
    )


def image_stats(media: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Decode every image payload (built-in BMP codec by default) and
    emit per-image stats: (media_id, width, height, pixel_sum,
    row0_sum). ``row0_sum`` is the sum of the TOP pixel row — it proves
    the decoder un-flips BMP's bottom-up row order, which a whole-image
    checksum could not detect."""

    def _stats(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = decode_image(payload, meta, decoder=decoder)
                rows.append(
                    (
                        mid,
                        int(img.shape[1]),
                        int(img.shape[0]),
                        int(img.astype("int64").sum()),
                        int(img[0].astype("int64").sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixel_sum", "row0_sum"]
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        _stats, IMAGE_STATS_SCHEMA
    )


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode every audio payload (built-in PCM-WAV codec) and emit
    (media_id, n_samples, sample_rate, sample_sum, max_sample)."""

    def _stats(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav_pcm16(bytes(payload))
                rows.append(
                    (
                        mid,
                        int(len(samples)),
                        int(rate),
                        int(samples.astype("int64").sum()),
                        int(samples.max()) if len(samples) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "sample_rate", "sample_sum", "max_sample"],
            )

    return media.select("media_id", "payload").mapInPandas(_stats, AUDIO_STATS_SCHEMA)


def builtin_video_decoder(payload: bytes, meta) -> "object":
    """Magic-byte dispatch: Y4M/YUV4MPEG2 decodes for real to an
    (n_frames, h, w) uint8 array; compressed containers raise
    NotImplementedError (inject an ffmpeg-backed ``decoder=``)."""
    if payload[:9] == b"YUV4MPEG2":
        frames, _fps = decode_y4m_mono(bytes(payload))
        return frames
    raise NotImplementedError(
        "no container codec for this video payload in-container; pass "
        "decoder= (e.g. ffmpeg-backed) for formats beyond Y4M"
    )


def video_stats(media: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Decode every video payload (built-in Y4M codec by default) and
    emit (media_id, n_frames, width, height, pixel_sum, frame0_sum).
    ``frame0_sum`` is the first frame's pixel sum — it proves frame
    ORDER survives the round trip, which a whole-stream checksum could
    not detect (the Y4M analogue of image_stats' row0_sum)."""

    def _stats(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                fr = (decoder or builtin_video_decoder)(bytes(payload), meta)
                n, h, w = fr.shape
                rows.append(
                    (
                        mid,
                        int(n),
                        int(w),
                        int(h),
                        int(fr.astype("int64").sum()),
                        int(fr[0].astype("int64").sum()) if n else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_frames", "width", "height", "pixel_sum", "frame0_sum"],
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        _stats, VIDEO_STATS_SCHEMA
    )


def sample_frames_decode(
    media: DataFrame, every_n: int, decoder: Callable | None = None
) -> DataFrame:
    """Decode each video and emit every ``every_n``-th frame as a row:
    (media_id, frame_idx, width, height, frame_sum, frame_bmp). The
    sampled frame is re-encoded as an 8-bit BMP so the output column
    composes directly with the IMAGE operators (image_stats /
    extract_features) — video → frame sample → image featurize is the
    standard training-data shape. One Arrow batch in, ~n_frames/every_n
    rows out per video."""

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                fr = (decoder or builtin_video_decoder)(bytes(payload), meta)
                n, h, w = fr.shape
                for idx in range(0, n, every_n):
                    rows.append(
                        (
                            mid,
                            idx,
                            int(w),
                            int(h),
                            int(fr[idx].astype("int64").sum()),
                            encode_bmp_gray(fr[idx]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "frame_sum", "frame_bmp"],
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
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
    """(media_id, frame_idx) metadata-only plan for videos: frames
    0, n, 2n, ... — sequence() expression, no UDF, no payload read.
    Use this to PLAN (join against storage, prune, estimate cost);
    ``sample_frames_decode`` actually decodes the chosen frames."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


def make_media_fixture(spark, n: int = 16) -> DataFrame:
    """Deterministic media fixture with REAL payloads for all three
    modalities: images are actual 8-bit BMPs, audio rows actual PCM-16
    WAVs, video rows actual Y4M (Cmono) streams — all built by
    codecs.py."""
    import numpy as np  # noqa: PLC0415

    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            h, w = 8 + i % 4, 8 + (i * 3) % 4
            px = ((np.arange(h * w).reshape(h, w) * (i + 7)) % 256).astype(np.uint8)
            rows.append((i, kind, bytearray(encode_bmp_gray(px)), (w, h, None, "bmp8")))
        elif kind == "audio":
            ns = 64 + i
            samples = ((np.arange(ns, dtype=np.int64) * (31 + i)) % 4096 - 2048).astype(
                np.int16
            )
            rows.append(
                (i, kind, bytearray(encode_wav_pcm16(samples, 8000)), (None, None, None, "pcm16"))
            )
        else:
            nf, h, w = 10 + i, 6, 8
            fr = ((np.arange(nf * h * w).reshape(nf, h, w) * (i + 3)) % 256).astype(
                np.uint8
            )
            rows.append(
                (i, kind, bytearray(encode_y4m_mono(fr)), (w, h, nf, "y4m-mono"))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
