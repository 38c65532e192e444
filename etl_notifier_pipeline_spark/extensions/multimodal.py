"""Multimodal column conventions + processing plumbing (SURVEY §2.10 X4).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct — the lakehouse-standard layout
(``spark.read.format("binaryFile")`` produces the same shape). All
Spark-side plumbing here is real and tested: schema, Arrow-batched
``mapInPandas`` operators, partition sizing. The codec is resolved at
runtime: when Pillow is importable, the image modality decodes for
real (grayscale 4x4 mean-pool features); other modalities (or no
codec library at all) raise ``NotImplementedError`` unless
``deterministic_fake=True``, where a seeded, content-derived fake
feature vector stands in so the distributed pipeline is testable
end-to-end in codec-free containers like this one.

Scale: media blobs dominate partition size — ``target_partition_mb``
repartitions by byte budget, not row count, so a 100 TB media table
doesn't produce 4 GB tasks.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _pil_module():
    """PIL.Image if Pillow is importable, else None — resolved lazily
    and cached so the probe runs once per executor process."""
    global _PIL
    if _PIL is _UNRESOLVED:
        try:
            from PIL import Image  # noqa: PLC0415

            _PIL = Image
        except ImportError:
            _PIL = None
    return _PIL


_UNRESOLVED = object()
_PIL = _UNRESOLVED


def _decode_impl(blob: bytes, modality: str, deterministic_fake: bool) -> list[float]:
    if deterministic_fake:
        digest = hashlib.sha256(blob or b"").digest()
        return [digest[i] / 255.0 for i in range(FEATURE_DIM)]
    pil = _pil_module()
    if modality == "image" and pil is not None:
        # Real decode path, auto-enabled when Pillow is present:
        # decode -> grayscale -> 4x4 mean-pool = FEATURE_DIM features
        # in [0, 1]. Deterministic (no resampling randomness: LANCZOS
        # is a fixed convolution).
        import io  # noqa: PLC0415

        side = int(FEATURE_DIM ** 0.5)
        img = pil.open(io.BytesIO(blob)).convert("L").resize(
            (side, side), pil.Resampling.LANCZOS
        )
        return [px / 255.0 for px in img.getdata()]
    # Remaining codecs (torchaudio / pyav) are not in this container —
    # see module docstring.
    raise NotImplementedError(
        f"decoding {modality!r} requires a codec library"
        + ("" if pil is None else " beyond Pillow")
    )


def extract_features(
    media: DataFrame, *, deterministic_fake: bool = False
) -> DataFrame:
    """binary content -> fixed-dim feature vector via Arrow-batched
    ``mapInPandas`` (never row-at-a-time Python). Output keeps the id
    and modality plus the vector — the shape the similarity operators
    consume."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": [
                        _decode_impl(c, m, deterministic_fake)
                        for c, m in zip(pdf["content"], pdf["modality"])
                    ],
                }
            )

    return media.mapInPandas(batches, out_schema)


def size_partitions(media: DataFrame, target_partition_mb: int = 256) -> DataFrame:
    """Repartition a media table by byte budget: estimates bytes from
    the binary column lengths and repartitions so each task holds
    ~``target_partition_mb``. Requires one lightweight agg over lengths
    (column-pruned scan)."""
    row = media.select(
        F.sum(F.coalesce(F.length("content"), F.lit(0))).alias("total")
    ).collect()[0]
    total_mb = (row["total"] or 0) / (1024 * 1024)
    n = max(1, int(total_mb / target_partition_mb) + 1)
    return media.repartition(n)


def frame_schedule(
    media: DataFrame, every_ms: int = 1000, *, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The metadata-only half of frame sampling: one row per sampled
    frame offset, generated from ``meta.duration_ms`` as a JVM
    ``sequence`` + ``explode`` — no binary column touched (unless
    explicitly carried via ``carry_cols``), so the schedule is
    plannable (and oracle-checkable) independently of the decoder."""
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
        *carry_cols,
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, *, deterministic_fake: bool = False
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset
    (``frame_schedule``, carrying the bytes alongside), decoder invoked
    per sampled frame only, never per video."""
    frames = frame_schedule(media, every_ms, carry_cols=("content",))
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ms": pdf["frame_ms"],
                    "features": [
                        _decode_impl(
                            (c or b"") + str(ms).encode(), "video", deterministic_fake
                        )
                        for c, ms in zip(pdf["content"], pdf["frame_ms"])
                    ],
                }
            )

    return frames.mapInPandas(batches, out_schema)
