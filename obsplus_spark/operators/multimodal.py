"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface (BASELINE.json): at 100 TB, media live as ``binary``
columns (or object-store paths) beside typed metadata structs; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
cross the driver and each task holds one batch.

The actual codec step is STUBBED — image/audio libraries are not in this
container (round-1 environment constraint). The Spark-side plumbing —
schema, batching, UDF signatures, partitioning — is real and tested:
``decode_stub=True`` swaps the codec for a deterministic byte-level fake
with the same output schema, so plans, shuffles, and downstream joins are
exercised end-to-end. Drop-in: replace ``_fake_image_features`` with a
PIL/librosa call on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),      # png/jpeg/wav/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, sha long, features array<float>"
)


def _decode_real(payload: bytes, meta) -> list[float]:
    """The real codec hook. Not available in this container."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in the "
        "round-1 environment; use decode_stub=True (deterministic fake) "
        "or plug a codec in here on a full cluster"
    )


def _fake_image_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in: md5-chained bytes → [0,1) floats.

    Keeps every downstream property real (fixed dim, deterministic,
    content-sensitive) without any media library.
    """
    out: list[float] = []
    seed = payload or b""
    h = hashlib.md5(seed).digest()
    while len(out) < dim:
        for i in range(0, len(h), 4):
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
            if len(out) == dim:
                break
        h = hashlib.md5(h).digest()
    return out


def extract_features(
    media: DataFrame,
    dim: int = 16,
    batch_size_hint: int = 256,
    decode_stub: bool = True,
) -> DataFrame:
    """Binary payloads → fixed-dim feature vectors via ``mapInPandas``.

    Arrow streams each partition as pandas batches; one output row per
    media row: ``(media_id, n_bytes, sha, features array<float>)``. The
    ``features`` column feeds directly into
    :mod:`obsplus_spark.operators.similarity` (ANN) — the intended
    pipeline shape for image-dedup at scale.
    """
    import pandas as pd

    from obsplus_spark.util import ensure_parallelism

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = [
                _fake_image_features(p, dim)
                if decode_stub
                else _decode_real(p, None)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha": payloads.map(
                        lambda b: int.from_bytes(
                            hashlib.sha256(b or b"").digest()[:8], "big", signed=True
                        )
                    ),
                    "features": feats,
                }
            )

    return ensure_parallelism(media).mapInPandas(_batches, FEATURE_SCHEMA)


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact media dedup on the payload hash — one groupBy, JVM-side sha2."""
    return (
        media.select(
            F.sha2(F.col("payload"), 256).alias("payload_sha"),
            F.col("media_id"),
        )
        .groupBy("payload_sha")
        .agg(F.min("media_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling *plan*: explode sample timestamps per video.

    The decode of each frame is the stubbed codec; the plan — one row per
    (media_id, frame_ts_ms), distributed by media — is the real scale
    artifact (a 100 TB video corpus explodes to frames here, then
    ``extract_features`` runs per frame batch).
    """
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
