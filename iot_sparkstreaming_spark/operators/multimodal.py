"""Multimodal column support: opaque binary payloads + typed metadata,
with Arrow-batched Pandas feature extraction.

North-star operator family (BASELINE.json). Design per the brief:
image/audio/video are **opaque ``binary`` columns** with a typed
``meta`` struct; decode / feature-extract / resize / frame-sample run
as ``mapInPandas`` over Arrow batches — the only Python-boundary
operators in the engine, placed where built-ins genuinely cannot go
(real codecs). The container has no image/audio libraries, so the
codec step is STUBBED: ``decode_asset`` raises ``NotImplementedError``
unless the optional dependency imports, while every piece of Spark
plumbing around it — schema, Arrow batch shape, partitioning,
UDF signature — is real and tested.

Scale posture: payload bytes never shuffle for metadata-only queries
(column pruning drops ``payload`` at the parquet scan); feature
extraction is a map-only pass whose parallelism is the scan's
partitioning; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import col

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MODALITIES = ("image", "audio", "video")

#: schema of the feature-extraction output (stable contract)
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic multimodal asset table derived from ``documents``:
    payload = UTF-8 bytes of the text, modality round-robins by id,
    metadata struct synthesized from n_chars. This is the fixture
    generator for the multimodal path (the harness ships no binary
    table)."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-"), modality).alias("mime"),
            (col("n_chars") % 640).cast("int").alias("width"),
            (col("n_chars") % 480).cast("int").alias("height"),
            (col("n_chars") * 10).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.

    ``mapInPandas`` receives an iterator of pandas batches (never the
    whole partition), computes per-asset byte statistics and a
    content hash, and never returns the payload — so the expensive
    column is read once and dropped before any shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd  # noqa: F811

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "byte_sum": payloads.map(
                        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
                    ).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        gen, schema=FEATURES_SCHEMA
    )


def decode_asset(payload: bytes, modality: str):  # pragma: no cover - stub
    """Codec stub: real decode needs PIL/av/soundfile, none of which
    exist in this container. The Spark-side plumbing (schema,
    batching, partitioning) is exercised with ``extract_features``;
    swap this in where a real pixel/sample decode is needed."""
    try:
        if modality == "image":
            from PIL import Image  # type: ignore
            import io

            return Image.open(io.BytesIO(payload))
    except ImportError:
        pass
    raise NotImplementedError(
        f"decode for modality={modality!r} requires codec libraries "
        "not present in this environment"
    )


def thumbnail_stub(assets: DataFrame, max_px: int = 64) -> DataFrame:
    """Resize/frame-sample plumbing with a deterministic fake decode:
    produces the (asset_id, thumb_w, thumb_h) the real resize would,
    scaled from metadata — the full mapInPandas round-trip without
    codecs. Replace the body's arithmetic with ``decode_asset`` +
    real resampling when codecs exist."""
    import pandas as pd  # noqa: F811

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("thumb_h", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            w = pdf["width"].clip(lower=1)
            h = pdf["height"].clip(lower=1)
            scale = (max_px / pd.concat([w, h], axis=1).max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "thumb_w": (w * scale).astype("int32").clip(lower=1),
                    "thumb_h": (h * scale).astype("int32").clip(lower=1),
                }
            )

    flat = assets.select(
        "asset_id", col("meta.width").alias("width"), col("meta.height").alias("height")
    )
    return flat.mapInPandas(gen, schema=out_schema)


def frame_sample_stub(
    assets: DataFrame, every_n: int = 10, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video assets: uniform every-Nth
    frame, capped at ``max_frames`` per asset — one output row per
    sampled frame index, the exploded shape a frame decoder feeds to a
    vision encoder. Deterministic from metadata alone (``n_frames``
    derived from duration_ms at a nominal 25 fps); the real
    implementation replaces the index arithmetic's downstream with
    ``decode_asset`` + per-frame extraction, keeping this exact
    partitioning and output contract.

    Scale: map-only, payloads untouched (column pruning drops them at
    the scan); output rows ≤ max_frames × assets."""
    import pandas as pd  # noqa: F811

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("sample_seq", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n_frames = (pdf["duration_ms"].fillna(0).clip(lower=0) * 25 // 1000).astype(
                "int64"
            )
            out = []
            for aid, nf in zip(pdf["asset_id"], n_frames):
                idxs = list(range(0, int(nf), every_n))[:max_frames]
                out.extend(
                    {"asset_id": aid, "frame_index": ix, "sample_seq": seq}
                    for seq, ix in enumerate(idxs)
                )
            yield pd.DataFrame(
                out, columns=["asset_id", "frame_index", "sample_seq"]
            ).astype(
                {"asset_id": "int64", "frame_index": "int32", "sample_seq": "int32"}
            )

    flat = assets.filter(col("modality") == "video").select(
        "asset_id", col("meta.duration_ms").alias("duration_ms")
    )
    return flat.mapInPandas(gen, schema=out_schema)
