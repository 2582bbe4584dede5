"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step itself is STUBBED (no imaging/audio libs in this
container — see `decode_image`): the Spark-side contract that matters
at 100 TB is real and tested — schema, batch shape, partition sizing,
and the mapInPandas exchange. Swap `_decode_stub` for a PIL/ffmpeg call
and nothing else changes.

Layout convention (one row per media object):
    media_id   bigint
    modality   string            ('image' | 'audio' | 'video')
    content    binary            (the encoded bytes, or null if external)
    uri        string            (object-store pointer when content is null)
    meta       string JSON       (width/height/sample_rate/... as produced)
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
        T.StructField("modality", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("uri", T.StringType(), True),
        T.StructField("meta", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def _decode_stub(content: bytes | None, modality: str) -> list[float] | None:
    """Deterministic fake decoder: 8 bytes → 8 floats. A real pipeline
    replaces this with PIL.Image.open / soundfile.read / pyav frame
    sampling; everything around it (batching, schema, nulls) is real.

    Raises NotImplementedError for modalities we don't fake."""
    if content is None:
        return None
    if modality in ("image", "audio"):
        head = content[:8].ljust(8, b"\0")
        return [float(b) / 255.0 for b in head]
    raise NotImplementedError(f"decode for modality {modality!r} needs a real codec")


def extract_features(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """content → fixed-width feature vector via Arrow-batched
    mapInPandas. Each batch stays columnar until the decode loop; output
    schema is declared so downstream plans don't depend on Python."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else None),
            }
            feats, ok = [], []
            for content, modality in zip(pdf["content"], pdf["modality"]):
                try:
                    f = _decode_stub(content, modality)
                    feats.append(f)
                    ok.append(f is not None)
                except NotImplementedError:
                    feats.append(None)
                    ok.append(False)
            out["feature"] = feats
            out["decode_ok"] = ok
            yield pd.DataFrame(out)

    return df.mapInPandas(_map, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: binary in → binary out + updated meta.

    The pixel work is STUBBED (`NotImplementedError` surfaces as
    resize_ok=false — no imaging libs in this container); schema,
    Arrow batching, and meta rewrite are the real contract. Swap the
    stub body for PIL `Image.open(BytesIO(b)).resize((w,h))`."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("meta", T.StringType(), True),
            T.StructField("resize_ok", T.BooleanType(), False),
        ]
    )

    def _resize_stub(content: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError("image resize needs PIL/opencv")

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json as _json

        for pdf in batches:
            out_content, out_meta, ok = [], [], []
            for content, modality, meta in zip(
                pdf["content"], pdf["modality"], pdf["meta"]
            ):
                try:
                    if modality != "image" or content is None:
                        raise NotImplementedError
                    resized = _resize_stub(content, width, height)
                    m = _json.loads(meta) if meta else {}
                    m.update({"w": width, "h": height})
                    out_content.append(resized)
                    out_meta.append(_json.dumps(m))
                    ok.append(True)
                except NotImplementedError:
                    out_content.append(content)
                    out_meta.append(meta)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "content": out_content,
                    "meta": out_meta,
                    "resize_ok": ok,
                }
            )

    return df.mapInPandas(_map, schema=out_schema)


def sample_frames(df: DataFrame, every_n: int = 30, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one video row → up to `max_frames`
    frame rows (media_id, frame_idx, frame binary). The codec is
    STUBBED deterministically: the demo 'video' payload is treated as a
    concatenation of 4-byte 'frames', sampled every `every_n`-th —
    replace the slicing with pyav/ffmpeg keyframe extraction; the
    one-to-many Arrow fan-out is the real contract."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                if modality != "video" or content is None:
                    continue
                n_frames = max(len(content) // 4, 0)
                for j, fi in enumerate(range(0, n_frames, every_n)):
                    if j >= max_frames:
                        break
                    ids.append(media_id)
                    idxs.append(fi)
                    frames.append(bytes(content[fi * 4 : fi * 4 + 4]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(_map, schema=out_schema)


def make_demo_media(spark, n: int = 64) -> DataFrame:
    """Synthesize a small media table (deterministic bytes) for tests."""
    rows = [
        (
            i,
            "image" if i % 3 == 0 else ("audio" if i % 3 == 1 else "video"),
            bytes([(i * 7 + j) % 256 for j in range(16)]) if i % 5 != 4 else None,
            None if i % 5 != 4 else f"s3://bucket/media/{i}",
            '{"w": 64, "h": 64}',
        )
        for i in range(n)
    ]
    # few partitions: 64 demo rows across 32 default slices would spawn
    # a Python worker per near-empty partition
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)
