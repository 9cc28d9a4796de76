"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed through Arrow-batched ``mapInPandas`` — the
Spark-idiomatic shape for Python-side media work: each task receives
pandas DataFrame batches (zero-copy via Arrow), so per-row Python
overhead is amortized across the batch.

The actual media codecs are NOT in this container, so the decode step is
STUBBED: :func:`decode_media` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested.  Everything around it — schema,
batch iteration, partitioning, UDF signatures — is real and tested.

At 100 TB: binary payloads dominate row size, so (a) metadata extraction
selects ONLY the binary column + key (column pruning keeps other columns
out of the Arrow exchange), and (b) ``spark.sql.files.maxPartitionBytes``
governs batch memory, not row counts.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_binary_payload",
    "binary_metadata",
    "decode_media",
    "extract_features",
    "resize_frames",
    "sample_frames",
    "fake_decode_frames",
]


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          payload_col: str = "payload") -> DataFrame:
    """Materialize a binary column (UTF-8 bytes of ``text_col``) — the
    stand-in for reading real media bytes; production swaps this for
    ``spark.read.format('binaryFile')`` or a blob-store reader."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha256", StringType()),
    ]
)


def binary_metadata(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Per-payload metadata via Arrow-batched ``mapInPandas``.

    Selects only (id, payload) before the exchange so Arrow never ships
    unused columns.
    """
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return pruned.mapInPandas(extract, schema=_META_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
                 codec: str = "image", use_fake: bool = False,
                 frames_per_doc: int = 4) -> DataFrame:
    """Decode media payloads into frames (1→N rows via ``mapInPandas``).

    Real codecs (PIL/ffmpeg/librosa) are unavailable in this container →
    raises ``NotImplementedError`` unless ``use_fake=True``, which runs
    :func:`fake_decode_frames` — a deterministic splitter that exercises
    the exact same schema/batch/explode shape a real decoder would.
    """
    if not use_fake:
        raise NotImplementedError(
            f"media codec {codec!r} not available in this environment; "
            "pass use_fake=True for the deterministic stub decoder"
        )
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, chunk in enumerate(fake_decode_frames(bytes(payload), frames_per_doc)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(chunk)
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs, "frame": frames})

    return pruned.mapInPandas(decode, schema=_FRAME_SCHEMA)


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload", dim: int = 16) -> DataFrame:
    """Fixed-dimension feature vector per payload (``array<float>``).

    Unlike :func:`decode_media` this needs no stub: the features are a
    normalized byte-value histogram folded into ``dim`` buckets — a real
    (if crude) content signature, directly consumable by the similarity
    layer (`operators/similarity.py` ANN / near-dup over the ``features``
    column).  A production pipeline swaps the histogram for a CLIP/audio
    embedding inside the SAME ``mapInPandas`` shape — schema, pruning,
    and batching are identical.
    """
    import numpy as np

    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                norm = float(np.linalg.norm(hist))
                feats.append((hist / norm if norm else hist).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return pruned.mapInPandas(featurize, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_frames(df: DataFrame, width: int, height: int,
                  id_col: str = "doc_id", index_col: str = "frame_index",
                  frame_col: str = "frame", use_fake: bool = False) -> DataFrame:
    """Resize decoded frames to ``width x height`` (1→1 via ``mapInPandas``).

    Image libraries are unavailable in this container → raises
    ``NotImplementedError`` unless ``use_fake=True``, which deterministically
    truncates/zero-pads each frame to ``width*height`` bytes — same schema,
    batch shape, and output contract a PIL/opencv resize would have.
    """
    if not use_fake:
        raise NotImplementedError(
            "image resize backend not available in this environment; "
            "pass use_fake=True for the deterministic stub"
        )
    target = width * height
    pruned = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(index_col).alias("frame_index"),
        F.col(frame_col).alias("frame"),
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                bytes(b)[:target].ljust(target, b"\0") for b in pdf["frame"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_index": pdf["frame_index"],
                    "frame": frames,
                    "width": [width] * len(frames),
                    "height": [height] * len(frames),
                }
            )

    return pruned.mapInPandas(resize, schema=_RESIZE_SCHEMA)


def fake_decode_frames(payload: bytes, frames: int) -> list[bytes]:
    """Deterministic stand-in for frame extraction: equal byte slices."""
    if not payload:
        return []
    step = max(1, len(payload) // frames)
    return [payload[i : i + step] for i in range(0, min(len(payload), frames * step), step)]


def sample_frames(df: DataFrame, stride: int = 2, max_frames: "int | None" = None,
                  index_col: str = "frame_index") -> DataFrame:
    """Deterministic frame sampling over a decoded frame table: keep every
    ``stride``-th frame, optionally capped at ``max_frames`` kept frames
    per document.

    Deliberately NOT a Python stage: once :func:`decode_media` has
    exploded payloads into indexed frame rows, sampling is a pure
    Catalyst filter on the index — it costs nothing, pushes through
    shuffles, and at 100 TB prunes the frame table before any expensive
    per-frame featurization runs (sample-then-featurize, never the
    reverse).
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    out = df.where(F.col(index_col) % stride == 0)
    if max_frames is not None:
        out = out.where(F.col(index_col) < max_frames * stride)
    return out
