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
    "payload_signature_pairs",
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


def payload_signature_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Perceptual-hash-style near-dup pairs over binary payloads.

    The multimodal dedup member: a 60-bit signature from the payload's
    byte-value histogram (bit b set iff bucket b is over-represented vs
    the uniform expectation — sign quantization, the aHash/pHash recipe
    applied to the distribution instead of pixels), then pigeonhole
    block banding (4 x 15 bits: hamming <= 3 guarantees one identical
    block) and an exact ``bit_count(xor)`` verify — the d_simhash
    machinery pointed at payload bytes, so SAMPLING/DEDUP RUNS BEFORE
    ANY DECODE (the scale-critical ordering for image/audio corpora).
    Pure Catalyst: explode chars -> bucket counts -> one integer
    signature per doc; shuffle is O(total bytes) skinny rows then
    O(docs x 4 blocks).
    """
    chars = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), "")).alias("__ch"),
    ).where(F.col("__ch") != "").select("__id", (F.ascii("__ch") % 60).alias("__b"))
    hist = chars.groupBy("__id", "__b").agg(F.count(F.lit(1)).alias("__c"))
    tot = hist.groupBy("__id").agg(F.sum("__c").alias("__n"))
    # corpus profile: bit b is set iff the DOC's bucket share exceeds the
    # CORPUS share (exact integer cross-multiply c*N > n*C in decimal so
    # corpus-scale totals cannot overflow).  Centering on the corpus
    # removes the common language letter profile — uniform-mean
    # quantization sets near-identical bits for every natural-language
    # doc (measured: 35k candidate pairs over 1k docs) while corpus
    # centering leaves only doc-specific deviations.
    corpus = hist.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    n_total = corpus.agg(F.sum("__cb").alias("__nt"))
    bit_set = (F.col("__c").cast("decimal(38,0)") * F.col("__nt")) > (
        F.col("__n").cast("decimal(38,0)") * F.col("__cb")
    )
    sig = (
        hist.join(tot, "__id")
        .join(F.broadcast(corpus), "__b")
        .crossJoin(F.broadcast(n_total))
        .groupBy("__id")
        .agg(
            F.sum(
                F.when(
                    bit_set,
                    # shiftleft with a COLUMN bit position must go through
                    # SQL (the python wrapper only takes int numBits)
                    F.expr("shiftleft(cast(1 as bigint), __b)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("__sig")
        )
    )
    # INTERLEAVED block assignment (block i takes bits i, i+4, i+8, ...):
    # contiguous 15-bit blocks collide catastrophically because byte
    # buckets rare in the corpus yield bits that are 0 for every doc — a
    # block covering only dead bits is constant and its band join becomes
    # all-pairs (measured: C(n,2) candidates).  Striding mixes live and
    # dead bits into every block, so each block retains discriminating
    # entropy.  Pigeonhole still holds: 4 disjoint blocks, hamming <= 3
    # leaves at least one block untouched.
    def _interleaved_bv(sig_col, i: int):
        bv = F.lit(0).cast("long")
        for k in range(15):
            bit = F.shiftright(sig_col, 4 * k + i).bitwiseAND(F.lit(1))
            bv = bv + F.shiftleft(bit, k)
        return bv

    blocks = sig.select(
        "__id",
        "__sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    _interleaved_bv(F.col("__sig"), i).alias("bv"),
                )
                for i in range(4)
            ])
        ).alias("__blk"),
    ).select("__id", "__sig", F.col("__blk.blk").alias("blk"), F.col("__blk.bv").alias("bv"))
    a = blocks.select(
        F.col("__id").alias("id_a"), F.col("__sig").alias("sig_a"), "blk", "bv"
    )
    b = blocks.select(
        F.col("__id").alias("id_b"), F.col("__sig").alias("sig_b"), "blk", "bv"
    )
    cand = (
        a.join(b, ["blk", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.expr("sig_a ^ sig_b"))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
