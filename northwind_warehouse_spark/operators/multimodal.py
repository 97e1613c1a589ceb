"""Multimodal (binary) column pipelines.

Treats media as opaque ``binary`` columns + typed metadata, processed
with Arrow-batched ``mapInPandas`` — the idiomatic Spark shape for
decode / feature-extract / resize / frame-sample stages at scale
(each batch stays columnar; partition count controls parallelism).

The actual media decode is STUBBED (this container has no image/audio
libraries): ``_decode_stub`` derives a small deterministic feature
vector from the bytes' md5. The Spark-side plumbing — schema,
partitioning, batch iteration, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField, StructType,
)

FEATURE_DIM = 4

EXTRACT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("content_md5", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def _decode_stub(blob: bytes) -> list[float]:
    """Deterministic fake 'decode → feature' stage.

    A real deployment would replace this with e.g. PIL/torchvision decode;
    the surrounding mapInPandas machinery is unchanged.
    """
    digest = hashlib.md5(blob).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(binary_df: DataFrame, id_col: str = "doc_id", blob_col: str = "content") -> DataFrame:
    """mapInPandas feature extraction over a binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": blobs.map(len).astype("int64"),
                "content_md5": blobs.map(lambda b: hashlib.md5(b).hexdigest()),
                "features": blobs.map(_decode_stub),
            })

    return binary_df.mapInPandas(run, EXTRACT_SCHEMA)


EXTRACT_FLAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
    ]
    + [StructField(f"f{i}_q", LongType()) for i in range(FEATURE_DIM)]
)


def extract_features_flat(
    binary_df: DataFrame, id_col: str = "doc_id", blob_col: str = "content"
) -> DataFrame:
    """``extract_features`` with the feature vector flattened to
    integer-quantized scalar columns (``f0_q..f3_q``, the raw 0-255
    digest bytes) — every column scalar and exact, so any external
    harness can sort/hash rows without array handling, per the
    project's float discipline (CLAUDE.md)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            digests = blobs.map(lambda b: hashlib.md5(b).digest())
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": blobs.map(len).astype("int64"),
                "content_md5": digests.map(bytes.hex),
            }
            for i in range(FEATURE_DIM):
                out[f"f{i}_q"] = digests.map(lambda d, i=i: d[i]).astype("int64")
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, EXTRACT_FLAT_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("resized", BinaryType()),
])


def resize_images(binary_df: DataFrame, width: int = 64, height: int = 64,
                  id_col: str = "doc_id", blob_col: str = "content") -> DataFrame:
    """mapInPandas image-resize stage.

    Decode/resample is STUBBED (no image libs in this container): the
    'resized' payload is a deterministic digest-derived byte block of
    exactly width*height bytes, standing in for the resampled pixel
    buffer. Batch iteration, schema, and partition behavior are real —
    swapping in PIL touches only the inner function.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "width": width,
                "height": height,
                "resized": blobs.map(
                    lambda b: (hashlib.md5(b).digest() * (n // 16 + 1))[:n]
                ),
            })

    return binary_df.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame", BinaryType()),
])


def sample_frames(binary_df: DataFrame, n_frames: int = 4,
                  id_col: str = "doc_id", blob_col: str = "content") -> DataFrame:
    """mapInPandas video frame-sampling stage (1→N fan-out inside the
    batch — the shape that matters for a real decoder).

    Frame extraction is STUBBED: each 'frame' is a deterministic slice
    digest of the source bytes at evenly spaced offsets.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                step = max(1, len(blob) // n_frames)
                for i in range(n_frames):
                    chunk = blob[i * step:(i + 1) * step] or blob[-step:]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame"].append(hashlib.md5(chunk).digest())
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, FRAME_SCHEMA)


def documents_as_binary(documents: DataFrame) -> DataFrame:
    """Adapter: expose the documents table as a binary-content corpus
    (stands in for an image/audio table in the testdata)."""
    return documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").cast(BinaryType()).alias("content")
    )


SCORE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("model_version", StringType()),
    StructField("score_q", LongType()),
    StructField("keep", StringType()),
])


def model_score_documents(
    docs: DataFrame,
    model_version: str = "quality-clf-v0",
    keep_threshold_q: int = 500_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_hint: int | None = None,
) -> DataFrame:
    """Batch model-inference over the corpus — the ML-classifier
    filtering stage of a curation pipeline (quality/toxicity/topic
    models), shaped the way real inference runs on Spark: Arrow-batched
    ``mapInPandas``, one model instance per task (load once per
    partition, score every batch), score emitted as exact quantized
    integer so downstream gating is engine-deterministic.

    The model itself is STUBBED deterministically (md5-derived pseudo
    score in [0, 1e6)); swapping in a real ONNX/torch classifier touches
    only ``_score`` — the batching, schema, and partition behavior are
    what this operator pins down.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model load happens HERE, once per task — not per row/batch
        def _score(text: str) -> int:
            digest = hashlib.md5(("score|" + text).encode()).hexdigest()
            return int(digest[:8], 16) % 1_000_000

        for pdf in batches:
            scores = pdf[text_col].map(_score)
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "model_version": model_version,
                "score_q": scores.astype("int64"),
                "keep": (scores >= keep_threshold_q).map({True: "Y", False: "N"}),
            })

    out = docs.select(id_col, text_col)
    if batch_hint:
        out = out.repartition(batch_hint)
    return out.mapInPandas(run, SCORE_SCHEMA)


SEGMENT_LEN = 256  # waveform-surrogate chars per segment

AUDIO_SEGMENT_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("seg_idx", LongType()),
    StructField("n_chars", LongType()),
    StructField("energy", LongType()),
    StructField("seg_md5", StringType()),
])


def segment_audio(binary_df: DataFrame, seg_len: int = SEGMENT_LEN,
                  id_col: str = "doc_id", blob_col: str = "content") -> DataFrame:
    """mapInPandas audio-segmentation stage (1→N fan-out): fixed-length
    windows over the decoded waveform with a per-segment energy feature
    — the VAD/loudness-gate shape of an audio curation pipeline
    (segment → featurize → filter), sharing the batch plumbing of
    sample_frames.

    Decode is STUBBED (no audio libs in this container): the 'waveform'
    is the blob decoded as utf-8 text, segments are seg_len-char
    windows, and 'energy' is the byte-sum of each segment's md5 digest
    — deterministic, and restatable from scratch in SQL so even the
    stub path is value-checked per segment. A real deployment swaps the
    decode + energy lines for e.g. soundfile + RMS; schema, fan-out and
    batch iteration are unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "seg_idx": [], "n_chars": [], "energy": [], "seg_md5": []}
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                wave = bytes(blob).decode("utf-8")
                n_segs = (len(wave) + seg_len - 1) // seg_len
                for i in range(n_segs):
                    seg = wave[i * seg_len:(i + 1) * seg_len]
                    digest = hashlib.md5(seg.encode("utf-8")).digest()
                    out["doc_id"].append(int(doc_id))
                    out["seg_idx"].append(i)
                    out["n_chars"].append(len(seg))
                    out["energy"].append(sum(digest))
                    out["seg_md5"].append(digest.hex())
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(run, AUDIO_SEGMENT_SCHEMA)
