"""Multimodal column plumbing (SURVEY.md §2.D).

Images/audio/video are opaque ``BinaryType`` columns with typed
metadata; decode / feature-extract run as Arrow-batched pandas
functions over ``mapInPandas``.  The container has no image/audio
libraries, so the *decoders* are stubbed (clearly marked), while the
Spark-side plumbing — schema, partition-sized batches, UDF signatures —
is real and tested:

- ``attach_payload``      — derive a deterministic fake binary payload
                            (production: ``spark.read.format("binaryFile")``
                            or a lazy fetch-by-URI map function)
- ``extract_features``    — mapInPandas over the binary column producing
                            typed features (here: byte statistics, the
                            deterministic stand-in for an image decoder)
- ``decode_image`` etc.   — the real decoder seams, NotImplementedError
                            until the libs exist on the cluster
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandasqlite_spark.operators.common import load

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, byte_mean double, byte_min int, byte_max int"


def attach_payload(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in payload: the md5 digest bytes of the text.
    In production this column comes from ``binaryFile`` / object-store
    fetch; everything downstream only sees BinaryType."""
    return docs.withColumn("payload", F.unhex(F.md5("text")))


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  The
    batch shape (one pandas frame per partition chunk) is exactly what a
    real image decoder would receive; only `_fake_decode` would change."""

    from pandasqlite_spark.operators.common import ensure_package_on_workers

    ensure_package_on_workers(with_payload.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda f: f[0]).astype("int32"),
                    "byte_mean": feats.map(lambda f: f[1]),
                    "byte_min": feats.map(lambda f: f[2]).astype("int32"),
                    "byte_max": feats.map(lambda f: f[3]).astype("int32"),
                }
            )
            yield out

    return with_payload.select("doc_id", "payload").mapInPandas(op, FEATURE_SCHEMA)


def _fake_decode(payload: bytes) -> tuple[int, float, int, int]:
    """STUB decoder: byte statistics instead of pixel decoding.
    Deterministic, so the pipeline is testable end-to-end."""
    b = list(payload)
    return (len(b), sum(b) / len(b), min(b), max(b))


def decode_image(payload: bytes):
    """Real decoder seam — requires an imaging library on the cluster."""
    raise NotImplementedError("image decoding requires PIL/opencv on the cluster")


def decode_audio(payload: bytes):
    raise NotImplementedError("audio decoding requires soundfile/librosa on the cluster")


def sample_video_frames(payload: bytes, every_n: int = 30):
    raise NotImplementedError("video frame sampling requires pyav/ffmpeg on the cluster")


def resize_image(payload: bytes, width: int, height: int):
    """Real resize seam — requires PIL/opencv; the Spark-side shape is
    identical to :func:`extract_features` (binary in → binary out via
    ``mapInPandas``)."""
    raise NotImplementedError("image resizing requires PIL/opencv on the cluster")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hex string"


def sample_frames(with_payload: DataFrame, frame_bytes: int = 4) -> DataFrame:
    """Frame-sampling plumbing: one binary payload row → N frame rows
    (here: fixed-width byte chunks standing in for decoded video
    frames).  The row-explosion shape — per-input fan-out inside
    ``mapInPandas``, no driver involvement, output partitioning
    inherited from the input — is exactly what a real pyav sampler
    produces; only the chunker would change."""

    from pandasqlite_spark.operators.common import ensure_package_on_workers

    ensure_package_on_workers(with_payload.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(payload) // frame_bytes):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes].hex())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hex": pd.Series(frames, dtype="object"),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(op, FRAME_SCHEMA)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs))


WINDOW_SCHEMA = "doc_id bigint, win_idx int, offset int, n_win_bytes int, win_hex string"


def window_audio(
    with_payload: DataFrame, win_bytes: int = 6, stride_bytes: int = 4
) -> DataFrame:
    """Overlapping-window segmentation over a binary payload — the
    audio analog of document chunking (PCM frame windows for feature
    extraction).  Same ``mapInPandas`` fan-out shape as
    :func:`sample_frames` but with stride < window (overlap), and the
    tail window is short, never dropped — exactly the contract an
    STFT/MFCC front end needs.  Only the per-window transform (here:
    hex passthrough) would change with a real audio lib."""

    from pandasqlite_spark.operators.common import ensure_package_on_workers

    ensure_package_on_workers(with_payload.sparkSession)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, hexes = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n, w = len(payload), 0
                for start in range(0, n, stride_bytes):
                    chunk = payload[start : start + win_bytes]
                    ids.append(doc_id)
                    idxs.append(w)
                    offs.append(start)
                    lens.append(len(chunk))
                    hexes.append(chunk.hex())
                    w += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int32"),
                    "n_win_bytes": pd.Series(lens, dtype="int32"),
                    "win_hex": pd.Series(hexes, dtype="object"),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(op, WINDOW_SCHEMA)


def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return window_audio(attach_payload(docs))


QUERIES = {
    "multimodal-features": q_multimodal_features,
    "multimodal-frames": q_multimodal_frames,
    "multimodal-audio-windows": q_multimodal_audio_windows,
}

# the fake payload is unhex(md5(text)), so each 4-byte frame is an
# 8-hex-char slice of the digest — SQL can state the expected frames
# exactly, giving the binary fan-out path a real value-hash oracle
ORACLES: dict = {
    "multimodal-frames": """
        SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
               substr(md5(text), i * 8 + 1, 8) AS frame_hex
        FROM documents, (SELECT unnest(generate_series(0, 3)) AS i)
    """,
    # reconstruct the 16 digest bytes from the md5 hex and aggregate:
    # the mapInPandas byte-stat extractor gets a full value oracle
    # (sum-of-16-ints / 16.0 is exact in float64, so byte_mean is
    # bit-identical to pandas' mean over the same ints)
    "multimodal-features": """
        WITH b AS (
          SELECT doc_id, ('0x' || substr(md5(text), i * 2 + 1, 2))::INT AS v
          FROM documents, (SELECT unnest(range(0, 16)) AS i))
        SELECT doc_id, CAST(16 AS INTEGER) AS n_bytes,
               CAST(SUM(v) AS DOUBLE) / 16 AS byte_mean,
               CAST(MIN(v) AS INTEGER) AS byte_min,
               CAST(MAX(v) AS INTEGER) AS byte_max
        FROM b GROUP BY doc_id
    """,
    # windows of 6 bytes every 4 bytes over the 16-byte digest:
    # starts 0,4,8,12 — the tail window is 4 bytes
    "multimodal-audio-windows": """
        SELECT doc_id, CAST(w AS INTEGER) AS win_idx,
               CAST(w * 4 AS INTEGER) AS offset,
               CAST(LEAST(6, 16 - w * 4) AS INTEGER) AS n_win_bytes,
               substr(md5(text), w * 8 + 1, LEAST(6, 16 - w * 4) * 2) AS win_hex
        FROM documents, (SELECT unnest(generate_series(0, 3)) AS w)
    """,
}
