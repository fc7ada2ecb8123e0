"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

The decode/resample kernels themselves are STUBBED (the image/audio
libraries aren't in this container — see ``try_import_*``): each stub either
raises NotImplementedError (real-decode path) or produces a deterministic
fake (testable path).  Everything Spark-side is real and tested: the schema
contract, the `mapInPandas` batch shape, partition sizing, and the metadata
projection — swapping a stub for `PIL.Image.open` changes one function body,
not the plan.

Scale posture for binary columns:
- keep blobs in their own column so Parquet column pruning skips them for
  metadata-only queries;
- size partitions by *bytes not rows* (`spark.sql.files.maxPartitionBytes`)
  because blob rows are huge;
- never collect blobs; feature extraction reduces each blob to a small
  struct before any shuffle.
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
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque blob
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),  # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def try_import_pillow():
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def decode_image_stub(blob: bytes) -> dict:
    """Deterministic fake decode: derives pseudo-pixel stats from the bytes.

    Replace body with PIL/libvips decode in a container that has them; the
    mapInPandas plumbing, schema, and batch shape do not change."""
    if blob is None:
        return {"n_bytes": None, "content_md5": None, "feature": None}
    import hashlib

    h = hashlib.md5(blob).hexdigest()
    # 8 fake features from the digest — deterministic, testable
    feat = [int(h[i * 4 : i * 4 + 4], 16) / 65535.0 for i in range(8)]
    return {"n_bytes": len(blob), "content_md5": h, "feature": feat}


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """Real image resize — requires an image library."""
    pil = try_import_pillow()
    if pil is None:
        raise NotImplementedError("image resize requires Pillow/libvips (not in this container)")
    raise NotImplementedError("wire PIL resize here when the library is available")


def sample_video_frames(blob: bytes, every_ms: int) -> list[bytes]:
    """Real frame sampling — requires a video library (pyav/ffmpeg)."""
    raise NotImplementedError("video frame sampling requires pyav/ffmpeg (not in this container)")


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Blob → (n_bytes, md5, feature[8]) via mapInPandas (Arrow batches).

    The UDF sees pandas DataFrames, never Python-per-row; output rows are
    tiny so every downstream op (dedup by content_md5, ANN over feature)
    shuffles features, not blobs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                d = decode_image_stub(bytes(blob) if blob is not None else None)
                out.append(
                    (mid, d["n_bytes"], d["content_md5"], d["feature"])
                )
            yield pd.DataFrame(out, columns=["media_id", "n_bytes", "content_md5", "feature"])

    return media.select("media_id", "content").mapInPandas(batches, FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: text bytes as
    the blob (deterministic), so the binary plumbing is exercised end-to-end
    without real image files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def video_media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a video media table from the documents fixture: text bytes
    as the blob, duration derived deterministically from text length (10 ms
    per character) — exercises the video-path plumbing without real files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("video/mp4").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length("text").cast("long") * 10).alias("duration_ms"),
    )


def audio_media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize an audio media table from the documents fixture: text
    bytes as the blob, duration 10 ms per character — exercises the
    audio-path plumbing without real files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length("text").cast("long") * 10).alias("duration_ms"),
    )


def plan_audio_chunks(
    media: DataFrame, chunk_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio chunking PLAN: overlapping ``chunk_ms`` windows every
    ``hop_ms`` across each clip — the work list an ASR/feature kernel
    would consume via mapInPandas (decode stays stubbed; the plan is real
    and oracle-checked).

    Like plan_frame_samples, this is metadata-only: the blob column is
    pruned at the scan, so a 100 TB audio table plans its segmentation
    reading only (media_id, duration_ms).  All-integer arithmetic; a clip
    shorter than one chunk still yields its single (clamped) window."""
    chunk, hop = int(chunk_ms), int(hop_ms)
    last_idx = F.expr(f"greatest((duration_ms - {chunk}) DIV {hop}, 0)").cast("long")
    start = F.col("chunk_idx") * F.lit(hop)
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.col("duration_ms"),
            F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias("chunk_idx"),
        )
        .select(
            "media_id",
            "chunk_idx",
            start.alias("start_ms"),
            F.least(start + F.lit(chunk), F.col("duration_ms")).alias("end_ms"),
        )
    )


def plan_frame_samples(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling PLAN: one row per (media_id, frame_idx, frame_ts_ms)
    to decode, at ``every_ms`` intervals across each video's duration.

    This is the Spark-side half of frame sampling — the work list the
    decode kernel (``sample_video_frames``, stubbed here) would consume via
    mapInPandas exactly like ``extract_features``.  Planning from metadata
    keeps the explode blob-free: Parquet column pruning drops ``content``
    entirely, so a 100 TB video table plans its sampling schedule reading
    only (media_id, duration_ms).  Frame indices are pure column arithmetic
    (explode over sequence) — fully oracle-checkable."""
    n = F.expr(f"duration_ms DIV {int(every_ms)}").cast("long")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0).cast("long"), n)).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(int(every_ms)))
    )
