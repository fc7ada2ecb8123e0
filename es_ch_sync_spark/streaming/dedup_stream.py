"""Streaming ingest dedup for a document feed.

A training-corpus ingest stream re-delivers content constantly (re-crawls,
mirror feeds, retry replays).  Running batch dedup afterwards pays a full
corpus pass per day; deduping ON the stream absorbs the duplicates at
arrival with state bounded by the watermark:

- the dedup key is the content fingerprint (`fingerprint_md5` over the
  normalized text — the same 32-byte key the batch `dedup_exact` groups
  on), so shuffle and state carry hashes, never documents;
- `dropDuplicatesWithinWatermark` keeps one row per fingerprint seen
  within the watermark horizon and ages state out beyond it — the
  streaming analog of exact-dedup keep-one, with bounded memory at any
  scale;
- `Trigger.AvailableNow` drains a backlog batch-style (the same cron/Job
  pattern as streaming/sync_stream.py).

Near-dup streaming: compute the minhash band keys on the stream with
`with_minhash` and dedup on a band-key column the same way — the exact
operator here IS that pipeline with fingerprint = band key.  Batch
re-clustering stays the periodic compaction job (connected components is
inherently multi-pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from es_ch_sync_spark.operators.text import fingerprint_md5


def dedup_document_stream(
    docs_stream: DataFrame,
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving document per content fingerprint within the
    watermark horizon."""
    return (
        docs_stream.withColumn("fp", fingerprint_md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
