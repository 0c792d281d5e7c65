"""Streaming exact deduplication — the arrival-time form of
``operators.dedup.exact_dedup`` (SURVEY §2.2 "streaming: the reference
is itself a change-stream sink"; dedup itself is a Spark-native
extension with no reference counterpart).

Batch ``exact_dedup`` picks one canonical doc per content hash over a
closed corpus. On a stream the corpus never closes, so the streaming
contract is FIRST-ARRIVAL-WINS: the first document with a given
content hash passes through; every later arrival with the same hash is
dropped. This is exactly how production ingestion dedup behaves (you
cannot retract an already-emitted doc), and it converges to a valid
batch answer: one representative per hash.

State at scale: ``dropDuplicates`` keeps one state row per distinct
hash forever unless bounded. Two bounded modes:

- event-time bound (``watermark_col``/``watermark``): state for a hash
  is evicted once the watermark passes — duplicates separated by more
  than the watermark horizon are NOT caught (the C4-style "dedup
  within a crawl window" trade).
- ``dropDuplicatesWithinWatermark`` semantics need the same column;
  for an unbounded exact guarantee, feed the stream through a
  MapIndex keyed by content hash instead (the stored-index path:
  ``indexed.py`` band indexes are the near-dup analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins streaming dedup on an md5 content hash.

    Returns the input rows (plus ``content_hash``) with later
    duplicate arrivals dropped. With ``watermark_col`` set, state is
    evicted at the watermark horizon (bounded state, bounded
    guarantee); without it, state grows with distinct-hash count
    (exact forever — only for bounded corpora replayed as streams).
    """
    hashed = docs.withColumn(
        "content_hash", F.md5(F.col(text_col))
    )
    if watermark_col is not None:
        hashed = hashed.withWatermark(watermark_col, watermark)
        return hashed.dropDuplicatesWithinWatermark(["content_hash"])
    return hashed.dropDuplicates(["content_hash"])
