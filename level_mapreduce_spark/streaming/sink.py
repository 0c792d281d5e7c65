"""Structured Streaming sink: live incremental index maintenance.

The reference Index IS a change-stream sink — a Node Transform stream
you pipe a changes feed into (index.js:121, 173; the couchup dependency
signals a CouchDB _changes source). The Spark-native equivalent is
``writeStream.foreachBatch``: each micro-batch is one ``update()``
epoch — the same delete-old-emits/insert-new semantics
(index.js:182-242), with chained indexes updated batch-synchronously
inside the same ``foreachBatch`` call (reference pipe, index.js:250-253,
minus its 10ms eventual-consistency sleeps).

Exactly-once notes: ``update()`` appends one epoch per call. On a
retried micro-batch the re-written epoch's tombstones supersede the
partial first attempt (same doc keys, higher epoch), so replays
converge — idempotent at the read() level, matching the crash-safety
argument in MapIndex.update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from level_mapreduce_spark.engine.index import MapIndex


def stream_into(
    index: MapIndex,
    changes: DataFrame,
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
    assume_unique: bool = False,
) -> StreamingQuery:
    """Pipe a streaming changes DataFrame into ``index``.

    ``changes`` must be a streaming DataFrame with the index's doc-key
    column (plus optional ``deleted``/``seq``); every micro-batch runs
    one incremental ``update()``, propagating to piped downstream
    indexes synchronously.

    ``available_now=True`` drains the backlog then stops (batch-like
    catch-up); pass ``processing_time='5 seconds'`` instead for a
    continuous micro-batch cadence.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index.update(batch_df, assume_unique=assume_unique)

    writer = changes.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sketches_into(
    index: MapIndex,
    events: DataFrame,
    checkpoint: str,
    bucket: str = "1 hour",
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Live continuous aggregate: fold each micro-batch of raw events
    into a bucket->sketch index (see ``operators.sketches``; the
    index's ``kind`` — hll/theta/kll — is remembered from
    ``build_sketch_index`` and drives the fold).

    Each micro-batch costs O(buckets touched by the batch): sketch the
    batch, read back the touched key range through the pruned index
    scan, union, overwrite. Range queries stay answerable mid-stream
    off the index (``sketch_index_estimate`` / ``_quantiles`` /
    ``_overlap``) — the hypertable "continuous aggregate" behavior on
    the engine's own storage.

    Replay semantics: retried micro-batches re-fold the same events.
    HLL and theta unions are idempotent for duplicate inserts, so
    replays converge exactly; KLL merge is NOT (duplicates re-weight
    ranks slightly) — for kll indexes a replayed batch perturbs
    quantiles within sketch error, acceptable for monitoring but not
    for exact replay convergence guarantees.
    """
    from level_mapreduce_spark.operators.sketches import update_sketch_index

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        update_sketch_index(index, batch_df, bucket=bucket)

    writer = events.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_semdedup_into(
    index: MapIndex,
    embeddings: DataFrame,
    checkpoint: str,
    available_now: bool = True,
    processing_time: str | None = None,
    max_batch: int = 100_000,
    source_embeddings: DataFrame | None = None,
) -> StreamingQuery:
    """Continuous-ingest semantic dedup over a stored semdedup index
    (``operators.similarity.build_semdedup_index``): every micro-batch
    of ``(vec_id, embedding)`` rows is assigned with the sidecar
    codebook, ranked AFTER every stored member, deduped against the
    stored members plus earlier rows of its own batch, and appended —
    ``semdedup_update`` per batch.

    The frozen-leaders contract IS first-arrival-wins streaming
    semantics: stored decisions never flip, so a drained stream
    converges to exactly the state of applying the same batches
    through ``semdedup_update`` by hand (pinned by
    tests/test_streaming.py). Replay caveat: a RETRIED micro-batch
    re-ingests its vec_ids, which replaces their rows with re-ranked
    decisions (documented overwrite semantics) — decisions stay
    correct w.r.t. live members, but ranks are not bit-stable across
    replays. ``max_batch`` passes through the incremental-batch guard;
    ``source_embeddings`` is the (static) exact-re-verification source
    a PQ-stored index requires — for a stream it must cover the build
    corpus plus every batch already drained (e.g. the table the
    stream also appends to).
    """
    from level_mapreduce_spark.operators.similarity import semdedup_update

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        semdedup_update(
            index,
            batch_df,
            max_batch=max_batch,
            source_embeddings=source_embeddings,
        )

    writer = embeddings.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
