"""Structured Streaming facade over the quality-filter pipeline.

The reference is strictly batch (SURVEY.md §2.9: no streaming anywhere), and
the engine's primary mode stays batch-with-checkpoints. But the pipeline
transform is a stateless per-row map/filter chain, so the SAME
QualityFilterPipeline.transform applies unchanged to a streaming DataFrame —
this module is the thin wiring for continuous ingestion (e.g. a WARC-drop
directory on a crawl frontier):

    readStream(parquet dir) -> pipeline.transform -> writeStream(parquet)

Exactly-once at file granularity comes from the sink checkpoint (offsets +
commit log), which complements the batch-side bucket checkpoints
(plans/checkpoints.py). No watermarks/stateful operators are needed — there
is no aggregation in the stream; metrics remain a batch query over the
output table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.pipeline import PipelineConfig, QualityFilterPipeline
from ..sources.synth import PAGES_SCHEMA_DDL


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    config: PipelineConfig | None = None,
    max_files_per_trigger: int = 16,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously filter pages parquet files landing in ``input_dir``.

    ``available_now=True`` drains the current backlog then stops (the batch
    parity mode used by tests); ``False`` keeps tailing the directory.

    Layout note: the streaming sink partitions by ``kept_partition`` (a
    STREAMING-ONLY string copy of ``keep``, see below) so consumers prune
    quarantined rows at scan time; the batch sink instead partitions by
    ``bucket``. A downstream union of the two tables should select the
    shared columns explicitly (or drop ``kept_partition``/``bucket``) --
    the tables are row-compatible, not schema-identical.
    """
    pipe = QualityFilterPipeline(config)
    pages = (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    from pyspark.sql import functions as F

    # Partition on a derived STRING copy of `keep`: a bare partitionBy("keep")
    # would hoist the boolean into the directory name and read back as a
    # string (partition-type inference covers only numeric/date), silently
    # changing the schema vs the batch path.
    out = pipe.transform(pages).withColumn(
        "kept_partition", F.col("keep").cast("string")
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("kept_partition")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
):
    """Event-time windowed counts with a watermark -- the late-data-tolerant
    streaming analog of the batch `events_hourly` query (A4 counters over a
    continuous feed). Works on a streaming OR batch DataFrame (the same
    expression tree runs in both; batch ignores the watermark), so tests
    assert stream==batch parity directly.

    Watermark semantics: events later than ``watermark`` behind the max
    observed event time are dropped from their window instead of blocking
    state forever -- state size is bounded by (watermark / window) keys per
    group, independent of stream length.
    """
    from pyspark.sql import functions as F

    # watermarks require TIMESTAMP (with zone); parquet event feeds often
    # carry TIMESTAMP_NTZ -- cast applies to both stream and batch sides so
    # parity holds
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), key_col, "n_events")
    )


def streaming_first_seen_dedup(
    pages,
    text_col: str = "text",
    id_col: str = "url",
):
    """Custom stateful streaming operator: exact-dedup a continuous page
    stream, emitting only the FIRST occurrence of each text hash and keeping
    a per-hash duplicate count in state.

    For plain streaming dedup Spark's built-in ``dropDuplicates`` /
    ``dropDuplicatesWithinWatermark`` is the first choice; this operator
    exists for the custom-state shape the built-in can't express (the
    running duplicate count per key, emitted with the surviving row) and as
    the template for arbitrary per-key streaming state
    (``applyInPandasWithState``: Arrow-batched pandas per group + a typed
    state tuple, the Spark-4 analog of flatMapGroupsWithState).

    Semantics: grouped by md5(text); the first micro-batch containing a
    hash emits that batch's min-``id_col`` row with ``n_dups_so_far`` = the
    batch's extra copies; later batches emit nothing and only grow the
    count. Emission is therefore arrival-order-dependent across batches
    (inherent to streaming dedup) while deterministic within a batch.

    Scale: state lives in the state store, hash-partitioned by group key
    (uniform md5 keys -> no skew); at 10^12 keys use the RocksDB state
    store provider and bound state with a TTL/watermark eviction policy --
    NoTimeout here keeps the demo exact. State row = 16-byte key + one
    long, so 10^9 distinct pages/executor ~= 40 GB RocksDB, disk-backed.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = pages.withColumn("_h", F.md5(F.col(text_col)))
    in_cols = [f.name for f in pages.schema.fields]
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields)
        + ", n_dups_so_far long"
    )

    def dedup_fn(key, pdfs, state):
        rows = 0
        first = None
        for pdf in pdfs:
            rows += len(pdf)
            if len(pdf):
                cand = pdf.sort_values(id_col).iloc[[0]]
                if first is None or cand[id_col].iloc[0] < first[id_col].iloc[0]:
                    first = cand
        if state.exists:
            (count,) = state.get
            state.update((count + rows,))
            return iter(())
        state.update((rows,))
        out = first[in_cols].copy()
        out["n_dups_so_far"] = rows - 1
        return iter((out,))

    return hashed.groupBy("_h").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="count long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
