"""O24–O26 — incremental ingest as Structured Streaming.

The reference's ``parser.add()`` semantics are *incremental
accumulation*: the graph grows monotonically as documents arrive
[PK naruhodo/parser.py]. The Spark analog: a streaming read over the
documents table, ``foreachBatch`` running the batch pipeline on each
micro-batch, and a MERGE-style upsert into the graph tables (Iceberg
MERGE in prod; anti-join+union emulation locally — storage.py).

Node counts / edge weights are additive, so late or re-delivered data
merges commutatively; the only state needed is doc_id dedup, bounded by
a watermark in a real deployment (``dropDuplicatesWithinWatermark``).
Cross-batch subject carryover is unnecessary because documents are atomic
within a batch (SURVEY.md O26); if documents ever spanned batches, the
keyed-state path is ``applyInPandasWithState`` on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from naruhodo_spark import schemas as S
from naruhodo_spark import storage
from naruhodo_spark.operators import agg as O_agg
from naruhodo_spark.operators import canon as O_canon
from naruhodo_spark.operators import link as O_link
from naruhodo_spark.pipeline import extract_document_triples


def incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    prof: dict | None = None,
    aliases: DataFrame | None = None,
    checkpoint: str | None = None,
):
    """Drain all available input files through the pipeline and upsert
    the graph tables once per micro-batch. Returns the finished query.

    availableNow trigger → processes the backlog then stops; swap for
    processingTime in continuous deployments.
    """
    stream = (
        spark.readStream.schema(S.DOCUMENTS_SPANS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.dropDuplicates(["doc_id"])
        stages = extract_document_triples(batch, prof, persist_chunks=False)
        # idempotent per-doc upsert: re-delivered doc_ids replace their rows
        storage.merge_upsert_by_key(
            spark, stages["triples"], "triples_raw", out_dir, keys=["doc_id"]
        )
        t = storage.read_table(spark, "triples_raw", out_dir)
        t = O_link.link_entities(t, aliases)
        if aliases is not None:
            labels = O_canon.alias_cc_labels(aliases)
            t = O_canon.apply_canonical_labels(t, labels)
        storage.write_table(O_agg.aggregate_edges(t), "ksg_edges", out_dir)
        storage.write_table(O_agg.aggregate_nodes(t), "ksg_nodes", out_dir)

    writer = stream.writeStream.foreachBatch(upsert).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q


def stateful_doc_dedup(stream_docs: DataFrame) -> DataFrame:
    """O26 — custom stateful operator: emit each doc_id the FIRST time it
    is seen across micro-batches (re-delivery suppression), via
    ``applyInPandasWithState`` keyed by doc_id. In production the state
    is bounded with a watermark timeout; here NoTimeout keeps the demo
    deterministic."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n_new,))
            return iter(())  # already emitted once
        state.update((n_new,))
        return iter([pd.DataFrame({"doc_id": [key[0]]})])

    return stream_docs.groupBy("doc_id").applyInPandasWithState(
        fn,
        outputStructType="doc_id string",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Harness coverage for watermark + tumbling window aggregation over
    the events table (the reference has no event-time concept — this is
    the engine's streaming-agg surface, SURVEY.md O26)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )
