"""Incremental knowledge-graph population.

The reference's KG stage runs inside PostIngestQueue — entities are
extracted and the kg_* tables updated *as documents arrive*
(``reference src/daemon/components/PostIngestQueue.cpp:2440-2720``).
The Structured-Streaming recast rests on one structural fact: every KG
table is a pure keyed aggregation of the mentions table
(operators/kg.py), so the stream only has to accumulate mentions
idempotently —

    docs stream → foreachBatch:
        extract_doc_entities(batch)     (one Arrow pass, narrow)
        append mentions, partitioned by batch_id
        (dynamic partition overwrite → at-least-once replay rewrites its
         own partition, same idempotency contract as incremental_er)

— and the derived tables (kg_nodes / kg_aliases / kg_edges /
kg_node_stats / co-mention edges) rebuild on demand from the
accumulated store with the SAME builders the batch path uses:
``kg_tables_from_store``. Equivalence: after the stream drains, every
derived table equals batch ``populate_kg`` over the union corpus
(property-tested) — because groupBy over a union is groupBy over the
parts.

At 100 TB the mentions store is the only growing state; it partitions
by batch_id for replay and the derived aggregations are ordinary keyed
shuffles. Node-level merges could update nodes/aliases incrementally
(counts add), but pagerank in kg_node_stats is global — the reference
likewise recomputes graph stats in a repair pass, so the rebuild-on-
demand contract matches it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yams_spark.operators.kg import (
    build_co_mention_edges,
    build_kg_aliases,
    build_kg_edges,
    build_kg_nodes,
    extract_doc_entities,
    kg_node_stats,
)

DOCS_SCHEMA = "doc_id long, text string"


def start_incremental_kg(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = True,
):
    """Stream doc parquet files; accumulate the mentions table
    (``kg_doc_entities.parquet`` partitioned by batch_id). Returns the
    StreamingQuery."""
    mentions_path = os.path.join(store_dir, "kg_doc_entities.parquet")

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        ents = extract_doc_entities(batch_df, id_col, text_col)
        (
            ents.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(mentions_path)
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kg_tables_from_store(
    spark: SparkSession,
    store_dir: str,
    pagerank_iters: int = 20,
    doc_embeddings: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Derive the full kg_* table set from the accumulated mentions store
    — the same builders as batch ``populate_kg``, so stream-then-derive
    equals batch on the union corpus. Also exposes the co-mention
    relation edges the graph-expansion components consume."""
    ents = spark.read.parquet(
        os.path.join(store_dir, "kg_doc_entities.parquet")
    ).drop("batch_id")
    edges = build_kg_edges(ents)
    out = {
        "kg_doc_entities": ents,
        "kg_nodes": build_kg_nodes(ents),
        "kg_aliases": build_kg_aliases(ents),
        "kg_edges": edges,
        "kg_co_mention_edges": build_co_mention_edges(ents),
        "kg_node_stats": kg_node_stats(edges, pagerank_iters=pagerank_iters),
    }
    if doc_embeddings is not None:
        from yams_spark.operators.kg import build_kg_node_embeddings

        out["kg_node_embeddings"] = build_kg_node_embeddings(ents, doc_embeddings)
    return out
