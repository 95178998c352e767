"""Streaming transcript ingestion → incremental edge table.

The reference's only incremental operation is batch graph append
(GraphAdd, /root/reference/src/index_graph.cpp:443-480, SURVEY.md §2.10);
our transcript pipeline generalizes it to Structured Streaming:

* reply edges are STATELESS: the edge (vid-1 → vid) is derived from the
  turn row alone (turn_idx density invariant), so each micro-batch emits
  exactly its own turns' edges — no cross-batch state, no dupes.
* tool edges are weight-ADDITIVE: per-batch (conv, tool) counts sum to
  the global counts, so batches append deltas and readers aggregate
  (``edges_view``).
* handoff edges are STATEFUL: a role transition can straddle a
  micro-batch boundary, so the stream keeps the last (turn_idx, role)
  per conversation in ``applyInPandasWithState`` and emits transitions
  exactly once.

Checkpointing + append sinks make ingestion resumable (kill → restart
continues from the last committed batch), matching the engine's batch
resume story.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kgraph_framework_spark.operators.edges import (
    reply_edges,
    role_code_col,
    tool_edges,
)
from kgraph_framework_spark.sources.transcripts import ROLES  # noqa: F401  (schema doc)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz"
)

HANDOFF_STATE_SCHEMA = "last_turn int, last_role string"
HANDOFF_OUT_SCHEMA = (
    "conv_id string, turn_idx int, prev_role string, role string"
)


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )


def handoff_transitions_stateful(stream: DataFrame) -> DataFrame:
    """Exactly-once role transitions across micro-batch boundaries.

    Keyed by conv_id; state = (last_turn, last_role). Each batch sorts
    its turns, emits every adjacent transition including the one that
    bridges the stored state, then stores the newest turn. Turn-ordering
    within a conversation is the input invariant (dense turn_idx).
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("turn_idx", kind="mergesort")
        if state.exists:
            last_turn, last_role = state.get
        else:
            last_turn, last_role = -1, None
        out = []
        for turn_idx, role in zip(rows["turn_idx"], rows["role"]):
            if last_role is not None and role != last_role:
                out.append((conv_id, int(turn_idx), last_role, role))
            last_turn, last_role = int(turn_idx), role
        state.update((last_turn, last_role))
        yield pd.DataFrame(
            out, columns=["conv_id", "turn_idx", "prev_role", "role"]
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=HANDOFF_OUT_SCHEMA,
        stateStructType=HANDOFF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transitions_to_edges(transitions: DataFrame) -> DataFrame:
    """Aggregate role transitions into weighted handoff edge deltas."""
    return (
        transitions.where(F.col("prev_role") != F.col("role"))
        .groupBy("prev_role", "role")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            (-(role_code_col(F.col("prev_role")) * 4 + 1)).alias("src_vertex"),
            (-(role_code_col(F.col("role")) * 4 + 1)).alias("dst_vertex"),
            F.col("cnt").cast("double").alias("weight"),
            F.lit("handoff").alias("edge_type"),
        )
    )


def ingest_edges(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
):
    """Run the streaming ingestion: transcripts dir → edge-delta sink.

    foreachBatch derives the stateless reply/tool edges per micro-batch
    and appends them; the stateful handoff stream runs as its own query
    into the same sink. ``availableNow`` processes the current backlog
    then stops — the cron/foreachBatch flavor of streaming; a real
    deployment drops the trigger for continuous ingestion.
    """
    stream = stream_transcripts(spark, input_dir)

    def emit_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = reply_edges(batch_df).unionByName(tool_edges(batch_df))
        out.write.mode("append").parquet(f"{output_dir}/stateless")

    q1 = (
        stream.writeStream.foreachBatch(emit_batch)
        .option("checkpointLocation", f"{checkpoint_dir}/stateless")
        .trigger(availableNow=True)
        .start()
    )
    # raw transitions append-only (a streaming agg after stateful map
    # would need update mode); the reader aggregates them
    q2 = (
        handoff_transitions_stateful(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{output_dir}/transitions")
        .option("checkpointLocation", f"{checkpoint_dir}/handoff")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q1.awaitTermination()
        q2.awaitTermination()
    return q1, q2


def edges_view(spark: SparkSession, output_dir: str) -> DataFrame:
    """Reader-side merge of appended deltas (weights are additive)."""
    stateless = (
        spark.read.parquet(f"{output_dir}/stateless")
        .groupBy("src_vertex", "dst_vertex", "edge_type")
        .agg(F.sum("weight").alias("weight"))
    )
    handoff = transitions_to_edges(
        spark.read.parquet(f"{output_dir}/transitions")
    ).select("src_vertex", "dst_vertex", "edge_type", "weight")
    return stateless.unionByName(handoff).select(
        "src_vertex", "dst_vertex", "weight", "edge_type"
    )
