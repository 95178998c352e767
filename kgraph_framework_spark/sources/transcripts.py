"""Transcript sources.

The engine's canonical input (BASELINE.json input_hint) is a table of
multi-turn conversation / agent transcripts:

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp)

`turn_idx` is dense 0..n-1 within each conversation — the stable ordering
key. Two providers:

* :func:`synthesize_transcripts` — deterministic, Spark-native generator
  (no Python UDFs, no driver-side data): power-law conversation sizes to
  exercise skew, Zipf-ish tool popularity to create hub vertices. Scales
  linearly with ``n_convs`` because every column is arithmetic on
  ``spark.range`` — this is how bench data at any SF is produced.

* :func:`transcripts_from_events` — canonical mapping from the driver's
  ``events`` test table into the transcript shape. Kept deliberately
  SQL-expressible so the identical derivation runs in DuckDB for the
  correctness oracle (:data:`TRANSCRIPTS_FROM_EVENTS_SQL`); per-turn
  ``text`` equality under stable (conv_id, turn_idx) ordering is the
  row-level invariant the driver checks.

Reference analog: fvecs/ivecs loaders, /root/reference/tests/test_nndescent.cpp:10-27
(fixed implicit schema) — ours is an explicit Spark schema instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "tool", "agent:planner", "agent:executor"]

# Deterministic event_type -> (role, has_tool) mapping used by BOTH the Spark
# derivation and the DuckDB oracle SQL. Any edit here must be mirrored in
# TRANSCRIPTS_FROM_EVENTS_SQL below.
_ROLE_CASE = (
    "CASE event_type "
    "WHEN 'signup' THEN 'user' "
    "WHEN 'view' THEN 'user' "
    "WHEN 'click' THEN 'assistant' "
    "WHEN 'purchase' THEN 'agent:executor' "
    "WHEN 'error' THEN 'tool' "
    "ELSE 'assistant' END"
)
# Tool name: event_type + a 0..6 bucket of floor(value); floor() (not cast)
# because Spark truncates double->int while DuckDB rounds — floor agrees.
_TOOL_CASE = (
    "CASE WHEN event_type IN ('click', 'purchase', 'error') "
    "THEN event_type || '_' || CAST(CAST(floor(value) AS BIGINT) % 7 AS VARCHAR(20)) "
    "ELSE NULL END"
)

# ANSI SQL that runs unchanged in Spark SQL and DuckDB over a view/table
# named `events(event_id, ts, user_id, event_type, value, props)`.
TRANSCRIPTS_FROM_EVENTS_SQL = f"""
SELECT
  'conv' || lpad(CAST(user_id AS VARCHAR(20)), 12, '0')                     AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT)
                                                                        AS turn_idx,
  {_ROLE_CASE}                                                          AS role,
  props                                                                 AS text,
  {_TOOL_CASE}                                                          AS tool,
  ts                                                                    AS ts
FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's events table into the canonical transcript shape."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)


def synthesize_transcripts(
    spark: SparkSession, n_convs: int, seed: int = 42
) -> DataFrame:
    """Deterministic synthetic transcript table, pure Spark arithmetic.

    Conversation sizes are power-law-ish (2..200 turns, cubic transform of a
    uniform hash) so per-conversation work is skewed like real corpora; tool
    ids are quadratic-transformed so low tool ids are hot (hub vertices for
    the shared-tool graph). Deterministic in (n_convs, seed) — NOT wall-clock
    seeded (the reference's unseeded rand() in hot paths is a determinism
    hazard we deliberately avoid, /root/reference/src/index_graph.cpp:94,106).
    """
    # Knuth-style multiplicative hashes -> uniform doubles in [0, 1).
    def uhash(col, salt: int):
        return (
            F.pmod(col * F.lit(2654435761 + salt * 40503) + F.lit(seed * 97), F.lit(1 << 31))
            / F.lit(float(1 << 31))
        )

    convs = spark.range(n_convs).withColumnRenamed("id", "conv_num")
    u_size = uhash(F.col("conv_num"), 1)
    convs = convs.withColumn(
        "n_turns", (F.lit(2) + F.floor(F.lit(198.0) * F.pow(u_size, F.lit(3.0)))).cast("int")
    )
    t = convs.select(
        "conv_num",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    u_tool = uhash(F.col("conv_num") * 131 + F.col("turn_idx"), 2)
    role_ix = F.when(F.col("turn_idx") == 0, F.lit(0)).otherwise(
        F.pmod(F.col("conv_num") * 3 + F.col("turn_idx"), F.lit(len(ROLES)))
    )
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), role_ix.cast("int") + 1)
    tool = F.when(
        role.isin("tool", "agent:executor"),
        F.concat(F.lit("tool_"), F.floor(F.lit(50.0) * F.pow(u_tool, F.lit(2.0))).cast("string")),
    )
    return t.select(
        F.concat(F.lit("conv"), F.lpad(F.col("conv_num").cast("string"), 12, "0")).alias(
            "conv_id"
        ),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("msg "),
            F.col("conv_num").cast("string"),
            F.lit(" "),
            F.col("turn_idx").cast("string"),
            F.lit(" "),
            F.element_at(
                F.array(*[F.lit(w) for w in ("alpha", "beta", "gamma", "delta", "epsilon")]),
                F.pmod(F.col("conv_num") + F.col("turn_idx") * 7, F.lit(5)).cast("int") + 1,
            ),
        ).alias("text"),
        tool.alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("conv_num") * 60 + F.col("turn_idx") * 30).cast("double"))
        ).alias("ts"),
    )
