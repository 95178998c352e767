"""DuckDB oracle-SQL builders for the graph query layer.

Every query the engine exposes in ``__spark_entry__.queries()`` has an
ANSI-SQL twin here that DuckDB executes over the same parquet tables
(views ``events``, ``documents``, ``embeddings`` are pre-registered by the
verification driver). The iterative algorithms (PageRank, hash-min CC,
label propagation) are not SQL-expressible as loops, so for a FIXED
superstep count k the loop is **unrolled into k chained CTEs** — the SQL
is generated programmatically and implements the exact same update rule as
the DataFrame supersteps in ``plans/``.

Float-output discipline: double sums accumulate in engine-dependent order,
so every floating column the comparator hashes is rounded at a precision
~1e9x coarser than the accumulated error (PageRank scores are additionally
scaled by N so rounding is at fixed RELATIVE precision). Integer-weighted
sums (edge counts) are exact in double and need no rounding.

Reference analog for the "oracle twin" methodology: the reference builds
brute-force ground truth offline and asserts recall against it
(/root/reference/tests/bruteforce.cpp:67-91,
/root/reference/src/index_graph.cpp:209-229).
"""

from __future__ import annotations

from kgraph_framework_spark.sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

ROLE_CASE_SQL = (
    "CASE {col} WHEN 'user' THEN 1 WHEN 'assistant' THEN 2 WHEN 'tool' THEN 3 "
    "WHEN 'agent:planner' THEN 4 WHEN 'agent:executor' THEN 5 ELSE 6 END"
)

# --- shared CTE prefix: events -> transcripts -> the three edge derivations
# (must stay semantically identical to operators/edges.py) ---
GRAPH_CTES = f"""
transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
reply_edges AS (
  SELECT (conv_num * 1048576 + turn_idx - 1) AS src_vertex,
         (conv_num * 1048576 + turn_idx)     AS dst_vertex,
         CAST(1.0 AS DOUBLE) AS weight, 'reply' AS edge_type
  FROM (SELECT CAST(substr(conv_id, 5) AS BIGINT) AS conv_num, turn_idx
        FROM transcripts WHERE turn_idx > 0)
),
tool_usage AS (
  SELECT CAST(substr(conv_id, 5) AS BIGINT) AS conv_num, tool, COUNT(*) AS cnt
  FROM transcripts WHERE tool IS NOT NULL GROUP BY 1, 2
),
tool_edges AS (
  SELECT -(conv_num * 4 + 2) AS src_vertex,
         -((('0x' || substr(md5(tool), 1, 15))::BIGINT) * 4 + 3) AS dst_vertex,
         CAST(cnt AS DOUBLE) AS weight, 'tool' AS edge_type
  FROM tool_usage
),
handoff_seq AS (
  SELECT role, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM transcripts
),
handoff_edges AS (
  SELECT -(({ROLE_CASE_SQL.format(col='prev_role')}) * 4 + 1) AS src_vertex,
         -(({ROLE_CASE_SQL.format(col='role')}) * 4 + 1)      AS dst_vertex,
         CAST(COUNT(*) AS DOUBLE) AS weight, 'handoff' AS edge_type
  FROM handoff_seq
  WHERE prev_role IS NOT NULL AND prev_role <> role
  GROUP BY 1, 2
),
union_edges AS (
  SELECT * FROM reply_edges
  UNION ALL SELECT * FROM tool_edges
  UNION ALL SELECT * FROM handoff_edges
)"""


def transcripts_sql() -> str:
    """Transcript derivation with the timestamp as exact epoch-micros."""
    return (
        f"WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}) "
        "SELECT conv_id, turn_idx, role, text, tool, "
        "CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM transcripts"
    )


def edges_sql(which: str) -> str:
    assert which in {"reply_edges", "tool_edges", "handoff_edges", "union_edges"}
    return f"WITH {GRAPH_CTES} SELECT src_vertex, dst_vertex, weight, edge_type FROM {which}"


def degrees_sql() -> str:
    return f"""WITH {GRAPH_CTES},
verts AS (SELECT DISTINCT vertex FROM (
  SELECT src_vertex AS vertex FROM union_edges
  UNION ALL SELECT dst_vertex FROM union_edges) t),
outd AS (SELECT src_vertex AS vertex, COUNT(*) AS cnt, SUM(weight) AS w
         FROM union_edges GROUP BY 1),
ind  AS (SELECT dst_vertex AS vertex, COUNT(*) AS cnt, SUM(weight) AS w
         FROM union_edges GROUP BY 1)
SELECT v.vertex,
       CAST(COALESCE(o.cnt, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(i.cnt, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(o.w, 0.0) AS DOUBLE) AS out_w,
       CAST(COALESCE(i.w, 0.0) AS DOUBLE) AS in_w
FROM verts v LEFT JOIN outd o ON v.vertex = o.vertex
             LEFT JOIN ind  i ON v.vertex = i.vertex"""


def pagerank_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank; output score scaled by N, round 6."""
    parts = [f"""WITH {GRAPH_CTES},
e AS (SELECT src_vertex AS s, dst_vertex AS d, weight AS w FROM union_edges),
wsum AS (SELECT s, SUM(w) AS ws FROM e GROUP BY s),
en AS (SELECT e.s, e.d, e.w / ws.ws AS wn FROM e JOIN wsum ws ON e.s = ws.s),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM e UNION ALL SELECT d FROM e) t),
nv AS (SELECT COUNT(*) AS n FROM verts),
r0 AS (SELECT v, 1.0 / nv.n AS score FROM verts CROSS JOIN nv)"""]
    for k in range(iters):
        parts.append(f""",
d{k} AS (SELECT COALESCE(SUM(score), 0.0) AS dm FROM r{k}
         WHERE v NOT IN (SELECT s FROM wsum)),
c{k} AS (SELECT en.d AS v, SUM(r.score * en.wn) AS contrib
         FROM en JOIN r{k} r ON en.s = r.v GROUP BY en.d),
r{k + 1} AS (SELECT verts.v,
         {1.0 - damping} / nv.n
         + {damping} * (COALESCE(c.contrib, 0.0) + d{k}.dm / nv.n) AS score
       FROM verts CROSS JOIN nv CROSS JOIN d{k} LEFT JOIN c{k} c ON verts.v = c.v)""")
    # Mean-normalized score quantized to parts-per-million as an exact
    # BIGINT: floor(x*1e6+0.5) of a double is deterministic, so the value
    # hash cannot be perturbed by engine-specific round() implementations.
    parts.append(
        f"\nSELECT v AS vertex,"
        f" CAST(floor(score * nv.n * 1000000 + 0.5) AS BIGINT) AS score_ppm"
        f" FROM r{iters} CROSS JOIN nv"
    )
    return "".join(parts)


def cc_sql(rounds: int = 4) -> str:
    """Unrolled synchronous hash-min label exchange on the symmetrized graph."""
    parts = [f"""WITH {GRAPH_CTES},
ue AS (SELECT DISTINCT s, d FROM (
  SELECT src_vertex AS s, dst_vertex AS d FROM union_edges
  UNION ALL SELECT dst_vertex, src_vertex FROM union_edges) t),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM ue UNION ALL SELECT d FROM ue) t),
l0 AS (SELECT v, v AS label FROM verts)"""]
    for k in range(rounds):
        parts.append(f""",
m{k} AS (SELECT ue.d AS v, MIN(l.label) AS ml FROM ue JOIN l{k} l ON ue.s = l.v GROUP BY ue.d),
l{k + 1} AS (SELECT l.v, LEAST(l.label, COALESCE(m.ml, l.label)) AS label
       FROM l{k} l LEFT JOIN m{k} m ON l.v = m.v)""")
    parts.append(f"\nSELECT v AS vertex, label FROM l{rounds}")
    return "".join(parts)


def labelprop_sql(rounds: int = 2) -> str:
    """Unrolled synchronous weighted label propagation (ties -> min label)."""
    parts = [f"""WITH {GRAPH_CTES},
se AS (SELECT src_vertex AS s, dst_vertex AS d, weight AS w FROM union_edges
       UNION ALL SELECT dst_vertex, src_vertex, weight FROM union_edges),
verts AS (SELECT DISTINCT v FROM (SELECT s AS v FROM se UNION ALL SELECT d FROM se) t),
l0 AS (SELECT v, v AS label FROM verts)"""]
    for k in range(rounds):
        parts.append(f""",
v{k} AS (SELECT se.d AS v, l.label, SUM(se.w) AS wv
         FROM se JOIN l{k} l ON se.s = l.v GROUP BY 1, 2),
b{k} AS (SELECT v, label FROM (
           SELECT v, label,
                  row_number() OVER (PARTITION BY v ORDER BY wv DESC, label ASC) AS rn
           FROM v{k}) t WHERE rn = 1),
l{k + 1} AS (SELECT l.v, COALESCE(b.label, l.label) AS label
       FROM l{k} l LEFT JOIN b{k} b ON l.v = b.v)""")
    parts.append(f"\nSELECT v AS vertex, label FROM l{rounds}")
    return "".join(parts)


def tool_cousage_sql() -> str:
    """tool-tool co-usage edges (u < v, weight = #conversations sharing)."""
    return f"""WITH {GRAPH_CTES},
usage2 AS (SELECT DISTINCT conv_num,
           -((('0x' || substr(md5(tool), 1, 15))::BIGINT) * 4 + 3) AS tid
           FROM tool_usage)
SELECT a.tid AS src_vertex, b.tid AS dst_vertex,
       CAST(COUNT(*) AS DOUBLE) AS weight
FROM usage2 a JOIN usage2 b
  ON a.conv_num = b.conv_num AND a.tid < b.tid
GROUP BY 1, 2"""


def triangles_sql() -> str:
    """Per-vertex triangle counts on the tool co-usage graph.

    The oracle orients edges by id (u < v); triangle counts are
    orientation-invariant, so this matches the engine's degree-oriented
    plan (plans/triangles.py) exactly.
    """
    return f"""WITH {GRAPH_CTES},
usage2 AS (SELECT DISTINCT conv_num,
           -((('0x' || substr(md5(tool), 1, 15))::BIGINT) * 4 + 3) AS tid
           FROM tool_usage),
copairs AS (SELECT DISTINCT a.tid AS u, b.tid AS v
            FROM usage2 a JOIN usage2 b
              ON a.conv_num = b.conv_num AND a.tid < b.tid),
tri AS (SELECT p1.u AS a, p1.v AS b, p2.v AS c
        FROM copairs p1
        JOIN copairs p2 ON p1.v = p2.u
        JOIN copairs p3 ON p3.u = p1.u AND p3.v = p2.v)
SELECT vertex, CAST(COUNT(*) AS BIGINT) AS triangles
FROM (SELECT a AS vertex FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri) t
GROUP BY vertex"""
