"""kgraph_framework_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities (per SURVEY.md, reference: markzxx/kgraph_framework a.k.a.
EFANNA_graph at /root/reference — studied for WHAT it computes, not HOW):

* transcript-table ingestion (conv_id, turn_idx, role, text, tool, ts)
* edge-table derivation: reply chains, shared-tool, agent-handoff
* per-partition CSR adjacency blocks (Arrow arrays)
* Pregel-style iterative analytics: PageRank, connected components
  (hash-min), label propagation, triangle counting
* kNN-graph construction layer (random / LSH init + NN-descent refinement)
  over embedding tables — the reference's native workload
* training-data pipeline ops: dedup (exact/minhash/simhash), similarity
  search, text statistics

Everything is DataFrame/Arrow-first: built-in pyspark.sql.functions where
possible, vectorized pandas/Arrow UDFs for sparse gather-scatter, no
per-row Python in any hot path.
"""

__version__ = "0.1.0"
