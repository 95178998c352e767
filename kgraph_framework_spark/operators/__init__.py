from kgraph_framework_spark.operators.edges import (
    TURN_STRIDE,
    handoff_edges,
    reply_edges,
    tool_edges,
    union_graph,
)

__all__ = [
    "TURN_STRIDE",
    "reply_edges",
    "tool_edges",
    "handoff_edges",
    "union_graph",
]
