"""Table source adapter: Iceberg catalogs with a parquet-path fallback.

Deployment target is Iceberg transcript tables (BASELINE.json north_rule
/ input_hint); this sandbox ships no Iceberg runtime jars, so the adapter
resolves table identifiers through the configured catalog when one exists
and falls back to parquet directories otherwise. All engine code reads
through :func:`read_table`, so switching the fleet to Iceberg is a
configuration change, not a code change.

What Iceberg adds at 10^12 rows (and why the code is already shaped for
it): snapshot-isolated incremental appends (the streaming ingest's
delta-append pattern maps to Iceberg appends), partition pruning on
(conv bucket, ts day) partition specs, and metadata-only row counts. The
lineage manifest (plans/pregel.py) records the input snapshot id per
superstep when one is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def has_iceberg(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    """True when an Iceberg catalog implementation is configured."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return impl is not None and "iceberg" in str(impl).lower()


def read_table(spark: SparkSession, ident_or_path: str) -> DataFrame:
    """Read a table by Iceberg identifier (``db.table``) or parquet path.

    Paths (anything containing '/') read as parquet; identifiers resolve
    through the session catalog (Iceberg when configured, else the
    built-in catalog).
    """
    if "/" in ident_or_path:
        return spark.read.parquet(ident_or_path)
    return spark.read.table(ident_or_path)


def snapshot_id(spark: SparkSession, ident_or_path: str) -> str | None:
    """Current Iceberg snapshot id for lineage records; None for parquet."""
    if "/" in ident_or_path:
        return None
    try:
        row = (
            spark.sql(f"SELECT snapshot_id FROM {ident_or_path}.snapshots "
                      "ORDER BY committed_at DESC LIMIT 1")
            .first()
        )
        return str(row[0]) if row else None
    except Exception:
        return None


def write_edges(
    edges: DataFrame,
    ident_or_path: str,
    mode: str = "append",
) -> None:
    """Edge-table sink: Iceberg writeTo for identifiers, parquet for paths.

    Reference analog: the adjacency Save path
    (/root/reference/src/index_graph.cpp:401-410).
    """
    if "/" in ident_or_path:
        edges.write.mode(mode).parquet(ident_or_path)
    elif mode == "append":
        edges.writeTo(ident_or_path).append()
    else:
        edges.writeTo(ident_or_path).createOrReplace()
