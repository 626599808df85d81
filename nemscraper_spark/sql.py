"""Interactive-SQL surface (SURVEY.md §3.3).

The reference's dashboards speak raw SQL to DuckDB over the parquet
tree (`grafana/provisioning/datasources/duckdb_datasources.yaml:1-10`,
`grafana/dashboards/fpp.json:129-1068`). The Spark equivalent is
`spark.sql(...)` over registered views — this module is that entry
point for a user migrating their dashboard queries: register every
table once, then run the same SQL minus dialect differences
(`read_parquet('…')` → view name, `time_bucket` → `date_trunc`/
`window`, `FILTER (WHERE …)` → `CASE WHEN` inside the aggregate).

For a persistent metastore (Thrift server / multiple sessions), use
`catalog_external_table`'s `saveAsTable` path instead — temp views are
session-scoped by design, matching the per-dashboard-connection model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nemscraper_spark.queries.common import TABLES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, suffix: str = ""
) -> list[str]:
    """Register every testdata table as a session temp view
    (``region``, ``nation``, … or ``region<suffix>`` …). Returns the
    view names. Views are lazy — no scan happens until a query runs,
    and Catalyst pushes each query's filters/projections into the
    underlying parquet scan exactly as the DataFrame API would.
    """
    names = []
    for t in TABLES:
        name = f"{t}{suffix}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


# register_views is idempotent but createOrReplaceTempView CLOBBERS any
# same-named view the session already holds (e.g. a user's own `events`
# view). sql() therefore registers each (session, sf_dir) combination
# only once — callers who need isolation pass suffix to register_views
# and qualify their SQL accordingly.
_REGISTERED: dict[int, str] = {}


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call convenience: register the views (once per session, and
    again whenever sf_dir changes so the unsuffixed names always point
    at the sf_dir of the MOST RECENT call — see note above), run the
    SQL."""
    # the tableExists probe guards against id() reuse after a session
    # is garbage-collected: a stale memo hit on a FRESH session would
    # otherwise skip registration and fail with "table not found"
    if _REGISTERED.get(id(spark)) != sf_dir or not spark.catalog.tableExists(
        TABLES[0]
    ):
        register_views(spark, sf_dir)
        _REGISTERED[id(spark)] = sf_dir
    return spark.sql(query)
