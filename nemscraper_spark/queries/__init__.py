"""Driver-facing query registry.

Importing this package registers every query module. ``REGISTRY`` maps
query name → QuerySpec(fn, oracle); ``__spark_entry__.py`` re-exports it
through the driver contract (queries()/oracle_sql()).
"""

from nemscraper_spark.queries.common import REGISTRY, QuerySpec, load_table, register

# import for side effect: each module registers its queries
from nemscraper_spark.queries import relational  # noqa: E402,F401
from nemscraper_spark.queries import joins  # noqa: E402,F401
from nemscraper_spark.queries import aggregates  # noqa: E402,F401
from nemscraper_spark.queries import timeseries  # noqa: E402,F401
from nemscraper_spark.queries import fpp_pipeline  # noqa: E402,F401
from nemscraper_spark.queries import training_data  # noqa: E402,F401
from nemscraper_spark.queries import ingest_ops  # noqa: E402,F401
from nemscraper_spark.queries import extended_ops  # noqa: E402,F401
from nemscraper_spark.queries import corpus_ops  # noqa: E402,F401
from nemscraper_spark.queries import streaming_ops  # noqa: E402,F401
from nemscraper_spark.queries import clustering  # noqa: E402,F401
from nemscraper_spark.queries import cdc_ops  # noqa: E402,F401
from nemscraper_spark.queries import layout_ops  # noqa: E402,F401
from nemscraper_spark.queries import dashboard_sql  # noqa: E402,F401
from nemscraper_spark.queries import corpus_health  # noqa: E402,F401
from nemscraper_spark.queries import ann_twins  # noqa: E402,F401
from nemscraper_spark.queries import corpus_extra  # noqa: E402,F401
from nemscraper_spark.queries import graph_ops  # noqa: E402,F401
from nemscraper_spark.queries import tpch_extra  # noqa: E402,F401
from nemscraper_spark.queries import corpus_graph  # noqa: E402,F401
from nemscraper_spark.queries import spark4_ops  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "load_table", "register"]
