"""Named query catalog.

Importing this package registers every query module with the registry;
``all_queries()`` / ``all_oracles()`` are what ``__spark_entry__.py``
exposes to the driver harness.
"""

from etl_notifier_pipeline_spark.plans.registry import (
    QuerySpec,
    all_oracles,
    all_queries,
    get,
    register,
    specs,
)

# Import for registration side effects — order defines catalog order.
from etl_notifier_pipeline_spark.plans import relational  # noqa: E402,F401
from etl_notifier_pipeline_spark.plans import tpch_extra  # noqa: E402,F401
from etl_notifier_pipeline_spark.plans import tpch_extra2  # noqa: E402,F401
from etl_notifier_pipeline_spark.plans import control  # noqa: E402,F401
from etl_notifier_pipeline_spark.plans import ext_text  # noqa: E402,F401
from etl_notifier_pipeline_spark.plans import ext_dedup  # noqa: E402,F401
from etl_notifier_pipeline_spark.plans import ext_sim  # noqa: E402,F401
from etl_notifier_pipeline_spark.plans import streaming_queries  # noqa: E402,F401
from etl_notifier_pipeline_spark.plans import advanced  # noqa: E402,F401

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "get",
    "register",
    "specs",
]
