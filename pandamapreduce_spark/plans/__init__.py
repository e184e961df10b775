"""Query plans: the engine's declared query surface.

``registry`` holds every named query as a (Spark builder, DuckDB oracle
SQL) pair; ``__spark_entry__.py`` and the test suite both consume it.
"""

from pandamapreduce_spark.plans.registry import REGISTRY, Query, query

# Import for side effect: module import registers its queries.
from pandamapreduce_spark.plans import relational  # noqa: E402,F401
from pandamapreduce_spark.plans import text  # noqa: E402,F401
from pandamapreduce_spark.plans import dedup  # noqa: E402,F401
from pandamapreduce_spark.plans import similarity  # noqa: E402,F401
from pandamapreduce_spark.plans import mapreduce  # noqa: E402,F401
from pandamapreduce_spark.plans import streaming_plans  # noqa: E402,F401
from pandamapreduce_spark.plans import multimodal  # noqa: E402,F401
from pandamapreduce_spark.plans import advanced  # noqa: E402,F401
from pandamapreduce_spark.plans import ml  # noqa: E402,F401
from pandamapreduce_spark.plans import pipeline  # noqa: E402,F401
from pandamapreduce_spark.plans import sketches  # noqa: E402,F401
from pandamapreduce_spark.plans import sql_surface  # noqa: E402,F401
from pandamapreduce_spark.plans import training  # noqa: E402,F401
from pandamapreduce_spark.plans import reshape  # noqa: E402,F401
from pandamapreduce_spark.plans import warehouse  # noqa: E402,F401
from pandamapreduce_spark.plans import maintenance  # noqa: E402,F401

# Cross-module composed oracles, installed once every lane is registered.
REGISTRY["q171_ann_recall"].oracle = similarity._recall_oracle()
REGISTRY["q172_entity_resolution"].oracle = similarity._entity_oracle()
REGISTRY["q183_semdedup"].oracle = similarity._semdedup_oracle()
REGISTRY["q203_semdedup_bucketed"].oracle = similarity._semdedup_oracle(
    similarity._semdedup_bucketed_mutual_sql()
)
REGISTRY["q193_phash_neardup"].oracle = multimodal._phash_oracle()
# q205/q207 are q199's/q198's streaming twins: the BATCH oracle
# verbatim — parity of the stream against the batch semantics IS the
# lane's claim.
REGISTRY["q205_stream_abandonment"].oracle = REGISTRY["q199_abandonment"].oracle
REGISTRY["q207_stream_ship_sla"].oracle = REGISTRY["q198_ship_sla"].oracle

__all__ = ["REGISTRY", "Query", "query"]
