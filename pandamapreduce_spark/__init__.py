"""pandamapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
PandaMapReduce reference (a C++/CUDA/MPI MapReduce runtime, see
/root/reference), re-expressed Spark-first:

- the MapReduce operator algebra (map / combine / partition / shuffle /
  group / reduce — reference ``src/panda/PandaMapReduceJob.cpp:885-955``)
  as a thin API over DataFrame/RDD ops (``operators.mapreduce``);
- the reference's concrete workloads — wordcount
  (``apps/wordcount/wc_api.cu``), teragen/terasort/teravalidate
  (``apps/terasort/``) — as native Spark jobs (``operators.text``,
  ``operators.tera``);
- a full declarative relational surface (scan/filter/project/agg/
  distinct/sort/join/window/set-ops) that the reference expresses only
  through user callbacks, compiled to DataFrame ops so Catalyst
  optimizes them (``plans``);
- large-scale training-data-pipeline extensions: dedup (exact/minhash-
  LSH/simhash/ngram-jaccard/embedding), similarity search, text
  analysis, multimodal column plumbing (``operators.dedup``,
  ``operators.similarity``, ``operators.text``, ``operators.multimodal``).

Design stance: DataFrame/SQL first (Catalyst + Tungsten pick the
physical plan), Pandas UDFs only where built-ins can't express the
semantics, RDDs only for the imperative MapReduce-callback spine.
"""

from pandamapreduce_spark.session import get_spark
from pandamapreduce_spark.catalog import load_tables, register_views
from pandamapreduce_spark.engine import Dataset, Engine, MapReduceJob

__all__ = ["get_spark", "load_tables", "register_views", "Engine", "Dataset", "MapReduceJob"]

__version__ = "0.1.0"
