"""blueetl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of BlueBrain/blueetl.

Built Spark-first: the reference (a pandas ETL framework, see SURVEY.md)
defines *what* is computed — a windowed event-extraction pipeline, a filter
DSL (``etl.q``), grouped user-defined features, and a checksum-based cache —
while this package re-expresses each piece with the Spark DataFrame API so
Catalyst/Tungsten choose the physical plan.

Public surface:

- :mod:`blueetl_spark.functions.qdsl` — the ``q`` filter-DSL compiler
  (dict/list-of-dict → ``pyspark.sql.Column``) and ``is_subfilter``.
- :mod:`blueetl_spark.operators.windows` — time-window materialization and
  event slicing (interval join).
- :mod:`blueetl_spark.operators.extraction` — the simulations → neurons →
  neuron_classes → windows → report extraction DAG.
- :mod:`blueetl_spark.operators.features` — grouped feature engine
  (Spark-native aggs + ``applyInPandas`` fallback) and the built-in feature
  library (firing rates, histograms, ISI/CV, PSTH, latency...).
- :mod:`blueetl_spark.operators.dedup` / ``similarity`` / ``text`` /
  ``multimodal`` — large-scale training-data pipeline operators.
- :mod:`blueetl_spark.plans.cache` — checksum + subfilter parquet cache.
"""

__version__ = "0.1.0"

from blueetl_spark.functions.qdsl import (  # noqa: E402
    compile_query,
    is_subfilter,
    q,
)
from blueetl_spark.session import get_spark  # noqa: E402

__all__ = ["compile_query", "get_spark", "is_subfilter", "q", "__version__"]
