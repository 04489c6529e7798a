"""googleanalytics_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of the reference ``avibrazil/GoogleAnalytics-ETL`` (an
incremental hit-level GA→SQL ETL tool; see SURVEY.md §0-§1 — the
reference checkout was empty, so all reference behavior is reconstructed
from public knowledge and tagged [REF-UNVERIFIED] in SURVEY.md), plus the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) mandated as the project's north star.

Design rules (SURVEY.md §1.2, §4):

- Everything is a ``pyspark.sql.DataFrame`` with an explicit schema;
  no RDD API anywhere.
- Catalyst does all optimization — operators are declared, not scheduled.
- Python UDFs only where builtins genuinely cannot express the op, and
  then always Arrow-vectorized (``pandas_udf`` / ``applyInPandas``).
- Every operator is registered in :mod:`.registry` with both a DataFrame
  builder and (when SQL-expressible) a DuckDB oracle SQL string, so the
  whole surface is differentially tested.
"""

from .io import TABLES, load, ensure_session_confs
from .materialize import materialize  # installs DataFrame.materialize
from .registry import REGISTRY, register, queries, oracle_sql
from .session import get_spark

__all__ = [
    "TABLES",
    "load",
    "ensure_session_confs",
    "REGISTRY",
    "register",
    "queries",
    "oracle_sql",
    "get_spark",
]

__version__ = "0.1.0"
