"""flight_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference repo ``Jfor12/flight-data-pipeline`` (a
carbon-intensity telemetry ETL pipeline; see SURVEY.md), extended with
the operators a large-scale (100 TB-class) training-data pipeline
needs: deduplication, similarity search, multimodal column handling,
and text analysis.

Design stance (SURVEY.md §7.1):

- DataFrame/SQL declarative plans everywhere; Catalyst + Tungsten pick
  the physical strategy. No RDDs.
- Zero row-at-a-time Python UDFs in hot paths; Arrow-batched pandas
  UDFs only where built-ins genuinely can't express the semantics
  (embedding math, minhash).
- Every public operator ships with a DuckDB-checkable SQL twin where
  SQL can express it (see ``plans.registry``).
"""

__version__ = "0.1.0"

from flight_data_pipeline_spark.session import get_spark  # noqa: F401
from flight_data_pipeline_spark.tables import load_table, register_tables  # noqa: F401
