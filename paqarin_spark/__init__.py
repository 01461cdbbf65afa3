"""paqarin_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of alan-turing-institute/paqarin
(synthetic time-series generation + evaluation), re-expressed
Spark-first, plus the LLM-data-pipeline operator family (dedup,
similarity search, multimodal columns, text analysis).

See SURVEY.md for the blueprint and reference citations.
"""

from paqarin_spark.schema import (
    EVENTS_SCHEMA,
    SURROGATE_ITEM_ID,
    TimeSeriesSchema,
    freq_to_spark,
    strftime_to_java,
)
from paqarin_spark.session import configure_for_determinism, get_session

__version__ = "0.1.0"

__all__ = [
    "EVENTS_SCHEMA",
    "SURROGATE_ITEM_ID",
    "TimeSeriesSchema",
    "freq_to_spark",
    "strftime_to_java",
    "configure_for_determinism",
    "get_session",
    "__version__",
]
