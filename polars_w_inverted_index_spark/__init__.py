"""PySpark-native analytics engine with inverted-index query capabilities.

A from-scratch Spark-first reimplementation of the query/data-processing
surface of savannahar68/polars-w-inverted-index (see SURVEY.md), extended
with LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.
"""

from .engine import Engine, FieldValueResult, NumericStats
from .pipelines import CorpusConfig, prepare_training_corpus
from .report import corpus_report
from .session import get_session
from .stats import QueryStats

__all__ = [
    "CorpusConfig",
    "Engine",
    "FieldValueResult",
    "NumericStats",
    "QueryStats",
    "corpus_report",
    "get_session",
    "prepare_training_corpus",
]
