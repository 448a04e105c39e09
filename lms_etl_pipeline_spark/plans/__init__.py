"""Named analytical plans: the ``queries()`` / ``oracle_sql()`` catalog.

Importing this package registers every query module into the catalog.
"""

from lms_etl_pipeline_spark.plans.catalog import all_oracles, all_queries, query

# Import for registration side effects.
from lms_etl_pipeline_spark.plans import relational  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import relational_joins  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import relational_deep  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import scalar  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import windows  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import streaming  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import llm  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import llm_similarity  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import etl  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import multimodal  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import curation  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import tokenizer  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import classifier_train  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import corpus_ml  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import corpus_ml_eval  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import training_mix  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import profiling  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import profiling_distributions  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import profiling_quality  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import behavior  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import behavior_outcomes  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import governance  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import timeseries  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import graph_retrieval  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import similarity_calibration  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import stats_eval  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import business_analytics  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import order_stats  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import data_selection  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import pq  # noqa: E402,F401
from lms_etl_pipeline_spark.plans import diversity  # noqa: E402,F401

__all__ = ["query", "all_queries", "all_oracles"]
