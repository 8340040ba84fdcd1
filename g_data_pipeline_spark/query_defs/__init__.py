"""Query definition modules — importing this package registers every query
into g_data_pipeline_spark.queries.REGISTRY."""

from g_data_pipeline_spark.query_defs import analytics  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics2  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics3  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics4  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics5  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics6  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics7  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics8  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics9  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics10  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics11  # noqa: F401
from g_data_pipeline_spark.query_defs import analytics12  # noqa: F401
from g_data_pipeline_spark.query_defs import curation  # noqa: F401
from g_data_pipeline_spark.query_defs import curation2  # noqa: F401
from g_data_pipeline_spark.query_defs import curation3  # noqa: F401
from g_data_pipeline_spark.query_defs import curation4  # noqa: F401
from g_data_pipeline_spark.query_defs import curation5  # noqa: F401
from g_data_pipeline_spark.query_defs import curation6  # noqa: F401
from g_data_pipeline_spark.query_defs import curation7  # noqa: F401
from g_data_pipeline_spark.query_defs import dedup  # noqa: F401
from g_data_pipeline_spark.query_defs import dedup2  # noqa: F401
from g_data_pipeline_spark.query_defs import events  # noqa: F401
from g_data_pipeline_spark.query_defs import events2  # noqa: F401
from g_data_pipeline_spark.query_defs import events3  # noqa: F401
from g_data_pipeline_spark.query_defs import grouped_gate  # noqa: F401
from g_data_pipeline_spark.query_defs import lakehouse  # noqa: F401
from g_data_pipeline_spark.query_defs import multimodal  # noqa: F401
from g_data_pipeline_spark.query_defs import profile_scale  # noqa: F401
from g_data_pipeline_spark.query_defs import reference_surface  # noqa: F401
from g_data_pipeline_spark.query_defs import sketches  # noqa: F401
from g_data_pipeline_spark.query_defs import similarity  # noqa: F401
from g_data_pipeline_spark.query_defs import text  # noqa: F401
from g_data_pipeline_spark.query_defs import text2  # noqa: F401
from g_data_pipeline_spark.query_defs import text3  # noqa: F401
from g_data_pipeline_spark.query_defs import text4  # noqa: F401
