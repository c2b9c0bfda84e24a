from vector_spark.operators.aggregate import aggregate_metrics, tumbling_agg  # noqa: F401
from vector_spark.operators.cardinality import tag_cardinality_limit  # noqa: F401
from vector_spark.operators.dedupe import dedupe  # noqa: F401
from vector_spark.operators.enrich import enrich_between, enrich_lookup  # noqa: F401
from vector_spark.operators.filter import filter_events  # noqa: F401
from vector_spark.operators.line_agg import line_agg  # noqa: F401
from vector_spark.operators.log_to_metric import log_to_metric, metric_to_log  # noqa: F401
from vector_spark.operators.reduce import reduce_groups, reduce_sessions  # noqa: F401
from vector_spark.operators.remap import Remap, remap  # noqa: F401
from vector_spark.operators.route import route  # noqa: F401
from vector_spark.operators.sample import sample  # noqa: F401
from vector_spark.operators.throttle import throttle  # noqa: F401
from vector_spark.operators.dedupe import dedupe_lru_replay  # noqa: F401
from vector_spark.operators.skew import salted_agg, salted_repartition  # noqa: F401
from vector_spark.operators.udf import map_batches, map_groups  # noqa: F401
