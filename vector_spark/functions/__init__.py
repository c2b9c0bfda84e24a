from vector_spark.functions.grok import (  # noqa: F401
    GROK_PATTERNS,
    grok_extract_native,
    grok_extract_pandas,
    grok_to_regex,
)
from vector_spark.functions.hashes import (  # noqa: F401
    consistent_keyed_hash,
    consistent_keyed_hash_sql,
    hex_prefix_to_long,
)
from vector_spark.functions.parse import (  # noqa: F401
    parse_json_col,
    parse_key_value,
    parse_regex,
)
from vector_spark.functions.presets import (  # noqa: F401
    parse_apache_log,
    parse_aws_alb_log,
    parse_aws_vpc_flow_log,
    parse_cef,
    parse_common_log,
    parse_glog,
    parse_klog,
    parse_linux_authorization,
    parse_logfmt,
    parse_nginx_log,
    parse_syslog,
)
from vector_spark.functions.vrl_map import VRL, coverage_summary  # noqa: F401
