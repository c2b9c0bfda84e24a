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
