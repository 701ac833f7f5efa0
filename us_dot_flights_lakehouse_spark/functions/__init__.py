from us_dot_flights_lakehouse_spark.functions.text import (  # noqa: F401
    bpe_ish_tokens,
    hash28,
    normalized_fingerprint,
    shingles,
    tokenize,
)
from us_dot_flights_lakehouse_spark.functions.vectors import (  # noqa: F401
    cosine,
    dot,
    norm,
    to_double_array,
)
