from us_dot_flights_lakehouse_spark.operators.joins import (  # noqa: F401
    broadcast_star_join,
    enrich_join,
    outer_merge_coalesce,
)
from us_dot_flights_lakehouse_spark.operators.aggregates import (  # noqa: F401
    conditional_count,
    conditional_avg,
    grouped_agg,
    ratio,
    topk,
)
from us_dot_flights_lakehouse_spark.operators.setops import union_distinct  # noqa: F401
from us_dot_flights_lakehouse_spark.operators.generators import (  # noqa: F401
    date_range_df,
    minute_of_day_df,
)
