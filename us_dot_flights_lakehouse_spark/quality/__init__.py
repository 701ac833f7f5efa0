from us_dot_flights_lakehouse_spark.quality.checks import (  # noqa: F401
    CheckResult,
    QualitySuite,
)
