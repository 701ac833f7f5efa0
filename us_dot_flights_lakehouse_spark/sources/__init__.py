from us_dot_flights_lakehouse_spark.sources.readers import (  # noqa: F401
    TABLES,
    lookup_scan,
    read_csv,
    read_table,
    read_tables,
    with_lineage,
)
from us_dot_flights_lakehouse_spark.sources.writers import (  # noqa: F401
    export_single_csv,
    write_partitioned,
)
