from storm_data_etl_service_spark.functions.enrich import (  # noqa: F401
    enrich,
    parse_raw_events,
)
