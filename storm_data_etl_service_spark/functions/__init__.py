"""Column-expression function library.

Import from the submodule (``from
storm_data_etl_service_spark.functions.enrich import enrich``) — no
re-exports here, so the ``enrich`` module is not shadowed by the
``enrich`` function.
"""
