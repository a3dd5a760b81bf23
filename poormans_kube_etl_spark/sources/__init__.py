from poormans_kube_etl_spark.sources.tables import (
    load_table,
    register_views,
    spread_small_scan,
    table_path,
)

__all__ = ["load_table", "table_path", "register_views", "spread_small_scan"]
