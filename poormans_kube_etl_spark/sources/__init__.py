from poormans_kube_etl_spark.sources.tables import load_table, table_path, register_views

__all__ = ["load_table", "table_path", "register_views"]
