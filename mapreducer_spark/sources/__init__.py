from mapreducer_spark.sources.tables import TABLES, fan_out, load_table, load_tables

__all__ = ["TABLES", "fan_out", "load_table", "load_tables"]
