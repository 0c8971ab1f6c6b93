from mapreducer_spark.functions.text import (
    SPARK_TOKEN_SPLIT_RE,
    ORACLE_TOKEN_SPLIT_RE,
    tokens,
)

__all__ = ["SPARK_TOKEN_SPLIT_RE", "ORACLE_TOKEN_SPLIT_RE", "tokens"]
