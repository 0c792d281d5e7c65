"""Column-expression helpers shared by the engine and operators."""

from level_mapreduce_spark.functions.staging import pin_array_arg, unpushable

__all__ = ["pin_array_arg", "unpushable"]
