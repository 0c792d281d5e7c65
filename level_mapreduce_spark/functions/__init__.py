"""Column-expression helpers shared by the engine and operators."""

from level_mapreduce_spark.functions.collation import (
    sortable_int,
    sortable_int_key,
    sortable_num,
    sortable_num_key,
    typed_num,
    typed_num_key,
    typed_str,
    typed_str_key,
)
from level_mapreduce_spark.functions.staging import pin_array_arg, unpushable
from level_mapreduce_spark.functions.zorder import z_scale, z_value, zorder_write

__all__ = [
    "pin_array_arg",
    "unpushable",
    "z_scale",
    "z_value",
    "zorder_write",
    "sortable_int",
    "sortable_int_key",
    "sortable_num",
    "sortable_num_key",
    "typed_num",
    "typed_num_key",
    "typed_str",
    "typed_str_key",
]
