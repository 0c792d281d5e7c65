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

__all__ = [
    "pin_array_arg",
    "unpushable",
    "sortable_int",
    "sortable_int_key",
    "sortable_num",
    "sortable_num_key",
    "typed_num",
    "typed_num_key",
    "typed_str",
    "typed_str_key",
]
