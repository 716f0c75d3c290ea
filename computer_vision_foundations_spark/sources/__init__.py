from computer_vision_foundations_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)
from computer_vision_foundations_spark.sources.binaryfile import (
    read_binary_files,
    read_binary_stream,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_binary_files",
    "read_binary_stream",
]
