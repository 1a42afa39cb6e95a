from .bronze import BRONZE_SCHEMAS, read_bronze, write_bronze
from .table import VersionedParquetTable

__all__ = ["BRONZE_SCHEMAS", "read_bronze", "write_bronze", "VersionedParquetTable"]
