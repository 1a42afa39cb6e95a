"""Bootstrap — the Spark analogue of ``python ddl.py`` (S12/S13/M3).

The reference's DDL entry point creates schemas, raw tables, and the
metadata registries (``ddl.py:3-581``).  Here: create the databases,
materialize every registered table as an empty, correctly-typed
parquet-backed table (``create_table``'s registry-driven DDL,
``ddl.py:447-462``), and register bronze schemas — so a fresh
deployment has the full catalog before the first load.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from . import registry
from .sources.bronze import BRONZE_SCHEMAS

_TYPE_MAP = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "bigint": T.LongType(),
    "timestamp": T.TimestampType(),
}


def struct_type_for(spec: registry.TableSpec) -> T.StructType:
    """Registry → StructType (the ``create_table`` string_agg DDL
    generator, ``ddl.py:454``, without SQL text)."""
    fields = [T.StructField(c, _TYPE_MAP[t], True) for c, t in spec.columns]
    if spec.scd2:
        fields += [
            T.StructField("valid_from", T.TimestampType(), True),
            T.StructField("valid_to", T.TimestampType(), True),
        ]
    return T.StructType(fields)


def bootstrap(spark: SparkSession, warehouse: "object | None" = None) -> dict[str, T.StructType]:
    """Create databases + return the declared schema catalog.  When a
    ``Warehouse`` is passed, also materialize empty v1 tables for any
    table that does not exist yet (idempotent)."""
    for db in ("bronze", "stg", "data_mart"):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    catalog: dict[str, T.StructType] = dict(BRONZE_SCHEMAS)
    for (schema, table), spec in registry.ALL_SPECS.items():
        catalog[f"{schema}.{table}"] = struct_type_for(spec)
        if warehouse is not None:
            tab = warehouse.table(schema, table)
            if not tab.exists():
                empty = spark.createDataFrame([], struct_type_for(spec))
                tab.write(empty)
    return catalog
