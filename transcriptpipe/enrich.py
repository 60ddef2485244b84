"""Enrich stage — broadcast-dictionary lookups.

The aushape analog is auparse's interpretation dictionaries (syscall numbers →
names, uid → username), invoked at /root/reference/lib/field.c:112-114 and
lib/execve_coll.c:242,360. Ours are explicit small dimension tables joined
with an explicit ``broadcast()`` hint, so at 10^12 rows the lookup is a
map-side hash probe — no shuffle of the fact table, ever.

Unknown codes are the anti-join case: a non-null ``tool`` code with no
dictionary hit becomes an UNKNOWN_TOOL row error routed to the error sink
(the reference would fail interpretation; we route, never throw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas, synth


def role_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(synth.role_dict_rows(), schema=schemas.ROLE_DICT)


def tool_dict_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(synth.tool_dict_rows(), schema=schemas.TOOL_DICT)


def enrich_roles(df: DataFrame, roles: DataFrame) -> DataFrame:
    """Map raw role codes (R0..R4) to canonical names; names pass through."""
    return (
        df.join(F.broadcast(roles), df["role"] == roles["role_code"], "left")
        .withColumn("role_name", F.coalesce("role_name", "role"))
        .drop("role_code")
    )


def enrich_tools(df: DataFrame, tools: DataFrame) -> DataFrame:
    """Resolve tool codes; unknown non-null codes become UNKNOWN_TOOL errors."""
    out = df.join(F.broadcast(tools), df["tool"] == tools["tool_code"], "left").drop(
        "tool_code", "tool_kind"
    )
    unknown = F.col("tool").isNotNull() & F.col("tool_name").isNull()
    return out.withColumn(
        "row_error",
        F.coalesce("row_error", F.when(unknown, F.lit(schemas.ERR_UNKNOWN_TOOL))),
    )


def enrich(df: DataFrame, spark: SparkSession) -> DataFrame:
    return enrich_tools(enrich_roles(df, role_dict_df(spark)), tool_dict_df(spark))
