"""As-of (nearest-preceding) join — an operator Spark lacks natively.

Strategy: the union-and-fill pattern — tag both sides, union, sort within
key by (ts, side), and carry the most recent right-side values forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window. ONE
shuffle on the join key, no range explosion, no cross join; tolerance is a
post-filter on the carried timestamp. This is the standard scale-safe shape
(the alternative, applyInPandas + pd.merge_asof per key group, is provided
for very wide right rows where the union projection would be wasteful).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              tolerance_us: int | None = None) -> DataFrame:
    """For each left row, attach the latest right row with the same ``on``
    key and right.ts <= left.ts (within tolerance if given). Right-side
    value columns come back with an ``r_`` prefix; unmatched rows keep nulls.
    """
    lcols = [c for c in left.columns]
    rvals = [c for c in right.columns if c not in (on, ts)]

    lt = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_r_ts_us"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}") for c in rvals],
    )
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    rt = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (on, ts)],
        F.lit(0).alias("_is_left"),
        us.alias("_r_ts_us"),
        *[F.col(c).alias(f"r_{c}") for c in rvals],
    ).select(*lcols, "_is_left", "_r_ts_us", *[f"r_{c}" for c in rvals])

    u = lt.unionByName(rt)
    # right rows sort before left rows at equal ts, so an exactly-equal
    # timestamp matches (merge_asof allow_exact_matches=True semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(us.asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        F.last("_r_ts_us", ignorenulls=True).over(w).alias("_m_ts_us"),
        *[F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}") for c in rvals],
    )
    out = filled.filter(F.col("_is_left") == 1)
    match_ok = F.col("_m_ts_us").isNotNull()
    if tolerance_us is not None:
        match_ok = match_ok & ((us - F.col("_m_ts_us")) <= tolerance_us)
    out = out.select(
        *lcols,
        *[F.when(match_ok, F.col(f"_m_{c}")).alias(f"r_{c}") for c in rvals],
        F.when(match_ok, F.col("_m_ts_us")).alias("r_ts_us"),
    )
    return out


def asof_join_pandas(left: DataFrame, right: DataFrame, on: str, ts: str,
                     tolerance_us: int | None = None) -> DataFrame:
    """applyInPandas + pd.merge_asof per key — for wide right rows where the
    union projection above would carry too many null columns through the
    shuffle. Cogroup keeps one shuffle per side."""
    import pandas as pd

    rvals = [c for c in right.columns if c not in (on, ts)]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`r_{c}` {right.schema[c].dataType.simpleString()}" for c in rvals]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(ts)
        rpdf = rpdf.sort_values(ts).rename(columns={c: f"r_{c}" for c in rvals})
        tol = pd.Timedelta(microseconds=tolerance_us) if tolerance_us else None
        m = pd.merge_asof(lpdf, rpdf.drop(columns=[on]), on=ts, tolerance=tol,
                          direction="backward")
        return m[[*lpdf.columns, *[f"r_{c}" for c in rvals]]]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema=out_schema)
    )
