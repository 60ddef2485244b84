"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship transcript-analog pipeline over the
sf0.001 events table. ``queries()`` exposes every SQL-checkable operator
from SURVEY.md §2 plus the training-data-pipeline ops (dedup / similarity /
text analysis) over the driver's parquet tables; ``oracle_sql()`` has the
DuckDB-equivalent SQL for each.

Numeric-determinism policy: money-like sums are computed in DECIMAL (exact,
order-independent) then cast to double; averages are decimal-sum / count;
floats that can't avoid float math (cosine similarity) are rounded.
Timestamps are compared as epoch microseconds (bigint).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# events-table queries — transcript-pipeline operator analogs (SURVEY.md §2)
# --------------------------------------------------------------------------

EVENT_DICT = [
    ("signup", "acquisition"),
    ("click", "engagement"),
    ("view", "engagement"),
    ("purchase", "revenue"),
]
# 'error' intentionally absent -> anti-join / unknown-code path


def q_ev_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 event coalescing: group rows by key, order-preserving assembly."""
    ev = _t(spark, sf_dir, "events")
    seq = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ),
    )
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.min("ts").cast("timestamp")).alias("first_ts_us"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("last_ts_us"),
        seq.alias("event_seq"),
    )


SQL_EV_COALESCE = """
SELECT user_id,
       count(*) AS n_events,
       epoch_us(min(ts)) AS first_ts_us,
       epoch_us(max(ts)) AS last_ts_us,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS event_seq
FROM events GROUP BY user_id
"""


def q_ev_kv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 grok/kv extraction from the props payload + bucket aggregate."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).try_cast("long")
    return (
        ev.select(k.alias("k_val"))
        .groupBy((F.col("k_val") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.sum("k_val").alias("k_sum"))
    )


SQL_EV_KV_PARSE = """
SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum
FROM events GROUP BY 1
"""


def q_ev_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-dictionary enrichment (auparse interpret analog)."""
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(EVENT_DICT, ["event_type", "category"])
    return (
        ev.join(F.broadcast(dim), "event_type", "left")
        .groupBy(F.coalesce("category", F.lit("unknown")).alias("category"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,2)"))).cast("double").alias("value_sum"),
        )
    )


SQL_EV_ENRICH = """
WITH dim(event_type, category) AS (VALUES
  ('signup','acquisition'), ('click','engagement'),
  ('view','engagement'), ('purchase','revenue'))
SELECT coalesce(d.category, 'unknown') AS category,
       count(*) AS n,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events e LEFT JOIN dim d USING (event_type)
GROUP BY 1
"""


def q_ev_unknown_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: codes missing from the dictionary -> error-sink analog."""
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(EVENT_DICT, ["event_type", "category"])
    return (
        ev.join(F.broadcast(dim), "event_type", "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


SQL_EV_UNKNOWN_CODES = """
WITH dim(event_type, category) AS (VALUES
  ('signup','acquisition'), ('click','engagement'),
  ('view','engagement'), ('purchase','revenue'))
SELECT event_type, count(*) AS n
FROM events e WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.event_type = e.event_type)
GROUP BY 1
"""


def q_ev_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ordering (first-3-per-user), the 'first record' analog."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "rn", "event_id", "event_type")
    )


SQL_EV_WINDOW_RANK = """
SELECT user_id, rn, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn <= 3
"""


def q_ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window coalescing: gap > 30 min starts a new session (the
    batch analog of the streaming event-completion boundary, SURVEY §2.9)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_sess", is_new)
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )


SQL_EV_SESSIONIZE = """
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              OR lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events) GROUP BY user_id
"""


def q_ev_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 duplicate suppression: distinct (user, type) then per-type counts."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type")
        .dropDuplicates()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_distinct_users"))
    )


SQL_EV_DEDUP_EXACT = """
SELECT event_type, count(*) AS n_distinct_users
FROM (SELECT DISTINCT user_id, event_type FROM events) GROUP BY 1
"""


def q_ev_doc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 document batching by key range + byte accounting (A6 counters)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("event_id") / 100).alias("doc_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.octet_length("props")).alias("bytes_out"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


SQL_EV_DOC_BATCH = """
SELECT CAST(floor(event_id / 100) AS BIGINT) AS doc_id,
       count(*) AS n_rows,
       CAST(sum(strlen(props)) AS BIGINT) AS bytes_out,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def q_ev_doc_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 complete: multi-event document ASSEMBLY (count mode) — events
    grouped into serial-ranged documents, bodies concatenated in serial
    order with prologue/epilogue wrapping (conv_buf.c:711-757 analog)."""
    from transcriptpipe import docbatch

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("serial"), F.col("props").alias("doc")
    )
    out = docbatch.batch_documents(ev, events_per_doc=50)
    return out.withColumn("n_events", F.col("n_events").cast("long"))


SQL_EV_DOC_ASSEMBLE = """
SELECT CAST(floor(event_id / 50) AS BIGINT) AS doc_id,
       count(*) AS n_events,
       min(event_id) AS first_serial,
       max(event_id) AS last_serial,
       CAST(sum(strlen(props)) + count(*) - 1 AS BIGINT) AS event_bytes,
       '[' || string_agg(props, ',' ORDER BY event_id) || ']' AS doc
FROM events GROUP BY 1
"""


def q_ev_repeated_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPEATED_RECORD analog: keys where a non-repeatable type occurs twice."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_signups"))
        .filter(F.col("n_signups") > 1)
    )


SQL_EV_REPEATED_GUARD = """
SELECT user_id, count(*) AS n_signups FROM events
WHERE event_type = 'signup' GROUP BY user_id HAVING count(*) > 1
"""


def q_ev_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/S5 router + A6 per-sink aggregate counts."""
    ev = _t(spark, sf_dir, "events")
    sink = (
        F.when(F.col("event_type") == "error", "error")
        .when(F.col("value") < 10, "raw")
        .otherwise("json_doc")
    )
    return ev.groupBy(sink.alias("sink")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


SQL_EV_ROUTE_COUNTS = """
SELECT CASE WHEN event_type = 'error' THEN 'error'
            WHEN value < 10 THEN 'raw' ELSE 'json_doc' END AS sink,
       count(*) AS n_rows,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events GROUP BY 1
"""


# deterministic as-of dimension: per segment (user_id % 3), a rate that
# changes weekly across the events table's Jan-2024 range
ASOF_RATES = [
    (seg, f"2024-01-{day:02d} 00:00:00", float(seg * 100 + day))
    for seg in range(3)
    for day in (1, 8, 15, 22, 29)
]


def q_ev_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bonus operator (datalib.asof): as-of join events to the latest
    preceding rate row per segment — union-fill plan, ONE shuffle, no range
    explosion — then aggregate per matched rate."""
    from transcriptpipe.datalib import asof

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 3).alias("segment"),
        F.col("ts"),
        F.col("event_id"),
    )
    rates = spark.createDataFrame(ASOF_RATES, ["segment", "ts", "rate"]).select(
        "segment", F.col("ts").cast("timestamp").alias("ts"), "rate"
    )
    j = asof.asof_join(ev, rates, on="segment", ts="ts")
    return j.groupBy("segment", "r_rate").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
    )


def _sql_ev_asof() -> str:
    vals = ", ".join(f"({s}, TIMESTAMP '{t}', {r})" for s, t, r in ASOF_RATES)
    return f"""
WITH rates(segment, ts, rate) AS (VALUES {vals}),
ev AS (SELECT user_id % 3 AS segment, ts, event_id FROM events)
SELECT ev.segment AS segment, r.rate AS r_rate,
       count(*) AS n_events, min(event_id) AS first_event
FROM ev ASOF LEFT JOIN rates r
  ON ev.segment = r.segment AND ev.ts >= r.ts
GROUP BY 1, 2
"""


def q_ev_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 cube/rollup: multi-dimensional subtotals over the event stream
    (the ops-dashboard aggregation surface)."""
    ev = _t(spark, sf_dir, "events")
    band = (
        F.when(F.col("value").isNull(), "na")
        .when(F.col("value") >= 50, "hi")
        .otherwise("lo")
    )
    return ev.cube("event_type", band.alias("value_band")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


SQL_EV_CUBE = """
SELECT event_type,
       CASE WHEN value IS NULL THEN 'na' WHEN value >= 50 THEN 'hi' ELSE 'lo' END
           AS value_band,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events GROUP BY CUBE (event_type, value_band)
"""


# --------------------------------------------------------------------------
# TPC-H-style relational queries (headline bench workload)
# --------------------------------------------------------------------------

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(F.broadcast(cu), od["o_custkey"] == cu["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way join through region: broadcast dims, shuffle facts."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(cu, od["o_custkey"] == cu["c_custkey"])
        .join(su, (li["l_suppkey"] == su["s_suppkey"])
              & (cu["c_nationkey"] == su["s_nationkey"]))
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# documents-table queries — training-data-pipeline text ops
# --------------------------------------------------------------------------

def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (md5): duplicate-group size histogram."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.count("*").alias("group_size"))
        .groupBy("group_size")
        .agg(F.count("*").alias("n_groups"))
    )


SQL_DOC_DEDUP_EXACT = """
SELECT group_size, count(*) AS n_groups FROM (
  SELECT md5(text) AS h, count(*) AS group_size FROM documents GROUP BY 1)
GROUP BY 1
"""


def q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup: shingle -> 4 minhashes -> 2 bands ->
    bucket-join collision stats. Hash family = md5 with salt prefixes, so the
    DuckDB oracle computes the identical signature."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 3)
    sh = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 2),
                lambda i: F.array_join(F.slice("w", i, 3), " "),
            )
        ).alias("sh"),
    )
    sig = sh.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(str(i)), F.col("sh")))).alias(f"h{i}") for i in range(4)]
    )
    bands = sig.select(
        "doc_id", F.md5(F.concat("h0", "h1")).alias("band"), F.lit(0).alias("band_id")
    ).unionByName(
        sig.select(
            "doc_id", F.md5(F.concat("h2", "h3")).alias("band"), F.lit(1).alias("band_id")
        )
    )
    return (
        bands.groupBy("band_id", "band")
        .agg(F.count("*").alias("c"))
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_collision_buckets"),
            F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("n_candidate_pairs"),
        )
    )


SQL_DOC_MINHASH_LSH = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
sh AS (SELECT doc_id,
              unnest(list_transform(range(1, len(w) - 1),
                     i -> array_to_string(w[i:i+2], ' '))) AS sh
       FROM w),
sig AS (SELECT doc_id,
               min(md5('0' || sh)) AS h0, min(md5('1' || sh)) AS h1,
               min(md5('2' || sh)) AS h2, min(md5('3' || sh)) AS h3
        FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, md5(h0 || h1) AS band, 0 AS band_id FROM sig
          UNION ALL
          SELECT doc_id, md5(h2 || h3) AS band, 1 AS band_id FROM sig),
buckets AS (SELECT band_id, band, count(*) AS c FROM bands GROUP BY 1, 2)
SELECT band_id, count(*) AS n_buckets,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_collision_buckets,
       CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_candidate_pairs
FROM buckets GROUP BY band_id
"""


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs (brute force at small SF; the LSH
    query above is the scale path)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    a, b = d.alias("a"), d.alias("b")
    jac = (
        F.size(F.array_intersect("a.toks", "b.toks")).cast("double")
        / F.size(F.array_union("a.toks", "b.toks"))
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.round(jac, 3).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


SQL_DOC_NGRAM_JACCARD = """
WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / len(list_distinct(list_concat(a.toks, b.toks))), 3) AS jaccard
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / len(list_distinct(list_concat(a.toks, b.toks))), 3) >= 0.8
"""


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (8-bit, md5-derived bit family) bucket histogram."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = F.md5("tok")
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(2 * (F.ascii(F.substring(h, b + 1, 1)) % 2) - 1).alias(f"s{b}")
            for b in range(8)
        ]
    )
    sim = sums.select(
        "doc_id",
        sum(
            (F.when(F.col(f"s{b}") > 0, 1).otherwise(0) * (1 << b)) for b in range(8)
        ).alias("simhash"),
    )
    return sim.groupBy("simhash").agg(F.count("*").alias("n_docs"))


_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN sum(2 * (ascii(substr(md5(tok), {b + 1}, 1)) % 2) - 1) > 0 "
    f"THEN 1 ELSE 0 END) * {1 << b}"
    for b in range(8)
)
SQL_DOC_SIMHASH = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
sim AS (SELECT doc_id, {_SIMHASH_BITS} AS simhash FROM tok GROUP BY doc_id)
SELECT simhash, count(*) AS n_docs FROM sim GROUP BY 1
"""


STOPWORDS = ["the", "a", "and", "of", "in", "to"]


def q_doc_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language/quality stats: token counting, stopword ratio, per-lang agg."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return (
        d.select("lang", n_tok.alias("n_tok"), n_stop.alias("n_stop"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_stop").alias("total_stopwords"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


SQL_DOC_TEXTSTATS = f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(len(list_filter(string_split(text, ' '),
               t -> list_contains({STOPWORDS!r}, t)))) AS BIGINT) AS total_stopwords,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID histogram (datalib.textstats.lang_id: stopword-profile
    scores, argmax with (score, lang) lexicographic tie-break)."""
    from transcriptpipe.datalib import textstats

    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        textstats.lang_id(F.col("text")).alias("lang_detected")
    ).agg(F.count("*").alias("n_docs"))


def _sql_doc_langid() -> str:
    from transcriptpipe.datalib.textstats import LANG_PROFILES

    score = {
        lang: (
            f"CAST(len(list_filter(toks, x -> list_contains({prof!r}, x))) AS DOUBLE)"
            f" / greatest(len(toks), 1)"
        )
        for lang, prof in LANG_PROFILES.items()
    }
    cols = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score.items())
    g = "greatest(" + ", ".join(f"s_{la}" for la in score) + ")"
    # tie-break mirrors Spark's array_max over struct(score, lang):
    # max lang string wins on equal score
    cases = " ".join(
        f"WHEN s_{la} = {g} THEN '{la}'"
        for la in sorted(score, reverse=True)
    )
    return f"""
WITH t AS (SELECT regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
s AS (SELECT {cols} FROM t)
SELECT CASE WHEN {g} = 0 THEN 'und' {cases} END AS lang_detected,
       count(*) AS n_docs
FROM s GROUP BY 1
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content hash of normalized prefix + length."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.concat(F.substring("text", 1, 64), F.length("text").cast("string")))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(fp).alias("n_distinct_fp"),
    )


SQL_DOC_FINGERPRINT = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(substr(text, 1, 64) || CAST(length(text) AS VARCHAR)))
           AS n_distinct_fp
FROM documents GROUP BY source
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-feature aggregation (datalib.textstats shape): punctuation /
    uppercase ratios and mean token length per source."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    n_char = F.greatest(F.length("text"), F.lit(1))
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    return (
        d.select(
            "source",
            F.size(toks).alias("n_tok"),
            F.round(punct.cast("double") / n_char, 4).alias("punct_ratio"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.sum("punct_ratio"), 3).alias("punct_ratio_sum"),
        )
    )


SQL_DOC_QUALITY = r"""
SELECT source, count(*) AS n_docs,
       CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
       round(sum(round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 4)), 3) AS punct_ratio_sum
FROM documents GROUP BY source
"""


# --------------------------------------------------------------------------
# embeddings-table queries — similarity search
# --------------------------------------------------------------------------

def _hyperplane_sql(planes: int = 4, dim: int = 64, seed: int = 42) -> str:
    from transcriptpipe.datalib.similarity import hyperplanes

    hp = hyperplanes(dim, planes, seed)
    terms = []
    for p in range(planes):
        arr = "[" + ", ".join(repr(float(c)) for c in hp[p]) + "]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> ve[i] * ({arr})[i])) > 0 THEN 1 ELSE 0 END) * {1 << p}"
        )
    return " + ".join(terms)


def q_emb_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket histogram (the ANN scale path's index)."""
    from transcriptpipe.datalib.similarity import bucket_of, hyperplanes

    e = _t(spark, sf_dir, "embeddings")
    hp = hyperplanes(64, 4, 42)
    return (
        e.select(bucket_of(F.col("embedding"), hp).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def _sql_emb_lsh_buckets() -> str:
    return f"""
WITH e AS (SELECT embedding::DOUBLE[] AS ve FROM embeddings)
SELECT {_hyperplane_sql(4, 64, 42)} AS bucket, count(*) AS n_vecs
FROM e GROUP BY 1
"""

def q_emb_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer cell census (the ANN index's partition stats);
    cells assigned by argmin squared distance to deterministic centroids."""
    from transcriptpipe.datalib import similarity

    e = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_cells(e).withColumn("cell", F.col("cell").cast("long"))


def _sql_emb_ivf_cells(k: int = 8, dim: int = 64, seed: int = 7) -> str:
    from transcriptpipe.datalib.similarity import ivf_centroids

    cents = ivf_centroids(dim, k, seed)
    d_cols = []
    for j, c in enumerate(cents):
        arr = "[" + ", ".join(repr(float(x)) for x in c) + "]"
        d_cols.append(
            f"round(list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> (ve[i] - ({arr})[i]) * (ve[i] - ({arr})[i]))), 6) AS d{j}"
        )
    best = "least(" + ", ".join(f"d{j}" for j in range(k)) + ")"
    cases = " ".join(f"WHEN d{j} = {best} THEN {j}" for j in range(k))
    return f"""
WITH e AS (SELECT embedding::DOUBLE[] AS ve FROM embeddings),
d AS (SELECT {", ".join(d_cols)} FROM e)
SELECT CAST(CASE {cases} END AS BIGINT) AS cell, count(*) AS n_vecs
FROM d GROUP BY 1
"""


def q_emb_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a fixed query vector (vec_id=0).
    The scale path is LSH-bucketed (datalib.similarity); this is the oracle-
    checkable baseline."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qe")
    )
    ed = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("ve")
    )
    dot = F.aggregate(
        F.zip_with("ve", "qe", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    n1 = F.sqrt(F.aggregate("ve", F.lit(0.0), lambda acc, x: acc + x * x))
    n2 = F.sqrt(F.aggregate("qe", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        ed.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(dot / (n1 * n2), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


SQL_EMB_ANN_COSINE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
e AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings WHERE vec_id <> 0)
SELECT vec_id,
       round(list_sum(list_transform(range(1, len(ve) + 1), i -> ve[i] * qe[i]))
             / (sqrt(list_sum(list_transform(ve, x -> x * x)))
                * sqrt(list_sum(list_transform(qe, x -> x * x)))), 4) AS cos_sim
FROM e, q
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


def q_emb_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: hyperplane-LSH bucket join + exact
    cosine within buckets (datalib.dedup.embedding_near_dups) — never
    all-pairs. Threshold lowered to 0.25 for the synthetic table (random
    vectors carry no planted dups; the operator is the same)."""
    from transcriptpipe.datalib import dedup

    e = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dups(e, threshold=0.25, planes=8, seed=42)


def _sql_emb_near_dups(planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    bucket = _hyperplane_sql(planes, dim, seed)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
b AS (SELECT vec_id, ve, {bucket} AS bucket FROM e)
SELECT a.vec_id AS a_id, c.vec_id AS b_id,
       round(list_sum(list_transform(range(1, {dim + 1}), i -> a.ve[i] * c.ve[i]))
             / (sqrt(list_sum(list_transform(a.ve, x -> x * x)))
                * sqrt(list_sum(list_transform(c.ve, x -> x * x)))), 4) AS cos_sim
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE round(list_sum(list_transform(range(1, {dim + 1}), i -> a.ve[i] * c.ve[i]))
            / (sqrt(list_sum(list_transform(a.ve, x -> x * x)))
               * sqrt(list_sum(list_transform(c.ve, x -> x * x)))), 4) >= 0.25
"""


def q_emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norm statistics (vector math via aggregate())."""
    e = _t(spark, sf_dir, "embeddings")
    ve = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(ve, F.lit(0.0), lambda acc, x: acc + x * x))
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.round(norm, 6)), 4).alias("norm_sum"),
    )


SQL_EMB_NORM_STATS = """
SELECT label, count(*) AS n,
       round(sum(round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6)), 4)
           AS norm_sum
FROM embeddings GROUP BY label
"""


# --------------------------------------------------------------------------
# transcript pipeline itself (non-SQL-expressible -> rows-only checks)
# --------------------------------------------------------------------------

def _synth_df(spark: SparkSession, n_convs: int = 200):
    from transcriptpipe import schemas, synth

    pdf = synth.gen_transcripts(n_convs=n_convs, seed=42)
    return spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)


def q_transcript_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full transcript pipeline -> json_doc sink (golden-corpus op; verified
    against the pure-Python oracle in tests/, rows-only here)."""
    from transcriptpipe import pipeline

    return pipeline.build(spark, _synth_df(spark))["json_doc"]


def q_transcript_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptpipe import pipeline

    return pipeline.build(spark, _synth_df(spark))["error"]


def q_transcript_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptpipe import pipeline

    return pipeline.build(spark, _synth_df(spark))["xml_doc"]


def q_transcript_docs_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline with the normalization section (--with-norm analog) enabled;
    rows-only (norm content pinned against the Python oracle in tests/)."""
    from transcriptpipe import pipeline

    return pipeline.build(
        spark, _synth_df(spark), pipeline.PipeConf(with_norm=True)
    )["json_doc"]


def q_transcript_log_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-event log documents (S6 count mode) built from the transcript
    pipeline's json_doc sink; rows-only (docbatch oracle-checked separately
    via ev_doc_assemble on the events table)."""
    from transcriptpipe import pipeline

    return pipeline.build(
        spark, _synth_df(spark), pipeline.PipeConf(doc_batch=10)
    )["json_log"]


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sessionize + coalesce + enrich + route the sf0.001 events
    stream into JSON session documents (the transcript pipeline's shape on
    the driver's own data)."""
    sf_dir = "/root/testdata/sf0.001"
    ev = _t(spark, sf_dir, "events")
    dim = spark.createDataFrame(EVENT_DICT, ["event_type", "category"])
    enriched = ev.join(F.broadcast(dim), "event_type", "left").withColumn(
        "category", F.coalesce("category", F.lit("unknown"))
    )
    doc = (
        enriched.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("first_ts_us"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type", "category"))
                ),
                lambda s: F.struct(
                    s["event_id"].alias("event_id"),
                    s["event_type"].alias("event_type"),
                    s["category"].alias("category"),
                ),
            ).alias("events"),
        )
        .select(
            "user_id",
            "n_events",
            "first_ts_us",
            F.to_json(F.struct("user_id", "n_events", "events")).alias("doc"),
        )
    )
    return doc


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ev_coalesce": q_ev_coalesce,
        "ev_kv_parse": q_ev_kv_parse,
        "ev_enrich": q_ev_enrich,
        "ev_unknown_codes": q_ev_unknown_codes,
        "ev_window_rank": q_ev_window_rank,
        "ev_sessionize": q_ev_sessionize,
        "ev_dedup_exact": q_ev_dedup_exact,
        "ev_doc_batch": q_ev_doc_batch,
        "ev_doc_assemble": q_ev_doc_assemble,
        "ev_repeated_guard": q_ev_repeated_guard,
        "ev_route_counts": q_ev_route_counts,
        "ev_cube": q_ev_cube,
        "ev_asof": q_ev_asof,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "doc_dedup_exact": q_doc_dedup_exact,
        "doc_minhash_lsh": q_doc_minhash_lsh,
        "doc_ngram_jaccard": q_doc_ngram_jaccard,
        "doc_simhash": q_doc_simhash,
        "doc_textstats": q_doc_textstats,
        "doc_quality": q_doc_quality,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_langid": q_doc_langid,
        "emb_ann_cosine": q_emb_ann_cosine,
        "emb_lsh_buckets": q_emb_lsh_buckets,
        "emb_ivf_cells": q_emb_ivf_cells,
        "emb_near_dups": q_emb_near_dups,
        "emb_norm_stats": q_emb_norm_stats,
        "transcript_docs": q_transcript_docs,
        "transcript_errors": q_transcript_errors,
        "transcript_xml": q_transcript_xml,
        "transcript_docs_norm": q_transcript_docs_norm,
        "transcript_log_batch": q_transcript_log_batch,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ev_coalesce": SQL_EV_COALESCE,
        "ev_kv_parse": SQL_EV_KV_PARSE,
        "ev_enrich": SQL_EV_ENRICH,
        "ev_unknown_codes": SQL_EV_UNKNOWN_CODES,
        "ev_window_rank": SQL_EV_WINDOW_RANK,
        "ev_sessionize": SQL_EV_SESSIONIZE,
        "ev_dedup_exact": SQL_EV_DEDUP_EXACT,
        "ev_doc_batch": SQL_EV_DOC_BATCH,
        "ev_doc_assemble": SQL_EV_DOC_ASSEMBLE,
        "ev_repeated_guard": SQL_EV_REPEATED_GUARD,
        "ev_route_counts": SQL_EV_ROUTE_COUNTS,
        "ev_cube": SQL_EV_CUBE,
        "ev_asof": _sql_ev_asof(),
        "tpch_q1": SQL_TPCH_Q1,
        "tpch_q3": SQL_TPCH_Q3,
        "tpch_q5": SQL_TPCH_Q5,
        "doc_dedup_exact": SQL_DOC_DEDUP_EXACT,
        "doc_minhash_lsh": SQL_DOC_MINHASH_LSH,
        "doc_ngram_jaccard": SQL_DOC_NGRAM_JACCARD,
        "doc_simhash": SQL_DOC_SIMHASH,
        "doc_textstats": SQL_DOC_TEXTSTATS,
        "doc_quality": SQL_DOC_QUALITY,
        "doc_fingerprint": SQL_DOC_FINGERPRINT,
        "doc_langid": _sql_doc_langid(),
        "emb_ann_cosine": SQL_EMB_ANN_COSINE,
        "emb_lsh_buckets": _sql_emb_lsh_buckets(),
        "emb_ivf_cells": _sql_emb_ivf_cells(),
        "emb_near_dups": _sql_emb_near_dups(),
        "emb_norm_stats": SQL_EMB_NORM_STATS,
        # transcript_docs / transcript_errors / transcript_xml: rows-only
        # (verified against the single-process oracle in tests/)
    }
