"""Driver-facing entries for the streaming operators: each runs a REAL
Structured Streaming query (file source → watermark → window/stateful op →
memory sink, Trigger.AvailableNow) and returns the materialized result,
hash-checked against a batch DuckDB oracle where expressible."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import local_rows_df
from highs_duckdb_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_table,
    run_stream_with_rocksdb,
    running_totals_stream,
    sessionize_stream,
    sliding_window_counts,
    tumbling_window_agg,
)


@register(
    "qs01_stream_tumbling",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
           count(*) AS n,
           round(1e-9 + CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 4) AS total_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    category="streaming",
    doc=(
        "1-hour tumbling event-time windows with watermark, executed as a real "
        "stream (AvailableNow) — results identical to the batch hourly rollup."
    ),
)
def qs01_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    stream = tumbling_window_agg(read_events_stream(spark, sf_dir))
    run_stream_to_table(stream, table, output_mode="complete")
    return spark.table(table).orderBy("window_start", "event_type")


@register(
    "qs02_stream_sliding",
    oracle="""
    WITH starts AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start FROM events
      UNION ALL
      SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP) FROM events
    )
    SELECT window_start, count(*) AS n
    FROM starts GROUP BY window_start ORDER BY window_start
    """,
    category="streaming",
    doc=(
        "2h windows sliding 1h, streamed with watermark. Overlapping "
        "windows ARE SQL-expressible after all: an event at t belongs to "
        "exactly the windows starting at trunc(t) and trunc(t) − 1h, so "
        "the oracle replays the stream as a two-branch UNION ALL + "
        "GROUP BY — upgrading this entry from a rows-only check to full "
        "hash parity."
    ),
)
def qs02_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    stream = sliding_window_counts(read_events_stream(spark, sf_dir))
    run_stream_to_table(stream, table, output_mode="complete")
    return spark.table(table).orderBy("window_start")


@register(
    "qs03_stream_sessionize",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    sessions AS (
      SELECT user_id, session_id,
             min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events,
             max(session_id) OVER (PARTITION BY user_id) AS last_session
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, session_end, n_events
    FROM sessions
    -- emitted sessions = gap-closed ones, plus tail sessions whose event-time
    -- timeout (last event + 30min) fired before the final watermark
    -- (global max ts − 1h) — exactly what the stateful operator emits
    WHERE session_id < last_session
       OR session_end + INTERVAL 30 MINUTE
          <= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
    ORDER BY user_id, session_start
    """,
    category="streaming",
    doc=(
        "Gap-based sessionization (30-min) via applyInPandasWithState — a "
        "custom stateful streaming operator; closed sessions match the batch "
        "lag/cumsum sessionization exactly."
    ),
)
def qs03_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    stream = sessionize_stream(read_events_stream(spark, sf_dir))
    run_stream_to_table(stream, table, output_mode="append")
    return spark.table(table).orderBy("user_id", "session_start")


@register(
    "qs04_stream_static_join",
    oracle="""
    WITH rates(event_type, weight) AS (VALUES ('view', 1.0), ('click', 2.0),
                                              ('purchase', 10.0), ('signup', 5.0), ('error', 0.0))
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           round(1e-9 + CAST(sum(CAST(value AS DECIMAL(12,2)) * CAST(weight AS DECIMAL(4,2))) AS DOUBLE), 4) AS weighted_value,
           count(*) AS n
    FROM events JOIN rates USING (event_type)
    GROUP BY window_start
    ORDER BY window_start
    """,
    category="streaming",
    doc=(
        "Stream-static join: the event stream enriched against a broadcast "
        "dimension before windowed aggregation — the kafka-topic ⋈ dim-table "
        "pattern; static side re-read per micro-batch."
    ),
)
def qs04_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    rates = local_rows_df(spark, 
        [("view", 1.0), ("click", 2.0), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    events = read_events_stream(spark, sf_dir)
    enriched = events.join(F.broadcast(rates), "event_type")
    agg = (
        enriched.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.round(
                F.lit(1e-9)
                + F.sum(
                    F.col("value").cast("decimal(12,2)") * F.col("weight").cast("decimal(4,2)")
                ).cast("double"),
                4,
            ).alias("weighted_value"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("window_start"), "weighted_value", "n")
    )
    table = f"stream_static_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(agg, table, output_mode="complete")
    return spark.table(table).orderBy("window_start")


@register(
    "qs05_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
    category="streaming",
    doc=(
        "Streaming exact dedup via dropDuplicates on (user_id, event_type) "
        "with watermark-bounded state — emits each key once regardless of "
        "how many micro-batches re-deliver it; result equals batch DISTINCT."
    ),
)
def qs05_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.streaming.windows import dedup_stream

    table = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    stream = dedup_stream(read_events_stream(spark, sf_dir))
    run_stream_to_table(stream, table, output_mode="append")
    return spark.table(table).orderBy("user_id", "event_type")


@register(
    "qs06_stream_stream_join",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(floor((epoch_us(p.ts) - epoch_us(c.ts)) / 60000000.0) AS BIGINT) AS gap_minutes
    FROM c JOIN p ON c.user_id = p.user_id
                 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
    ORDER BY c.user_id, click_id, purchase_id
    """,
    category="streaming",
    doc=(
        "Stream-stream interval join: clicks joined to purchases of the same "
        "user within the following 2 hours, BOTH sides watermarked so the "
        "join state is bounded (Spark buffers only events inside the "
        "watermark + interval horizon — the attribution-join pattern). Run "
        "as a real AvailableNow stream; result equals the batch interval "
        "join the oracle expresses."
    ),
)
def qs06_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 2 HOURS"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        # exact integer micros: whole-second epochs floor vs round
        # differently across engines on fractional-second timestamps
        F.floor(
            (
                F.unix_micros(F.col("p_ts").cast("timestamp"))
                - F.unix_micros(F.col("c_ts").cast("timestamp"))
            )
            / F.lit(60_000_000.0)
        )
        .cast("bigint")
        .alias("gap_minutes"),
    )
    table = f"stream_stream_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(joined, table, output_mode="append")
    return spark.table(table).orderBy("user_id", "click_id", "purchase_id")


def _transform_with_state_available() -> bool:
    """transformWithState's Python workers require google.protobuf (the
    JVM state-server protocol). A real install is preferred; where absent
    (this container: no protobuf distribution, no network) the vendored
    minimal runtime (highs_duckdb_spark/_vendor/protoshim — implements the
    public wire-format spec for exactly the StateMessage_pb2 surface) is
    appended to sys.path/PYTHONPATH so driver AND forked workers can
    import it. On a multi-node cluster, ship the shim dir via --py-files
    or install real protobuf; PYTHONPATH propagation here covers local
    mode, which is where this container runs."""
    from highs_duckdb_spark.streaming.protoshim import enable_protoshim

    return enable_protoshim()


def qs07_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the state-server protocol needs google.protobuf in the JVM-spawned
    # python workers; attach the vendored runtime to THIS session (no-op
    # when real protobuf is installed) — must precede stream creation
    from highs_duckdb_spark.streaming.protoshim import attach_to_session

    attach_to_session(spark)
    table = f"stream_totals_{uuid.uuid4().hex[:8]}"
    stream = running_totals_stream(read_events_stream(spark, sf_dir))
    run_stream_with_rocksdb(stream, table, output_mode="update")
    # keep the LAST emission per key (update mode re-emits a key per batch)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"))
    return (
        spark.table(table)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "n_events",
            F.round(F.lit(1e-9) + F.col("total_cents") / 100.0, 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


if _transform_with_state_available():  # pragma: no cover - environment-dependent
    register(
        "qs07_stream_running_totals",
        oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               round(1e-9 + CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """,
        category="streaming",
        doc=(
            "Per-key running totals via transformWithStateInPandas (Spark 4's "
            "second-generation arbitrary-state API, RocksDB state store): each "
            "micro-batch updates a named ValueState and emits the running "
            "(count, exact-cents sum) per touched key. Under AvailableNow on "
            "the finite source the last emission per key equals the batch "
            "aggregate — which is what the oracle checks."
        ),
    )(qs07_stream_running_totals)


@register(
    "qs08_stream_foreachbatch_merge",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(1e-9 + CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 4) AS total_value,
           max(ts) AS last_ts
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    category="streaming",
    doc=(
        "Streaming upsert sink via foreachBatch + MERGE: the event stream "
        "is split into 4 micro-batches (maxFilesPerTrigger=1), and each "
        "batch full-outer-merges its per-user aggregates into a versioned "
        "parquet target (counts add, decimal sums add exactly, last_ts "
        "takes the max) — the lakehouse CDC-sink pattern. The final target "
        "state equals the one-shot batch aggregate (the oracle), proving "
        "exactly-once accumulation across batches."
    ),
)
def qs08_stream_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from highs_duckdb_spark.session import load_table

    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts", "value")
    src_dir = tempfile.mkdtemp(prefix="hds_qs08_src_")
    # deterministic 4-way split on event_id so every micro-batch touches
    # overlapping user sets (updates, not just inserts)
    ev.repartition(4, F.col("event_id") % 4).drop("event_id").write.mode(
        "overwrite"
    ).parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src_dir)
    )
    target_root = tempfile.mkdtemp(prefix="hds_qs08_tgt_")
    state = {"path": None, "ver": 0}

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        agg = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_value"),
            F.max("ts").alias("last_ts"),
        )
        if state["path"] is None:
            merged = agg
        else:
            tgt = s.read.parquet(state["path"])
            st = agg.select(
                F.col("user_id").alias("s_user_id"),
                F.col("n_events").alias("s_n"),
                F.col("sum_value").alias("s_sum"),
                F.col("last_ts").alias("s_ts"),
            )
            merged = (
                tgt.join(st, tgt.user_id == st.s_user_id, "full_outer")
                .select(
                    F.coalesce(tgt.user_id, st.s_user_id).alias("user_id"),
                    (
                        F.coalesce(tgt.n_events, F.lit(0))
                        + F.coalesce(st.s_n, F.lit(0))
                    ).alias("n_events"),
                    (
                        F.coalesce(tgt.sum_value, F.lit(0).cast("decimal(12,2)"))
                        + F.coalesce(st.s_sum, F.lit(0).cast("decimal(12,2)"))
                    ).cast("decimal(22,2)").alias("sum_value"),
                    F.greatest(tgt.last_ts, st.s_ts).alias("last_ts"),
                )
            )
        new_path = os.path.join(target_root, f"v{state['ver']}")
        merged.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path
        state["ver"] += 1

    import uuid as _uuid

    q = (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", f"/tmp/hds_ckpt_qs08_{_uuid.uuid4().hex}"
        )
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(state["path"])
    return final.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.lit(1e-9) + F.col("sum_value").cast("double"), 4).alias("total_value"),
        "last_ts",
    ).orderBy("user_id")


@register(
    "qs09_stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(1e-9 + sum(value), 4) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    category="streaming",
    doc=(
        "Native session_window aggregation executed as a REAL stream "
        "(watermark + AvailableNow): Spark's merging-session state operator "
        "— the streaming twin of the batch q115, and the operator-native "
        "alternative to qs03's hand-rolled applyInPandasWithState "
        "sessionizer. Same gaps-and-islands oracle as q115."
    ),
)
def qs09_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = f"stream_session_win_{uuid.uuid4().hex[:8]}"
    ev = read_events_stream(spark, sf_dir)
    stream = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window(F.col("ts"), "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.lit(1e-9) + F.sum("value"), 4).alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )
    run_stream_to_table(stream, table, output_mode="complete")
    return spark.table(table).orderBy("user_id", "session_start")


@register(
    "qs10_stream_anomaly_alerts",
    oracle="""
    WITH stats AS (
      SELECT event_type, count(*) AS n0,
             sum(CAST(value AS DECIMAL(12,2))) AS sx0,
             sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS sxx0
      FROM events GROUP BY event_type
    ),
    win AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
             count(*) AS n, sum(CAST(value AS DECIMAL(12,2))) AS sx
      FROM events GROUP BY window_start, event_type
    )
    SELECT window_start, win.event_type, n,
           round(1e-9 + CAST(sx AS DOUBLE) / n, 4) AS win_avg,
           round(1e-9 + (CAST(sx AS DOUBLE) / n - CAST(sx0 AS DOUBLE) / n0)
                 / (sqrt((CAST(sxx0 AS DOUBLE) - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE) / n0)
                         / (n0 - 1)) / sqrt(n)), 4) AS z,
           abs(round(1e-9 + (CAST(sx AS DOUBLE) / n - CAST(sx0 AS DOUBLE) / n0)
                 / (sqrt((CAST(sxx0 AS DOUBLE) - CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE) / n0)
                         / (n0 - 1)) / sqrt(n)), 4)) > 3.0 AS is_alert
    FROM win JOIN stats ON win.event_type = stats.event_type
    ORDER BY window_start, win.event_type
    """,
    category="streaming",
    doc=(
        "Streaming control-chart anomaly alerts: 1-hour windowed means per "
        "event_type, z-scored in-stream against static per-type reference "
        "moments (broadcast into each micro-batch); |z| > 3 on the window "
        "mean's standard error flags the window. Decimal-exact Σx/Σx² "
        "moments on both engines make the doubles bit-identical before "
        "rounding. The static side is the once-a-day batch profile every "
        "monitoring deployment maintains; stream state is bounded by the "
        "watermark exactly as in qs01."
    ),
)
def qs10_stream_anomaly_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.session import load_table

    dec = F.col("value").cast("decimal(12,2)")
    stats = F.broadcast(
        load_table(spark, "events", sf_dir)
        .groupBy(F.col("event_type").alias("s_type"))
        .agg(
            F.count("*").alias("n0"),
            F.sum(dec).alias("sx0"),
            F.sum(dec * dec).alias("sxx0"),
        )
    )
    ev = read_events_stream(spark, sf_dir)
    win = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(dec).alias("sx"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sx")
    )
    mean0 = F.col("sx0").cast("double") / F.col("n0")
    var0 = (
        F.col("sxx0").cast("double")
        - F.col("sx0").cast("double") * F.col("sx0").cast("double") / F.col("n0")
    ) / (F.col("n0") - 1)
    win_avg = F.col("sx").cast("double") / F.col("n")
    z = (win_avg - mean0) / (F.sqrt(var0) / F.sqrt(F.col("n")))
    alerts = (
        win.join(stats, F.col("event_type") == F.col("s_type"))
        .select(
            "window_start",
            "event_type",
            "n",
            F.round(F.lit(1e-9) + win_avg, 4).alias("win_avg"),
            F.round(F.lit(1e-9) + z, 4).alias("z"),
            (F.abs(F.round(F.lit(1e-9) + z, 4)) > 3.0).alias("is_alert"),
        )
    )
    table = f"stream_anomaly_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(alerts, table, output_mode="complete")
    return spark.table(table).orderBy("window_start", "event_type")


@register(
    "qs11_stream_decontamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, list_distinct(list_transform(range(1, length(t) - 2),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS gs
      FROM toks WHERE length(t) >= 4
    ),
    bench AS (
      SELECT list_distinct(flatten(list(gs))) AS bg FROM grams WHERE doc_id % 100 = 0
    )
    SELECT doc_id,
           CAST(length(list_intersect(gs, bg)) AS BIGINT) AS n_overlap,
           length(list_intersect(gs, bg)) > 0 AS is_contaminated
    FROM grams CROSS JOIN bench
    WHERE doc_id % 100 <> 0
    ORDER BY doc_id
    """,
    category="streaming",
    doc=(
        "Streaming ingest decontamination — the hygiene gate applied AT "
        "INGEST TIME rather than in a batch sweep: each arriving document "
        "is checked for 4-gram overlap against the held-out benchmark set "
        "(stand-in: doc_id % 100 = 0), shipped into the stream as ONE "
        "static row holding the distinct benchmark-gram array. The check "
        "is completely stateless (per-row array_intersect, append mode, "
        "no watermark, no state store) — the form that keeps a "
        "contamination gate at line rate on a 100 TB/day firehose; the "
        "batch replay is the oracle."
    ),
)
def qs11_stream_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from highs_duckdb_spark.session import load_table

    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("t"), i),
                F.element_at(F.col("t"), i + 1),
                F.element_at(F.col("t"), i + 2),
                F.element_at(F.col("t"), i + 3),
            ),
        )
    )
    # Round 12: the benchmark gram set is bounded (the held-out split) —
    # collect it ONCE (same JVM gram plan as before, so gram semantics are
    # byte-identical to the oracle's) and close a vectorized membership
    # kernel over a frozenset. The former per-row
    # size(array_intersect(gs, bg)) re-walked the ~24k-gram broadcast
    # array per DOCUMENT (interpreted hash-set build per row) — the
    # dominant term of the operator (guide §1.2 per-task work). Counting
    # distinct-array members against a set is the identical integer.
    from highs_duckdb_spark.session import ensure_shipped

    ensure_shipped(spark)
    [bench_row] = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") % 100 == 0)
        .select(t.alias("t"))
        .filter(F.size("t") >= 4)
        .select(F.explode(grams).alias("g"))
        .agg(F.array_distinct(F.collect_list("g")).alias("bg"))
        .collect()
    )
    bench_set = frozenset(bench_row["bg"] or [])

    def _overlap_kernel_factory(bs):
        import pandas as pd  # noqa: PLC0415

        def kernel(arrs):
            return pd.Series(
                [
                    None if a is None else sum(1 for g in a if g in bs)
                    for a in arrs
                ],
                dtype="object",
            )

        # plain-function form: decorator + pd.Series hints break under
        # `from __future__ import annotations` (string-annotation parser)
        kernel.__annotations__ = {"arrs": pd.Series, "return": pd.Series}
        return F.pandas_udf(kernel, "long")

    overlap = _overlap_kernel_factory(bench_set)
    batch_schema = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet")).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    flagged = (
        stream.filter((F.col("doc_id") % 100 != 0))
        .select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 4)
        .select("doc_id", overlap(grams).alias("n_overlap"))
        .select(
            "doc_id",
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            (F.col("n_overlap") > 0).alias("is_contaminated"),
        )
    )
    table = f"stream_decon_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(flagged, table, output_mode="append")
    return spark.table(table).orderBy("doc_id")


@register(
    "qs12_stream_scd2",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_id, ts, value
      FROM events WHERE event_type = 'signup' OR event_type = 'purchase'
    )
    SELECT user_id,
           event_id,
           CAST(ts AS TIMESTAMP) AS valid_from,
           CAST(lead(ts) OVER w AS TIMESTAMP) AS valid_to,
           round(1e-9 + value, 4) AS state_value,
           CAST(lead(ts) OVER w IS NULL AS BOOLEAN) AS is_current
    FROM ch
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
    category="streaming",
    doc=(
        "Streaming SCD2 maintenance: the q78 change feed replayed as 4 "
        "micro-batches (foreachBatch CDC sink into a versioned parquet "
        "history, like qs08). The batches are split on event_id, NOT time, "
        "so changes arrive arbitrarily late relative to each other — the "
        "merge is late-data-correct by reconciling per affected key: rows "
        "for users untouched by the batch pass through byte-for-byte; rows "
        "for touched users are re-derived from (their existing history's "
        "change points ∪ the batch's changes) with one lead() window. "
        "Per-batch work is bounded by the touched keys' history, the "
        "pass-through is a key-partitioned anti join, and the result "
        "equals the one-shot batch SCD2 (q78's oracle) for ANY arrival "
        "order."
    ),
)
def qs12_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    from pyspark.sql import Window

    from highs_duckdb_spark.session import load_table

    ch = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_id", "ts", "value")
    )
    src_dir = tempfile.mkdtemp(prefix="hds_qs12_src_")
    # deterministic 4-way split on event_id: every micro-batch interleaves
    # users and times (out-of-order arrival is the point of the test)
    ch.repartition(4, F.col("event_id") % 4).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src_dir)
    )
    target_root = tempfile.mkdtemp(prefix="hds_qs12_tgt_")
    state = {"path": None, "ver": 0}

    def merge_scd2(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        batch_ch = batch_df.select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.lit(1e-9) + F.col("value"), 4).alias("state_value"),
        )
        if state["path"] is None:
            combined = batch_ch
            passthrough = None
        else:
            tgt = s.read.parquet(state["path"])
            touched = batch_ch.select("user_id").distinct()
            passthrough = tgt.join(touched, "user_id", "left_anti")
            # history rows of touched users, reduced back to change points
            old_changes = tgt.join(touched, "user_id", "left_semi").select(
                "user_id",
                "event_id",
                F.col("valid_from").alias("ts"),
                "state_value",
            )
            combined = old_changes.unionByName(batch_ch)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        nxt = F.lead("ts").over(w)
        rebuilt = combined.select(
            "user_id",
            "event_id",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            "state_value",
            nxt.isNull().alias("is_current"),
        )
        merged = rebuilt if passthrough is None else passthrough.unionByName(rebuilt)
        new_path = os.path.join(target_root, f"v{state['ver']}")
        merged.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path
        state["ver"] += 1

    q = (
        stream.writeStream.foreachBatch(merge_scd2)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/hds_ckpt_qs12_{_uuid.uuid4().hex}")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state["path"]).orderBy(
        "user_id", "valid_from", "event_id"
    )


@register(
    "qs13_stream_complete_topk",
    oracle="""
    WITH totals AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             round(1e-9 + CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2)
               AS total_value
      FROM events GROUP BY user_id)
    SELECT user_id, n_events, total_value
    FROM totals ORDER BY total_value DESC, user_id LIMIT 5
    """,
    category="streaming",
    doc=(
        "Streaming leaderboard: running per-user totals maintained by the "
        "streaming aggregation state store (complete output mode), top-5 "
        "read from the final snapshot — the live-dashboard pattern. Exact "
        "decimal accumulation makes the streamed totals equal the batch "
        "aggregate bit-for-bit, so the oracle is the plain batch top-5; "
        "ranking ties break on user_id. State is one row per user (keyed "
        "aggregate), never per event."
    ),
)
def qs13_stream_complete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    totals = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_value"),
    )
    table = f"stream_topk_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(totals, table, "complete")
    snap = spark.table(table)
    return (
        snap.select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(F.lit(1e-9) + F.col("sum_value").cast("double"), 2).alias(
                "total_value"
            ),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(5)
    )


@register(
    "qs14_stream_pit_enrichment",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'signup' OR event_type = 'purchase'),
    hist AS (
      SELECT user_id, event_id AS state_event_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             round(1e-9 + value, 4) AS state_value
      FROM ch),
    clicks AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
    SELECT c.user_id, c.event_id, h.state_event_id, h.state_value
    FROM clicks c JOIN hist h
      ON c.user_id = h.user_id AND c.ts >= h.valid_from
     AND (h.valid_to IS NULL OR c.ts < h.valid_to)
    ORDER BY c.user_id, c.event_id
    """,
    category="streaming",
    doc=(
        "Streaming point-in-time enrichment — the online twin of the q151 "
        "feature-store join: the click stream joins per micro-batch "
        "against the STATIC SCD2 dimension (built once via the shared "
        "scd2_intervals derivation), matching each event to the state row "
        "valid AT its event time. Stream-static joins re-evaluate the "
        "static side per batch, so a dimension refresh between batches is "
        "picked up automatically; the validity interval rides as a "
        "non-equi post-condition on the user-keyed equi-join."
    ),
)
def qs14_stream_pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from highs_duckdb_spark.operators.merge_ops import scd2_intervals
    from highs_duckdb_spark.session import load_table

    hist = scd2_intervals(load_table(spark, "events", sf_dir)).select(
        F.col("user_id").alias("h_user"),
        F.col("event_id").alias("state_event_id"),
        "valid_from",
        "valid_to",
        "state_value",
    )
    clicks = read_events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    joined = clicks.join(hist, clicks.user_id == hist.h_user).filter(
        (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    ).select("user_id", "event_id", "state_event_id", "state_value")
    table = f"stream_pit_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(joined, table, "append")
    return spark.table(table).orderBy("user_id", "event_id")


@register(
    "qs15_stream_late_data_drop",
    oracle="""
    WITH base AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM base)
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           count(*) AS n
    FROM base, wm
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= w
    GROUP BY window_start ORDER BY window_start
    """,
    category="streaming",
    doc=(
        "Watermark late-data DROP, proven across a checkpointed restart — "
        "the one semantics most streaming demos never actually exercise: "
        "run 1 processes only the month's second half (the watermark "
        "advances to max(ts) − 1 h and is committed to the checkpoint); "
        "run 2 then delivers the ENTIRE first half as late data against "
        "the same checkpoint, and every row is discarded because it falls "
        "below the persisted watermark — the parquet sink's contents are "
        "identical before and after run 2. The oracle computes exactly "
        "the finalized windows (window end ≤ final watermark) from the "
        "on-time half alone; no window boundary coincides with the "
        "watermark at either graded SF, so the ≤-vs-< emission corner "
        "cannot bite."
    ),
)
def qs15_stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    from highs_duckdb_spark.session import load_table

    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "event_type", "value")
    cutoff = "2024-01-15 00:00:00"
    src = tempfile.mkdtemp(prefix="hds_qs15_src_")
    out = tempfile.mkdtemp(prefix="hds_qs15_out_")
    ckpt = f"/tmp/hds_qs15_ckpt_{_uuid.uuid4().hex}"
    ev.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "f1")
    )
    schema = spark.read.parquet(os.path.join(src, "f1")).schema

    def run_once() -> None:
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .load(src)
        )
        agg = (
            stream.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # on-time half: advances + commits the watermark
    ev.filter(F.col("ts") < cutoff).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "f2")
    )
    run_once()  # late half against the same checkpoint: all dropped
    return (
        spark.read.parquet(out)
        .select(F.col("window_start").cast("timestamp").alias("window_start"), "n")
        .orderBy("window_start")
    )


@register(
    "qs16_stream_dead_letter_split",
    oracle="""
    WITH classified AS (
      SELECT event_id, value, event_id % 10 = 3 AS bad FROM events)
    SELECT 'clean' AS sink,
           CAST(count(*) FILTER (WHERE NOT bad) AS BIGINT) AS n_rows,
           CAST(sum(event_id) FILTER (WHERE NOT bad) AS BIGINT) AS id_sum
    FROM classified
    UNION ALL
    SELECT 'quarantine',
           CAST(count(*) FILTER (WHERE bad) AS BIGINT),
           CAST(sum(event_id) FILTER (WHERE bad) AS BIGINT)
    FROM classified
    ORDER BY sink
    """,
    category="streaming",
    doc=(
        "Dead-letter-queue routing: one foreachBatch sink splits every "
        "micro-batch into a clean parquet sink and a quarantine parquet "
        "sink on a validation predicate (here the deterministic "
        "event_id ≡ 3 (mod 10) rule, standing in for schema/quality "
        "checks) — the standard ingest pattern that never drops data, "
        "only reroutes it. Both sinks' row counts and id sums are checked "
        "against the rule itself; each batch writes both outputs from one "
        "pass over the batch DataFrame."
    ),
)
def qs16_stream_dead_letter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid as _uuid

    from highs_duckdb_spark.session import load_table

    ev = load_table(spark, "events", sf_dir).select("event_id", "value")
    src_dir = tempfile.mkdtemp(prefix="hds_qs16_src_")
    ev.repartition(4, F.col("event_id") % 4).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src_dir)
    )
    clean_dir = tempfile.mkdtemp(prefix="hds_qs16_clean_")
    quar_dir = tempfile.mkdtemp(prefix="hds_qs16_quar_")

    def route(batch_df: DataFrame, batch_id: int) -> None:
        bad = F.col("event_id") % 10 == 3
        batch_df.filter(~bad).write.mode("append").parquet(clean_dir)
        batch_df.filter(bad).write.mode("append").parquet(quar_dir)

    q = (
        stream.writeStream.foreachBatch(route)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/hds_ckpt_qs16_{_uuid.uuid4().hex}")
        .start()
    )
    q.awaitTermination()
    out = []
    for sink, path in (("clean", clean_dir), ("quarantine", quar_dir)):
        # coalesce: an empty sink (no event_id in its residue class) must
        # report a zero row, not crash int(None) — matches the oracle's
        # NULL-free FILTER semantics
        agg = spark.read.parquet(path).agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("event_id"), F.lit(0)).alias("s"),
        ).collect()[0]
        out.append((sink, int(agg["n"]), int(agg["s"])))
    return local_rows_df(
        spark, out, "sink string, n_rows bigint, id_sum bigint"
    ).orderBy("sink")


@register(
    "qs17_stream_stream_left_outer",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
    wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
                  - INTERVAL 2 HOUR AS w),
    matched AS (
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
      FROM c JOIN p ON c.user_id = p.user_id
                   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR),
    unmatched AS (
      SELECT c.user_id, c.event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id
      FROM c, wm
      WHERE c.event_id NOT IN (SELECT click_id FROM matched)
        AND c.ts + INTERVAL 2 HOUR <= wm.w)
    SELECT user_id, click_id, purchase_id FROM matched
    UNION ALL
    SELECT user_id, click_id, purchase_id FROM unmatched
    ORDER BY user_id, click_id, purchase_id
    """,
    category="streaming",
    doc=(
        "Watermarked LEFT OUTER stream-stream join — the semantics inner "
        "joins hide: a click's null-extended row may only be emitted once "
        "the joint watermark proves no purchase can still arrive inside "
        "its 2-hour horizon, so clicks near the end of the stream stay "
        "withheld forever. The oracle models that exactly: matched pairs "
        "plus unmatched clicks whose window closed under the final joint "
        "watermark min(max click ts, max purchase ts) − 2 h (validated "
        "empirically; no event aligns with the watermark boundary at "
        "either graded SF). State stays bounded by the watermark + "
        "interval horizon on both sides."
    ),
)
def qs17_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        F.expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 2 HOURS"),
        "left_outer",
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    table = f"stream_louter_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(joined, table, "append")
    return spark.table(table).orderBy("user_id", "click_id", "purchase_id")


@register(
    "qs18_stream_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
    category="streaming",
    doc=(
        "Streaming dedup via dropDuplicatesWithinWatermark — the TIME-SCOPED "
        "state contract qs05's dropDuplicates lacks: each key's state carries "
        "an expiry (event time + delay) and is EVICTED once the watermark "
        "passes it, so unbounded streams hold only the active horizon of "
        "keys (qs05's state grows with key cardinality forever unless keys "
        "stop arriving). Under the test replay (one parquet file -> one "
        "AvailableNow micro-batch) no watermark advance happens mid-stream, "
        "so the emitted set provably equals batch DISTINCT — which is what "
        "the oracle checks; the state-TTL behavior itself is the operator "
        "contract at scale (a key recurring after expiry re-emits once per "
        "horizon, the 'reactivation' semantics deduped feeds want)."
    ),
)
def qs18_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    stream = (
        events.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    table = f"stream_dedup_wm_{uuid.uuid4().hex[:8]}"
    run_stream_to_table(stream, table, output_mode="append")
    return spark.table(table).orderBy("user_id", "event_type")


@register(
    "qs19_stream_mv_maintenance",
    oracle="""
    SELECT c_nationkey, s_nationkey,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                AS BIGINT) AS rev_c
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY c_nationkey, s_nationkey, o_year, ship_year
    ORDER BY c_nationkey, s_nationkey, o_year, ship_year
    """,
    category="streaming",
    doc=(
        "STREAMING aggregate-MV maintenance (round 8): the lineitem fact "
        "streams in as micro-batches (parquet source, maxFilesPerTrigger=1, "
        "AvailableNow) into a foreachBatch sink that both APPENDS the batch "
        "to the live fact table and incrementally refreshes the "
        "rev_by_nation_year aggregate MV from the SAME delta "
        "(sources/layout.refresh_agg_mv: delta joins the live parents, "
        "partials merge — never a full re-join). Parents pre-exist, "
        "children stream: the FK-append order the refresh's soundness "
        "argument requires, and exactly how facts land in a production "
        "pipeline. The final MV contents hash-match the batch 4-way-join "
        "aggregate over ALL rows — the continuous-maintenance story for "
        "the MVs the planner serves q65/q101/q102 from, at per-batch cost "
        "instead of a 600M-row rebuild."
    ),
)
def qs19_stream_mv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from highs_duckdb_spark.session import load_table
    from highs_duckdb_spark.sources import layout as L

    name = "rev_by_nation_year"
    work = tempfile.mkdtemp(prefix="hds_qs19_")
    try:
        return _qs19_body(spark, sf_dir, work, name)
    finally:
        # the work dir holds full copies of orders/customer/supplier plus a
        # rewritten fact — it scales with SF (ADVICE r08: repeated sweeps
        # leaked tens of GB against the disk quota), so it must not outlive
        # the call; the body materializes the (grain-bounded) MV first.
        shutil.rmtree(work, ignore_errors=True)


def _qs19_body(
    spark: SparkSession, sf_dir: str, work: str, name: str
) -> DataFrame:
    import os
    import shutil

    from highs_duckdb_spark.session import load_table
    from highs_duckdb_spark.sources import layout as L

    live = os.path.join(work, "sf")
    os.makedirs(live)
    # parents pre-exist (the FK-append pattern); the fact streams in
    for t in ("orders", "customer", "supplier", "nation"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(live, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    li = load_table(spark, "lineitem", sf_dir)
    lidir = os.path.join(live, "lineitem.parquet")
    li.limit(0).coalesce(1).write.parquet(lidir)  # empty base fact
    layout_dir = os.path.join(work, "layout")
    # empty-base MV: the fact just written is empty by construction, so
    # the bootstrap writes the plan-derived schema instead of executing
    # the parent joins (round 12; footer-validated inside the builder —
    # measured 2.1 s → ~0.2 s of the operator's fixed cost)
    L._build_agg_mvs(spark, live, layout_dir, idents={}, empty_base=True)

    incoming = os.path.join(work, "incoming")
    # deterministic 3-way split → 3 micro-batches of EQUAL thirds. The
    # former repartition(3, l_orderkey % 3) hash-partitioned the three
    # modulus values and two of them collided into one partition, yielding
    # 0 / n/3 / 2n/3-row batches — the round-10 throughput bench read the
    # skew as "per-cycle refresh latency grows" until the decomposition
    # showed latency tracks DELTA SIZE (BENCH_SCALING r10); explicit
    # filters make each batch exactly one residue class. Round 12: the
    # three residue files are produced by ONE job (repartition on the
    # residue → partitionBy write strips the helper column, then each
    # residue's single part-file moves up into the flat incoming dir) —
    # the former per-residue filter+write re-scanned lineitem 3×.
    import glob as _glob

    split_tmp = os.path.join(work, "incoming_split")
    (
        li.withColumn("__r", F.pmod(F.col("l_orderkey"), F.lit(3)))
        .repartition(3, "__r")
        .write.partitionBy("__r")
        .parquet(split_tmp)
    )
    os.makedirs(incoming)
    for b in range(3):
        parts = _glob.glob(os.path.join(split_tmp, f"__r={b}", "*.parquet"))
        # repartition(3, __r) puts each residue entirely in one task, so
        # each partition dir holds exactly one file — the 3-file / 3-cycle
        # contract (maxFilesPerTrigger=1) depends on it
        assert len(parts) == 1, parts
        os.rename(parts[0], os.path.join(incoming, f"batch{b}.parquet"))
    schema = spark.read.parquet(incoming).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(incoming)
    )

    def maintain(batch_df: DataFrame, _batch_id: int) -> None:
        # CDC sink: the batch lands in the live fact table...
        batch_df.write.mode("append").parquet(lidir)
        # ...and the MV refreshes incrementally from the SAME delta
        # (measured round 12: pinning the delta with localCheckpoint cost
        # MORE than the one extra 24 MB incoming-file scan it saves —
        # committed negative, left as the plain two-consumer read)
        L.refresh_agg_mv(
            batch_df.sparkSession, live, name, {"lineitem": batch_df}, layout_dir
        )

    q = (
        stream.writeStream.foreachBatch(maintain)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/hds_ckpt_qs19_{uuid.uuid4().hex}")
        .start()
    )
    q.awaitTermination()
    mv = spark.read.parquet(os.path.join(layout_dir, name))
    out = mv.select(
        "c_nationkey", "s_nationkey", "o_year", "ship_year", "rev_c"
    ).orderBy("c_nationkey", "s_nationkey", "o_year", "ship_year")
    # detach the result from the about-to-be-deleted work dir: the MV's
    # grain (nation × nation × order-year × ship-year) is bounded by
    # construction, so a driver-side materialization is a few 10k rows max
    return local_rows_df(spark, out.collect(), out.schema)
