"""Query registry — the driver contract.

Each entry pairs a Spark DataFrame builder `(spark, sf_dir) -> DataFrame`
with an equivalent DuckDB oracle SQL string over the same parquet tables
(driver registers views: region nation customer supplier part orders
lineitem events documents embeddings).

Engine-neutral determinism rules used throughout (so order-insensitive
value hashes match bit-for-bit across Spark and DuckDB):
- money/measure doubles (all 2 dp in the testdata) are summed as
  DECIMAL (exact, order-independent), cast to DOUBLE at the end;
  averages are exact-sum / count divided in double.
- timestamps are emitted as BIGINT epoch seconds (or ms), never as
  raw timestamp columns; the session timezone is forced to UTC.
- integer outputs are BIGINT on both engines (DuckDB sums promote to
  HUGEINT, Spark's to BIGINT — we cast explicitly).
- hashing is md5-based (identical everywhere); pseudo-randomness is
  integer arithmetic on md5 prefixes, never engine RNG.
- rankings always carry a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .session import tune
from .sources.tables import (
    load_table, normalize_ts, sensor_readings, SENSOR_READINGS_SQL)
from .operators import aggregations as agg
from .operators import dedup, joins, late_data, similarity, text, multimodal
from .operators.aggregations import dec
from .functions import scalar as scalar_fn


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, *tags: str):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags)
        return fn
    return deco


def _sensors(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return sensor_readings(spark, sf_dir)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


def _rebalance_scan(df: DataFrame) -> DataFrame:
    """UNUSED since r13 — kept as the record of a measured rejection.

    The r12 idea (guide §2.5, input skew / unsplittable files): when
    the scan yields fewer partitions than cores (single-row-group
    parquet fixtures), inject `repartition(defaultParallelism)` after
    the pushed filters so partial aggregates run core-wide; a no-op at
    production scale where splits >= cores.

    The r13 quiet-window interleaved A/B (18/18 pairs, same session,
    alternating per run) REVERSED the r12 in-session claim: the
    identity form beat the rebalanced form on every TPC-H head, 20-40%
    (q1 0.95 vs 1.10 s, q3 0.81 vs 1.17, q5 0.81 vs 1.40, q10 0.71 vs
    1.13, q18 1.05 vs 1.64, w_avg_temp 1.05 vs 1.17 — best-of-3 each).
    The round-robin exchange of the whole filtered scan plus the
    per-call `.rdd.getNumPartitions()` physical-plan compile cost more
    than the extra parallelism won back at bench volume, and at scale
    the helper never fires by construction — so the call sites were
    removed outright (OPTIMIZATION_r13.md). Plan shape returns to r11.

    BATCH-ONLY if ever reused: `.rdd` throws on a streaming DataFrame
    (guarded below, r12 VERDICT #4); the decision depends on core
    count and fixture layout, so plan dumps record defaultParallelism
    in their header (tools/dump_plans.py, r12 ADVICE)."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:  # plan-only, no job
        return df.repartition(par)
    return df


SENSORS_CTE = f"WITH sensors AS ({SENSOR_READINGS_SQL})"


# --- engine-exact 6-dp averages over the 2-dp `value` column ----------
# round(double_division, 6) is NOT engine-neutral at round-half ties:
# Spark's round goes through the double's SHORTEST decimal repr
# (BigDecimal.valueOf), DuckDB's rounds the raw binary value — a
# window at sf0.1 landed on avg = 2089.93/32 = 65.3103125 exactly and
# the two engines split on the final digit (r12 full-sf0.1-sweep
# find; the sf0.01 driver gate never hits a tie). The fix computes
# round-half-up on the EXACT rational instead: sum the values as
# integer cents, then one integer division implements half-up at 6 dp
# identically on both engines (value >= 0, exactly 2 dp — asserted of
# the events fixture; BIGINT headroom to ~4.6e14 cents per group,
# beyond which widen to DECIMAL(38,0)). The unrounded avg queries
# (w_avg_temp etc.) need none of this: identical division operands
# give identical doubles.

#: Spark aggregate: exact integer cent sum of `value`.
def _cents_sum(col: str = "value") -> F.Column:
    return F.sum(F.round(F.col(col) * 100).cast("long")).alias("sc")


#: Spark post-aggregate: half-up 6-dp average from (sc, cnt) as DOUBLE.
def _avg6(sc: str = "sc", cnt: str = "cnt") -> F.Column:
    return (F.expr(f"(2 * {sc} * 10000 + {cnt}) div (2 * {cnt})") / 1e6)


#: DuckDB twin of _cents_sum + _avg6 as one aggregate expression.
AVG6_SQL = ("((2 * SUM(CAST(round(value * 100) AS BIGINT)) * 10000"
            " + count(*)) // (2 * count(*))) / 1e6")


# --- engine-exact 6-dp ratios of nonnegative integers ------------------
# The same round-half-tie class as _avg6, for the count/count ratio
# sites (precision/recall, conditional probabilities, shares, dup
# fractions — r12 VERDICT #3 inventory): round(double(a/b), 6) splits
# between Spark (shortest-decimal-repr) and DuckDB (raw binary) when
# the exact rational a/b terminates at a 6-dp half, i.e. when the
# reduced denominator is 2^7 * 5^j — which count-valued denominators
# hit (the r12 tie had cnt = 32 over cents: denominator 3200). The fix
# computes half-up on the EXACT rational: one integer quotient
# (2a*10^6 + b) div (2b), identical on both engines. Preconditions:
# a >= 0, b > 0, a <= ~4.6e12 (2a*10^6 must fit BIGINT; counts at any
# test SF are orders of magnitude below — widen to DECIMAL(38,0) at
# the site if a corpus-scaled numerator can exceed it). Constant
# denominators whose reduction has fewer than seven 2s (e.g. /5, /16)
# can never tie and stay on F.round; transcendental values (log, exp,
# sqrt) have no exact decimal expansion and stay on F.round.

#: canonical implementations live with the scalar function surface so
#: the operator modules share them
_ratio6 = scalar_fn.ratio6
_ratio6_dec = scalar_fn.ratio6_dec


def _ratio12_dec(num: F.Column, n_vals: F.Column) -> F.Column:
    """round-half-up(num/(n_vals*10^12), 12) in DECIMAL(38,0) — the
    12-dp variant of _ratio6_dec for the int8-quant MSE."""
    d38 = "decimal(38,0)"
    n = num.cast(d38)
    d = n_vals.cast(d38) * F.lit(1_000_000_000_000)
    n2 = n * F.lit(2_000_000_000_000) + d
    d2 = d * F.lit(2)
    return (((n2 - F.pmod(n2, d2)) / d2)
            .cast(d38).cast("double") / F.lit(1e12))


def R6(a: str, b: str) -> str:
    """DuckDB twin of _ratio6 as a SQL fragment over expressions a, b."""
    return (f"(((2 * CAST(({a}) AS BIGINT) * 1000000 + ({b}))"
            f" // (2 * CAST(({b}) AS BIGINT))) / 1e6)")


# ======================================================================
# Reference surface: projections / filters / flatMap (SURVEY §2.2)
# ======================================================================

@register(
    "map_celsius",
    SENSORS_CTE + """
    SELECT event_id, id, (temperature - 32) * 5.0 / 9.0 AS celsius
    FROM sensors""",
    "reference", "P1",
)
def map_celsius(spark, sf_dir):
    """P1 — chapter1/AverageSensorReadings.scala:50-51."""
    s = _sensors(spark, sf_dir)
    return s.select("event_id", "id",
                    ((F.col("temperature") - 32) * 5.0 / 9.0).alias("celsius"))


@register(
    "filter_high_temp",
    SENSORS_CTE + """
    SELECT event_id, id, temperature FROM sensors WHERE temperature >= 25""",
    "reference", "P4",
)
def filter_high_temp(spark, sf_dir):
    """P4 — chapter5/BasicTransformations.scala:46-47. Predicate is
    pushed to the parquet scan."""
    s = _sensors(spark, sf_dir)
    return s.filter(F.col("temperature") >= 25).select("event_id", "id", "temperature")


@register(
    "flatmap_split_tokens",
    SENSORS_CTE + """
    SELECT token, count(*)::BIGINT AS cnt FROM (
      SELECT unnest(string_split(id, '_')) AS token FROM sensors
    ) GROUP BY token""",
    "reference", "P5",
)
def flatmap_split_tokens(spark, sf_dir):
    """P5 — chapter5/BasicTransformations.scala:62-63 ('sensor_7' ->
    ['sensor','7']), aggregated to keep output small."""
    s = _sensors(spark, sf_dir)
    return (
        s.select(F.explode(F.split(F.col("id"), "_")).alias("token"))
        .groupBy("token").agg(F.count("*").alias("cnt"))
    )


@register(
    "iso_format",
    SENSORS_CTE + """
    SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso FROM sensors""",
    "reference", "scalar",
)
def iso_format(spark, sf_dir):
    """§2.11 — epoch→ISO formatting (chapter8/TransactionalSinkExample.scala:83-85)."""
    s = _sensors(spark, sf_dir)
    return s.select("event_id",
                    F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso"))


# ======================================================================
# Rolling keyed aggregation (A2/A3)
# ======================================================================

@register(
    "rolling_max_by",
    SENSORS_CTE + """
    SELECT id, temperature, event_id FROM (
      SELECT id, temperature, event_id,
             row_number() OVER (PARTITION BY id
                                ORDER BY temperature DESC, event_id DESC) AS rn
      FROM sensors) WHERE rn = 1""",
    "reference", "A2",
)
def rolling_max_by(spark, sf_dir):
    """A2 — running max-by (chapter5/KeyedTransformations.scala:49-52);
    batch twin = final state. max(struct) gives lexicographic argmax
    with a unique tie-break, one shuffle with partial agg."""
    s = _sensors(spark, sf_dir)
    m = s.groupBy("id").agg(F.max(F.struct("temperature", "event_id")).alias("m"))
    return m.select("id", F.col("m.temperature").alias("temperature"),
                    F.col("m.event_id").alias("event_id"))


@register(
    "rolling_sum_final",
    SENSORS_CTE + """
    SELECT id, SUM(CAST(temperature AS DECIMAL(12,2)))::DOUBLE AS total
    FROM sensors GROUP BY id""",
    "reference", "A3",
)
def rolling_sum_final(spark, sf_dir):
    """A3 — rolling sum (chapter5/RollingSum.scala:31-33), final state."""
    s = _sensors(spark, sf_dir)
    return s.groupBy("id").agg(agg.exact_sum("temperature", "total"))


@register(
    "rolling_sum_trace",
    SENSORS_CTE + """
    SELECT event_id, id,
           (SUM(CAST(temperature AS DECIMAL(12,2)))
              OVER (PARTITION BY id ORDER BY event_id))::DOUBLE AS running_sum
    FROM sensors""",
    "reference", "A3",
)
def rolling_sum_trace(spark, sf_dir):
    """A3 with the reference's per-record emission cadence: cumulative
    sum in arrival order — the exact update-mode output history."""
    s = _sensors(spark, sf_dir)
    w = Window.partitionBy("id").orderBy("event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return s.select(
        "event_id", "id",
        F.sum(dec("temperature")).over(w).cast("double").alias("running_sum"),
    )


@register(
    "high_count",
    SENSORS_CTE + """
    SELECT id, count(*)::BIGINT AS high_count FROM sensors
    WHERE temperature > 100 GROUP BY id""",
    "reference", "A11",
)
def high_count(spark, sf_dir):
    """A11/A12 — HighTempCounter (chapter7/OperatorListStateFunction.scala:62-69)
    re-modeled as keyed count (per-subtask counts are an execution
    artifact, not a query semantic)."""
    return agg.high_count(_sensors(spark, sf_dir), threshold=100.0)


# ======================================================================
# Windowed aggregation (A4-A10, W1-W5) — epoch-second window bounds
# ======================================================================

def _win_sql(size_s: int, start: bool = True) -> str:
    col = "start" if start else "end"
    off = 0 if start else size_s
    return f"(epoch_us(ts) // {size_s * 1_000_000}) * {size_s} + {off}"


@register(
    "w_avg_temp",
    SENSORS_CTE + f"""
    SELECT {_win_sql(10)} AS window_start, id,
           ((SUM(CAST(temperature AS DECIMAL(12,2)))::DOUBLE / count(*)) - 32)
             * 5.0 / 9.0 AS avg_celsius
    FROM sensors GROUP BY 1, 2""",
    "reference", "A5", "W1", "flagship",
)
def w_avg_temp(spark, sf_dir):
    """FLAGSHIP — chapter1/AverageSensorReadings.scala:48-57: tumbling
    10 s window per sensor, average temperature in Celsius. The
    reference's explicit AggregateFunction partial/final merge is
    Catalyst's partial HashAggregate, for free."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.window("ts", "10 seconds"), "id").agg(
        F.sum(dec("temperature")).alias("s"), F.count(F.lit(1)).alias("c"))
    return out.select(
        F.col("window.start").cast("long").alias("window_start"),
        "id",
        ((F.col("s").cast("double") / F.col("c") - 32) * 5.0 / 9.0).alias("avg_celsius"),
    )


@register(
    "w_min_temp",
    SENSORS_CTE + f"""
    SELECT {_win_sql(15)} AS window_start, id, min(temperature) AS min_temp
    FROM sensors GROUP BY 1, 2""",
    "reference", "A4", "W1",
)
def w_min_temp(spark, sf_dir):
    """A4 — 15 s tumbling min (chapter6/WindowFunctions.scala:37-41)."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.window("ts", "15 seconds"), "id").agg(
        F.min("temperature").alias("min_temp"))
    return out.select(F.col("window.start").cast("long").alias("window_start"),
                      "id", "min_temp")


@register(
    "w_min_max_temp",
    SENSORS_CTE + f"""
    SELECT {_win_sql(5, start=False)} AS window_end, id,
           min(temperature) AS min_temp, max(temperature) AS max_temp
    FROM sensors GROUP BY 1, 2""",
    "reference", "A6", "A7",
)
def w_min_max_temp(spark, sf_dir):
    """A6/A7 — MinMaxTemp with window end
    (chapter6/WindowFunctions.scala:56-72,107-143)."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.window("ts", "5 seconds"), "id").agg(
        F.min("temperature").alias("min_temp"),
        F.max("temperature").alias("max_temp"))
    return out.select(F.col("window.end").cast("long").alias("window_end"),
                      "id", "min_temp", "max_temp")


@register(
    "w_count_30s",
    SENSORS_CTE + f"""
    SELECT {_win_sql(30, start=False)} AS window_end, id,
           count(*)::BIGINT AS cnt
    FROM sensors GROUP BY 1, 2""",
    "reference", "A9", "W3", "W4",
)
def w_count_30s(spark, sf_dir):
    """A9/W3 — the custom ThirtySecondsWindows assigner + CountFunction
    (chapter6/CustomWindow.scala:56-84,152-168): identical bucketing
    arithmetic (ts - ts % 30s) via window('30 seconds')."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.window("ts", "30 seconds"), "id").agg(
        F.count("*").alias("cnt"))
    return out.select(F.col("window.end").cast("long").alias("window_end"),
                      "id", "cnt")


@register(
    "w_global_avg",
    SENSORS_CTE + f"""
    SELECT {_win_sql(60, start=False)} AS window_end,
           SUM(CAST(temperature AS DECIMAL(12,2)))::DOUBLE / count(*) AS avg_temp
    FROM sensors GROUP BY 1""",
    "reference", "A10", "W2",
)
def w_global_avg(spark, sf_dir):
    """A10/W2 — non-keyed global window average
    (chapter8/TransactionalSinkExample.scala:78-89). Flink forces
    parallelism 1 here; Spark still computes distributed partials."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.window("ts", "60 seconds")).agg(
        F.sum(dec("temperature")).alias("s"), F.count(F.lit(1)).alias("c"))
    return out.select(
        F.col("window.end").cast("long").alias("window_end"),
        (F.col("s").cast("double") / F.col("c")).alias("avg_temp"),
    )


@register(
    "w_session_stats",
    SENSORS_CTE + """
    , x AS (SELECT id, epoch_us(ts) AS tu, temperature FROM sensors),
    f AS (
      SELECT id, tu, temperature,
             CASE WHEN lag(tu) OVER w IS NULL
                    OR tu - lag(tu) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM x WINDOW w AS (PARTITION BY id ORDER BY tu)),
    g AS (
      SELECT id, tu, temperature,
             sum(new_s) OVER (PARTITION BY id ORDER BY tu
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM f)
    SELECT id, min(tu) AS session_start_us,
           max(tu) + 1800000000 AS session_end_us,
           count(*)::BIGINT AS cnt,
           SUM(CAST(temperature AS DECIMAL(12,2)))::DOUBLE / count(*)
             AS avg_temp
    FROM g GROUP BY id, sid""",
    "reference", "W1", "session",
)
def w_session_stats(spark, sf_dir):
    """Session (gap) windows — the one everyday window family the
    reference's examples never exercise (SURVEY §2.5: the book covers
    session windows, chapter6/WindowFunctions.scala:37-72 is
    tumbling-only). Per sensor, readings closer than a 30-minute gap
    merge into one session; a gap > 30 min closes it (Spark merges
    at exactly diff == gap — pinned by test). Native
    `session_window` keeps the merge logic JVM-side (and is the same
    operator Structured Streaming uses for streaming sessionization
    with watermark-driven eviction). Session end = last event + gap,
    exactly Spark's definition; bounds are emitted as epoch
    MICROSECONDS (the data's native resolution) so both engines agree
    bit-for-bit. Oracle = the classic islands construction: a
    new-session flag via lag(), a running sum to number sessions, one
    group-by. Scale shape: one shuffle on id (session merge is a
    per-key sort, no pair blowup), partial aggregation applies, and
    the output is session-sized, never event-squared."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.session_window("ts", "30 minutes"), "id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("temperature")).alias("sm"))
    return out.select(
        "id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.col("sm").cast("double") / F.col("cnt")).alias("avg_temp"),
    )


@register(
    "w_session_dynamic_gap",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS tu,
             (300 + (event_id % 3) * 600) * 1000000 AS g, value
      FROM events),
    f AS (
      SELECT event_type, tu, g, value,
             max(tu + g) OVER (PARTITION BY event_type ORDER BY tu, g
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
      FROM e),
    s AS (
      SELECT event_type, tu, g, value,
             sum(CASE WHEN prev_end IS NULL OR tu > prev_end
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY tu, g
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM f)
    SELECT event_type,
           min(tu) AS session_start_us,
           max(tu + g) AS session_end_us,
           count(*)::BIGINT AS cnt,
           {AVG6_SQL} AS avg_value
    FROM s GROUP BY event_type, sid""",
    "reference", "W1", "session", "dynamic-gap",
)
def w_session_dynamic_gap(spark, sf_dir):
    """Session windows with a PER-ROW gap expression — the adaptive
    sessionization Spark supports natively (`session_window(ts,
    <interval column>)`): each event opens a window [t, t + gap(row))
    and overlapping windows merge, so e.g. purchase-like events can
    hold a session open longer than views. Gap here is a
    deterministic function of event_id (5/15/25 min by id % 3) so
    the oracle can replay the merge: per key, a session continues
    while an event's time is <= the running max of (t_i + gap_i)
    (the same inclusive boundary as the fixed-gap form), i.e. a
    running-max islands construction. Session end = max(t_i + g_i),
    NOT last-event + constant — the dynamic semantics the fixed-gap
    oracle cannot express. One keyed shuffle, JVM-side merge."""
    ev = _t(spark, sf_dir, "events")
    # session_window wants CalendarIntervalType: string durations
    # cast there; ANSI INTERVAL literals (DayTimeIntervalType) do not
    gap = (F.when(F.col("event_id") % 3 == 0, F.lit("5 minutes"))
           .when(F.col("event_id") % 3 == 1, F.lit("15 minutes"))
           .otherwise(F.lit("25 minutes")))
    out = ev.groupBy(F.session_window("ts", gap), "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        _cents_sum("value"))
    return out.select(
        "event_type",
        F.unix_micros(F.col("session_window.start"))
         .alias("session_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
        F.col("cnt").cast("bigint").alias("cnt"),
        _avg6().alias("avg_value"),
    )


@register(
    "w_sliding_avg",
    SENSORS_CTE + """
    SELECT (epoch_us(ts) // 900000000) * 900 - k.k * 900 AS window_start,
           id, count(*)::BIGINT AS cnt,
           SUM(CAST(temperature AS DECIMAL(12,2)))::DOUBLE / count(*)
             AS avg_temp
    FROM sensors CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1, 2""",
    "reference", "W1", "sliding",
)
def w_sliding_avg(spark, sf_dir):
    """Sliding (hopping) windows — the other window family the
    reference's examples skip (SURVEY §2.5; the book's slidingWindow
    discussion has no runnable example). 1-hour windows hopping every
    15 minutes, keyed by sensor: each reading lands in exactly
    size/slide = 4 overlapping windows. Spark's window(size, slide)
    expands each row to its covering windows BEFORE the partial
    aggregate, so the shuffle moves 4 partial rows per (window, key),
    not 4 copies of the data — the same map-side-combine shape as the
    tumbling queries. Oracle: enumerate the 4 covering windows per row
    with a 4-row cross join (start = floor(t/slide)*slide - k*slide,
    k < size/slide, always > t - size when slide divides size).
    Window starts are slide-aligned whole seconds -> BIGINT epoch s."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.window("ts", "1 hour", "15 minutes"), "id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("temperature")).alias("sm"))
    return out.select(
        F.col("window.start").cast("long").alias("window_start"),
        "id",
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.col("sm").cast("double") / F.col("cnt")).alias("avg_temp"),
    )


# ======================================================================
# Stateful per-record processing — batch twins (F1/F2)
# ======================================================================

@register(
    "alert_temp_delta",
    SENSORS_CTE + """
    SELECT event_id, id, temperature, diff FROM (
      SELECT event_id, id, temperature,
             temperature - lag(temperature) OVER
               (PARTITION BY id ORDER BY event_id) AS diff
      FROM sensors) WHERE abs(diff) > 17""",
    "reference", "F2",
)
def alert_temp_delta(spark, sf_dir):
    """F2 — TemperatureAlertFunction (chapter7/KeyedStateFunction.scala:73-100):
    emit (id, temp, diff) when |temp - lastTemp| > threshold. Batch twin
    of the keyed-state flatMap via lag(); streaming form lives in
    streaming/stateful.py."""
    s = _sensors(spark, sf_dir)
    w = Window.partitionBy("id").orderBy("event_id")
    return (
        s.withColumn("diff", F.col("temperature") - F.lag("temperature").over(w))
        .filter(F.abs(F.col("diff")) > 17)
        .select("event_id", "id", "temperature", "diff")
    )


@register(
    "alert_temp_increase",
    SENSORS_CTE + """
    SELECT event_id, id FROM (
      SELECT event_id, id, temperature,
             lag(temperature) OVER (PARTITION BY id ORDER BY event_id) AS prev
      FROM sensors) WHERE temperature > prev""",
    "reference", "F1",
)
def alert_temp_increase(spark, sf_dir):
    """F1 — TempIncreaseAlertFunction (chapter6/ProcessFunctionTimers.scala:42-97)
    batch twin: readings whose temperature rose vs the previous reading
    of the same sensor. Timer semantics are covered by the streaming
    implementation (streaming/stateful.py) + tests."""
    s = _sensors(spark, sf_dir)
    w = Window.partitionBy("id").orderBy("event_id")
    return (
        s.withColumn("prev", F.lag("temperature").over(w))
        .filter(F.col("temperature") > F.col("prev"))
        .select("event_id", "id")
    )


# ======================================================================
# Multi-stream correlation (J1-J5)
# ======================================================================

_SMOKE_SQL = (
    "(VALUES (TIMESTAMP '2024-01-01 00:00:00','Low'),"
    "(TIMESTAMP '2024-01-05 00:00:00','High'),"
    "(TIMESTAMP '2024-01-10 00:00:00','Low'),"
    "(TIMESTAMP '2024-01-20 00:00:00','High'),"
    "(TIMESTAMP '2024-01-25 00:00:00','Low')) AS sm(sts, level)"
)


@register(
    "asof_smoke_alert",
    SENSORS_CTE + f"""
    , enriched AS MATERIALIZED (
      SELECT s.event_id, s.id, s.temperature, sm.level
      FROM sensors s ASOF LEFT JOIN {_SMOKE_SQL} ON s.ts >= sm.sts)
    SELECT event_id, id, temperature FROM enriched
    WHERE level = 'High' AND temperature > 100""",
    "reference", "J1",
)
def asof_smoke_alert(spark, sf_dir):
    """J1 — RaiseAlertFlatMap (chapter5/MultiStreamTransformations.scala:77-91):
    alert when temperature > 100 while the control stream's latest value
    is High — an as-of join against the control stream (our as-of
    operator; DuckDB oracle uses native ASOF JOIN)."""
    from .sources.fixtures import smoke_levels_batch
    s = _sensors(spark, sf_dir)
    smoke = smoke_levels_batch(spark)
    enriched = joins.asof_join(s, smoke, ts="ts", right_cols=["level"])
    return (
        enriched.filter((F.col("level") == "High") & (F.col("temperature") > 100))
        .select("event_id", "id", "temperature")
    )


_SWITCHES_SQL = (
    "(VALUES ('sensor_2', TIMESTAMP '2024-01-03 00:00:00', 172800000),"
    "('sensor_7', TIMESTAMP '2024-01-15 00:00:00', 432000000)) "
    "AS sw(id, enable_ts, duration_ms)"
)


@register(
    "switch_forward",
    SENSORS_CTE + f"""
    SELECT s.event_id, s.id FROM sensors s JOIN {_SWITCHES_SQL}
      ON s.id = sw.id
     AND epoch_us(s.ts) >= epoch_us(sw.enable_ts)
     AND epoch_us(s.ts) < epoch_us(sw.enable_ts) + sw.duration_ms::BIGINT * 1000""",
    "reference", "J2",
)
def switch_forward(spark, sf_dir):
    """J2 — ReadingFilter (chapter6/CoProcessFunctionTimers.scala:49-102):
    a switch enables forwarding a sensor's readings for duration_ms.
    Relational form: broadcast interval join; the processing-time-timer
    form lives in streaming/stateful.py."""
    s = _sensors(spark, sf_dir)
    sw = spark.createDataFrame(
        [("sensor_2", "2024-01-03 00:00:00", 172_800_000),
         ("sensor_7", "2024-01-15 00:00:00", 432_000_000)],
        ["id", "enable_str", "duration_ms"],
    ).select("id", F.to_timestamp("enable_str").alias("enable_ts"), "duration_ms")
    r = s.alias("r")
    j = r.join(
        F.broadcast(sw).alias("s"),
        (F.col("r.id") == F.col("s.id"))
        & (F.expr("unix_micros(r.ts) >= unix_micros(s.enable_ts)"))
        & (F.expr("unix_micros(r.ts) < unix_micros(s.enable_ts) + s.duration_ms * 1000")),
        "inner",
    )
    return j.select(F.col("r.event_id").alias("event_id"), F.col("r.id").alias("id"))


_LOCATIONS_SQL = (
    "(VALUES " + ",".join(
        f"('sensor_{i}', 'room_{i % 10}')" for i in range(1, 11)
    ) + ") AS loc(sensor, room)"
)


@register(
    "enrich_locations",
    SENSORS_CTE + f"""
    SELECT s.event_id, s.id, loc.room
    FROM sensors s LEFT JOIN {_LOCATIONS_SQL} ON s.id = loc.sensor""",
    "reference", "J3", "J4",
)
def enrich_locations(spark, sf_dir):
    """J3/J4 — the Derby lookup enrichment
    (chapter8/AsyncFunctionExample.scala:103-204) as a broadcast hash
    join: micro-batch join replaces per-record async I/O; the 100 TB
    fact side never shuffles."""
    s = _sensors(spark, sf_dir)
    dim = spark.createDataFrame(
        [(f"sensor_{i}", f"room_{i % 10}") for i in range(1, 11)],
        ["sensor", "room"],
    )
    out = joins.enrichment_join(s, dim, on=[s.id == dim.sensor], how="left")
    return out.select("event_id", "id", "room")


_RULES_SQL = (
    "(VALUES ('sensor_1',5.0,1),('sensor_2',0.9,2),('sensor_3',0.5,3),"
    "('sensor_1',1.2,4),('sensor_3',0.0,5)) AS r(id, threshold, seq)"
)


@register(
    "broadcast_thresholds",
    SENSORS_CTE + f"""
    , rules AS (
      SELECT id, threshold FROM (
        SELECT id, threshold,
               row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
        FROM {_RULES_SQL}) WHERE rn = 1 AND threshold != 0.0)
    SELECT s.event_id, s.id, s.temperature, r.threshold
    FROM sensors s JOIN rules r ON s.id = r.id
    WHERE s.temperature > r.threshold""",
    "reference", "J5",
)
def broadcast_thresholds(spark, sf_dir):
    """J5 — KeyedBroadcastProcessFunction
    (chapter7/BroadcastStateFunction.scala:69-126): rule changelog
    collapsed to latest-per-key (deletes = threshold 0.0), broadcast,
    alert where temperature exceeds the rule."""
    from .sources.fixtures import threshold_updates
    s = _sensors(spark, sf_dir)
    out = joins.broadcast_rules_join(s, threshold_updates(spark))
    return out.select("event_id", "id", "temperature", "threshold")


# ======================================================================
# Late data (T1-T7) — deterministic out-of-order twin
# ======================================================================

_SHIFT_SQL = (
    "(('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 600000)"
)
_LATE_CTE = SENSORS_CTE + f"""
    , shifted AS (
      SELECT event_id, id, timestamp + {_SHIFT_SQL} AS ts2_ms
      FROM sensors),
    marked AS (
      SELECT event_id, id, ts2_ms,
             max(ts2_ms) OVER (ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING) - 60000 AS wm_ms
      FROM shifted)
"""


def _shifted_sensors(spark, sf_dir):
    """Deterministically out-of-order sensor stream: P6's
    TimestampShuffler (chapter6/LateDataHandling.scala:175-183) with an
    md5-derived shift so both engines agree."""
    s = _sensors(spark, sf_dir)
    shift = (F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
             .cast("bigint") % 600_000)
    return s.select("event_id", "id", (F.col("timestamp") + shift).alias("ts2_ms"))


@register(
    "late_classify",
    _LATE_CTE + """
    SELECT event_id, (ts2_ms < wm_ms)::INT AS is_late FROM marked""",
    "reference", "T5", "T6", "P6",
)
def late_classify(spark, sf_dir):
    """T5/T6 — LateReadingsFilter (chapter6/LateDataHandling.scala:60-76):
    per-row late classification against the running watermark
    (max event time seen in arrival order − 60 s). SS drops these rows
    silently; this is the row-level capture, and
    numRowsDroppedByWatermark is the streaming observability twin."""
    sh = _shifted_sensors(spark, sf_dir)
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding,
                                               Window.currentRow)
    return sh.select(
        "event_id",
        (F.col("ts2_ms") < (F.max("ts2_ms").over(w) - 60_000)).cast("int").alias("is_late"),
    )


@register(
    "late_window_updates",
    _LATE_CTE + """
    , accepted AS (
      SELECT id, (ts2_ms // 1000 // 3600) * 3600 + 3600 AS window_end,
             (ts2_ms < wm_ms)::INT AS is_late, wm_ms
      FROM marked)
    SELECT id, window_end, count(*)::BIGINT AS cnt,
           sum(is_late)::BIGINT AS update_cnt
    FROM accepted
    WHERE wm_ms < window_end * 1000 + 300000
    GROUP BY id, window_end""",
    "reference", "T7",
)
def late_window_updates(spark, sf_dir):
    """T7 — allowedLateness + UpdatingWindowCountFunction
    (chapter6/LateDataHandling.scala:112-172): per key+window count of
    rows accepted while the window was open (watermark 60 s + 5 min
    allowed lateness on 1 h windows); update_cnt = late-but-accepted
    rows (the reference's 'update' re-fires)."""
    sh = _shifted_sensors(spark, sf_dir)
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding,
                                               Window.currentRow)
    marked = sh.select(
        "event_id", "id", "ts2_ms",
        (F.max("ts2_ms").over(w) - 60_000).alias("wm_ms"),
    )
    win_end = F.expr("ts2_ms div 1000 div 3600") * 3600 + 3600  # exact int div
    accepted = marked.select(
        "id", win_end.alias("window_end"),
        (F.col("ts2_ms") < F.col("wm_ms")).cast("int").alias("is_late"),
        "wm_ms",
    ).filter(F.col("wm_ms") < F.col("window_end") * 1000 + 300_000)
    return accepted.groupBy("id", "window_end").agg(
        F.count("*").alias("cnt"),
        F.sum("is_late").cast("bigint").alias("update_cnt"),
    )


@register(
    "side_output_freezing",
    SENSORS_CTE + """
    SELECT event_id, 'Freezing Alarm for ' || id AS alarm, temperature
    FROM sensors WHERE temperature < 32""",
    "reference", "O1",
)
def side_output_freezing(spark, sf_dir):
    """O1 — FreezingMonitor side output (chapter6/SideOutputs.scala:50-67).
    The main output is the input stream itself; this is the side branch
    (Catalyst shares the scan between branches)."""
    s = _sensors(spark, sf_dir)
    return s.filter(F.col("temperature") < 32).select(
        "event_id",
        F.concat(F.lit("Freezing Alarm for "), F.col("id")).alias("alarm"),
        "temperature",
    )


# ======================================================================
# Relational suite (TPC-H-style) — the general analytics surface a
# complete engine needs; also the bench headliners. All money math goes
# through DECIMAL for engine-exact, order-independent results.
# ======================================================================

_DISC_PRICE = ("CAST(l_extendedprice AS DECIMAL(10,2)) * "
               "(CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))")
_CHARGE = _DISC_PRICE + " * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"


def _disc_price():
    one = F.lit(1.0).cast("decimal(3,2)")
    return dec("l_extendedprice", 10, 2) * (one - dec("l_discount", 3, 2))


def _charge():
    one = F.lit(1.0).cast("decimal(3,2)")
    return _disc_price() * (one + dec("l_tax", 3, 2))


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_quantity AS DECIMAL(10,2)))::DOUBLE AS sum_qty,
           SUM(CAST(l_extendedprice AS DECIMAL(10,2)))::DOUBLE AS sum_base_price,
           SUM(""" + _DISC_PRICE + """)::DOUBLE AS sum_disc_price,
           SUM(""" + _CHARGE + """)::DOUBLE AS sum_charge,
           SUM(CAST(l_quantity AS DECIMAL(10,2)))::DOUBLE / count(*) AS avg_qty,
           SUM(CAST(l_extendedprice AS DECIMAL(10,2)))::DOUBLE / count(*) AS avg_price,
           SUM(CAST(l_discount AS DECIMAL(3,2)))::DOUBLE / count(*) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
    "relational", "bench",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 pricing summary. Single scan + single partial/final
    hash aggregate on 6 groups; shipdate predicate pushed to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    filtered = li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
    return filtered.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity", 10, 2)).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice", 10, 2)).cast("double").alias("sum_base_price"),
        F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(_charge()).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity", 10, 2)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        (F.sum(dec("l_extendedprice", 10, 2)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        (F.sum(dec("l_discount", 3, 2)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           SUM(""" + _DISC_PRICE + """)::DOUBLE AS revenue,
           epoch_us(o_orderdate) // 1000000 AS o_orderdate_s,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10""",
    "relational", "bench",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3: top-10 unshipped orders by revenue. The customer side
    is left to the planner (r12 review fix: a hard F.broadcast hint is
    honored regardless of size, and customer scales with SF — forcing
    it would OOM the driver at 100 TB; at test SF the static size
    estimate broadcasts it anyway, and AQE converts at runtime
    wherever the built side measures small). orders↔lineitem is the
    only unavoidable big shuffle."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15 00:00:00")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15 00:00:00")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    out = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_disc_price()).cast("double").alias("revenue"))
    return (
        out.select(
            "l_orderkey", "revenue",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority""",
    "relational",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4-style: priority counts for orders with a late-shipping
    lineitem — LEFT SEMI join (no fact duplication, early exit)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00"))
    li = _t(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q5_local_supplier",
    """
    SELECT n_name, SUM(""" + _DISC_PRICE + """)::DOUBLE AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                                AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name""",
    "relational", "bench",
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5: local-supplier revenue by nation. nation/region
    (fixed cardinality) are broadcast-hinted; customer/supplier are
    SF-scaled so the planner decides (broadcast at test SF via the
    static estimate, AQE-converted or shuffled at scale — r12). The
    plan is one big fact shuffle (orders↔lineitem) with the dimension
    joins hanging off it."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-01-01 00:00:00"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier are SF-scaled: no broadcast hint (r12 —
        # planner/AQE broadcasts them while they measure small, shuffle
        # at 100 TB); nation (25) / region (5) stay hinted
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp,
              (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(F.sum(_disc_price()).cast("double").alias("revenue"))


@register(
    "q6_forecast_revenue",
    """
    SELECT SUM(CAST(l_extendedprice AS DECIMAL(10,2))
               * CAST(l_discount AS DECIMAL(3,2)))::DOUBLE AS revenue,
           count(*)::BIGINT AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24""",
    "relational", "bench",
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: pure scan-filter-agg — every predicate pushes into the
    parquet scan; zero shuffle (single global agg)."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return f.agg(
        F.sum(dec("l_extendedprice", 10, 2) * dec("l_discount", 3, 2))
        .cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           SUM(""" + _DISC_PRICE + """)::DOUBLE AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20""",
    "relational", "bench",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned revenue."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-07-01 00:00:00"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)  # SF-scaled: no hint
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    out = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_disc_price()).cast("double").alias("revenue"))
    return out.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, SUM(volume)::DOUBLE AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate)::BIGINT AS l_year, """ + _DISC_PRICE + """ AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year""",
    "relational",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume by year. nation is broadcast
    twice (supplier side / customer side); the nation-name disjunction
    prunes most rows right after the broadcasts; lineitem↔orders is
    the only big shuffle. supplier/customer joins are left to AQE,
    which broadcasts while they fit and falls back to shuffle joins at
    larger SFs."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00"))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


@register(
    "q8_market_share",
    """
    SELECT o_year,
           (SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0.00 AS DECIMAL(10,2)) END)::DOUBLE
            / SUM(volume)::DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate)::BIGINT AS o_year,
             """ + _DISC_PRICE + """ AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year""",
    "relational",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: NATION_3's share of ECONOMY-part revenue in AMERICA by
    order year. Conditional aggregate keeps one pass over the joined
    fact; both sums stay DECIMAL until the final division."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00"))
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    zero = F.lit("0.00").cast("decimal(10,2)")
    return j.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        (F.sum(F.when(F.col("supp_nation") == "NATION_3", _disc_price())
               .otherwise(zero)).cast("double")
         / F.sum(_disc_price()).cast("double")).alias("mkt_share"))


@register(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, SUM(amount)::DOUBLE AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
             """ + _DISC_PRICE + """ AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'PROMO'
    ) profit
    GROUP BY nation, o_year""",
    "relational",
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 adapted: the testdata has no partsupp table, so profit
    reduces to discounted revenue of PROMO parts by supplier nation and
    order year (the join/agg shape of Q9 without the ps_supplycost
    term)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(F.sum(_disc_price()).cast("double").alias("sum_profit"))


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*)::BIGINT AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count""",
    "relational",
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of orders-per-customer (zero included
    via the left outer join). Two aggregations; the second groups on
    the first's output so it reuses the shuffle only logically —
    c_count has few distinct values, so the second agg is cheap."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_effect",
    """
    SELECT (100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN """ + _DISC_PRICE + """
                         ELSE CAST(0.00 AS DECIMAL(10,2)) END)::DOUBLE
            / SUM(""" + _DISC_PRICE + """)::DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""",
    "relational",
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14: promo revenue share for one month. The shipdate range
    is pushed to the parquet scan; part join is AQE's choice (broadcast
    at test SFs, shuffle at scale)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01 00:00:00")
        & (F.col("l_shipdate") < "1997-10-01 00:00:00"))
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    zero = F.lit("0.00").cast("decimal(10,2)")
    return j.agg(
        (F.lit(100.0)
         * F.sum(F.when(F.col("p_type") == "PROMO", _disc_price())
                 .otherwise(zero)).cast("double")
         / F.sum(_disc_price()).cast("double")).alias("promo_revenue"))


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(""" + _DISC_PRICE + """) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue::DOUBLE AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""",
    "relational",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with max quarterly revenue. The revenue
    CTE computes once — literally: the supplier-sized aggregate is
    lazily checkpointed so the max branch and the join branch share
    ONE lineitem scan (was two; r6 plan fix, byte-identical). The max
    is a broadcast scalar (1 row), not a sort — ties are all returned,
    and DECIMAL sums make the equality exact on both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-04-01 00:00:00"))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue"))
        .localCheckpoint(eager=False))
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev),
                     revenue.total_revenue == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name",
                F.col("total_revenue").cast("double").alias("total_revenue"))
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p_brand, p_type, p_size""",
    "relational",
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 adapted: no partsupp table, so the part↔supplier
    relation observed in lineitem stands in for it. Distinct-aggregate
    over the joined fact; Catalyst plans the distinct as a two-phase
    aggregate (partial distinct per partition, then final)."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))


@register(
    "q17_small_quantity_revenue",
    """
    WITH part_avg AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(10,2)))::DOUBLE / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT (SUM(CAST(l_extendedprice AS DECIMAL(10,2)))::DOUBLE / 7.0) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < 0.2 * avg_qty""",
    "relational",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders. The correlated
    subquery (per-part average quantity) is decorrelated into an
    aggregate + self-join — the plan Catalyst produces for the SQL form
    too. The average is exact-decimal-sum / count, so the 0.2*avg
    threshold bit-matches across engines and partitionings."""
    li = _t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.sum(dec("l_quantity", 10, 2)).cast("double") / F.count(F.lit(1)))
        .alias("avg_qty"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return j.agg(
        (F.sum(dec("l_extendedprice", 10, 2)).cast("double") / F.lit(7.0))
        .alias("avg_yearly"))


@register(
    "q18_large_volume_customer",
    """
    SELECT c_name, c_custkey, o_orderkey,
           epoch_us(o_orderdate) // 1000000 AS o_orderdate_s,
           CAST(o_totalprice AS DECIMAL(12,2))::DOUBLE AS o_totalprice,
           SUM(CAST(l_quantity AS DECIMAL(10,2)))::DOUBLE AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(10,2))) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100""",
    "relational", "bench",
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: customers with very large orders. The textbook form
    joins lineitem back after the HAVING aggregate and re-sums — but
    the query groups per ORDER, so that second sum(l_quantity) IS the
    HAVING aggregate itself: one lineitem scan computes sq per order,
    the >150 survivors (tiny — broadcastable) join orders and
    customer, and sq ships through as total_qty. Halves the lineitem
    scans and drops the corpus-sized 3-way join + re-aggregation
    (measured 1.38 -> 0.91 s best-of-3 at sf0.1, byte-identical).
    Threshold 150 fits the testdata's ~4-lineitem orders (TPC-H's 300
    assumes 7)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(dec("l_quantity", 10, 2)).alias("sq"))
           .filter(F.col("sq") > 150))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = (orders.join(big, orders.o_orderkey == big.l_orderkey)
         .join(cust, F.col("o_custkey") == cust.c_custkey))
    return (
        j.select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("o_orderdate_s"),
            F.col("o_totalprice").cast("decimal(12,2)").cast("double")
            .alias("o_totalprice"),
            F.col("sq").cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT SUM(""" + _DISC_PRICE + """)::DOUBLE AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)""",
    "relational",
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 adapted (no p_container column): disjunctive
    brand/size/quantity predicates over one part join — the OR of ANDs
    stays a single join condition pass, not three unioned scans."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((br == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((br == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"))


@register(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE / count(*) AS ab
      FROM customer WHERE c_acctbal > 0.00)
    SELECT cntrycode, count(*)::BIGINT AS numcust,
           SUM(CAST(c_acctbal AS DECIMAL(12,2)))::DOUBLE AS totacctbal
    FROM (
      SELECT (c_nationkey % 10)::BIGINT AS cntrycode, c_acctbal
      FROM customer
      WHERE c_acctbal > (SELECT ab FROM avg_bal)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    ) custsale
    GROUP BY cntrycode""",
    "relational",
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 adapted (no c_phone column → country code from
    nationkey; every testdata customer has *some* order, so lapsed =
    no order since 2000): above-average-balance customers with no
    recent orders. The scalar average broadcasts; the no-recent-orders
    test is a LEFT ANTI join."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg((F.sum(dec("c_acctbal", 12, 2)).cast("double")
                     / F.count(F.lit(1))).alias("ab")))
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01 00:00:00")
    rich = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return rich.groupBy(
        (F.col("c_nationkey") % 10).cast("long").alias("cntrycode")
    ).agg(
        F.count("*").alias("numcust"),
        F.sum(dec("c_acctbal", 12, 2)).cast("double").alias("totacctbal"))


@register(
    "events_percentiles",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type""",
    "relational", "aggregates",
)
def events_percentiles(spark, sf_dir):
    """Exact percentiles per event type (sort-based `percentile`, the
    same linear interpolation as DuckDB's quantile_cont — results are
    bit-identical). At scale, swap in approx_percentile(value, p, acc)
    for one-pass sketching; the exact form is the oracle-checkable
    baseline."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
        F.percentile("value", F.lit(0.99)).alias("p99"))


@register(
    "clean_text",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\s+', ' ', 'g')) AS clean_text,
           len(regexp_extract_all(text, 'https?://[^\s]+'))::BIGINT AS n_urls,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails
    FROM documents""",
    "llm", "text",
)
def clean_text(spark, sf_dir):
    """Training-data scrubbing: URL/email placeholder substitution +
    whitespace normalization with substitution counts (the audit
    trail). Pure codegen'd regexp chain, zero shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return text.clean_text(docs)


@register(
    "events_pivot",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE)::VARCHAR AS day,
           count(*) FILTER (event_type = 'click')::BIGINT    AS click,
           count(*) FILTER (event_type = 'error')::BIGINT    AS error,
           count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
           count(*) FILTER (event_type = 'signup')::BIGINT   AS signup,
           count(*) FILTER (event_type = 'view')::BIGINT     AS view
    FROM events GROUP BY 1""",
    "relational", "aggregates",
)
def events_pivot(spark, sf_dir):
    """Pivot: daily event counts, one column per event type. The
    value list is declared so Catalyst skips the extra distinct-values
    job and plans a single conditional aggregate (the same shape as
    the oracle's FILTER clauses)."""
    ev = _t(spark, sf_dir, "events")
    out = (ev.groupBy(F.date_trunc("day", "ts").cast("date")
                      .cast("string").alias("day"))
           .pivot("event_type",
                  ["click", "error", "purchase", "signup", "view"])
           .count())
    # pivot leaves missing cells null; counts should read 0
    return out.select(
        "day", *[F.coalesce(F.col(c), F.lit(0)).alias(c)
                   for c in ["click", "error", "purchase", "signup", "view"]])


@register(
    "salted_event_type_stats",
    """
    SELECT event_type, count(*)::BIGINT AS cnt,
           SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total
    FROM events GROUP BY event_type""",
    "scale", "skew",
)
def salted_event_type_stats(spark, sf_dir):
    """Skew-safe two-stage aggregation (operators/skew.py): event_type
    has ~5 values over the whole table — the canonical hot-key shape.
    Stage 1 shuffles on (event_type, xxhash64-salt), stage 2 combines the 16
    partials per key; results are bit-identical to the direct groupBy
    (the oracle)."""
    from .operators.skew import salted_agg_count_sum

    ev = _t(spark, sf_dir, "events")
    return salted_agg_count_sum(
        ev, key="event_type", val="value",
        salt_from=["event_id"], buckets=16)


@register(
    "salted_enrich_segments",
    """
    SELECT c_mktsegment, count(*)::BIGINT AS cnt,
           SUM(CAST(value AS DECIMAL(18,2)))::DOUBLE AS total
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment""",
    "scale", "skew",
)
def salted_enrich_segments(spark, sf_dir):
    """Skew-safe salted join (operators/skew.py): the fact side is
    salted 8 ways, the dimension exploded 8x, so a hot user_id spreads
    over 8 reducers. Equivalent to the plain join (the oracle); AQE
    skew-join handles the sort-merge case at runtime, this builder is
    the deterministic pre-planned variant."""
    from .operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    j = salted_join(ev, cust, key="user_id", salt_from=["event_id"],
                    buckets=8)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        .alias("total"))


@register(
    "events_cube",
    """
    SELECT event_type, user_id % 10 AS user_bucket,
           count(*)::BIGINT AS cnt,
           SUM(CAST(value AS DECIMAL(12,2)))::DOUBLE AS total
    FROM events GROUP BY CUBE (event_type, user_id % 10)""",
    "relational",
)
def events_cube(spark, sf_dir):
    """Grouping-sets surface (beyond the reference — Spark built-in):
    CUBE over (event_type, user_bucket)."""
    ev = _t(spark, sf_dir, "events").withColumn("user_bucket", F.col("user_id") % 10)
    return (
        ev.cube("event_type", "user_bucket")
        .agg(F.count("*").alias("cnt"),
             F.sum(dec("value")).cast("double").alias("total"))
    )


@register(
    "events_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
    FROM events GROUP BY event_type""",
    "relational",
)
def events_distinct_users(spark, sf_dir):
    """Distinct aggregation (two-phase partial distinct under AQE)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"))


# ======================================================================
# LLM-data-pipeline surface: dedup / similarity / text / multimodal.
# Oracle SQL mirrors the exact md5-based integer hashing used by the
# Spark operators, so results are engine-identical.
# ======================================================================

_SHINGLES_BODY = """w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM {src}),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, greatest(len(words) - 2, 0) + 1),
               i -> array_to_string(list_slice(words, i, i + 2), ' '))) AS shingle
      FROM w)"""

_SHINGLES_CTE = "\n    WITH " + _SHINGLES_BODY.format(src="documents") + "\n"


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*)::BIGINT AS dup_count
    FROM documents GROUP BY md5(text)""",
    "llm", "dedup",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via content hash: one shuffle on md5(text)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


def _minhash_sig_sql(src: str = "documents", prefix: str = "") -> str:
    mins = ",\n           ".join(
        f"min((x * {a} + {b}) % {dedup.P})::BIGINT AS mh_{i}"
        for i, (a, b) in enumerate(dedup._hash_params(16))
    )
    return (
        "\n    WITH " + prefix + _SHINGLES_BODY.format(src=src)
        + f""",
    x AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {dedup.P} AS x
      FROM sh)
    SELECT doc_id,
           {mins}
    FROM x GROUP BY doc_id"""
    )


@register("minhash_signatures", _minhash_sig_sql(), "llm", "dedup")
def minhash_signatures(spark, sf_dir):
    """MinHash signatures (16 universal hashes over word 3-shingles):
    one explode + one groupBy computing all minima map-side."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, num_hashes=16, n=3)


def _minhash_pairs_sql(bands: int = 4, rows: int = 4, threshold: float = 0.5,
                       src: str = "documents") -> str:
    sig = _minhash_sig_sql(src=src)
    band_exprs = ",\n           ".join(
        "md5(concat_ws(','," + ",".join(
            f"mh_{b * rows + r}::VARCHAR" for r in range(rows)
        ) + f")) AS band_{b}"
        for b in range(bands)
    )
    buckets = ",".join(f"'{b}|' || band_{b}" for b in range(bands))
    matches = " + ".join(
        f"(l.mh_{i} = r.mh_{i})::INT" for i in range(bands * rows)
    )
    return f"""
    WITH sig AS ({sig}),
    banded AS (
      SELECT doc_id,
           {band_exprs}
      FROM sig),
    kv AS (
      SELECT doc_id, unnest([{buckets}]) AS bucket FROM banded),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM kv l JOIN kv r USING (bucket)
      WHERE l.doc_id < r.doc_id)
    SELECT doc_a, doc_b, (({matches}) / 16.0) AS sig_sim
    FROM cand JOIN sig l ON l.doc_id = doc_a
              JOIN sig r ON r.doc_id = doc_b
    WHERE (({matches}) / 16.0) >= {threshold}"""


@register("minhash_lsh_pairs", _minhash_pairs_sql(), "llm", "dedup", "bench")
def minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH near-dup pairs: 4 bands x 4 rows, verified at
    signature similarity >= 0.5. Candidate join restricted to LSH
    buckets — linear in collisions, never O(n^2)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.5)


def _dedup_clusters_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_pairs_sql()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON r.id = e.src)
    SELECT id AS doc_id, min(label)::BIGINT AS cluster_id
    FROM reach GROUP BY id"""


@register("dedup_clusters", _dedup_clusters_sql(), "llm", "dedup")
def dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS from the MinHash-LSH pair graph:
    iterative min-label propagation (operators/graph.py) labels every
    doc with the min doc_id of its connected component — the canonical
    representative a dedup pass keeps. Oracle: recursive CTE transitive
    closure over the same pairs."""
    from .operators.graph import dedup_clusters as clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
    return clusters(docs, pairs)


def _dedup_canonical_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({_minhash_pairs_sql()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON r.id = e.src),
    clusters AS (
      SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id)
    SELECT cluster_id::BIGINT AS keep_id, count(*)::BIGINT AS cluster_size
    FROM clusters GROUP BY cluster_id"""


@register("dedup_canonical", _dedup_canonical_sql(), "llm", "dedup")
def dedup_canonical(spark, sf_dir):
    """The APPLY step of fuzzy dedup: one row per near-duplicate
    cluster — the canonical doc to keep (min doc_id) and how many
    documents it absorbs. Composes minhash_lsh_pairs -> connected
    components -> groupBy(cluster); a writer keeps exactly
    `keep_id`-rows of the corpus."""
    from .operators.graph import dedup_clusters as clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
    return (clusters(docs, pairs)
            .groupBy(F.col("cluster_id").alias("keep_id"))
            .agg(F.count("*").alias("cluster_size")))


@register(
    "dedup_source_overlap",
    f"""
    WITH pairs AS ({_minhash_pairs_sql()}),
    lab AS (SELECT doc_id, source FROM documents),
    e AS (
      SELECT least(a.source, b.source) AS src_a,
             greatest(a.source, b.source) AS src_b,
             p.sig_sim
      FROM pairs p JOIN lab a ON p.doc_a = a.doc_id
                   JOIN lab b ON p.doc_b = b.doc_id)
    SELECT src_a, src_b, count(*)::BIGINT AS n_pairs,
           {R6('SUM(CAST(sig_sim * 16 AS BIGINT))', 'count(*) * 16')}
             AS avg_sig_sim,
           max(sig_sim) AS max_sig_sim
    FROM e GROUP BY src_a, src_b""",
    "llm", "dedup",
)
def dedup_source_overlap(spark, sf_dir):
    """Cross-source near-duplication leakage matrix: for every
    (source, source) pair — including the diagonal — how many
    MinHash-LSH near-dup pairs land across it, with mean and max
    signature similarity. The curation diagnostic that answers "is
    source A just a scrape of source B?" before mixture weights are
    chosen: a hot off-diagonal cell means two feeds share content
    and their token budgets double-count.

    Composes minhash_lsh_pairs (collision-bounded, never O(n^2))
    with two equi-joins against the doc->source label projection —
    both fact-sized sides stay on shuffle joins (nothing
    corpus-derived is broadcast) — then collapses to a
    #sources^2-bounded matrix. sig_sim values are exact sixteenths,
    so sum/count is order-independent on any engine."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
    lab = docs.select("doc_id", "source")
    e = (pairs
         .join(lab.select(F.col("doc_id").alias("doc_a"),
                          F.col("source").alias("source_a")), "doc_a")
         .join(lab.select(F.col("doc_id").alias("doc_b"),
                          F.col("source").alias("source_b")), "doc_b"))
    return (e.select(
                F.least("source_a", "source_b").alias("src_a"),
                F.greatest("source_a", "source_b").alias("src_b"),
                "sig_sim")
            .groupBy("src_a", "src_b")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 # sig_sim is an exact sixteenth: *16 -> exact integer,
                 # so the mean is a count/count rational (_ratio6)
                 _ratio6(F.sum((F.col("sig_sim") * 16).cast("long")),
                         F.count("*") * 16).alias("avg_sig_sim"),
                 F.max("sig_sim").alias("max_sig_sim")))


@register(
    "vocab_top_ngrams",
    _SHINGLES_CTE + """
    SELECT shingle, count(*)::BIGINT AS df
    FROM sh GROUP BY shingle
    ORDER BY df DESC, shingle LIMIT 100""",
    "llm", "text",
)
def vocab_top_ngrams(spark, sf_dir):
    """Vocabulary building: top-100 word 3-grams by document frequency
    (distinct per doc). One explode + one groupBy; top-k plans as
    TakeOrderedAndProject, so no global sort at corpus scale."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, n=3, distinct=True)
    return (sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .orderBy(F.col("df").desc(), F.col("shingle")).limit(100))


def _simhash_sql(bits: int = 32) -> str:
    votes = ",\n           ".join(
        f"sum(CASE WHEN (x >> {j}) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS v_{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN v_{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents),
    x AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS x FROM toks),
    votes AS (
      SELECT doc_id,
           {votes}
      FROM x GROUP BY doc_id)
    SELECT doc_id, ({fp})::BIGINT AS simhash FROM votes"""


@register("simhash_fingerprints", _simhash_sql(), "llm", "dedup")
def simhash_fingerprints(spark, sf_dir):
    """32-bit SimHash fingerprints (per-bit majority vote over token
    hashes): one explode + one groupBy."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, bits=32)


def _simhash_pairs_sql() -> str:
    sim = _simhash_sql()
    buckets = ",".join(
        f"'{b}|' || ((simhash >> {b * 8}) & 255)::VARCHAR" for b in range(4)
    )
    return f"""
    WITH fp AS ({sim}),
    kv AS (
      SELECT doc_id, simhash, unnest([{buckets}]) AS bucket FROM fp),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, l.simhash AS sh_a,
             r.doc_id AS doc_b, r.simhash AS sh_b
      FROM kv l JOIN kv r USING (bucket)
      WHERE l.doc_id < r.doc_id)
    SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3"""


@register("simhash_near_pairs", _simhash_pairs_sql(), "llm", "dedup")
def simhash_near_pairs(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 3) via byte-band blocking."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.simhash_near_pairs(docs, max_hamming=3, bits=32)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("bigint").alias("hamming"))


@register(
    "ngram_jaccard_pairs",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh_str AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(words) - 2, 0) + 1),
               i -> array_to_string(list_slice(words, i, i + 2), ' '))) AS shingle_str
      FROM w),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(shingle_str), 1, 15))::BIGINT AS shingle
      FROM sh_str)""" + """,
    sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*)::BIGINT AS inter
      FROM sh l JOIN sh r USING (shingle)
      WHERE l.doc_id < r.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           ((2 * inter * 1000000 + (sa.sz + sb.sz - inter))
            // (2 * (sa.sz + sb.sz - inter))) / 1e6 AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = doc_a
               JOIN sz sb ON sb.doc_id = doc_b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.5""",
    "llm", "dedup",
)
def ngram_jaccard_pairs(spark, sf_dir):
    """Exact word-3-gram Jaccard similarity join at threshold 0.5
    (sparse equi-join on shingles; df-capped at production scale)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)


@register(
    "embedding_near_pairs",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e)
    SELECT l.vec_id AS doc_a, r.vec_id AS doc_b,
           round(list_dot_product(l.v, r.v) / (l.norm * r.norm), 6) AS cos
    FROM n l JOIN n r ON l.vec_id < r.vec_id
    WHERE list_dot_product(l.v, r.v) / (l.norm * r.norm) >= 0.35""",
    "llm", "dedup",
)
def embedding_near_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs (>= 0.35), brute force — the
    LSH-bucketed variant is the scale path (ann_topk_lsh)."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_pairs(emb, threshold=0.35)


_BRUTE_TOPK_SQL = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    q AS (
      SELECT vec_id AS query_id, v AS qv, norm AS qnorm
      FROM n WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 256),
    scored AS (
      SELECT query_id, vec_id AS neighbor_id,
             list_dot_product(qv, v) / (qnorm * norm) AS cos
      FROM n, q WHERE vec_id != query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cos
    FROM ranked WHERE rank <= 5"""


@register(
    "ann_topk_bruteforce",
    _BRUTE_TOPK_SQL,
    "llm", "similarity", "bench",
)
def ann_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for query vectors (vec_id % 50 == 0):
    broadcast queries, JVM-side double fold, rank with unique
    tie-break."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(emb, k=5, query_mod=50)
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("bigint").alias("rank"), "cos")


def _lsh_topk_sql(num_planes: int = 8, dim: int = 64) -> str:
    planes = []
    for p in range(num_planes):
        comps = ",".join(repr(similarity._plane_component(p, d)) for d in range(dim))
        planes.append(
            f"(CASE WHEN list_dot_product(v, [{comps}]) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    sig = " + ".join(planes)
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
             ({sig})::BIGINT AS sig
      FROM e),
    q AS (
      SELECT vec_id AS query_id, v AS qv, norm AS qnorm, sig AS qsig
      FROM n WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 256),
    scored AS (
      SELECT query_id, vec_id AS neighbor_id,
             list_dot_product(qv, v) / (qnorm * norm) AS cos
      FROM n JOIN q ON sig = qsig AND vec_id != query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cos
    FROM ranked WHERE rank <= 5"""


_IVF_SQL = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 ORDER BY vec_id LIMIT 256),
    affinity AS (
      SELECT vec_id, cent_id,
             list_dot_product(v, cv) / (norm * cnorm) AS ccos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY list_dot_product(v, cv) / (norm * cnorm) DESC,
                                         cent_id) AS r
      FROM n, c),
    assign AS (
      SELECT vec_id, cent_id AS cell FROM affinity WHERE r = 1),
    qs AS (
      SELECT vec_id FROM n WHERE vec_id % 50 = 0
      ORDER BY vec_id LIMIT 256),
    probes AS (
      SELECT vec_id AS query_id, cent_id AS cell
      FROM affinity JOIN qs USING (vec_id) WHERE r <= 2),
    q AS (
      SELECT vec_id AS query_id, v AS qv, norm AS qnorm
      FROM n JOIN qs USING (vec_id)),
    scored AS (
      SELECT q.query_id, n.vec_id AS neighbor_id,
             list_dot_product(qv, v) / (qnorm * norm) AS cos
      FROM n JOIN assign ON n.vec_id = assign.vec_id
             JOIN probes ON assign.cell = probes.cell
             JOIN q ON probes.query_id = q.query_id
      WHERE n.vec_id != q.query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cos
    FROM ranked WHERE rank <= 5"""


@register("ann_topk_ivf", _IVF_SQL, "llm", "similarity")
def ann_topk_ivf(spark, sf_dir):
    """IVF approximate top-5: deterministic coarse-quantizer cells
    (vec_id % 23 == 1 sampled centroids), nprobe=2 probed cells per
    query — the inverted-file layout that partition-prunes at scale."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(emb, k=5, query_mod=50, centroid_mod=23,
                              nprobe=2)
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("bigint").alias("rank"), "cos")


@register("ann_topk_lsh", _lsh_topk_sql(), "llm", "similarity")
def ann_topk_lsh(spark, sf_dir):
    """Approximate top-5: random-hyperplane LSH (8 deterministic
    planes) buckets candidates; equi-join on the signature — the
    partition-pruned serving path at scale."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.lsh_topk(emb, k=5, query_mod=50, num_planes=8, dim=64)
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("bigint").alias("rank"), "cos")


# Exact DuckDB twin of the PQ-ADC pipeline: the codebook is a
# deterministic id-sample, encoding is argmin over 16 codes per
# subspace (expanded ||x||^2 - 2xb + ||b||^2, the same float form
# pq_encode evaluates), and the per-query distance table is the direct
# squared-diff form pq_adc_topk builds — so the approximate distances
# themselves are value-checkable, not just a recall bound.
_PQ_CODES_CTES = """
    e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bk AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v AS bv
      FROM (SELECT vec_id, v FROM e WHERE vec_id % 23 = 1
            ORDER BY vec_id LIMIT 16)),
    ss AS (SELECT unnest(generate_series(0, 7)) AS s),
    xs AS (SELECT vec_id, s, v[s*8+1 : s*8+8] AS xv FROM e CROSS JOIN ss),
    bs AS (SELECT code, s, bv[s*8+1 : s*8+8] AS sv FROM bk CROSS JOIN ss),
    enc AS (
      SELECT vec_id, s, code,
             row_number() OVER (
               PARTITION BY vec_id, s
               ORDER BY list_dot_product(xv, xv)
                        - 2 * list_dot_product(xv, sv)
                        + list_dot_product(sv, sv), code) AS rn
      FROM xs JOIN bs USING (s)),
    codes AS (SELECT vec_id, s, code FROM enc WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 256),
    qs AS (SELECT query_id, s, qv[s*8+1 : s*8+8] AS qsv
           FROM q CROSS JOIN ss),
    tab AS (
      SELECT query_id, s, code,
             list_sum(list_transform(generate_series(1, 8),
                 i -> (qsv[i] - sv[i]) * (qsv[i] - sv[i]))) AS d
      FROM qs JOIN bs USING (s))"""

_PQ_SQL = f"""
    WITH {_PQ_CODES_CTES},
    ad AS (
      SELECT t.query_id, c.vec_id AS neighbor_id, sum(t.d) AS adist
      FROM codes c JOIN tab t ON t.s = c.s AND t.code = c.code
      WHERE c.vec_id != t.query_id
      GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, neighbor_id, adist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rank
      FROM ad)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank,
           round(adist, 6) AS adist
    FROM ranked WHERE rank <= 5"""


@register("ann_topk_pq", _PQ_SQL, "llm", "similarity", "sketch")
def ann_topk_pq(spark, sf_dir):
    """Product-quantization top-5 by asymmetric distance computation
    (operators/similarity.py:pq_adc_topk): 64-float vectors compressed
    to 8 one-byte subspace codes (32x), candidates scored via per-query
    distance-table lookups, per-partition local top-k so the final
    shuffle carries only queries x k rows per partition — the memory
    half of the IVF-PQ architecture every RAM-resident 100 TB ANN index
    uses. The codebook is a deterministic id-sample, so the WHOLE ADC
    pipeline (encode argmin, distance tables, ranking) is reproduced in
    the DuckDB oracle and value-checked end to end."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(emb, k=5, query_mod=50, m=8, codes=16,
                                  dim=64, sample_mod=23)


def _lang_sql(rel: str = "documents") -> str:
    cnts = {
        lang: " + ".join(
            f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"
            for w in words
        )
        for lang, words in text.LANG_MARKERS.items()
    }
    cols = ",\n             ".join(
        f"({expr})::BIGINT AS cnt_{lang}" for lang, expr in cnts.items()
    )
    langs = sorted(text.LANG_MARKERS)  # alphabetical tie-break order
    mx = "greatest(" + ", ".join(f"cnt_{la}" for la in langs) + ")"
    case = " ".join(f"WHEN cnt_{la} = mx THEN '{la}'" for la in langs)
    return f"""
    WITH c AS (
      SELECT doc_id,
             {cols}
      FROM {rel}),
    m AS (SELECT doc_id, *, {mx} AS mx FROM c)
    SELECT doc_id,
           CASE WHEN mx = 0 THEN 'und' {case} ELSE 'und' END AS pred_lang
    FROM m"""


@register("lang_id", _lang_sql(), "llm", "text")
def lang_id(spark, sf_dir):
    """Language-ID heuristic: stopword-marker voting with deterministic
    alphabetical tie-break."""
    docs = _t(spark, sf_dir, "documents")
    return text.lang_id(docs)


@register(
    "token_count",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words,
           len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
           (length(text) // 4)::BIGINT AS n_tokens_est
    FROM documents""",
    "llm", "text", "bench",
)
def token_count(spark, sf_dir):
    """Whitespace token count + punctuation count + chars/4 estimate."""
    docs = _t(spark, sf_dir, "documents")
    out = text.token_count(docs)
    return out.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_punct").cast("bigint").alias("n_punct"),
        F.col("n_tokens_est"),
    )


def _quality_sql(rel: str = "documents") -> str:
    stop = " + ".join(
        f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"
        for w in text.STOPWORDS
    )
    return f"""
    WITH f AS (
      SELECT doc_id,
             length(text)::BIGINT AS n_chars_m,
             len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words,
             len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
             len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digit,
             ({stop})::BIGINT AS n_stop
      FROM {rel})
    SELECT doc_id, n_chars_m, n_words,
           ((2 * (n_chars_m - (n_words - 1)) * 1000000 + n_words)
            // (2 * n_words)) / 1e6 AS mean_word_len,
           ((2 * n_punct * 1000000 + n_chars_m)
            // (2 * n_chars_m)) / 1e6 AS punct_ratio,
           ((2 * n_digit * 1000000 + n_chars_m)
            // (2 * n_chars_m)) / 1e6 AS digit_ratio,
           ((2 * n_stop * 1000000 + n_words)
            // (2 * n_words)) / 1e6 AS stop_ratio,
           round(
             (CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN (n_chars_m - (n_words - 1)) / n_words >= 3
                    AND (n_chars_m - (n_words - 1)) / n_words <= 10
                   THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_punct / n_chars_m < 0.2 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_stop / n_words > 0.01 THEN 0.25 ELSE 0.0 END), 2)
             AS quality_score
    FROM f"""


@register("quality_score", _quality_sql(), "llm", "text")
def quality_score(spark, sf_dir):
    """Document quality features + composite score."""
    docs = _t(spark, sf_dir, "documents")
    out = text.quality_score(docs)
    return out.select(
        "doc_id",
        F.col("n_chars_m").cast("bigint").alias("n_chars_m"),
        F.col("n_words").cast("bigint").alias("n_words"),
        "mean_word_len", "punct_ratio", "digit_ratio", "stop_ratio",
        "quality_score",
    )


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents""",
    "llm", "text",
)
def doc_fingerprint(spark, sf_dir):
    """Whitespace/case-normalized md5 fingerprint."""
    docs = _t(spark, sf_dir, "documents")
    return text.fingerprint(docs)


@register(
    "winnow_fingerprint_pairs",
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents),
    g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(w) - 2, 0) + 1),
               i -> ('0x' || substr(md5(
                      array_to_string(list_slice(w, i, i + 2), ' ')),
                      1, 15))::BIGINT) AS hs
      FROM t WHERE len(w) >= 3),
    s AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               j -> list_min(list_slice(hs, j, j + 3)))) AS fps
      FROM g),
    f AS (
      SELECT doc_id, len(fps)::BIGINT AS n_fp, unnest(fps) AS fp FROM s),
    hot AS (
      SELECT fp FROM f GROUP BY fp HAVING count(DISTINCT doc_id) > 50),
    cold AS (SELECT * FROM f WHERE fp NOT IN (SELECT fp FROM hot)),
    p AS (
      SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
             count(*)::BIGINT AS n_shared,
             max(l.n_fp) AS n_a, max(r.n_fp) AS n_b
      FROM cold l JOIN cold r USING (fp)
      WHERE l.doc_id < r.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_shared,
           ((2 * CAST(n_shared AS BIGINT) * 1000000 + least(n_a, n_b))
            // (2 * CAST(least(n_a, n_b) AS BIGINT))) / 1e6
             AS containment
    FROM p WHERE n_shared >= 2""",
    "llm", "dedup", "text",
)
def winnow_fingerprint_pairs(spark, sf_dir):
    """Winnowed-fingerprint overlap pairs (operators/text.py:
    winnow_fingerprints — the MOSS scheme): doc pairs sharing >= 2
    selected fingerprints with the containment ratio
    n_shared / min(n_fp). Fingerprint selection (word-3-gram 60-bit
    hashes, window-4 minima) is entirely narrow inside the scan;
    fingerprints seen in > 50 distinct docs are boilerplate and are
    excluded before pair generation (the same hot-bucket guard the
    prefix-filtered set-similarity join uses), so the equi-join on fp
    is linear in true collisions and the wire carries only longs.
    Per-doc fingerprint counts ride along the join rows (max() in the
    pair aggregate), so no per-doc size table is joined back."""
    docs = _t(spark, sf_dir, "documents")
    # the in-scan selection (per-gram md5 + window minima) is the
    # dominant CPU and feeds the hot-fp filter plus BOTH sides of the
    # pair self-join — materialize once (was 4 corpus scans)
    f = text.winnow_fingerprints(docs, k=3, w=4).localCheckpoint(
        eager=False)
    hot = (f.groupBy("fp")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .filter(F.col("nd") > 50).select("fp"))
    # r13: NO broadcast hint — `hot` is corpus-derived (fingerprints in
    # > 50 docs grow with boilerplate volume at 100 TB), the exact class
    # the r12 de-hint sweep removed elsewhere (VERDICT r12 #3). The
    # left-anti join AQE-converts to broadcast while hot measures small;
    # at scale the shuffle join stands.
    cold = f.join(hot, "fp", "left_anti")
    l = cold.select(F.col("doc_id").alias("doc_a"),
                    F.col("n_fp").alias("n_a"), "fp")
    r = cold.select(F.col("doc_id").alias("doc_b"),
                    F.col("n_fp").alias("n_b"), "fp")
    return (l.join(r, "fp")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").cast("long").alias("n_shared"),
                 F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"))
            .filter(F.col("n_shared") >= 2)
            .select("doc_a", "doc_b", "n_shared",
                    _ratio6(F.col("n_shared"),
                            F.least(F.col("n_a"), F.col("n_b")))
                     .alias("containment")))


def _dsir_sql(table: str = "documents") -> str:
    """DSIR weight SQL over any (doc_id, text, lang) relation — the
    pipeline composes it over the ExactSubstr-cleaned corpus."""
    return f"""
    WITH w AS (
      SELECT doc_id, lang = 'de' AS tgt,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      FROM {table}),
    f AS (
      SELECT doc_id, tgt, unnest(ws) AS feat FROM w
      UNION ALL
      SELECT doc_id, tgt, ws[i] || ' ' || ws[i + 1] AS feat
      FROM (SELECT doc_id, tgt, ws,
                   unnest(generate_series(1, len(ws) - 1)) AS i
            FROM w)),
    fb AS (
      SELECT doc_id, tgt,
             ('0x' || substr(md5(feat), 1, 15))::BIGINT % 512 AS b,
             count(*)::BIGINT AS cnt
      FROM f GROUP BY 1, 2, 3),
    raw AS (SELECT b, sum(cnt)::BIGINT AS c_r FROM fb GROUP BY b),
    tg AS (SELECT b, sum(cnt)::BIGINT AS c_t FROM fb WHERE tgt
           GROUP BY b),
    nr AS (SELECT sum(c_r)::BIGINT AS n_r FROM raw),
    nt AS (SELECT sum(c_t)::BIGINT AS n_t FROM tg),
    lp AS (
      SELECT raw.b,
             round(ln((coalesce(t.c_t, 0) + 1)::DOUBLE
                      / (nt.n_t + 512)) * 1e9)::BIGINT
           - round(ln((raw.c_r + 1)::DOUBLE
                      / (nr.n_r + 512)) * 1e9)::BIGINT AS du
      FROM raw LEFT JOIN tg t USING (b), nr, nt),
    sc AS (
      SELECT doc_id, sum(cnt)::BIGINT AS n_feats,
             sum(cnt * du)::BIGINT AS units
      FROM fb JOIN lp USING (b) GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(sc.n_feats, 0)::BIGINT AS n_feats,
           (CASE WHEN coalesce(sc.units, 0) < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(coalesce(sc.units, 0))::BIGINT * 1000000 + 1000000000)
                // 2000000000) / 1e6 AS logweight
    FROM {table} d LEFT JOIN sc ON sc.doc_id = d.doc_id"""


@register(
    "dsir_importance_weights",
    _dsir_sql(),
    "llm", "sampling", "text",
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR data selection (operators/sampling.py:dsir_importance —
    Xie et al. 2023): per-doc log-likelihood ratio of hashed
    unigram+bigram features under the target-domain ('de') vs
    raw-corpus Laplace-smoothed bag-of-ngrams models — rank by
    logweight and take the top slice to select pretraining data that
    matches the target. Bucket ln-probs are rounded once to integer
    nano-units so the per-doc sum is exact (doc_bigram_logppl trick);
    both <= 512-row model tables broadcast into the scoring join."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.sampling import dsir_importance
    return dsir_importance(docs, target=F.col("lang") == "de",
                           n_buckets=512)


def _bpe_oracle_sql(k: int = 12, apply: bool = False,
                    encode: bool = False, by_lang: bool = False) -> str:
    """Unrolled-CTE twin of operators/text.py:bpe_train_merges — one
    (pair-count, argmax, rewrite) CTE triple per merge round, the same
    single-replace substitution over DOUBLE-space-joined symbols (the
    doubled separator makes one left-to-right replace exactly greedy,
    self-pair runs included — see _bpe_loop's docstring), the same
    (count DESC, left, right) tie-break. Generated, not handwritten,
    so K stays in one place. With apply=True the final select explodes
    the post-merge vocab into subword usage counts instead of emitting
    the merge table."""
    sql = [r"""
    WITH v0 AS MATERIALIZED (
      SELECT w, count(*)::BIGINT AS c,
             '  ' || regexp_replace(w, '(.)', '\1  ', 'g') || '_  '
               AS sym
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS w
            FROM documents)
      GROUP BY w)"""]
    for r in range(1, k + 1):
        pat = (f"' ' || (SELECT a FROM m{r}) || '  ' || "
               f"(SELECT b FROM m{r}) || ' '")
        rep = (f"' ' || (SELECT a FROM m{r}) || "
               f"(SELECT b FROM m{r}) || ' '")
        sql.append(f"""
    , p{r} AS MATERIALIZED (
      SELECT a, b, sum(c)::BIGINT AS pc FROM (
        SELECT c, s[i] AS a, s[i + 1] AS b FROM (
          SELECT c, s, unnest(generate_series(1, len(s) - 1)) AS i
          FROM (SELECT c, string_split(trim(sym), '  ') AS s
                FROM v{r - 1})))
      GROUP BY a, b)
    , m{r} AS MATERIALIZED (
        SELECT a, b, pc FROM p{r} ORDER BY pc DESC, a, b LIMIT 1)
    , v{r} AS MATERIALIZED (SELECT w, c,
                      replace(sym, {pat}, {rep}) AS sym
               FROM v{r - 1})""")
    if by_lang:
        sql.append(f"""
    , seg AS MATERIALIZED (
      SELECT w, len(string_split(trim(sym), '  '))::BIGINT AS n_sub
      FROM v{k})
    , dw AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents)
    , perdoc AS (
      SELECT doc_id, count(*)::BIGINT AS n_words,
             sum(n_sub)::BIGINT AS n_subwords
      FROM dw JOIN seg USING (w) GROUP BY doc_id)
    SELECT d.lang, count(*)::BIGINT AS n_docs,
           coalesce(sum(p.n_words), 0)::BIGINT AS n_words,
           coalesce(sum(p.n_subwords), 0)::BIGINT AS n_subwords,
           CASE WHEN coalesce(sum(p.n_words), 0) = 0 THEN 0.0
                ELSE ((2 * sum(p.n_subwords)::BIGINT * 1000000
                       + sum(p.n_words))
                      // (2 * sum(p.n_words)::BIGINT)) / 1e6
                END AS fertility
    FROM documents d LEFT JOIN perdoc p USING (doc_id)
    GROUP BY d.lang""")
        return "".join(sql)
    if encode:
        sql.append(f"""
    , seg AS MATERIALIZED (
      SELECT w, len(string_split(trim(sym), '  '))::BIGINT AS n_sub
      FROM v{k})
    , dw AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents)
    , per AS (
      SELECT doc_id, count(*)::BIGINT AS n_words,
             sum(n_sub)::BIGINT AS n_subwords
      FROM dw JOIN seg USING (w) GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(p.n_words, 0)::BIGINT AS n_words,
           coalesce(p.n_subwords, 0)::BIGINT AS n_subwords,
           ((2 * p.n_subwords::BIGINT * 1000000 + p.n_words)
            // (2 * p.n_words::BIGINT)) / 1e6 AS fertility
    FROM documents d LEFT JOIN per p USING (doc_id)""")
        return "".join(sql)
    if apply:
        sql.append(f"""
    SELECT token, sum(c)::BIGINT AS n_tokens,
           count(DISTINCT w)::BIGINT AS n_words
    FROM (SELECT w, c,
                 unnest(string_split(trim(sym), '  ')) AS token
          FROM v{k})
    GROUP BY token""")
        return "".join(sql)
    union = "\n      UNION ALL ".join(
        f"SELECT {r}::BIGINT AS merge_rank, a AS left_sym, "
        f"b AS right_sym, pc AS pair_count FROM m{r}"
        for r in range(1, k + 1))
    sql.append(f"\n    {union}")
    return "".join(sql)


@register("bpe_train_merges", _bpe_oracle_sql(12), "llm", "text")
def bpe_train_merges(spark, sf_dir):
    """BPE merge-rule training (operators/text.py:bpe_train_merges —
    Sennrich et al. 2016): the first 12 merges learned from the
    corpus' own word frequencies, with end-of-word marker, overlapping
    pair counts, and deterministic (count DESC, left, right)
    tie-break. The only corpus-sized stage is the initial wordcount;
    the 12 rounds run on the checkpointed vocab table with exactly one
    1-row argmax collect each. The oracle unrolls the identical
    iteration as 12 CTE triples, so a divergence in ANY round's pair
    statistics, tie-break, or substitution shifts every later round
    and hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    return text.bpe_train_merges(docs, k_merges=12)


@register(
    "dsir_resample_topk",
    "WITH wts AS MATERIALIZED (" + _dsir_sql() + """),
    g AS (
      SELECT doc_id, logweight,
             round(logweight * 1e9)::BIGINT
           + round(-ln(-ln(
               (('0x' || substr(md5('gumbel:' || doc_id::VARCHAR),
                               1, 13))::BIGINT + 1)
               / 4503599627370498.0)) * 1e9)::BIGINT AS units
      FROM wts)
    SELECT doc_id, logweight,
           (CASE WHEN units < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(units)::BIGINT * 1000000 + 1000000000)
                // 2000000000) / 1e6 AS score,
           row_number() OVER (ORDER BY units DESC, doc_id)::BIGINT
             AS rnk
    FROM g ORDER BY units DESC, doc_id LIMIT 100""",
    "llm", "sampling",
)
def dsir_resample_topk(spark, sf_dir):
    """The DSIR resample step (operators/sampling.py:gumbel_topk):
    Gumbel-top-k over the importance log-weights — an exact
    without-replacement draw of 100 docs with probability
    proportional to exp(logweight), made deterministic by md5-derived
    uniforms and nano-unit integer ranking (no engine RNG, no float
    reordering at the top-k boundary). Plan: the weight computation +
    one narrow projection + TakeOrderedAndProject; the corpus never
    shuffles for the draw itself."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.sampling import dsir_importance, gumbel_topk
    w = dsir_importance(docs, target=F.col("lang") == "de",
                        n_buckets=512)
    return gumbel_topk(w, k=100)


@register("bpe_encode_doc_stats", _bpe_oracle_sql(12, encode=True),
          "llm", "text")
def bpe_encode_doc_stats(spark, sf_dir):
    """Per-document encoding stats under the self-trained 12-merge BPE
    tokenizer (operators/text.py:bpe_encode_doc_stats): n_words,
    n_subwords, and fertility — the numbers that price a document in a
    token budget. Encoding is a word-level equi-join against the
    BROADCAST (word -> segment count) map the trainer already built;
    no per-doc re-segmentation. Oracle = the trainer CTE chain + the
    same join, so any merge-round divergence shifts segment counts and
    hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    return text.bpe_encode_doc_stats(docs, k_merges=12)


@register("bpe_apply_token_counts", _bpe_oracle_sql(12, apply=True),
          "llm", "text")
def bpe_apply_token_counts(spark, sf_dir):
    """Corpus-wide application of the self-trained 12-merge BPE
    tokenizer (operators/text.py:bpe_apply_token_counts): the subword
    vocabulary with occurrence and word-coverage counts — the
    fertility/coverage table inspected before freezing a tokenizer.
    Applying the tokenizer is one explode of the post-training
    vocab-sized table (the trainer's final state IS the segmentation
    of every distinct word); the corpus is touched only by the
    wordcount. Oracle = the trainer's unrolled CTE chain ending in
    the same explode, so any divergence in ANY merge round reshapes
    the subword vocabulary and hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    return text.bpe_apply_token_counts(docs, k_merges=12)


@register("bpe_fertility_by_lang", _bpe_oracle_sql(12, by_lang=True),
          "llm", "text")
def bpe_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility by LANGUAGE under the self-trained 12-merge
    BPE: per lang, doc count, total words, total subwords, and
    fertility = subwords/words — the cross-lingual tokenizer-equity
    report every multilingual pretraining effort runs before freezing
    a vocabulary (a language with outsized fertility pays more of the
    context window per sentence). Rolls bpe_encode_doc_stats' per-doc
    integers up to the lang grain, so the division happens ONCE per
    language on exact BIGINT sums.

    Plan: the trainer touches the corpus once (the wordcount); the
    rollup is the per-doc encode join plus one lang-keyed aggregate —
    output is #langs-sized. Oracle = the same unrolled trainer CTE
    chain, so any merge-round divergence reshapes segment counts and
    hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    per = text.bpe_encode_doc_stats(docs, k_merges=12)
    joined = per.join(docs.select("doc_id", "lang"), "doc_id")
    out = joined.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_subwords").cast("long").alias("n_subwords"))
    return out.select(
        "lang", "n_docs", "n_words", "n_subwords",
        F.when(F.col("n_words") == 0, F.lit(0.0))
         .otherwise(_ratio6(F.col("n_subwords"), F.col("n_words")))
         .alias("fertility"))


@register(
    "substring_dedup_rewrite",
    """
    WITH d AS (SELECT doc_id, text AS t, length(text)::BIGINT AS n
               FROM documents),
    ph AS (
      SELECT doc_id,
             ('0x' || substr(md5(substring(t, i, 30)), 1, 15))::BIGINT AS g,
             i
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, n - 29)) AS i
            FROM d WHERE n >= 30)),
    r AS (
      SELECT doc_id, i FROM (
        SELECT doc_id, i,
               count(*) OVER (PARTITION BY g) AS c,
               row_number() OVER (PARTITION BY g
                                  ORDER BY doc_id, i) AS rn
        FROM ph)
      WHERE c >= 2 AND rn > 1),
    rem AS (
      SELECT DISTINCT doc_id, i + off AS p
      FROM (SELECT doc_id, i,
                   unnest(generate_series(0, 29)) AS off FROM r)),
    stats AS (
      SELECT doc_id, count(*)::BIGINT AS rm,
             sum(CASE WHEN lag_p IS NULL OR p - lag_p > 1
                 THEN 1 ELSE 0 END)::BIGINT AS sp
      FROM (SELECT doc_id, p,
                   lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS lag_p
            FROM rem)
      GROUP BY doc_id),
    chars AS (
      SELECT doc_id, t, unnest(generate_series(1, n)) AS p FROM d),
    clean AS (
      SELECT c.doc_id,
             string_agg(substring(c.t, c.p, 1), '' ORDER BY c.p)
               AS clean_text
      FROM chars c
      WHERE NOT EXISTS (SELECT 1 FROM rem
                        WHERE rem.doc_id = c.doc_id AND rem.p = c.p)
      GROUP BY c.doc_id)
    SELECT d.doc_id,
           coalesce(cl.clean_text, '') AS clean_text,
           coalesce(s.rm, 0)::BIGINT AS n_chars_removed,
           coalesce(s.sp, 0)::BIGINT AS n_dup_spans
    FROM d
    LEFT JOIN clean cl USING (doc_id)
    LEFT JOIN stats s USING (doc_id)""",
    "llm", "dedup", "text",
)
def substring_dedup_rewrite(spark, sf_dir):
    """ExactSubstr dedup WITH rewriting (operators/dedup.py:
    substring_dedup_rewrite — Lee et al. 2022): duplicated 30-char
    windows are removed from all but their globally-first occurrence
    and each doc's text is rebuilt from the survivors — the curation
    pass that substring_dup_stats only measures. The per-doc rebuild
    is one sorted-offset fold (interval union + kept-segment concat)
    in whole-stage codegen; the oracle rebuilds char-by-char with an
    anti-join, so a fold off-by-one anywhere hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.substring_dedup_rewrite(docs, L=30)


def _dk_lcp(a: str, b: str) -> str:
    """DuckDB longest-common-prefix of two varchars (NULL b -> NULL):
    first mismatching char index - 1, else the shorter length."""
    return (f"coalesce(list_min(list_transform("
            f"range(1, least(length({a}), length({b})) + 1), "
            f"j -> CASE WHEN substr({a}, j, 1) = substr({b}, j, 1) "
            f"THEN NULL ELSE j END)) - 1, "
            f"least(length({a}), length({b})))")


@register(
    "substring_dedup_suffix",
    f"""
    WITH d AS (SELECT doc_id, text AS t, length(text)::BIGINT AS n
               FROM documents WHERE length(text) >= 30),
    p0 AS (SELECT doc_id, t,
                  unnest(generate_series(1, n - 29)) AS i FROM d),
    pos AS (SELECT doc_id, i,
                   ('0x' || substr(md5(substring(t, i, 30)), 1, 15))::BIGINT
                     AS g,
                   substring(t, i + 30) AS ext
            FROM p0),
    dupg AS (SELECT g FROM pos GROUP BY g HAVING count(*) >= 2),
    cand AS (SELECT doc_id, i, g, ext FROM pos JOIN dupg USING (g)),
    nb AS (SELECT doc_id, i, ext,
                  lag(ext) OVER w AS pv, lead(ext) OVER w AS nx
           FROM cand
           WINDOW w AS (PARTITION BY g ORDER BY ext, doc_id, i)),
    lc AS (SELECT doc_id, i,
                  30 + greatest(coalesce({_dk_lcp('ext', 'pv')}, 0),
                                coalesce({_dk_lcp('ext', 'nx')}, 0))
                    AS dup_len
           FROM nb),
    sp AS (SELECT doc_id, i, dup_len, i + dup_len AS e,
                  max(i + dup_len) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pmax
           FROM lc)
    SELECT doc_id, i::BIGINT AS span_start, dup_len::BIGINT AS span_len
    FROM sp WHERE pmax IS NULL OR e > pmax""",
    "llm", "dedup", "text", "suffix",
)
def substring_dedup_suffix(spark, sf_dir):
    """Paper-exact ExactSubstr (operators/dedup.py:suffix_dup_spans —
    Lee et al. 2022's suffix-array form): VARIABLE-LENGTH maximal
    duplicated spans, not fixed-30-char windows. dup_len(p) = 30 +
    the longest common extension against any other occurrence of p's
    window, found by chunked lexicographic-neighbor LCP (the
    suffix-array property, computed in geometrically growing chunk
    rounds — 64, 128, ... chars — over candidates only); per-doc
    containment filtering leaves exactly the maximal
    spans. The oracle computes the same neighbor LCPs over FULL
    suffix extensions in one shot — so any divergence in the round
    accounting (chunk boundaries, class splitting, early
    finalization) shifts a span length and hash-fails. The union
    char coverage of these spans equals substring_dup_stats' dup
    positions (pinned by test); what this adds is the spans
    themselves: lengths and boundaries of each verbatim repeat."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.suffix_dup_spans(docs, L=30, chunk=64)


@register(
    "substring_dedup_scrub",
    """
    WITH d AS (SELECT doc_id, text AS t, length(text)::BIGINT AS n
               FROM documents),
    ph AS (
      SELECT doc_id,
             ('0x' || substr(md5(substring(t, i, 30)), 1, 15))::BIGINT AS g,
             i
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, n - 29)) AS i
            FROM d WHERE n >= 30)),
    r AS (
      SELECT doc_id, i FROM (
        SELECT doc_id, i, count(*) OVER (PARTITION BY g) AS c FROM ph)
      WHERE c >= 2),
    rem AS (
      SELECT DISTINCT doc_id, i + off AS p
      FROM (SELECT doc_id, i,
                   unnest(generate_series(0, 29)) AS off FROM r)),
    stats AS (
      SELECT doc_id, count(*)::BIGINT AS rm,
             sum(CASE WHEN lag_p IS NULL OR p - lag_p > 1
                 THEN 1 ELSE 0 END)::BIGINT AS sp
      FROM (SELECT doc_id, p,
                   lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS lag_p
            FROM rem)
      GROUP BY doc_id),
    chars AS (
      SELECT doc_id, t, unnest(generate_series(1, n)) AS p FROM d),
    clean AS (
      SELECT c.doc_id,
             string_agg(substring(c.t, c.p, 1), '' ORDER BY c.p)
               AS clean_text
      FROM chars c
      WHERE NOT EXISTS (SELECT 1 FROM rem
                        WHERE rem.doc_id = c.doc_id AND rem.p = c.p)
      GROUP BY c.doc_id)
    SELECT d.doc_id,
           coalesce(cl.clean_text, '') AS clean_text,
           coalesce(s.rm, 0)::BIGINT AS n_chars_removed,
           coalesce(s.sp, 0)::BIGINT AS n_scrubbed_regions
    FROM d
    LEFT JOIN clean cl USING (doc_id)
    LEFT JOIN stats s USING (doc_id)""",
    "llm", "dedup", "text", "suffix",
)
def substring_dedup_scrub(spark, sf_dir):
    """ExactSubstr SCRUB mode (operators/dedup.py:
    substring_dedup_scrub — Lee et al. 2022's all-occurrences
    default): every maximal duplicated span found by the suffix-span
    detector is folded out of every doc. The oracle is an
    INDEPENDENT formulation — drop every char covered by any
    duplicated 30-char window, rebuilt char-by-char with an
    anti-join — which equals the span-union rebuild only if the span
    detector, the per-doc containment filter, and the variable-width
    interval fold all compose correctly; any off-by-one in any of
    them shifts a char and hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.substring_dedup_scrub(docs, L=30, chunk=64)


@register(
    "doc_trigram_backoff_ppl",
    r"""
    WITH t AS (SELECT count(*) * 4 // 5 AS thr FROM documents),
    hw AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
           FROM documents, t WHERE doc_id < thr),
    ow AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
           FROM documents, t WHERE doc_id >= thr),
    uni AS (SELECT u AS wd, count(*)::BIGINT AS c FROM (
              SELECT unnest(w) AS u FROM hw) GROUP BY 1),
    nv AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM uni),
    bi AS (SELECT b, count(*)::BIGINT AS c FROM (
             SELECT w[i] || ' ' || w[i + 1] AS b
             FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                   FROM hw)) GROUP BY 1),
    tri AS (SELECT tr, count(*)::BIGINT AS c FROM (
              SELECT w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tr
              FROM (SELECT w, unnest(generate_series(1, len(w) - 2)) AS i
                    FROM hw)) GROUP BY 1),
    ot AS (
      SELECT doc_id, tr, w12, w23, w2, w3, count(*)::BIGINT AS cnt
      FROM (SELECT doc_id,
                   w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tr,
                   w[i] || ' ' || w[i + 1] AS w12,
                   w[i + 1] || ' ' || w[i + 2] AS w23,
                   w[i + 1] AS w2, w[i + 2] AS w3
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - 2)) AS i
                  FROM ow))
      GROUP BY 1, 2, 3, 4, 5, 6),
    sc AS (
      SELECT doc_id, sum(cnt)::BIGINT AS n_trigrams,
             sum(cnt * CASE
               WHEN t3.c IS NOT NULL
                 THEN round(ln(t3.c::DOUBLE / b12.c) * 1e9)::BIGINT
               WHEN b23.c IS NOT NULL
                 THEN round(ln(b23.c::DOUBLE / u2.c) * 1e9)::BIGINT
                      - 916290732
               ELSE round(ln((coalesce(u3.c, 0) + 1)::DOUBLE
                             / (nv.n + nv.v)) * 1e9)::BIGINT
                    - 1832581464
             END)::BIGINT AS units
      FROM ot
      LEFT JOIN tri t3 ON t3.tr = ot.tr
      LEFT JOIN bi b12 ON b12.b = ot.w12
      LEFT JOIN bi b23 ON b23.b = ot.w23
      LEFT JOIN uni u2 ON u2.wd = ot.w2
      LEFT JOIN uni u3 ON u3.wd = ot.w3
      CROSS JOIN nv
      GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(sc.n_trigrams, 0)::BIGINT AS n_trigrams,
           (CASE WHEN -sc.units < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(sc.units)::HUGEINT * 1000000
                 + sc.n_trigrams::HUGEINT * 1000000000)
                // (2 * sc.n_trigrams::HUGEINT * 1000000000)) / 1e6
             AS avg_neg_logscore
    FROM documents d CROSS JOIN t LEFT JOIN sc USING (doc_id)
    WHERE d.doc_id >= t.thr""",
    "llm", "text",
)
def doc_trigram_backoff_ppl(spark, sf_dir):
    """Held-out stupid-backoff trigram scoring (Brants et al. 2007,
    "Large Language Models in Machine Translation" — the backoff
    scheme DESIGNED for distributed count-table LMs): train trigram/
    bigram/unigram counts on the first 80% of docs, score the held-out
    20% with S(w3|w1w2) = c123/c12, backing off x0.4 to c23/c2, then
    x0.4^2 to the (+1-smoothed) unigram floor — unlike the
    self-scored bigram LM, unseen n-grams genuinely occur here, so
    every backoff tier executes. Per-tier ln is rounded once to
    nano-units (exact integer per-doc sums; the 0.4 penalties are the
    integer constants round(ln .4 * 1e9)). Plan: count tables are
    plain aggregates; scoring is five LEFT equi-joins on n-gram keys
    (sort-merge at scale — Brants' point is precisely that these
    tables shard) plus a broadcast 1-row (N, V) aggregate."""
    t = _t(spark, sf_dir, "documents")
    thr = t.count() * 4 // 5  # bounded: one scalar
    words = t.select("doc_id",
                     F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    hw = words.filter(F.col("doc_id") < thr)
    ow = words.filter(F.col("doc_id") >= thr)
    uni = (hw.select(F.explode("w").alias("wd"))
           .groupBy("wd").agg(F.count("*").cast("long").alias("c")))
    nv = uni.agg(F.sum("c").cast("long").alias("n"),
                 F.count("*").cast("long").alias("v"))
    def grams(df, k):
        return df.select(F.explode(F.expr(
            f"CASE WHEN size(w) >= {k} THEN transform("
            f"sequence(1, size(w) - {k - 1}), "
            f"i -> concat_ws(' ', slice(w, i, {k}))) "
            f"ELSE CAST(array() AS array<string>) END")).alias("g"))
    bi = grams(hw, 2).groupBy(F.col("g").alias("b")).agg(
        F.count("*").cast("long").alias("c"))
    tri = grams(hw, 3).groupBy(F.col("g").alias("tr")).agg(
        F.count("*").cast("long").alias("c"))
    ot = (ow.select("doc_id", F.explode(F.expr(
            "CASE WHEN size(w) >= 3 THEN transform("
            "sequence(1, size(w) - 2), i -> named_struct("
            "'tr', concat_ws(' ', slice(w, i, 3)), "
            "'w12', concat_ws(' ', slice(w, i, 2)), "
            "'w23', concat_ws(' ', slice(w, i + 1, 2)), "
            "'w2', element_at(w, i + 1), "
            "'w3', element_at(w, i + 2))) "
            "ELSE CAST(array() AS array<struct<tr: string, w12: string, "
            "w23: string, w2: string, w3: string>>) END")).alias("p"))
          .select("doc_id", "p.tr", "p.w12", "p.w23", "p.w2", "p.w3")
          .groupBy("doc_id", "tr", "w12", "w23", "w2", "w3")
          .agg(F.count("*").cast("long").alias("cnt")))
    t3 = tri.select(F.col("tr"), F.col("c").alias("c123"))
    b12 = bi.select(F.col("b").alias("w12"), F.col("c").alias("c12"))
    b23 = bi.select(F.col("b").alias("w23"), F.col("c").alias("c23"))
    u2 = uni.select(F.col("wd").alias("w2"), F.col("c").alias("c2"))
    u3 = uni.select(F.col("wd").alias("w3"), F.col("c").alias("c3"))
    LB = -916290732
    units = (F.when(F.col("c123").isNotNull(),
                    F.round(F.log(F.col("c123").cast("double")
                                  / F.col("c12")) * 1e9).cast("long"))
             .when(F.col("c23").isNotNull(),
                   F.round(F.log(F.col("c23").cast("double")
                                 / F.col("c2")) * 1e9).cast("long")
                   + F.lit(LB))
             .otherwise(
                 F.round(F.log((F.coalesce("c3", F.lit(0)) + 1)
                               .cast("double")
                               / (F.col("n") + F.col("v"))) * 1e9)
                 .cast("long") + F.lit(2 * LB)))
    sc = (ot.join(t3, "tr", "left").join(b12, "w12", "left")
          .join(b23, "w23", "left").join(u2, "w2", "left")
          .join(u3, "w3", "left").crossJoin(F.broadcast(nv))
          .groupBy("doc_id")
          .agg(F.sum("cnt").cast("long").alias("n_trigrams"),
               F.sum(F.col("cnt") * units).cast("long").alias("units")))
    return (ow.select("doc_id").join(sc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_trigrams", F.lit(0)).cast("bigint")
                     .alias("n_trigrams"),
                    # -units/(n*1e9): signed integer rational beyond
                    # BIGINT headroom (r13 tie class)
                    scalar_fn.sratio6_dec(
                        -F.col("units"),
                        F.col("n_trigrams") * F.lit(1_000_000_000))
                    .alias("avg_neg_logscore")))


@register(
    "mixture_waterfill_alloc",
    r"""
    WITH s AS (
      SELECT source,
             sum(len(string_split_regex(trim(text), '\s+')))::BIGINT AS n
      FROM documents GROUP BY source),
    t AS (SELECT sum(n)::BIGINT AS tn, count(*)::BIGINT AS m FROM s),
    r AS (
      SELECT s.source, s.n, t.tn, t.m, t.tn // 2 AS b,
             row_number() OVER (ORDER BY s.n, s.source) AS j,
             sum(s.n) OVER (ORDER BY s.n, s.source
                            ROWS UNBOUNDED PRECEDING) AS pn
      FROM s, t),
    k AS (
      SELECT coalesce(max(CASE WHEN n * (m - j + 1) <= b - (pn - n)
                          THEN j END), 0) AS kk
      FROM r),
    lam AS (
      SELECT k.kk,
             (SELECT b FROM r LIMIT 1) AS b,
             coalesce((SELECT pn FROM r, k WHERE j = k.kk), 0) AS snk,
             (SELECT m FROM r LIMIT 1) AS m
      FROM k)
    SELECT r.source, r.n AS n_tokens,
           r.j <= lam.kk AS capped,
           CASE WHEN r.j <= lam.kk THEN r.n::DOUBLE
                ELSE ((2 * (lam.b - lam.snk)::BIGINT * 1000000
                       + (lam.m - lam.kk))
                      // (2 * (lam.m - lam.kk))) / 1e6
                END AS alloc_tokens,
           CASE WHEN r.j <= lam.kk THEN 1.0
                ELSE ((2 * (lam.b - lam.snk)::BIGINT * 1000000
                       + (lam.m - lam.kk) * r.n)
                      // (2 * (lam.m - lam.kk) * r.n)) / 1e6
                END AS rate
    FROM r, lam""",
    "llm", "sampling", "mixture",
)
def mixture_waterfill_alloc(spark, sf_dir):
    """Capped water-filling mixture allocation — the exact-budget form
    of dataset mixing (the Pile/Dolma-style recipe: spend EXACTLY a
    token budget B = half the corpus, giving every source an equal
    share except sources too small to fill theirs, whose surplus is
    redistributed): allocation_s = min(n_s, lambda) with lambda chosen
    so the total hits B. Solved in one pass over the per-source token
    table: sort ascending, exact INTEGER threshold tests
    n_j * (m - j + 1) <= B - prefix_{j-1} find the capped prefix, and
    lambda is a single division of exact integers, so both engines
    emit identical doubles. The global sort window runs over the
    per-source AGGREGATE — bounded by the source catalog (~100s of
    rows at any corpus scale), not the corpus; the only corpus-sized
    stage is the token count."""
    docs = _t(spark, sf_dir, "documents")
    s = (docs.select("source",
                     F.size(F.split(F.trim(F.col("text")), r"\s+"))
                      .cast("long").alias("nt"))
         .groupBy("source").agg(F.sum("nt").cast("long").alias("n")))
    tot = s.agg(F.sum("n").cast("long").alias("tn"),
                F.count("*").cast("long").alias("m"))
    w = Window.orderBy("n", "source")
    r = (s.crossJoin(F.broadcast(tot))
         .withColumn("b", (F.col("tn") / 2).cast("long"))
         .withColumn("j", F.row_number().over(w).cast("long"))
         .withColumn("pn", F.sum("n").over(
             w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
             .cast("long"))
         .localCheckpoint(eager=False))
    k = r.agg(F.coalesce(F.max(F.when(
            F.col("n") * (F.col("m") - F.col("j") + 1)
            <= F.col("b") - (F.col("pn") - F.col("n")), F.col("j"))),
            F.lit(0)).cast("long").alias("kk"))
    snk = (r.join(F.broadcast(k), F.col("j") == F.col("kk"))
           .agg(F.coalesce(F.max("pn"), F.lit(0)).cast("long")
                .alias("snk")))
    lam_num = F.col("b") - F.coalesce(F.col("snk"), F.lit(0))
    out = (r.crossJoin(F.broadcast(k)).crossJoin(F.broadcast(snk))
           .select(
               "source", F.col("n").alias("n_tokens"),
               (F.col("j") <= F.col("kk")).alias("capped"),
               F.when(F.col("j") <= F.col("kk"),
                      F.col("n").cast("double"))
                .otherwise(_ratio6(lam_num, F.col("m") - F.col("kk")))
                .alias("alloc_tokens"),
               F.when(F.col("j") <= F.col("kk"), F.lit(1.0))
                .otherwise(_ratio6(lam_num, (F.col("m") - F.col("kk"))
                                   * F.col("n"))).alias("rate")))
    return out


@register(
    "mixture_epoch_plan",
    r"""
    WITH s AS (
      SELECT source,
             sum(len(string_split_regex(trim(text), '\s+')))::BIGINT AS n
      FROM documents GROUP BY source),
    s2 AS (
      SELECT source, n,
             CAST(round(sqrt(n) * 1000000) AS BIGINT) AS w,
             n * 4 AS c
      FROM s),
    t AS (SELECT sum(n)::BIGINT AS tn, sum(w)::BIGINT AS tw,
                 count(*)::BIGINT AS m FROM s2),
    r AS (
      SELECT s2.source, s2.n, s2.w, s2.c, t.tn, t.tw, t.m,
             t.tn AS b,
             row_number() OVER (ORDER BY s2.c::DOUBLE / s2.w, s2.source)
               AS j,
             sum(s2.c) OVER (ORDER BY s2.c::DOUBLE / s2.w, s2.source
                             ROWS UNBOUNDED PRECEDING) AS pc,
             sum(s2.w) OVER (ORDER BY s2.c::DOUBLE / s2.w, s2.source
                             ROWS UNBOUNDED PRECEDING) AS pw
      FROM s2, t),
    k AS (
      SELECT coalesce(max(CASE WHEN c::HUGEINT * (tw - pw)
                               <= w::HUGEINT * (b - pc) THEN j END), 0)
               AS kk
      FROM r),
    lam AS (
      SELECT k.kk,
             coalesce((SELECT pc FROM r, k WHERE j = k.kk), 0) AS pck,
             coalesce((SELECT pw FROM r, k WHERE j = k.kk), 0) AS pwk
      FROM k),
    alloc AS (
      SELECT r.source, r.n, r.w, r.j <= lam.kk AS capped,
             CASE WHEN r.j <= lam.kk THEN r.c::HUGEINT
                  ELSE (r.w::HUGEINT * (r.b - lam.pck))
                       // greatest(r.tw - lam.pwk, 1) END AS a
      FROM r, lam)
    SELECT source, n AS n_tokens, w AS weight_units, capped,
           a::BIGINT AS alloc_tokens,
           ((2 * a * 1000000 + n) // (2 * n::HUGEINT)) / 1e6 AS epochs
    FROM alloc""",
    "llm", "sampling", "mixture",
)
def mixture_epoch_plan(spark, sf_dir):
    """Epoch-capped WEIGHTED mixture allocation — the multi-epoch
    sampling plan a training run actually consumes (the Pile/Dolma
    recipe refined by the repetition literature: small high-quality
    sources may repeat, but never past ~4 epochs): spend exactly one
    corpus-worth of tokens B = sum(n_s), allocating proportional to
    temperature weights w_s = round(sqrt(n_s) * 1e6) (tau = 2
    temperature mixing, integer micro-units) under per-source
    ceilings c_s = 4 * n_s. alloc_s = min(c_s, lambda * w_s) with
    lambda chosen so the total hits B — WEIGHTED water-filling with
    ceilings, the weights+epochs generalization of
    mixture_waterfill_alloc (whose shares are equal and whose
    ceiling is one epoch).

    Exactly like the unweighted form, the whole solve is one pass
    over the per-source AGGREGATE: sort by the binding order c/w,
    find the capped prefix with exact integer cross-multiplications
    (c * suffix_w <= w * remaining_budget — DECIMAL(38,0)/HUGEINT
    products, BIGINT-safe at any corpus size), and every uncapped
    allocation is one exact floor division floor(w * num / den),
    computed remainder-style on Spark so no decimal rounding can
    perturb the floor. Total allocated lands in (B - m, B] — the
    only slack is the per-source floor, deterministic on both
    engines. The global sort window runs over #sources rows, never
    the corpus."""
    docs = _t(spark, sf_dir, "documents")
    s = (docs.select("source",
                     F.size(F.split(F.trim(F.col("text")), r"\s+"))
                      .cast("long").alias("nt"))
         .groupBy("source").agg(F.sum("nt").cast("long").alias("n")))
    s2 = (s.withColumn("w", F.round(F.sqrt(F.col("n")) * 1_000_000)
                       .cast("long"))
          .withColumn("c", (F.col("n") * 4).cast("long")))
    t = s2.agg(F.sum("n").cast("long").alias("tn"),
               F.sum("w").cast("long").alias("tw"),
               F.count("*").cast("long").alias("m"))
    wnd = Window.orderBy(F.col("c") / F.col("w"), "source")
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    r = (s2.crossJoin(F.broadcast(t))
         .withColumn("b", F.col("tn"))
         .withColumn("j", F.row_number().over(wnd).cast("long"))
         .withColumn("pc", F.sum("c").over(
             wnd.rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)).cast("long"))
         .withColumn("pw", F.sum("w").over(
             wnd.rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)).cast("long"))
         .localCheckpoint(eager=False))
    cond = (d19("c") * (d19("tw") - d19("pw"))
            <= d19("w") * (d19("b") - d19("pc")))
    k = r.agg(F.coalesce(F.max(F.when(cond, F.col("j"))), F.lit(0))
              .cast("long").alias("kk"))
    at_k = (r.join(F.broadcast(k), F.col("j") == F.col("kk"))
            .agg(F.coalesce(F.max("pc"), F.lit(0)).cast("long")
                 .alias("pck"),
                 F.coalesce(F.max("pw"), F.lit(0)).cast("long")
                 .alias("pwk")))
    wnum = d19("w") * (d19("b") - d19("pck"))
    den = F.greatest(d19("tw") - d19("pwk"), F.lit(1).cast("decimal(19,0)"))
    # exact floor division: subtract the remainder first so the
    # decimal divide is an exact multiple (no rounding can move it)
    q = ((wnum - F.pmod(wnum, den)) / den).cast("decimal(38,0)")
    a = F.when(F.col("j") <= F.col("kk"),
               F.col("c").cast("decimal(38,0)")).otherwise(q)
    # epochs = alloc/n is an integer/integer rational with a count
    # denominator (the r13 tie class) — exact half-up at 6 dp in
    # DECIMAL(38,0) (alloc is corpus-token-scaled, beyond _ratio6's
    # BIGINT headroom), remainder-style like the floor division above
    ep_num = a * F.lit(2_000_000) + F.col("n").cast("decimal(38,0)")
    ep_den = F.col("n").cast("decimal(38,0)") * F.lit(2)
    epochs = (((ep_num - F.pmod(ep_num, ep_den)) / ep_den)
              .cast("decimal(38,0)").cast("double") / F.lit(1e6))
    return (r.crossJoin(F.broadcast(k)).crossJoin(F.broadcast(at_k))
            .select("source", F.col("n").alias("n_tokens"),
                    F.col("w").alias("weight_units"),
                    (F.col("j") <= F.col("kk")).alias("capped"),
                    a.cast("long").alias("alloc_tokens"),
                    epochs.alias("epochs")))


def _substring_incremental_sql() -> str:
    rewrite = REGISTRY["substring_dedup_rewrite"].oracle
    return f"""
    SELECT * FROM ({rewrite})
    WHERE doc_id >= (SELECT count(*) * 4 // 5 FROM documents)"""


@register(
    "substring_dedup_incremental",
    _substring_incremental_sql(),
    "llm", "dedup", "incremental",
)
def substring_dedup_incremental(spark, sf_dir):
    """Incremental ExactSubstr rewrite (operators/dedup.py:
    substring_dedup_incremental): the last 20% of docs (by id) arrive
    as a new batch and are cleaned against the first 80% — history
    contributes only its DISTINCT window-hash index (8-byte longs; in
    production a persisted bucketed table appended per batch), so the
    per-batch cost is sized to the delta. Because history ids precede
    incoming ids, the result must equal the full-corpus rewrite
    restricted to the incoming docs — the oracle IS that restriction,
    so any divergence between the incremental index path and the
    batch semantics hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.count() * 4 // 5  # bounded: one scalar
    history = docs.filter(F.col("doc_id") < t)
    incoming = docs.filter(F.col("doc_id") >= t)
    return dedup.substring_dedup_incremental(history, incoming, L=30)


def _curation_v4_sql() -> str:
    rewrite = REGISTRY["substring_dedup_rewrite"].oracle
    return f"""
    WITH cleaned_v4 AS MATERIALIZED (
      SELECT d.doc_id, r.clean_text AS text, d.lang,
             r.n_chars_removed
      FROM documents d JOIN ({rewrite}) r USING (doc_id)
      WHERE length(r.clean_text) >= 50
        AND r.n_chars_removed < length(r.clean_text)),
    wts AS MATERIALIZED ({_dsir_sql("cleaned_v4")}),
    g AS (
      SELECT doc_id, logweight,
             round(logweight * 1e9)::BIGINT
           + round(-ln(-ln(
               (('0x' || substr(md5('gumbel:' || doc_id::VARCHAR),
                               1, 13))::BIGINT + 1)
               / 4503599627370498.0)) * 1e9)::BIGINT AS units
      FROM wts),
    sel AS (
      SELECT doc_id, logweight, (CASE WHEN units < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(units)::BIGINT * 1000000 + 1000000000)
                // 2000000000) / 1e6 AS score,
             row_number() OVER (ORDER BY units DESC, doc_id)::BIGINT
               AS rnk
      FROM g ORDER BY units DESC, doc_id LIMIT 150)
    SELECT s.doc_id, c.lang,
           length(c.text)::BIGINT AS clean_len,
           c.n_chars_removed, s.logweight, s.score, s.rnk
    FROM sel s JOIN cleaned_v4 c USING (doc_id)"""


@register("pipeline_curation_v4", _curation_v4_sql(), "llm", "pipeline")
def pipeline_curation_v4(spark, sf_dir):
    """The round-5-continuation operators composed into one curation
    job — the modern pretraining-data recipe: ExactSubstr rewrite
    (strip corpus-duplicated spans, keep-first) -> boilerplate gate
    (cleaned length >= 50 AND removed < kept, i.e. docs that were
    mostly duplicated text are dropped) -> DSIR importance weights
    computed ON THE CLEANED TEXT against the 'de' target -> Gumbel-
    top-150 without-replacement selection. Each stage is the
    standalone oracle-checked operator; the oracle is their literal
    SQL composition. Scale shape: rewrite output feeds the DSIR
    explode directly (no second corpus scan of raw text); the gate is
    a narrow filter; the draw is one TakeOrderedAndProject."""
    from .operators.sampling import dsir_importance, gumbel_topk
    docs = _t(spark, sf_dir, "documents")
    rw = dedup.substring_dedup_rewrite(docs, L=30)
    cleaned = (docs.select("doc_id", "lang")
               .join(rw, "doc_id")
               .filter((F.length("clean_text") >= 50)
                       & (F.col("n_chars_removed")
                          < F.length("clean_text")))
               .select("doc_id", F.col("clean_text").alias("text"),
                       "lang", "n_chars_removed")
               .localCheckpoint(eager=False))
    w = dsir_importance(cleaned, target=F.col("lang") == "de",
                        n_buckets=512)
    sel = gumbel_topk(w, k=150)
    return (sel.join(cleaned, "doc_id")
            .select("doc_id", "lang",
                    F.length("text").cast("bigint").alias("clean_len"),
                    "n_chars_removed", "logweight", "score", "rnk"))


_MEDIA_N = "octet_length(encode(text))"


@register(
    "media_meta",
    f"""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS mime,
             {_MEDIA_N}::BIGINT AS n
      FROM documents)
    SELECT doc_id, mime, n AS n_bytes,
           (CASE WHEN mime = 'audio/wav' THEN 0 ELSE (n % 1920) + 1 END)::BIGINT AS width,
           (CASE WHEN mime = 'audio/wav' THEN 0 ELSE (n % 1080) + 1 END)::BIGINT AS height,
           (CASE WHEN mime = 'image/png' THEN 1
                 WHEN mime = 'audio/wav' THEN n * 100
                 ELSE (n % 240) + 1 END)::BIGINT AS n_frames
    FROM m""",
    "llm", "multimodal",
)
def media_meta(spark, sf_dir):
    """Multimodal plumbing: binary payload + typed metadata, decoded
    via Arrow-batched mapInPandas (decode itself is a deterministic
    stub — codec libs not in this container; see operators/multimodal.py)."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.decode_media(multimodal.media_table(docs))


@register(
    "frame_sample",
    f"""
    WITH m AS (
      SELECT doc_id, {_MEDIA_N}::BIGINT AS n FROM documents
      WHERE doc_id % 3 = 2)
    SELECT doc_id, unnest(range(0, (n % 240) + 1, 24))::BIGINT AS frame_idx
    FROM m""",
    "llm", "multimodal",
)
def frame_sample(spark, sf_dir):
    """Frame-sampling plan over decoded video rows (every 24th frame)."""
    docs = _t(spark, sf_dir, "documents")
    decoded = multimodal.decode_media(multimodal.media_table(docs))
    return multimodal.frame_sample(decoded, every_n=24)


@register(
    "bmp_decode_stats",
    """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 5 + doc_id % 7 AS h
      FROM documents),
    px1 AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
    px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px1)
    SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
           (w * h)::BIGINT AS n_pixels,
           sum((doc_id + 7 * x + 13 * y) % 256)::BIGINT AS r_sum,
           sum((2 * doc_id + 3 * x + 5 * y) % 256)::BIGINT AS g_sum,
           sum((doc_id + x * y) % 256)::BIGINT AS b_sum,
           sum(CASE WHEN y = 0 THEN (doc_id + 7 * x) % 256
                    ELSE 0 END)::BIGINT AS first_row_r_sum
    FROM px GROUP BY 1, 2, 3, 4""",
    "llm", "multimodal",
)
def bmp_decode_stats(spark, sf_dir):
    """REAL pixel decode, oracle-checked end to end (VERDICT r4 #8):
    one genuine 24-bit BMP per document (multimodal.py:bmp_media_table
    — closed-form pixels of doc_id, widths hitting every 4-byte
    row-padding residue), decoded by the pure-Python header+pixel
    decoder (multimodal.py:decode_bmp — offset, padding, bottom-up
    flip, BGR), then per-asset channel sums PLUS the top-row r-sum
    computed from the decoded array. The oracle recomputes every
    statistic from the pixel formula alone — it never sees the bytes —
    so any decoder error in dimensions, offsets, padding, channel
    order, or row orientation hash-fails the gate. The encode+decode
    round trip runs inside one Arrow-batched mapInPandas scan stage;
    only 8 integers per asset flow out."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.bmp_pixel_stats(multimodal.bmp_media_table(docs))


@register(
    "bmp_thumbnail_stats",
    """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 5 + doc_id % 7 AS h
      FROM documents),
    ox AS (SELECT doc_id, w, h, unnest(range(0, 7)) AS ox FROM d),
    oxy AS (SELECT doc_id, w, h, ox, unnest(range(0, 5)) AS oy FROM ox),
    m AS (
      SELECT doc_id, w, h, ox, oy,
             ((2 * ox + 1) * w) // 14 AS sx,
             ((2 * oy + 1) * h) // 10 AS sy
      FROM oxy)
    SELECT doc_id, w::BIGINT AS src_w, h::BIGINT AS src_h,
           sum((doc_id + 7 * sx + 13 * sy) % 256)::BIGINT AS t_r_sum,
           sum((2 * doc_id + 3 * sx + 5 * sy) % 256)::BIGINT AS t_g_sum,
           sum((doc_id + sx * sy) % 256)::BIGINT AS t_b_sum,
           sum(CASE WHEN oy = 0
                    THEN (doc_id + 7 * sx + 13 * sy) % 256
                    ELSE 0 END)::BIGINT AS t_top_r_sum
    FROM m GROUP BY 1, 2, 3""",
    "llm", "multimodal",
)
def bmp_thumbnail_stats(spark, sf_dir):
    """The EXECUTED resample path: real BMP payloads are decoded
    (multimodal.py:decode_bmp), thumbnailed to 7x5 by the pure-integer
    midpoint nearest-neighbor rule (resample_nearest — sx =
    ((2*ox+1)*w) DIV (2*tw), no floats), and reduced to thumbnail
    channel sums + the orientation-sensitive top-row sum. The oracle
    composes the closed-form pixel function with the same integer
    source mapping, never touching bytes — any resample coordinate
    error (off-by-one, axis swap, orientation) hash-fails. This
    upgrades resize_plan from geometry planning to an executed
    decode -> resample -> features chain, all inside one Arrow
    scan stage."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.bmp_thumbnail_stats(
        multimodal.bmp_media_table(docs), tw=7, th=5)


@register(
    "wav_decode_stats",
    """
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 97 AS n,
             8000 + 1000 * (doc_id % 5) AS rate
      FROM documents),
    sm AS (
      SELECT doc_id, n, rate, unnest(range(0, n)) AS i FROM d),
    s AS (
      SELECT doc_id, n, rate, i,
             ((doc_id * 31 + i * 17) % 4001) - 2000 AS v
      FROM sm)
    SELECT doc_id, rate::BIGINT AS sample_rate, 1::BIGINT AS n_channels,
           n::BIGINT AS n_samples,
           sum(v)::BIGINT AS s_sum,
           sum(abs(v))::BIGINT AS s_abs_sum,
           sum(i * v)::BIGINT AS s_weighted_sum
    FROM s GROUP BY 1, 2, 3, 4""",
    "llm", "multimodal",
)
def wav_decode_stats(spark, sf_dir):
    """REAL audio decode, oracle-checked end to end — the PCM
    counterpart of bmp_decode_stats: one genuine RIFF/WAVE 16-bit PCM
    payload per document (multimodal.py:wav_media_table — closed-form
    samples of doc_id, lengths hitting odd/even chunk alignments),
    decoded by the pure-Python chunk-walking decoder
    (multimodal.py:decode_wav — RIFF validation, fmt/data chunk
    walk, little-endian int16), then per-asset sample sums PLUS the
    index-weighted sum from the decoded array. The oracle recomputes
    everything from the sample formula alone, so any decoder error in
    chunk offsets, sample order, or endianness hash-fails the gate."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.wav_sample_stats(multimodal.wav_media_table(docs))


# ======================================================================
# Beyond-parity window surface: sliding + session windows (the book
# covers them; the reference examples don't — Spark has them built in),
# approximate aggregates, and a genuine Structured Streaming entry.
# ======================================================================

@register(
    "w_sliding_counts",
    SENSORS_CTE + """
    , k AS (SELECT unnest(range(0, 3)) AS k)
    SELECT (epoch_us(ts) // 10000000 - k.k) * 10 AS window_start, id,
           count(*)::BIGINT AS cnt,
           SUM(CAST(temperature AS DECIMAL(12,2)))::DOUBLE AS total
    FROM sensors, k
    GROUP BY 1, 2""",
    "beyond", "W_sliding",
)
def w_sliding_counts(spark, sf_dir):
    """Sliding window 30 s / slide 10 s per sensor: each event lands in
    exactly 3 windows (size/slide); Spark's window() replicates rows
    JVM-side — the oracle mirrors via an unnested 0..2 multiplier."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.window("ts", "30 seconds", "10 seconds"), "id").agg(
        F.count("*").alias("cnt"),
        F.sum(dec("temperature")).cast("double").alias("total"))
    return out.select(F.col("window.start").cast("long").alias("window_start"),
                      "id", "cnt", "total")


@register(
    "session_windows",
    SENSORS_CTE + """
    , s AS (SELECT id, epoch_us(ts) AS us FROM sensors),
    m AS (
      SELECT id, us,
             CASE WHEN lag(us) OVER (PARTITION BY id ORDER BY us) IS NULL
                    OR us - lag(us) OVER (PARTITION BY id ORDER BY us)
                       >= 600000000
                  THEN 1 ELSE 0 END AS new_s
      FROM s),
    g AS (
      SELECT id, us,
             sum(new_s) OVER (PARTITION BY id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
    SELECT id, (min(us) // 1000000) AS session_start,
           ((max(us) + 600000000) // 1000000) AS session_end,
           count(*)::BIGINT AS cnt
    FROM g GROUP BY id, sid""",
    "beyond", "W_session",
)
def session_windows(spark, sf_dir):
    """Session windows (10 min gap) per sensor — Spark's
    session_window() merges events closer than the gap; session end =
    last event + gap. The oracle sessionizes via lag()+cumsum, the
    standard SQL formulation."""
    s = _sensors(spark, sf_dir)
    out = s.groupBy(F.session_window("ts", "10 minutes"), "id").agg(
        F.count("*").alias("cnt"))
    return out.select(
        "id",
        F.col("session_window.start").cast("long").alias("session_start"),
        F.col("session_window.end").cast("long").alias("session_end"),
        "cnt",
    )


@register(
    "approx_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type""",
    "beyond",
)
def approx_distinct_users(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) per event_type — the
    approximate-aggregate surface (SURVEY §2.3 note). Sketch estimates
    are engine-specific, so instead of hashing the estimate itself the
    query emits a CHECKABLE BOUND: within_bound is true iff the HLL
    estimate (rsd=0.01) lands within 5 % of the exact distinct count
    (>= 5 sigma of the configured rsd — a genuine correctness envelope,
    not a tautology). The oracle recomputes the exact count and asserts
    TRUE, so the gate row hash-fails exactly when the sketch leaves its
    published error bound. Exact twin: events_distinct_users."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count_distinct("user_id").alias("n_exact"))
    return agg.select(
        "event_type", "n_exact",
        (F.abs(F.col("approx_users") - F.col("n_exact"))
         <= F.greatest(F.lit(1.0), F.col("n_exact") * 0.05))
        .alias("within_bound"))


@register(
    "stream_delta_alerts",
    SENSORS_CTE + """
    SELECT event_id, id, temperature, diff FROM (
      SELECT event_id, id, temperature,
             temperature - lag(temperature) OVER
               (PARTITION BY id ORDER BY event_id) AS diff
      FROM sensors) WHERE abs(diff) > 17""",
    "streaming", "F2",
)
def stream_delta_alerts(spark, sf_dir):
    """F2 as REAL Structured Streaming: sensor readings replayed as 4
    event_id-ORDERED micro-batches through applyInPandasWithState
    (keyed last_temp ValueState), availableNow trigger, memory sink.
    Because the replay is ordered (range-partitioned staging,
    streaming/stateful.py:temperature_delta_alerts_traced sorts each
    Arrow batch by event_id), the streamed alert set hash-matches the
    batch lag() twin's oracle — keyed streaming state and the batch
    window provably agree, upgrading this gate row from rows-only to
    value-checked."""
    tune(spark)
    from .streaming.stateful import temperature_delta_alerts_traced

    src = _staged_events_stream_ordered(spark, sf_dir, n_files=4,
                                        order_cols=("event_id",))
    readings = src.select(
        "event_id",
        F.concat(F.lit("sensor_"),
                 ((F.col("user_id") % 10) + 1).cast("string")).alias("id"),
        F.col("value").alias("temperature"),
    )
    out = temperature_delta_alerts_traced(readings, threshold=17.0)
    return _run_to_memory(spark, out, "stream_delta_alerts_result")


@register(
    "stream_delta_alerts_smallbatch",
    SENSORS_CTE + """
    SELECT event_id, id, temperature, diff FROM (
      SELECT event_id, id, temperature,
             temperature - lag(temperature) OVER
               (PARTITION BY id ORDER BY event_id) AS diff
      FROM sensors) WHERE abs(diff) > 17""",
    "streaming", "F2",
)
def stream_delta_alerts_smallbatch(spark, sf_dir):
    """stream_delta_alerts with
    spark.sql.execution.arrow.maxRecordsPerBatch forced to 64, so
    every key's per-batch input arrives as MANY Arrow record chunks
    and the multi-chunk ordered-scan path
    (streaming/stateful.py:ordered_batch — concat THEN sort; chunks
    arrive in arbitrary relative order) executes under the driver's
    correctness gate, not only under pytest. Same oracle as
    stream_delta_alerts: the streamed alert set must hash-match the
    batch lag() twin regardless of Arrow chunking — the adversarial
    re-prove of the r4 chunk-ordering fix."""
    tune(spark)
    from .streaming.stateful import temperature_delta_alerts_traced

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        src = _staged_events_stream_ordered(spark, sf_dir, n_files=4,
                                            order_cols=("event_id",))
        readings = src.select(
            "event_id",
            F.concat(F.lit("sensor_"),
                     ((F.col("user_id") % 10) + 1).cast("string"))
            .alias("id"),
            F.col("value").alias("temperature"),
        )
        out = temperature_delta_alerts_traced(readings, threshold=17.0)
        return _run_to_memory(spark, out,
                              "stream_delta_alerts_smallbatch_result")
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


@register(
    "stream_early_firing",
    """
    WITH e AS (
      SELECT 'sensor_' || ((user_id % 10) + 1)::VARCHAR AS id,
             (epoch_us(ts) // 1000) AS ms
      FROM events),
    wm AS (SELECT max(ms) - 5000 AS w FROM e),
    c AS (SELECT id, (ms // 3600000) * 3600000 AS window_start,
                 count(*)::BIGINT AS cnt
          FROM e GROUP BY 1, 2)
    SELECT c.id, window_start::BIGINT AS window_start,
           (window_start + 3600000)::BIGINT AS window_end,
           (CASE WHEN wm.w >= window_start + 3600000
                 THEN window_start + 3600000
                 ELSE wm.w - (wm.w % 600000) END)::BIGINT AS fire_ms,
           cnt, (wm.w >= window_start + 3600000) AS is_final
    FROM c CROSS JOIN wm
    WHERE wm.w >= window_start + 600000""",
    "streaming", "W4", "W6",
)
def stream_early_firing(spark, sf_dir):
    """W4 as REAL Structured Streaming: the events table replayed as a
    bounded stream through the early-firing tumbling window counter
    (streaming/timers.py — event-time timeout re-armed as a timer
    service; partial FIREs per interval tick, FIRE_AND_PURGE at window
    end). Under this replay (one data micro-batch — a single parquet
    file under availableNow — followed by SS's no-data timeout batch)
    the watermark trajectory is deterministic: wm=0 during the data
    batch (no fires), then wm = max event ms - 5000 for the timeout
    batch, in which every window fires exactly once — FIRE_AND_PURGE
    where wm >= end, an early FIRE at the latest due interval tick
    where wm >= start + interval. That closed form IS the oracle, so
    both final AND partial fires are value-checked, not rows-only.
    (A multi-batch replay would interleave partial fires per batch —
    the timer semantics themselves are additionally covered by
    dedicated tests.)"""
    import tempfile

    tune(spark)
    from .streaming.timers import early_firing_window_counts

    src = _events_stream(spark, sf_dir)
    readings = src.select(
        F.concat(F.lit("sensor_"), ((F.col("user_id") % 10) + 1).cast("string")).alias("id"),
        F.expr("unix_micros(ts) div 1000").alias("timestamp"),  # epoch ms
        F.col("value").alias("temperature"),
    )
    out = early_firing_window_counts(
        readings, window_ms=3_600_000, interval_ms=600_000,
        watermark_delay="5 seconds")
    return _run_to_memory(spark, out, "stream_early_firing_result")


def _staged_events_stream_quartile(spark, sf_dir, n_files: int = 4,
                                   assert_tick_ms: int | None = None,
                                   assert_key_expr: str | None = None):
    """Stage events as n_files EQUAL-COUNT time-quantile parquet files
    (file k = the k-th quartile of the (ts, event_id) total order) and
    stream them one per micro-batch in order. Unlike
    _staged_events_stream_ordered (repartitionByRange — boundaries
    come from Spark's range-partitioner SAMPLING), the bucket
    boundaries here are a closed form — bucket = (rank-1)*n // N — so
    a SQL oracle can recompute the exact per-batch watermark
    trajectory. Replay scaffolding only: the global row_number is a
    single-partition sort, bounded by the replay corpus by design.

    assert_tick_ms/assert_key_expr (ADVICE r5): when set, assert the
    two corpus invariants the multibatch closed-form oracle depends on
    — every key has rows in every bucket, and consecutive-bucket
    watermark jumps exceed the tick interval — against the ACTUAL
    staged buckets, so a fixture/corpus change invalidates the oracle
    loudly here instead of silently drifting."""
    import glob
    import os
    import shutil
    import tempfile

    ev = (load_table(spark, sf_dir, "events")
          .withColumn("ts", F.expr("unix_micros(ts)")))
    n = ev.count()
    b = (ev.withColumn("rn", F.row_number().over(
            Window.orderBy("ts", "event_id")))
         .withColumn("bucket",
                     F.expr(f"CAST(((rn - 1) * {n_files}) DIV {n} AS INT)"))
         .select("event_id", "ts", "user_id", "event_type", "value",
                 "props", "bucket")
         # pin once: the first consumer (invariant collect or the
         # first bucket write) materializes the lazy checkpoint and
         # every later bucket write reads the persisted blocks — the
         # global sort still runs exactly once, without a dedicated
         # checkpoint job (r12 job-fold)
         .localCheckpoint(eager=False))
    # The invariant re-check costs two extra Spark actions per build
    # on a static corpus (ADVICE r6): skip it when the gate latency
    # matters via SPARK_GRAFT_SKIP_STAGE_ASSERTS=1 (default: on —
    # safety over speed; pytest exercises both paths implicitly).
    if os.environ.get("SPARK_GRAFT_SKIP_STAGE_ASSERTS") == "1":
        assert_tick_ms = None
    if assert_tick_ms is not None:
        per = (b.withColumn("k", F.expr(assert_key_expr))
               .groupBy("bucket")
               .agg(F.max(F.expr("ts div 1000")).alias("mx"),
                    F.countDistinct("k").alias("nk"))
               .orderBy("bucket").collect())
        n_keys = (b.select(F.expr(assert_key_expr).alias("k"))
                  .distinct().count())
        assert len(per) == n_files and all(r["nk"] == n_keys for r in per), (
            f"multibatch oracle invariant broken: not every key appears in "
            f"every bucket ({[(r['bucket'], r['nk']) for r in per]} vs "
            f"{n_keys} keys) — the fires-every-batch closed form no longer "
            f"models the replay; restage or fix the oracle")
        jumps = [per[k]["mx"] - per[k - 1]["mx"] for k in range(1, len(per))]
        assert min(jumps) > assert_tick_ms, (
            f"multibatch oracle invariant broken: consecutive-bucket "
            f"watermark jumps {jumps} do not all exceed the tick interval "
            f"{assert_tick_ms} ms — partial-fire attribution would diverge")
    work = tempfile.mkdtemp(prefix="sgs_qstage_work_")
    d = tempfile.mkdtemp(prefix="sgs_qstaged_")
    base = 1_700_000_000
    for k in range(n_files):
        sub = os.path.join(work, f"b{k}")
        (b.filter(F.col("bucket") == k).drop("bucket")
         .coalesce(1).write.mode("overwrite").parquet(sub))
        part = glob.glob(os.path.join(sub, "part-*.parquet"))[0]
        dst = os.path.join(d, f"part-{k:05d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (base + k, base + k))
    shutil.rmtree(work, ignore_errors=True)
    src = (
        spark.readStream.schema(
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string")
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    return src.withColumn("ts", F.timestamp_micros("ts"))


@register(
    "stream_early_firing_multibatch",
    """
    WITH e AS (
      SELECT 'sensor_' || ((user_id % 10) + 1)::VARCHAR AS id,
             (epoch_us(ts) // 1000) AS ms,
             ((row_number() OVER (ORDER BY epoch_us(ts), event_id) - 1) * 4)
               // (SELECT count(*) FROM events) AS bucket
      FROM events),
    ks AS (SELECT unnest(generate_series(1, 4)) AS k),
    wm AS (
      SELECT k, (SELECT max(ms) FROM e WHERE bucket = least(k, 4) - 1) - 5000
               AS w
      FROM ks),
    c AS (
      SELECT id, (ms // 3600000) * 3600000 AS ws, k, count(*)::BIGINT AS cnt
      FROM e JOIN ks ON e.bucket <= least(k, 3)
      GROUP BY 1, 2, 3),
    p AS (
      SELECT x.id, x.ws, min(wm.k) AS pk
      FROM (SELECT DISTINCT id, ws FROM c) x
      JOIN wm ON wm.w >= x.ws + 3600000
      GROUP BY 1, 2),
    f AS (
      SELECT c.id, c.ws, c.k, c.cnt, wm.w, p.pk
      FROM c JOIN wm ON wm.k = c.k
      LEFT JOIN p ON p.id = c.id AND p.ws = c.ws
      WHERE p.pk IS NULL OR c.k <= p.pk)
    SELECT id, ws::BIGINT AS window_start,
           (ws + 3600000)::BIGINT AS window_end,
           (CASE WHEN k = pk THEN ws + 3600000
                 ELSE w - (w % 600000) END)::BIGINT AS fire_ms,
           cnt, coalesce(k = pk, FALSE) AS is_final
    FROM f
    WHERE coalesce(k = pk, FALSE) OR w >= ws + 600000""",
    "streaming", "W4", "W6",
)
def stream_early_firing_multibatch(spark, sf_dir):
    """W4 under a MULTI-batch replay — the full interleaved-fire
    semantics of the reference trigger
    (chapter6/CustomWindow.scala:87-148), value-checked: the events
    table streams as 4 time-quartile micro-batches
    (_staged_events_stream_quartile — closed-form bucket boundaries),
    so the watermark advances batch by batch and windows fire
    PARTIALLY in one batch and FINALLY in a later one, with cnt
    snapshotting the rows absorbed so far. The oracle simulates the
    trajectory exactly: wm_k = (max ms of quartile k-1) - 5000 for
    data batches 1-3 and the trailing no-data batch (k=4); at batch k
    every live window fires — FIRE_AND_PURGE at the first k with
    wm_k >= end (fire_ms = end, cnt = rows through quartile
    min(k,3)), else a partial FIRE at the latest 10-min tick
    (fire_ms = wm_k - wm_k % interval) once wm_k >= start+interval.
    The fires-every-batch model is exact for this corpus because every
    key has data in every quartile AND consecutive-quartile watermark
    jumps (~10^4 min) dwarf the tick interval, so every keyed timer
    has expired by the next batch — both properties ASSERTED against
    the actual staged buckets at stage time (ADVICE r5), so a corpus
    change fails loudly instead of silently drifting the oracle."""
    tune(spark)
    from .streaming.timers import early_firing_window_counts

    src = _staged_events_stream_quartile(
        spark, sf_dir, n_files=4, assert_tick_ms=600_000,
        assert_key_expr="(user_id % 10) + 1")
    readings = src.select(
        F.concat(F.lit("sensor_"),
                 ((F.col("user_id") % 10) + 1).cast("string")).alias("id"),
        F.expr("unix_micros(ts) div 1000").alias("timestamp"),
        F.col("value").alias("temperature"),
    )
    out = early_firing_window_counts(
        readings, window_ms=3_600_000, interval_ms=600_000,
        watermark_delay="5 seconds")
    return _run_to_memory(spark, out, "stream_early_firing_mb_result")

# ======================================================================
# Beyond-parity relational surface: per-key top-N (rank window), an
# event-time interval join, and the composite training-data pipeline
# (quality filter -> exact dedup -> language ID -> corpus stats).
# ======================================================================

@register(
    "topn_per_key",
    SENSORS_CTE + """
    SELECT id, rnk, event_id, temperature FROM (
      SELECT id, event_id, temperature,
             row_number() OVER (PARTITION BY id
                                ORDER BY temperature DESC, event_id) AS rnk
      FROM sensors)
    WHERE rnk <= 3""",
    "beyond", "relational",
)
def topn_per_key(spark, sf_dir):
    """Top-3 hottest readings per sensor via row_number() — the per-key
    top-N idiom (the reference's rolling max, A2, is the N=1 case).
    Unique tie-break on event_id keeps ranks deterministic. At scale
    this is one hash shuffle on the key + an in-partition sort; Spark
    plans a WindowGroupLimit (rank-pushdown) so each partition keeps
    only N rows before the final sort — no full per-key materialization."""
    s = _sensors(spark, sf_dir)
    w = Window.partitionBy("id").orderBy(
        F.col("temperature").desc(), F.col("event_id").asc())
    return (
        s.select("id", "event_id", "temperature",
                 F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .select("id", F.col("rnk").cast("bigint").alias("rnk"),
                "event_id", "temperature")
    )


@register(
    "error_recent_clicks",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, count(c.ts)::BIGINT AS n_recent_clicks
    FROM e LEFT JOIN c
      ON e.user_id = c.user_id
     AND c.ts > e.ts - INTERVAL 24 HOUR AND c.ts <= e.ts
    GROUP BY e.event_id, e.user_id""",
    "beyond", "relational", "interval_join",
)
def error_recent_clicks(spark, sf_dir):
    """Event-time interval join (the relational form of the reference's
    connect-based stream correlation, SURVEY §2.4): for each error
    event, count the same user's clicks in the preceding 24 h. The
    equi-key (user_id) carries the join — the time range is a post-join
    filter — so this stays a hash/sort-merge join on user_id at any
    scale; no cross product. The streaming twin is a stream-stream
    interval join with watermarks bounding state retention."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("err_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"))
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") > F.col("err_ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("click_ts") <= F.col("err_ts")),
        "left")
    return joined.groupBy("event_id", "user_id").agg(
        F.count("click_ts").alias("n_recent_clicks"))


def _pipeline_sql() -> str:
    return f"""
    WITH q AS ({_quality_sql()}),
    good AS (
      SELECT d.doc_id, d.text, d.source FROM documents d
      JOIN q ON d.doc_id = q.doc_id
      WHERE q.quality_score >= 0.75),
    keep AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(text)),
    kept AS (SELECT g.* FROM good g JOIN keep ON g.doc_id = keep.doc_id),
    l AS ({_lang_sql(rel='kept')})
    SELECT l.pred_lang, kept.source,
           count(*)::BIGINT AS n_docs,
           SUM(length(kept.text) // 4)::BIGINT AS n_tokens_est
    FROM kept JOIN l ON kept.doc_id = l.doc_id
    GROUP BY l.pred_lang, kept.source"""


@register("pipeline_training_data", _pipeline_sql(), "llm", "pipeline")
def pipeline_training_data(spark, sf_dir):
    """The composite training-data pipeline, end to end: quality-filter
    (score >= 0.75) -> exact dedup (keep smallest doc_id per identical
    text) -> language ID -> per (language, source) corpus stats. This is
    the shape of a real 100 TB curation job; every stage is the same
    operator the standalone queries check individually, composed as one
    lazy plan so Catalyst pipelines the scans (documents is read once
    per branch, filters push down, the dedup shuffle keys on md5 so the
    text column never shuffles twice). The regex-heavy quality/lang-ID
    stage is repartitioned off the scan so it doesn't inherit a single
    small file's parallelism (measured 2.3x at sf0.1; at production
    scale input splits exceed cores and AQE coalesces the exchange)."""
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism)
    good = docs.filter(text.quality_score_col(F.col("text")) >= 0.75)
    # all per-doc features computed narrowly, BEFORE any shuffle — the
    # only things that ever cross the wire are (doc_id, pred_lang,
    # source, tok_est) and the dedup's (md5, doc_id); text itself
    # never shuffles.
    # r12: ONE projection computes every per-doc feature (lang ID,
    # token estimate, content hash) in a single pass over the
    # survivors and is pinned — previously the regex-heavy quality
    # filter ran twice (once under the feature branch, once under the
    # dedup branch: 2 scans in the plan). The checkpointed rows are
    # narrow (no text).
    feat = good.select(
        "doc_id", "source",
        text.lang_id_col(F.col("text")).alias("pred_lang"),
        (F.length("text") / F.lit(4)).cast("long").alias("tok_est"),
        F.md5("text").alias("h")).localCheckpoint(eager=False)
    keep = (feat.groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"))
    return (
        feat.join(keep, "doc_id")
        .groupBy("pred_lang", "source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("tok_est").cast("bigint").alias("n_tokens_est"))
    )


@register(
    "stream_interval_join",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'error'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id,
           (epoch_us(e.ts) // 1000) AS err_ms,
           (epoch_us(c.ts) // 1000) AS click_ms
    FROM e JOIN c
      ON e.user_id = c.user_id
     AND c.ts > e.ts - INTERVAL 24 HOUR AND c.ts <= e.ts""",
    "streaming", "J1",
)
def stream_interval_join_query(spark, sf_dir):
    """J1's relational form as REAL Structured Streaming: the events
    table replayed as a bounded stream, self-joined (errors x clicks,
    same user, 24 h lookback) with the watermarked stream-stream
    interval join builder. Append-mode inner-join output is exactly the
    batch join's match set, so unlike the stateful stream_* entries
    this streaming query is fully oracle-checked."""
    import tempfile

    tune(spark)
    from .streaming.pipelines import stream_interval_join

    src = _events_stream(spark, sf_dir)
    errors = src.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("err_ts"))
    clicks = src.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"))
    out = stream_interval_join(
        errors, clicks, keys=["user_id"],
        left_ts="err_ts", right_ts="click_ts", lookback="24 hours")
    out = out.select(
        "event_id", "user_id",
        F.expr("unix_micros(err_ts) div 1000").alias("err_ms"),
        F.expr("unix_micros(click_ts) div 1000").alias("click_ms"),
    )
    return _run_to_memory(spark, out, "stream_interval_join_result")


def _events_stream(spark, sf_dir):
    """Bounded streaming replay of the events table. The parquet
    TIMESTAMP(NANOS) column is read as TIMESTAMP_NTZ (vanilla Spark 4
    behavior) and normalized to a UTC-instant TimestampType, matching
    the batch load_table() path under any session timezone."""
    src = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string")
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .parquet(sf_dir)
    )
    return normalize_ts(src, "ts")


def _run_to_memory(spark, out, name, mode="append"):
    """Run a bounded streaming replay to a memory sink and return the
    materialized table.

    State-store partitioning is sized to the REPLAY's volume (8), not
    the session's scale default: a streaming query locks its stateful
    shuffle partitioning into the (fresh) checkpoint at start, and at
    correctness-gate SF the per-micro-batch fixed cost of 32 state
    stores dominates runtime (measured 2-4x on the stream-stream
    joins). A production deployment sizes this to the stream rate —
    the knob is per-query, exactly as here. The session conf is
    restored before returning; the memory table is already
    materialized, so callers' batch reads are unaffected. The
    checkpoint dir is deleted once the replay terminates — the memory
    sink holds the rows driver-side, so nothing reads it again (the
    staged INPUT dirs, by contrast, must persist: batch twins scan
    them lazily)."""
    import shutil
    import tempfile

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = tempfile.mkdtemp(prefix="sgs_ckpt_")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        q = (out.writeStream.format("memory").queryName(name).outputMode(mode)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        shutil.rmtree(ckpt, ignore_errors=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


@register(
    "stream_dedup",
    """
    SELECT event_id, user_id, event_type,
           (epoch_us(ts) // 1000) AS ts_ms
    FROM events""",
    "streaming", "llm", "dedup",
)
def stream_dedup(spark, sf_dir):
    """Streaming exactly-once dedup: the events stream unioned with
    itself (every row arrives twice — the at-least-once delivery
    failure mode) then dropDuplicatesWithinWatermark on event_id. State
    holds only ids younger than the watermark delay, so memory is
    O(rate x delay) at any scale — the streaming twin of exact_dedup.
    Append output = each event exactly once = the oracle's plain scan."""
    tune(spark)
    ev = _events_stream(spark, sf_dir)
    doubled = ev.union(ev).withWatermark("ts", "10 seconds")
    deduped = doubled.dropDuplicatesWithinWatermark(["event_id"])
    return _run_to_memory(
        spark,
        deduped.select("event_id", "user_id", "event_type",
                       F.expr("unix_micros(ts) div 1000").alias("ts_ms")),
        "stream_dedup_result")


@register(
    "stream_static_enrich",
    """
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
           e.value AS value
    FROM events e JOIN customer c ON c.c_custkey = e.user_id""",
    "streaming", "J3",
)
def stream_static_enrich(spark, sf_dir):
    """J3/J4 as REAL streaming: per micro-batch stream-static
    enrichment join, planner-broadcast while the dim fits (the
    async/sync Derby lookup's Spark idiom —
    reference chapter8/AsyncFunctionExample.scala:77-83,103-159). The
    static dimension is re-read each micro-batch, so a refreshed dim
    table is picked up at batch boundaries — the micro-batch form of
    the reference's per-record lookup."""
    tune(spark)
    ev = _events_stream(spark, sf_dir)
    # no broadcast hint (r12 review fix): the stand-in dim here is the
    # SF-scaled customer table, and a hard hint is honored regardless
    # of size. The static size estimate broadcasts it while it is
    # small (stream-static joins plan the static side from file
    # stats); a dim that outgrows the threshold degrades to a shuffle
    # join instead of OOMing the driver — the documented J3/J4 cutover
    # (SCALE.md §4).
    dim = (load_table(spark, sf_dir, "customer")
           .select("c_custkey", "c_name", "c_mktsegment"))
    out = ev.join(dim, ev.user_id == dim.c_custkey, "inner").select(
        "event_id", "user_id", "c_name", "c_mktsegment", "value")
    return _run_to_memory(spark, out, "stream_static_enrich_result")


@register(
    "hash_split_sample",
    """
    WITH h AS (
      SELECT doc_id, lang, source,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100
               AS b_split,
             ('0x' || substr(md5('samp-' || doc_id::VARCHAR), 1, 15))::BIGINT
               % 100 AS b_keep
      FROM documents)
    SELECT doc_id, lang, source,
           CASE WHEN b_split < 80 THEN 'train'
                WHEN b_split < 90 THEN 'validation'
                ELSE 'test' END AS split,
           (b_keep < CASE WHEN lang = 'en' THEN 50 ELSE 100 END) AS kept
    FROM h""",
    "llm", "sampling",
)
def hash_split_sample(spark, sf_dir):
    """Deterministic train/validation/test assignment (80/10/10) plus
    stratified downsampling (keep 50% of over-represented 'en', 100%
    of the rest) — both via md5 hash buckets of the stable doc_id, the
    replayable alternative to rand()-based sampling: a retried task
    reproduces the same sample, and the split never shifts as data is
    appended. Independent buckets use a salted second hash so the
    sample is uncorrelated with the split. Pure narrow ops: zero
    shuffle at any scale."""
    docs = _t(spark, sf_dir, "documents")
    b = lambda c: (F.conv(F.substring(F.md5(c), 1, 15), 16, 10)
                   .cast("bigint") % 100)
    out = docs.select(
        "doc_id", "lang", "source",
        b(F.col("doc_id").cast("string")).alias("b_split"),
        b(F.concat(F.lit("samp-"), F.col("doc_id").cast("string")))
        .alias("b_keep"))
    return out.select(
        "doc_id", "lang", "source",
        F.when(F.col("b_split") < 80, "train")
         .when(F.col("b_split") < 90, "validation")
         .otherwise("test").alias("split"),
        (F.col("b_keep") < F.when(F.col("lang") == "en", 50).otherwise(100))
        .alias("kept"))


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
           FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    n AS (SELECT count(*)::BIGINT AS n FROM documents),
    s AS (
      SELECT doc_id, term, tf, df,
             tf * ln((n + 1.0) / (df + 1.0)) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, df, round(score, 6) AS tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term) AS rnk
          FROM s)
    WHERE rnk <= 5""",
    "llm", "text",
)
def tfidf_top_terms(spark, sf_dir):
    """Top-5 TF-IDF terms per document: tokenize -> per-(doc,term)
    counts -> document frequency -> smoothed idf ln((N+1)/(df+1)) ->
    per-doc rank. Two hash aggregations + one equi-join on term; the
    corpus size N rides along as a broadcast scalar, and the per-doc
    top-5 uses the same WindowGroupLimit rank-pushdown as topn_per_key
    — no doc's full term list is ever sorted globally."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.expr(
            "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    s = (tf.join(dfreq, "term").crossJoin(F.broadcast(n))
         .withColumn("score",
                     F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (s.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("doc_id", "term", "tf", "df",
                    F.round("score", 6).alias("tfidf")))


# ======================================================================
# Analytic window functions & stable moments over events
# ======================================================================

@register(
    "events_session_stats",
    """
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g),
    per AS (
      SELECT user_id, session_id, count(*)::BIGINT AS n_events
      FROM s GROUP BY user_id, session_id)
    SELECT user_id, count(*)::BIGINT AS n_sessions,
           max(n_events)::BIGINT AS max_session_events,
           sum(n_events)::BIGINT AS total_events
    FROM per GROUP BY user_id""",
    "relational", "window_functions",
)
def events_session_stats(spark, sf_dir):
    """Lag-based sessionization (the window-function twin of
    `session_windows`): a >30 min gap opens a new session; session ids
    are running sums of the gap flags. One shuffle on user_id serves
    both window passes AND the final groupBy (same partitioning —
    Exchange reuse keeps this a single-shuffle plan at any scale)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    sess = ev.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    per = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"))
    return per.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").cast("bigint").alias("total_events"))


@register(
    "events_moving_avg",
    """
    SELECT event_id, user_id,
           (count(*) OVER w)::BIGINT AS mov_n,
           (SUM(CAST(value AS DECIMAL(14,2))) OVER w)::DOUBLE
             / (count(*) OVER w) AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    "relational", "window_functions",
)
def events_moving_avg(spark, sf_dir):
    """Per-user 3-row moving average ordered by event time. The frame
    sum is DECIMAL (exact, order-independent) with one final DOUBLE
    division, so results are bit-identical across engines and across
    partitionings — the rule every distributed float aggregate here
    follows. Single shuffle on user_id; both window aggregates share
    one Window physical node."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    return ev.select(
        "event_id", "user_id",
        F.count("*").over(w).alias("mov_n"),
        (F.sum(dec("value", 14)).over(w).cast("double")
         / F.count("*").over(w)).alias("mov_avg"))


@register(
    "events_rollup",
    """
    SELECT event_type, day, count(*)::BIGINT AS cnt,
           SUM(CAST(value AS DECIMAL(14,2)))::DOUBLE AS total
    FROM (SELECT event_type,
                 CAST(date_trunc('day', ts) AS DATE)::VARCHAR AS day,
                 value
          FROM events)
    GROUP BY ROLLUP (event_type, day)""",
    "relational", "aggregates",
)
def events_rollup(spark, sf_dir):
    """Hierarchical totals via ROLLUP (event_type, day): per-day,
    per-type subtotal, grand total in one pass — Spark expands the
    grouping sets inside a single hash aggregate (one shuffle), not
    one job per level."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
        "value")
    return ev.rollup("event_type", "day").agg(
        F.count("*").alias("cnt"),
        F.sum(dec("value", 14)).cast("double").alias("total"))


@register(
    "events_value_stats",
    """
    WITH s AS (
      SELECT event_type, count(*)::BIGINT AS cnt,
             SUM(CAST(value AS DECIMAL(14,2)))::DOUBLE AS total,
             SUM(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS HUGEINT))
               AS sc,
             SUM(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS HUGEINT)
                 * CAST(CAST(value AS DECIMAL(14,2)) * 100 AS HUGEINT))
               AS sc2
      FROM events GROUP BY event_type)
    SELECT event_type, cnt, total,
           ((2 * sc * 1000000 + 100 * cnt) // (200 * cnt)) / 1e6 AS mean,
           ((2 * (sc2 * cnt - sc * sc) * 1000000 + 10000 * cnt * cnt)
            // (2 * 10000 * cnt::HUGEINT * cnt)) / 1e6 AS var_pop
    FROM s""",
    "relational", "aggregates", "numeric_stability",
)
def events_value_stats(spark, sf_dir):
    """Population mean/variance from exact DECIMAL first and second
    moments (sum, sum of squares), combined in DOUBLE only at the end.
    This is the numerically stable distributed-moments pattern: the
    partial aggregates commute exactly, so the result is independent
    of partition count and merge order — a float stddev_pop would not
    hash-match itself across two different partitionings, let alone
    across engines."""
    ev = _t(spark, sf_dir, "events")
    v = dec("value", 14)
    # exact integer cents (r13 tie class): mean = sc/(100n) and
    # var = (sc2*n - sc^2)/(10^4 n^2) are integer rationals with
    # count-valued denominators — half-up at 6 dp in DECIMAL(38,0)
    c = (v * 100).cast("decimal(38,0)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(v).cast("double").alias("total"),
        F.sum(c).alias("sc"),
        F.sum(c * c).alias("sc2"))
    cnt = F.col("cnt").cast("decimal(38,0)")
    sc, sc2 = F.col("sc").cast("decimal(38,0)"), \
        F.col("sc2").cast("decimal(38,0)")
    return s.select(
        "event_type", "cnt", "total",
        _ratio6_dec(sc, cnt * 100).alias("mean"),
        _ratio6_dec(sc2 * cnt - sc * sc,
                    cnt * cnt * 10_000).alias("var_pop"))


@register(
    "bigram_cond_prob",
    """
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents),
    ucnt AS (
      SELECT w1, count(*)::BIGINT AS first_cnt
      FROM (SELECT unnest(w) AS w1 FROM toks) GROUP BY w1),
    bcnt AS (
      SELECT bigram, count(*)::BIGINT AS cnt
      FROM (SELECT unnest(list_transform(
                     range(1, greatest(len(w) - 1, 0) + 1),
                     i -> w[i] || ' ' || w[i + 1])) AS bigram
            FROM toks)
      GROUP BY bigram)
    SELECT bigram, cnt, first_cnt,
           ((2 * cnt * 1000000 + first_cnt) // (2 * first_cnt)) / 1e6
             AS cond_p
    FROM bcnt JOIN ucnt ON string_split(bigram, ' ')[1] = w1
    ORDER BY cnt DESC, bigram LIMIT 50""",
    "llm", "text",
)
def bigram_cond_prob(spark, sf_dir):
    """Bigram language-model statistics: top-50 word bigrams with
    conditional probability P(w2 | w1) = c(w1 w2) / c(w1). The token
    array is materialized once per doc and feeds both the unigram and
    bigram counts; the bigram->unigram equi-join keys on the first
    word (vocab-sized sides, never corpus-sized), and the top-50 plans
    as TakeOrderedAndProject — no global sort of the vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("w"))
    ucnt = (toks.select(F.explode("w").alias("w1"))
            .groupBy("w1").agg(F.count("*").alias("first_cnt")))
    grams = F.expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) "
        "ELSE CAST(array() AS array<string>) END")
    bcnt = (toks.select(F.explode(grams).alias("bigram"))
            .groupBy("bigram").agg(F.count("*").alias("cnt")))
    j = bcnt.join(ucnt, F.split(F.col("bigram"), " ").getItem(0) == F.col("w1"))
    return (j.select(
        "bigram", "cnt", "first_cnt",
        _ratio6(F.col("cnt"), F.col("first_cnt")).alias("cond_p"))
        .orderBy(F.col("cnt").desc(), "bigram").limit(50))



@register(
    "stream_session_windows",
    SENSORS_CTE + """
    , s AS (SELECT id, epoch_us(ts) AS us FROM sensors),
    m AS (
      SELECT id, us,
             CASE WHEN lag(us) OVER (PARTITION BY id ORDER BY us) IS NULL
                    OR us - lag(us) OVER (PARTITION BY id ORDER BY us)
                       >= 600000000
                  THEN 1 ELSE 0 END AS new_s
      FROM s),
    g AS (
      SELECT id, us,
             sum(new_s) OVER (PARTITION BY id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m),
    sess AS (
      SELECT id, min(us) AS s_us, max(us) AS e_us, count(*)::BIGINT AS cnt
      FROM g GROUP BY id, sid),
    mx AS (SELECT max(us) AS mx_us FROM s)
    SELECT id, s_us // 1000000 AS session_start,
           (e_us + 600000000) // 1000000 AS session_end, cnt
    FROM sess, mx
    WHERE e_us + 600000000 <= mx_us""",
    "streaming", "W_session",
)
def stream_session_windows(spark, sf_dir):
    """Session windows as REAL Structured Streaming: watermarked
    session_window aggregation in append mode — sessions merge in
    state and emit exactly once when the watermark passes their end.
    The oracle sessionizes in SQL and keeps sessions whose end <= the
    final watermark (max event time, 0 s delay): the one session per
    key still open at end-of-stream is exactly what a real unbounded
    stream would still be holding in state. State is O(open sessions),
    eviction at the watermark — memory is bounded by key cardinality x
    gap, not stream length."""
    tune(spark)
    ev = _events_stream(spark, sf_dir)
    sens = ev.select(
        F.concat(F.lit("sensor_"),
                 ((F.col("user_id") % 10) + 1).cast("string")).alias("id"),
        "ts")
    agg = (sens.withWatermark("ts", "0 seconds")
           .groupBy(F.session_window("ts", "10 minutes"), "id")
           .agg(F.count("*").alias("cnt")))
    out = agg.select(
        "id",
        F.col("session_window.start").cast("long").alias("session_start"),
        F.col("session_window.end").cast("long").alias("session_end"),
        "cnt")
    return _run_to_memory(spark, out, "stream_session_windows_result")


@register(
    "doc_repetition_stats",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents),
    base AS (
      SELECT doc_id, len(w)::BIGINT AS n_words,
             len(list_distinct(w))::BIGINT AS n_distinct,
             unnest(list_transform(
               range(1, greatest(len(w) - 1, 0) + 1),
               i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM toks),
    bi AS (
      SELECT doc_id, bigram, count(*)::BIGINT AS c,
             max(n_words) AS n_words, max(n_distinct) AS n_distinct
      FROM base GROUP BY doc_id, bigram)
    SELECT doc_id, max(n_words)::BIGINT AS n_words,
           ((2 * (max(n_words) - max(n_distinct)) * 1000000
             + max(n_words)) // (2 * max(n_words))) / 1e6
             AS dup_word_frac,
           ((2 * max(c) * 1000000 + sum(c)) // (2 * sum(c)::BIGINT)) / 1e6
             AS top_bigram_frac
    FROM bi GROUP BY doc_id""",
    "llm", "text", "quality",
)
def doc_repetition_stats(spark, sf_dir):
    """Repetition-based quality signals (the Gopher-style filters) for
    docs with >= 2 tokens: duplicate-word fraction (1 - distinct/total)
    and the fraction of all bigrams taken by the single most frequent
    bigram — high values flag boilerplate/spam for training-data
    filtering. ZERO shuffles (r5 rewrite, was two doc-keyed shuffles):
    every signal is a narrow per-row fold — the most frequent bigram's
    multiplicity equals the longest equal-run in the doc's SORTED
    bigram array, so one array_sort + one aggregate() fold computes it
    without the (doc_id, bigram) rows ever leaving the scan task, and
    sum(c) is just size(w)-1. At 100 TB that removes a corpus-sized
    bigram-keyed exchange entirely; output flows straight out of the
    scan stage. Equivalence to the aggregate form is pinned by
    tests/test_round3_ops.py::test_doc_repetition_narrow_equivalence
    (exact frame match vs the two-shuffle composition) and the
    zero-Exchange plan assert in test_plan_hygiene.py."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("w"))
    # longest equal-run over the sorted bigram array == max bigram
    # multiplicity; <=> makes the first element start run 1 (prev null)
    max_run = F.expr("""
      aggregate(
        array_sort(transform(sequence(1, size(w) - 1),
                   i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))),
        named_struct('prev', cast(null as string),
                     'run', cast(0 as bigint), 'best', cast(0 as bigint)),
        (acc, x) -> named_struct(
          'prev', x,
          'run', CASE WHEN x <=> acc.prev THEN acc.run + 1
                      ELSE cast(1 as bigint) END,
          'best', greatest(acc.best,
                  CASE WHEN x <=> acc.prev THEN acc.run + 1
                       ELSE cast(1 as bigint) END)),
        acc -> acc.best)""")
    return (toks.filter(F.size("w") >= 2)
            .select("doc_id",
                    F.size("w").cast("bigint").alias("n_words"),
                    F.size(F.array_distinct("w")).cast("bigint")
                     .alias("n_distinct"),
                    max_run.alias("max_c"))
            .select("doc_id", "n_words",
                    _ratio6(F.col("n_words") - F.col("n_distinct"),
                            F.col("n_words")).alias("dup_word_frac"),
                    _ratio6(F.col("max_c"), F.col("n_words") - 1)
                     .alias("top_bigram_frac")))


@register(
    "funnel_conversion",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) // 1000 AS ms FROM events),
    w1 AS (
      SELECT *, min(CASE WHEN event_type = 'view' THEN ms END)
                  OVER (PARTITION BY user_id) AS v_ms
      FROM e),
    w2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ms >= v_ms THEN ms END)
                  OVER (PARTITION BY user_id) AS c_ms
      FROM w1),
    w3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ms >= c_ms THEN ms END)
                  OVER (PARTITION BY user_id) AS p_ms
      FROM w2)
    SELECT user_id, max(v_ms)::BIGINT AS v_ms, max(c_ms)::BIGINT AS c_ms,
           max(p_ms)::BIGINT AS p_ms,
           (CASE WHEN max(p_ms) IS NOT NULL THEN 3
                 WHEN max(c_ms) IS NOT NULL THEN 2
                 WHEN max(v_ms) IS NOT NULL THEN 1
                 ELSE 0 END)::BIGINT AS funnel_stage
    FROM w3 GROUP BY user_id""",
    "relational", "window_functions", "funnel",
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel per user (view -> first click at/after the first
    view -> first purchase at/after that click) — the sequence/CEP
    pattern as relational analytics. Three chained conditional window
    minima over ONE user_id partitioning; the final per-user collapse
    reuses the same shuffle, so the whole funnel is a single-exchange
    plan at any scale."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.expr("unix_micros(ts) div 1000").alias("ms"))
    w = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "v_ms", F.min(F.when(F.col("event_type") == "view", F.col("ms"))).over(w))
    s2 = s1.withColumn(
        "c_ms", F.min(F.when((F.col("event_type") == "click")
                             & (F.col("ms") >= F.col("v_ms")),
                             F.col("ms"))).over(w))
    s3 = s2.withColumn(
        "p_ms", F.min(F.when((F.col("event_type") == "purchase")
                             & (F.col("ms") >= F.col("c_ms")),
                             F.col("ms"))).over(w))
    return s3.groupBy("user_id").agg(
        F.max("v_ms").alias("v_ms"),
        F.max("c_ms").alias("c_ms"),
        F.max("p_ms").alias("p_ms"),
        F.when(F.max("p_ms").isNotNull(), 3)
         .when(F.max("c_ms").isNotNull(), 2)
         .when(F.max("v_ms").isNotNull(), 1)
         .otherwise(0).cast("bigint").alias("funnel_stage"))


@register(
    "decontaminate_overlap",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT AS shingle,
             greatest(len(words) - 4, 0) AS _n_raw
      FROM (SELECT doc_id, words,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 4, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 4), ' ')))
                     AS g
            FROM w)),
    sz AS (SELECT doc_id, count(*)::BIGINT AS n_shingles
           FROM sh GROUP BY doc_id),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    ov AS (
      SELECT c.doc_id, count(b.shingle)::BIGINT AS n_overlap
      FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) c
      LEFT JOIN bench b USING (shingle)
      GROUP BY c.doc_id)
    SELECT o.doc_id, s.n_shingles, o.n_overlap,
           ((2 * o.n_overlap * 1000000 + s.n_shingles)
            // (2 * s.n_shingles::BIGINT)) / 1e6 AS overlap_frac,
           (o.n_overlap / s.n_shingles::DOUBLE >= 0.1) AS contaminated
    FROM ov o JOIN sz s USING (doc_id)""",
    "llm", "dedup", "decontamination",
)
def decontaminate_overlap(spark, sf_dir):
    """Training-data decontamination: distinct word-5-gram overlap of
    every corpus document against a benchmark set (here the docs with
    doc_id % 97 == 0 stand in for an eval set). The benchmark shingle
    index is distinct-ed and BROADCAST — eval sets are small by
    construction, so at 100 TB this stays a narrow per-doc pipeline
    plus one groupBy(doc): no corpus-sized join anywhere."""
    docs = _t(spark, sf_dir, "documents")
    bench_docs = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return dedup.benchmark_overlap(corpus, bench_docs, n=5,
                                   frac_threshold=0.1)


@register(
    "events_json_props",
    """
    SELECT event_type,
           count(*)::BIGINT AS cnt,
           min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
           max(json_extract_string(props, '$.k')::BIGINT) AS max_k,
           sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k
    FROM events GROUP BY event_type""",
    "relational", "semi_structured",
)
def events_json_props(spark, sf_dir):
    """Semi-structured extraction: pull an integer field out of the
    JSON `props` column and aggregate it per event type. Uses
    get_json_object (JVM-side, codegen) — at scale, repeated multi-field
    extraction should switch to one from_json into a struct so the
    document parses once; the single-field form here keeps the scan
    narrow and shuffles only (event_type, k)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type").agg(
                F.count("*").alias("cnt"),
                F.min("k").alias("min_k"),
                F.max("k").alias("max_k"),
                F.sum("k").cast("bigint").alias("sum_k")))


@register(
    "q12_late_shipment_priority",
    """
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE date_diff('day', o_orderdate::DATE, l_shipdate::DATE) > 60
    GROUP BY l_linestatus""",
    "relational", "bench",
)
def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 adapted (testdata has no l_shipmode/l_commitdate/
    l_receiptdate — reference columns in dbgen): late lines = shipped
    > 60 days after the order date, bucketed by l_linestatus standing
    in for shipmode, with Q12's signature conditional priority counts.
    The date filter is computed from both sides, so it applies after
    the join — but the join itself is the only fact shuffle, and the
    conditional aggregation collapses map-side."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus",
                                              "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate",
                                                "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.datediff(F.col("l_shipdate").cast("date"),
                           F.col("o_orderdate").cast("date")) > 60)
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
              .alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
              .alias("low_line_count")))


@register(
    "q21_waiting_supplier",
    """
    WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem)
    SELECT s_name, count(DISTINCT l1.l_orderkey)::BIGINT AS numwait
    FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM l l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM l l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20""",
    "relational", "bench",
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 adapted (no l_commitdate/l_receiptdate in testdata):
    suppliers whose line was the LAST to ship in a multi-supplier
    order — Q21's signature shape, a correlated EXISTS (another
    supplier in the order) plus a correlated NOT EXISTS (nobody
    shipped later), expressed as a left-semi and a left-anti self-join
    on l_orderkey. All three legs shuffle on the same orderkey, so AQE
    plans one co-partitioned pipeline; the SF-scaled supplier join is
    planner-decided (r12 — broadcast while small, shuffle at scale)."""
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1, l2, l3 = li.alias("l1"), li.alias("l2"), li.alias("l3")
    waiting = (
        l1.join(l2, (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
                & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
                "left_semi")
        .join(l3, (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
              & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
              & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
              "left_anti")
    )
    return (
        waiting.join(sup,  # supplier is SF-scaled: no hint (r12)
                     F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct(F.col("l1.l_orderkey")).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name").limit(20))


# ======================================================================
# Chunking, rare-token stats, label centroids (LLM-pipeline breadth)
# ======================================================================

@register(
    "doc_chunks",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents),
    st AS (
      SELECT doc_id, t,
             unnest(generate_series(0, greatest(len(t) - 1, 0), 12)) AS s
      FROM toks)
    SELECT doc_id, (s // 12)::BIGINT AS chunk_id,
           least(16, len(t) - s)::BIGINT AS n_chunk_tokens,
           array_to_string(t[s + 1 : s + 16], ' ') AS chunk_text
    FROM st""",
    "llm", "text",
)
def doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (window 16, stride 12) —
    RAG / context-length prep. Zero shuffle: pure narrow array ops."""
    docs = _t(spark, sf_dir, "documents")
    return text.chunk_tokens(docs, window=16, stride=12)


@register(
    "doc_rare_token_stats",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
           FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    j AS (SELECT doc_id, tf, df, n_docs
          FROM tf JOIN dfreq USING (term) CROSS JOIN n)
    SELECT doc_id,
           sum(tf)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_terms,
           sum(CASE WHEN df * 5 <= n_docs THEN tf ELSE 0 END)::BIGINT
             AS n_rare,
           ((2 * count(*) * 1000000 + sum(tf))
            // (2 * sum(tf)::BIGINT)) / 1e6 AS ttr,
           ((2 * sum(CASE WHEN df * 5 <= n_docs THEN tf ELSE 0 END)::BIGINT
             * 1000000 + sum(tf))
            // (2 * sum(tf)::BIGINT)) / 1e6 AS rare_ratio
    FROM j GROUP BY doc_id""",
    "llm", "text",
)
def doc_rare_token_stats(spark, sf_dir):
    """Zipf-tail quality signal: fraction of token occurrences whose
    corpus document-frequency is <=20% of the corpus — integer-exact
    rarity test, vocabulary-sized broadcast, one wide doc rollup."""
    docs = _t(spark, sf_dir, "documents")
    return text.rare_token_stats(docs, rare_df_num=1, rare_df_den=5)


@register(
    "label_centroids",
    """
    WITH dims AS (SELECT unnest(generate_series(0, 63)) AS dim),
    e AS (
      SELECT label::BIGINT AS label, d.dim::BIGINT AS dim,
             (embedding[d.dim + 1]::DOUBLE)::DECIMAL(28,12) AS x
      FROM embeddings CROSS JOIN dims d)
    SELECT label, dim, count(*)::BIGINT AS n,
           (CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END)
           * ((2 * abs(CAST(sum(x) * 1000000000000 AS HUGEINT)) * 1000000
               + count(*)::HUGEINT * 1000000000000)
              // (2 * count(*)::HUGEINT * 1000000000000)) / 1e6
             AS centroid
    FROM e GROUP BY label, dim""",
    "llm", "similarity",
)
def label_centroids(spark, sf_dir):
    """Per-label embedding centroids with order-independent DECIMAL
    partial sums — the supervised twin of the IVF coarse quantizer."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.label_centroids(emb, dim=64)


# ======================================================================
# TPC-H completions: q2 / q11 / q20 over a derived partsupp
# (the testdata ships no partsupp table; we derive one from lineitem:
#  ps_supplycost = min line price, ps_availqty = total shipped qty —
#  both exact DECIMAL, so derived values match bit-for-bit across
#  engines and the three queries keep their reference shapes.)
# ======================================================================

_PS_CTE = """
    ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(10,2))) AS ps_supplycost,
             SUM(CAST(l_quantity AS DECIMAL(10,2))) AS ps_availqty
      FROM lineitem GROUP BY 1, 2)"""


def _derived_ps(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(dec("l_extendedprice", 10, 2)).alias("ps_supplycost"),
        F.sum(dec("l_quantity", 10, 2)).alias("ps_availqty"),
    )


@register(
    "q2_min_cost_supplier",
    "WITH" + _PS_CTE + """,
    europe AS (
      SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
      FROM ps JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    parts AS (
      SELECT p_partkey, p_name FROM part
      WHERE p_size = 15 AND p_type = 'STANDARD'),
    mc AS (
      SELECT ps_partkey, min(ps_supplycost) AS mincost
      FROM europe JOIN parts ON ps_partkey = p_partkey GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ps_supplycost::DOUBLE AS supplycost
    FROM europe JOIN parts ON ps_partkey = p_partkey
                JOIN mc USING (ps_partkey)
    WHERE ps_supplycost = mincost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "relational", "tpch",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 adapted to the derived partsupp: cheapest EUROPE
    supplier(s) per qualifying part. The correlated min-cost subquery
    becomes a partkey aggregate joined back on (partkey, exact-decimal
    cost equality). One wide stage builds ps. The supplier/part/
    min-cost sides are SF-scaled, so they carry NO broadcast hint (r12
    review fix — the previous docstring's "small and broadcast ... at
    100 TB" claim was false: a filtered part table still scales
    linearly with SF and a forced hint OOMs at 100 TB; the planner
    broadcasts them statically at test SF and AQE converts at runtime
    while they measure small). The filtered (part, supplier) table is
    lazily checkpointed so the min-cost branch and the join-back share
    ONE derived-partsupp computation (was two full lineitem
    scans+aggs; r6 plan fix, byte-identical, 1.13 -> 0.99 s)."""
    ps = _derived_ps(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe = (ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
              .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
              .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
              .select("ps_partkey", "ps_supplycost", "s_acctbal",
                      "s_name", "n_name"))
    parts = (_t(spark, sf_dir, "part")
             .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
             .select("p_partkey", "p_name"))
    withp = (europe.join(parts, europe.ps_partkey == parts.p_partkey)
             .localCheckpoint(eager=False))
    mc = (withp.groupBy("ps_partkey")
          .agg(F.min("ps_supplycost").alias("mincost")))
    return (withp.join(mc, "ps_partkey")
            .filter(F.col("ps_supplycost") == F.col("mincost"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                    F.col("ps_supplycost").cast("double").alias("supplycost"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


@register(
    "q11_important_stock",
    "WITH" + _PS_CTE + """,
    in_nation AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS val
      FROM ps JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'),
    byp AS (SELECT ps_partkey, sum(val) AS val FROM in_nation GROUP BY 1),
    tot AS (SELECT sum(val) AS total FROM in_nation)
    SELECT ps_partkey, val::DOUBLE AS stock_value
    FROM byp CROSS JOIN tot
    WHERE val * 10000 > total""",
    "relational", "tpch",
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 adapted: parts whose stock value at NATION_7 suppliers
    exceeds 0.01% of the nation total. All sums are exact DECIMAL
    (products of 2-dp decimals), and the threshold compares
    value*10000 > total in integer-scaled decimal — no float
    summation anywhere until the final output cast. The nation total
    rides along as a broadcast scalar (the scalar-subquery shape of
    the reference query) — computed FROM the checkpointed per-part
    aggregate (total = sum of byp.val, exact in decimal), so the
    derived-partsupp chain runs once instead of twice (r6 plan fix,
    byte-identical)."""
    ps = _derived_ps(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    nat = (_t(spark, sf_dir, "nation")
           .filter(F.col("n_name") == "NATION_7"))
    # the one-nation supplier set is still ~1/25 of an SF-scaled
    # table: no hint on it (r12) — nation itself (25 rows) stays hinted
    in_nation = (ps.join(
                     sup.join(F.broadcast(nat),
                              sup.s_nationkey == nat.n_nationkey)
                     .select("s_suppkey"),
                     ps.ps_suppkey == F.col("s_suppkey"))
                 .select("ps_partkey",
                         (F.col("ps_supplycost") * F.col("ps_availqty"))
                         .alias("val")))
    byp = (in_nation.groupBy("ps_partkey").agg(F.sum("val").alias("val"))
           .localCheckpoint(eager=False))
    tot = byp.agg(F.sum("val").alias("total"))
    return (byp.crossJoin(F.broadcast(tot))
            .filter(F.col("val") * 10000 > F.col("total"))
            .select("ps_partkey",
                    F.col("val").cast("double").alias("stock_value")))


@register(
    "q20_excess_availability",
    """
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(10,2))) AS total_qty,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                      THEN CAST(l_quantity AS DECIMAL(10,2))
                      ELSE CAST(0 AS DECIMAL(10,2)) END) AS qty_1996
      FROM lineitem GROUP BY 1, 2),
    cand AS (
      SELECT DISTINCT l_suppkey
      FROM pq JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%' AND qty_1996 * 2 > total_qty)
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (SELECT l_suppkey FROM cand)""",
    "relational", "tpch",
)
def q20_excess_availability(spark, sf_dir):
    """TPC-H Q20 adapted: NATION_3 suppliers who shipped more than half
    of their total volume of some 'small%' part during 1996 — the
    reference's nested correlated-subquery chain re-expressed as a
    conditional aggregate plus a left-semi join onto supplier. The
    (part, supp) aggregate is the only wide stage; the filtered part
    table and the candidate-supplier list are SF-scaled, so the
    planner decides their join strategy (r12 — no forced hints)."""
    li = _t(spark, sf_dir, "lineitem")
    in_1996 = ((F.col("l_shipdate") >= "1996-01-01 00:00:00")
               & (F.col("l_shipdate") < "1997-01-01 00:00:00"))
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity", 10, 2)).alias("total_qty"),
        F.sum(F.when(in_1996, dec("l_quantity", 10, 2))
              .otherwise(dec(F.lit(0), 10, 2))).alias("qty_1996"))
    parts = (_t(spark, sf_dir, "part")
             .filter(F.col("p_name").like("small%"))
             .select("p_partkey"))
    cand = (pq.join(parts,  # filtered part is still SF-scaled: no hint
                    pq.l_partkey == parts.p_partkey)
            .filter(F.col("qty_1996") * 2 > F.col("total_qty"))
            .select("l_suppkey").distinct())
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
            .join(cand, sup.s_suppkey == cand.l_suppkey, "left_semi")
            .select("s_name", "s_acctbal"))


# ======================================================================
# Corpus dataset card + ANN recall measurement
# ======================================================================

def _corpus_stats_sql() -> str:
    stop = " + ".join(
        f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"
        for w in text.STOPWORDS
    )
    return f"""
    WITH f AS (
      SELECT source, lang,
             length(text)::BIGINT AS n_chars,
             len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words,
             len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
             ({stop})::BIGINT AS n_stop
      FROM documents),
    g AS (
      SELECT source, lang, n_chars, n_words,
             round(
               (CASE WHEN n_words >= 10 AND n_words <= 100000
                     THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN (n_chars - (n_words - 1)) / n_words >= 3
                      AND (n_chars - (n_words - 1)) / n_words <= 10
                     THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN n_punct / n_chars < 0.2 THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN n_stop / n_words > 0.01 THEN 0.25 ELSE 0.0 END), 2)
               AS q
      FROM f)
    SELECT source, lang,
           count(*)::BIGINT AS n_docs,
           sum(n_words)::BIGINT AS total_words,
           sum(n_chars)::BIGINT AS total_chars,
           ((2 * sum(n_words)::BIGINT * 1000000 + count(*))
            // (2 * count(*))) / 1e6 AS mean_words,
           ((2 * sum(n_chars)::BIGINT * 1000000 + count(*))
            // (2 * count(*))) / 1e6 AS mean_chars,
           ((2 * sum(CAST(q * 4 AS BIGINT)) * 1000000 + 4 * count(*))
            // (2 * 4 * count(*))) / 1e6 AS mean_quality
    FROM g GROUP BY source, lang"""


@register("corpus_stats_by_source", _corpus_stats_sql(), "llm", "text")
def corpus_stats_by_source(spark, sf_dir):
    """Dataset-card rollup: per (source, lang) document counts, token
    and char totals, and mean composite quality. One narrow scan + one
    hash agg on a tiny key space; quality scores are exact quarters
    (multiples of 0.25 are exactly representable), so the double sum
    is order-independent without a decimal detour."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_words = F.size(F.split(F.trim(t), r"\s+"))
    q = text.quality_score_col(t)
    return (docs.select("source", "lang", n_chars.alias("n_chars"),
                        n_words.alias("n_words"), q.alias("q"))
            .groupBy("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("total_words"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 _ratio6(F.sum("n_words"), F.count("*"))
                  .alias("mean_words"),
                 _ratio6(F.sum("n_chars"), F.count("*"))
                  .alias("mean_chars"),
                 # q is an exact quarter: *4 -> integer (r13 tie class)
                 _ratio6(F.sum((F.col("q") * 4).cast("long")),
                         F.count("*") * 4).alias("mean_quality")))


@register(
    "ann_recall_lsh",
    f"""
    WITH brute AS ({_BRUTE_TOPK_SQL}),
    lsh AS ({_lsh_topk_sql()}),
    hits AS (
      SELECT b.query_id, count(*)::BIGINT AS n_hits
      FROM brute b JOIN lsh l
        ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      GROUP BY b.query_id),
    base AS (SELECT DISTINCT query_id FROM brute)
    SELECT base.query_id,
           coalesce(n_hits, 0)::BIGINT AS n_hits,
           round(coalesce(n_hits, 0) / 5.0, 6) AS recall_at_5
    FROM base LEFT JOIN hits ON base.query_id = hits.query_id""",
    "llm", "similarity",
)
def ann_recall_lsh(spark, sf_dir):
    """Measures the approximation: recall@5 of the hyperplane-LSH
    top-k against the exact brute-force top-k, per query vector. The
    quality gauge a production ANN path ships with — at 100 TB you
    tune num_planes/nprobe against exactly this curve on a sampled
    slice. Both sides reuse the registry's own builders; the
    intersection is a broadcast-sized semi join."""
    emb = _t(spark, sf_dir, "embeddings")
    brute = similarity.brute_force_topk(emb, k=5, query_mod=50)
    lshr = similarity.lsh_topk(emb, k=5, query_mod=50, num_planes=8, dim=64)
    hits = (brute.join(lshr.select("query_id", "neighbor_id"),
                       ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count("*").alias("n_hits")))
    base = brute.select("query_id").distinct()
    return (base.join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                     .alias("n_hits"),
                    F.round(F.coalesce("n_hits", F.lit(0)) / 5.0, 6)
                     .alias("recall_at_5")))


# ======================================================================
# Passage-level dedup over token-window chunks
# ======================================================================

def _chunk_hash_cte(window: int = 8, stride: int = 4) -> str:
    return rf"""
    w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents),
    st AS (
      SELECT doc_id, t,
             unnest(generate_series(0, greatest(len(t) - 1, 0), {stride}))
               AS s
      FROM w),
    c AS (
      SELECT doc_id,
             md5(array_to_string(t[s + 1 : s + {window}], ' ')) AS h
      FROM st)"""


def _chunk_hashes(spark, sf_dir, window: int = 8, stride: int = 4):
    docs = _t(spark, sf_dir, "documents")
    return (text.chunk_tokens(docs, window=window, stride=stride)
            .select("doc_id", F.md5("chunk_text").alias("h")))


@register(
    "shared_passages",
    "WITH" + _chunk_hash_cte() + """
    SELECT h,
           count(DISTINCT doc_id)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_chunks,
           min(doc_id) AS keep_doc
    FROM c GROUP BY h
    HAVING count(DISTINCT doc_id) >= 2""",
    "llm", "dedup",
)
def shared_passages(spark, sf_dir):
    """Cross-document repeated passages: 8-token chunks (stride 4)
    hashed and grouped; a hash hitting >=2 distinct docs is boilerplate
    / injected duplication. Chunking is narrow; the single shuffle
    carries (doc_id, 16-byte hash), never text — at 100 TB the shuffle
    is ~1% of corpus bytes."""
    c = _chunk_hashes(spark, sf_dir)
    return (c.groupBy("h")
            .agg(F.count_distinct("doc_id").cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_chunks"),
                 F.min("doc_id").alias("keep_doc"))
            .filter(F.col("n_docs") >= 2))


@register(
    "doc_passage_dup_ratio",
    "WITH" + _chunk_hash_cte() + """,
    shared AS (
      SELECT h FROM c GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    tot AS (
      SELECT doc_id, count(*)::BIGINT AS n_chunks FROM c GROUP BY doc_id),
    dup AS (
      SELECT doc_id, count(*)::BIGINT AS n_dup
      FROM c WHERE h IN (SELECT h FROM shared)
      GROUP BY doc_id)
    SELECT doc_id, n_chunks,
           coalesce(n_dup, 0)::BIGINT AS n_dup,
           ((2 * coalesce(n_dup, 0)::BIGINT * 1000000 + n_chunks)
            // (2 * n_chunks)) / 1e6 AS dup_ratio
    FROM tot LEFT JOIN dup USING (doc_id)""",
    "llm", "dedup",
)
def doc_passage_dup_ratio(spark, sf_dir):
    """Per-document duplication signal: the fraction of a doc's 8-token
    chunks that also appear in some other document — the filter column
    a curation pipeline thresholds on. The shared-hash set is tiny
    (only colliding hashes) so it broadcasts into a semi join; total
    and duplicated counts co-partition on doc_id."""
    c = _chunk_hashes(spark, sf_dir)
    shared = (c.groupBy("h")
              .agg(F.count_distinct("doc_id").alias("nd"))
              .filter(F.col("nd") >= 2).select("h"))
    tot = c.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_chunks"))
    # r13 de-hint: `shared` is corpus-derived (colliding hashes grow
    # with the duplication rate); AQE broadcasts it while small
    dup = (c.join(shared, "h", "left_semi")
           .groupBy("doc_id").agg(F.count("*").cast("long").alias("n_dup")))
    return (tot.join(dup, "doc_id", "left")
            .select("doc_id", "n_chunks",
                    F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
                    _ratio6(F.coalesce("n_dup", F.lit(0)),
                            F.col("n_chunks")).alias("dup_ratio")))


@register(
    "stream_windowed_avg",
    f"""
    WITH e AS (
      SELECT event_type, (epoch_us(ts) // 1000) AS ms, value FROM events),
    w AS (
      SELECT event_type, ms - ms % 60000 AS w_start, value FROM e),
    a AS (
      SELECT event_type, w_start,
             count(*)::BIGINT AS cnt,
             {AVG6_SQL} AS avg_value
      FROM w GROUP BY event_type, w_start),
    mx AS (SELECT max(ms) AS mx FROM e)
    SELECT event_type, w_start AS window_start_ms,
           w_start + 60000 AS window_end_ms, cnt, avg_value
    FROM a, mx WHERE w_start + 60000 <= mx""",
    "streaming", "W1",
)
def stream_windowed_avg(spark, sf_dir):
    """The chapter-1 flagship shape as REAL Structured Streaming:
    watermarked tumbling 1-minute averages per event type in append
    mode — each window emits exactly once when the watermark passes
    its end (reference chapter1/AverageSensorReadings.scala:48-57).
    The oracle recomputes the windows in SQL and keeps those whose end
    <= the final watermark (max event time, 0 s delay) — the windows a
    real unbounded run would have emitted by end-of-stream. Averages
    are exact integer-cent sums with half-up 6-dp integer rounding
    (_avg6 — engine-neutral at round-half ties, unlike round(double)),
    so state merge order cannot perturb the hash. State is O(open
    windows x types);
    eviction at the watermark bounds memory at any stream length."""
    tune(spark)
    ev = _events_stream(spark, sf_dir)
    agg = (ev.withWatermark("ts", "0 seconds")
           .groupBy(F.window("ts", "1 minute"), "event_type")
           .agg(F.count("*").alias("cnt"), _cents_sum("value")))
    out = agg.select(
        "event_type",
        F.expr("unix_micros(window.start) div 1000").alias("window_start_ms"),
        F.expr("unix_micros(window.end) div 1000").alias("window_end_ms"),
        "cnt", _avg6().alias("avg_value"))
    return _run_to_memory(spark, out, "stream_windowed_avg_result")


@register(
    "stream_session_stats",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS tu, value FROM events),
    mx AS (SELECT max(tu) AS mx FROM e),
    f AS (
      SELECT event_type, tu, value,
             CASE WHEN lag(tu) OVER w IS NULL
                    OR tu - lag(tu) OVER w > 600000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY tu)),
    g AS (
      SELECT event_type, tu, value,
             sum(new_s) OVER (PARTITION BY event_type ORDER BY tu
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM f),
    s AS (
      SELECT event_type, min(tu) AS session_start_us,
             max(tu) + 600000000 AS session_end_us,
             count(*)::BIGINT AS cnt,
             {AVG6_SQL} AS avg_value
      FROM g GROUP BY event_type, sid)
    SELECT event_type, session_start_us, session_end_us, cnt, avg_value
    FROM s, mx WHERE session_end_us <= mx""",
    "streaming", "session",
)
def stream_session_stats(spark, sf_dir):
    """Session (gap) windows as REAL Structured Streaming — the
    streaming complement of the batch `w_session_stats` (native
    `session_window`, the state-merging operator SS uses for
    sessionization): per event type, 10-minute-gap sessions over the
    4-micro-batch event-time-ORDERED replay, watermark 0 s, append
    mode — a session emits exactly once, when the watermark passes
    its end (last event + gap). The oracle recomputes sessions via
    the islands construction and keeps those whose end <= the final
    watermark (max event time) — precisely what an unbounded run
    would have emitted by end-of-stream; trailing still-open sessions
    correctly stay in state and NOT in the output. Averages are exact
    integer-cent sums with half-up 6-dp integer rounding (_avg6), so
    session-merge order inside the state store cannot perturb the
    hash. State is O(open sessions x types), evicted at the
    watermark — bounded at any stream length."""
    tune(spark)
    src = _staged_events_stream_ordered(spark, sf_dir, n_files=4)
    agg = (src.withWatermark("ts", "0 seconds")
           .groupBy(F.session_window("ts", "10 minutes"), "event_type")
           .agg(F.count("*").alias("cnt"), _cents_sum("value")))
    out = agg.select(
        "event_type",
        F.unix_micros("session_window.start").alias("session_start_us"),
        F.unix_micros("session_window.end").alias("session_end_us"),
        F.col("cnt").cast("bigint").alias("cnt"),
        _avg6().alias("avg_value"))
    return _run_to_memory(spark, out, "stream_session_stats_result")


@register(
    "stream_sliding_avg",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS tu, value FROM events),
    mx AS (SELECT max(tu) AS mx FROM e),
    m AS (
      SELECT event_type,
             (tu // 900000000) * 900 - k.k * 900 AS w_start, value
      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k),
    a AS (
      SELECT event_type, w_start,
             count(*)::BIGINT AS cnt,
             {AVG6_SQL} AS avg_value
      FROM m GROUP BY event_type, w_start)
    SELECT event_type, w_start AS window_start, cnt, avg_value
    FROM a, mx WHERE (w_start + 3600) * 1000000 <= mx""",
    "streaming", "sliding",
)
def stream_sliding_avg(spark, sf_dir):
    """Sliding (hopping) windows as REAL Structured Streaming — with
    stream_windowed_avg (tumbling) and stream_session_stats
    (session), this completes the batch+streaming coverage of all
    three window families: 1-hour windows hopping every 15 minutes
    per event type, watermark 0 s, append mode. Each event enters 4
    open windows, so streaming state holds size/slide windows per
    key — the overlap cost a production sizing must budget (and why
    slide << size is the memory knob, not the correctness knob). The
    oracle enumerates covering windows and keeps those whose end <=
    the final watermark — exactly the append-mode emission set."""
    tune(spark)
    src = _staged_events_stream_ordered(spark, sf_dir, n_files=4)
    agg = (src.withWatermark("ts", "0 seconds")
           .groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
           .agg(F.count(F.lit(1)).alias("cnt"), _cents_sum("value")))
    out = agg.select(
        "event_type",
        F.col("window.start").cast("long").alias("window_start"),
        F.col("cnt").cast("bigint").alias("cnt"),
        _avg6().alias("avg_value"))
    return _run_to_memory(spark, out, "stream_sliding_avg_result")


@register(
    "events_zscore_anomalies",
    """
    WITH s AS (
      SELECT event_type, count(*)::BIGINT AS cnt,
             SUM(CAST(value AS DECIMAL(14,2)))::DOUBLE AS total,
             SUM(CAST(value AS DECIMAL(14,2))
                 * CAST(value AS DECIMAL(14,2)))::DOUBLE AS total_sq
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - (total / cnt))
                 / sqrt((total_sq - total * total / cnt) / cnt), 6) AS z
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE (e.value - (total / cnt)) * (e.value - (total / cnt))
          > 9 * ((total_sq - total * total / cnt) / cnt)""",
    "relational", "aggregates", "numeric_stability",
)
def events_zscore_anomalies(spark, sf_dir):
    """Outlier detection against exact distributed moments: events more
    than 3 population-stddevs from their type's mean. The per-type
    stats table derives from DECIMAL first/second moments (identical
    doubles on both engines), broadcasts into the fact scan, and the
    flag compares (v-m)^2 > 9*var with the SAME expression tree as the
    oracle — IEEE doubles over identical operands, no epsilon needed.
    One shuffle (the stats agg); the fact side never moves."""
    ev = _t(spark, sf_dir, "events")
    v = dec("value", 14)
    # st is per-event_type (fixed-cardinality enum) — bounded by
    # contract, audited in tests/test_plan_hygiene.py
    st = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(v).cast("double").alias("total"),
        F.sum(v * v).cast("double").alias("total_sq"))
    m = F.col("total") / F.col("cnt")
    var = (F.col("total_sq") - F.col("total") * F.col("total") / F.col("cnt")) \
        / F.col("cnt")
    return (ev.join(F.broadcast(st), "event_type")
            .filter((F.col("value") - m) * (F.col("value") - m) > 9 * var)
            .select("event_id", "event_type", "value",
                    F.round((F.col("value") - m) / F.sqrt(var), 6).alias("z")))


@register(
    "user_retention_cohorts",
    """
    WITH w AS (
      SELECT user_id,
             ((epoch_us(ts) // 1000000) // 86400) // 7 AS week
      FROM events),
    c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
    SELECT cohort_week, (week - cohort_week)::BIGINT AS week_offset,
           count(DISTINCT user_id)::BIGINT AS n_users
    FROM w JOIN c USING (user_id)
    GROUP BY cohort_week, week - cohort_week""",
    "relational", "analytics",
)
def user_retention_cohorts(spark, sf_dir):
    """Retention triangle: users grouped by first-activity week, counted
    in each subsequent week they return — the standard cohort analysis
    every analytics engine must express. Weeks are integer epoch-day
    arithmetic (engine-neutral). Both aggregations key on user_id, so
    the cohort join consumes the same partitioning the min-week agg
    produced — one user_id shuffle plus the final (small) cohort
    rollup."""
    ev = _t(spark, sf_dir, "events")
    w = ev.select(
        "user_id",
        (F.expr("unix_micros(ts) div 1000000").cast("long") / 86400)
        .cast("long").alias("day"))
    w = w.select("user_id", (F.col("day") / 7).cast("long").alias("week"))
    c = w.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (w.join(c, "user_id")
            .groupBy("cohort_week",
                     (F.col("week") - F.col("cohort_week")).cast("long")
                     .alias("week_offset"))
            .agg(F.count_distinct("user_id").cast("long").alias("n_users")))


@register(
    "dedup_keep_best",
    """
    WITH f AS (
      SELECT doc_id, md5(text) AS h,
             len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words
      FROM documents),
    r AS (
      SELECT doc_id, h, n_words,
             row_number() OVER (PARTITION BY h
                                ORDER BY n_words DESC, doc_id) AS rnk,
             count(*) OVER (PARTITION BY h) AS grp
      FROM f)
    SELECT h, doc_id AS keep_id, n_words AS keep_words,
           grp::BIGINT AS group_size
    FROM r WHERE rnk = 1""",
    "llm", "dedup",
)
def dedup_keep_best(spark, sf_dir):
    """Canonical-document selection: within each exact-content group,
    keep the best candidate (most tokens, doc_id tie-break) instead of
    an arbitrary min id — the A2 argmax (max_by-on-struct) idiom
    applied to curation. One shuffle on the 16-byte hash; the ordered
    struct-max is a plain agg, not a window sort, so groups never
    materialize."""
    docs = _t(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    f = docs.select(F.md5("text").alias("h"), "doc_id",
                    n_words.alias("n_words"))
    # argmax via max_by on (n_words desc, doc_id asc): encode the
    # tie-break by negating doc_id in the ordering struct
    best = f.groupBy("h").agg(
        F.max_by(F.struct("doc_id", "n_words"),
                 F.struct(F.col("n_words"), -F.col("doc_id"))).alias("b"),
        F.count("*").cast("long").alias("group_size"))
    return best.select("h", F.col("b.doc_id").alias("keep_id"),
                       F.col("b.n_words").alias("keep_words"), "group_size")


@register(
    "lang_id_confusion",
    f"""
    WITH pred AS ({_lang_sql()})
    SELECT d.lang AS true_lang, p.pred_lang,
           count(*)::BIGINT AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.pred_lang""",
    "llm", "text",
)
def lang_id_confusion(spark, sf_dir):
    """Model-eval confusion matrix: the lang-ID heuristic's predictions
    against the labeled lang column — the evaluation query every
    classifier in a curation pipeline ships with. The prediction is a
    narrow expression over the same scan as the label, so the whole
    matrix costs one (true, pred) hash agg on a ~|langs|^2 key space —
    no join materializes at any scale."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.select(F.col("lang").alias("true_lang"),
                        text.lang_id_col(F.col("text")).alias("pred_lang"))
            .groupBy("true_lang", "pred_lang")
            .agg(F.count("*").cast("long").alias("n_docs")))


@register(
    "scrub_audit_by_source",
    rf"""
    WITH a AS (
      SELECT source,
             len(regexp_extract_all(text, 'https?://[^\s]+'))::BIGINT
               AS n_urls,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))::BIGINT
               AS n_emails
      FROM documents)
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(n_urls)::BIGINT AS total_urls,
           sum(n_emails)::BIGINT AS total_emails,
           sum(CASE WHEN n_urls + n_emails > 0 THEN 1 ELSE 0 END)::BIGINT
             AS docs_affected
    FROM a GROUP BY source""",
    "llm", "text",
)
def scrub_audit_by_source(spark, sf_dir):
    """Scrubbing audit rolled up per source: how many URL/email
    substitutions text cleaning would make, and how many docs are
    touched — the compliance report a PII pass ships with. Counting
    composes the same RE2-safe patterns as clean_text over one narrow
    scan + one tiny hash agg."""
    docs = _t(spark, sf_dir, "documents")
    n_urls = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(text.URL_RE), F.lit(0))).cast("long")
    n_emails = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(text.EMAIL_RE), F.lit(0))).cast("long")
    a = docs.select("source", n_urls.alias("n_urls"),
                    n_emails.alias("n_emails"))
    return (a.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_urls").cast("long").alias("total_urls"),
                 F.sum("n_emails").cast("long").alias("total_emails"),
                 F.sum(F.when(F.col("n_urls") + F.col("n_emails") > 0, 1)
                       .otherwise(0)).cast("long").alias("docs_affected")))


@register(
    "doc_length_histogram",
    r"""
    WITH t AS (
      SELECT len(string_split_regex(trim(text), '\s+'))::BIGINT AS n
      FROM documents)
    SELECT (n // 10) * 10 AS bucket_start,
           (n // 10) * 10 + 10 AS bucket_end,
           count(*)::BIGINT AS n_docs,
           min(n)::BIGINT AS min_tokens,
           max(n)::BIGINT AS max_tokens
    FROM t GROUP BY n // 10""",
    "llm", "text",
)
def doc_length_histogram(spark, sf_dir):
    """Token-length histogram in width-10 buckets — the dataset-card
    length distribution (what a curation pass thresholds to drop
    too-short/too-long docs). Integer bucket arithmetic, one narrow
    scan, one hash agg on ~|max_len/10| keys."""
    docs = _t(spark, sf_dir, "documents")
    n = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    b = (n / 10).cast("long") * 10
    return (docs.select(b.alias("bucket_start"), n.alias("n"))
            .groupBy("bucket_start")
            .agg(F.count("*").alias("n_docs"),
                 F.min("n").cast("long").alias("min_tokens"),
                 F.max("n").cast("long").alias("max_tokens"))
            .select("bucket_start",
                    (F.col("bucket_start") + 10).alias("bucket_end"),
                    "n_docs", "min_tokens", "max_tokens"))


@register(
    "media_chunks",
    """
    WITH m AS (
      SELECT doc_id, text, length(text)::BIGINT AS n FROM documents),
    st AS (
      SELECT doc_id, text,
             unnest(generate_series(0, greatest(n - 1, 0), 64)) AS s
      FROM m)
    SELECT doc_id, (s // 64)::BIGINT AS chunk_idx,
           md5(substring(text, s + 1, 64)) AS chunk_md5,
           length(substring(text, s + 1, 64))::BIGINT AS n_bytes
    FROM st""",
    "llm", "multimodal",
)
def media_chunks(spark, sf_dir):
    """Content-addressable chunking of binary payloads (64-byte chunks
    at test scale; 4 KB+ in production): the Spark side slices the real
    BINARY column; the oracle chunks the source text, byte-identical
    because the corpus is ASCII (octet_length == length for every doc,
    asserted during design). Zero shuffle — hashes, not bytes, flow
    out of the scan."""
    docs = _t(spark, sf_dir, "documents")
    m = multimodal.media_table(docs)
    return multimodal.chunk_media(m, chunk_bytes=64)


@register(
    "grouped_kfold_assign",
    """
    WITH can AS (
      SELECT doc_id, lang,
             min(doc_id) OVER (PARTITION BY md5(text)) AS grp
      FROM documents)
    SELECT doc_id, lang, grp,
           (('0x' || substr(md5('kf-' || grp::VARCHAR), 1, 15))::BIGINT
            % 5)::BIGINT AS fold
    FROM can""",
    "llm", "sampling",
)
def grouped_kfold_assign(spark, sf_dir):
    """GROUP-aware k-fold assignment for leakage-free cross-
    validation: every doc in the same exact-content group (keyed by
    the group's min doc_id) lands in the SAME fold, so duplicate
    documents can never straddle a train/eval fold boundary — the
    k-fold counterpart of leakage_free_split. Fold = salted md5 of
    the GROUP id, not the doc id: deterministic, append-stable, and
    replayable, like every sampling op here. One content-hash window
    plus narrow column math; no corpus-sized join."""
    docs = _t(spark, sf_dir, "documents")
    grp = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    can = docs.select("doc_id", "lang", grp.alias("grp"))
    fold = (F.conv(F.substring(
        F.md5(F.concat(F.lit("kf-"), F.col("grp").cast("string"))),
        1, 15), 16, 10).cast("bigint") % 5)
    return can.select("doc_id", "lang", "grp",
                      fold.cast("bigint").alias("fold"))


@register(
    "media_dedup_by_chunks",
    """
    WITH m AS (
      SELECT doc_id, text, length(text)::BIGINT AS n FROM documents),
    st AS (
      SELECT doc_id, text,
             unnest(generate_series(0, greatest(n - 1, 0), 64)) AS s
      FROM m),
    ch AS (
      SELECT DISTINCT doc_id, md5(substring(text, s + 1, 64)) AS h
      FROM st),
    sz AS (SELECT doc_id, count(*)::BIGINT AS nc FROM ch GROUP BY 1),
    p AS (
      SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
             count(*)::BIGINT AS n_shared
      FROM ch l JOIN ch r USING (h)
      WHERE l.doc_id < r.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b, n_shared, sa.nc AS n_a, sb.nc AS n_b
    FROM p JOIN sz sa ON sa.doc_id = doc_a
           JOIN sz sb ON sb.doc_id = doc_b
    WHERE 2 * n_shared >= least(sa.nc, sb.nc)""",
    "llm", "multimodal", "dedup",
)
def media_dedup_by_chunks(spark, sf_dir):
    """Media near-dup detection by CONTENT-ADDRESSED CHUNK OVERLAP:
    asset pairs sharing at least half of the smaller asset's distinct
    chunk hashes (chunk_media's 16-byte md5s) — the storage-layer
    dedup screen that finds duplicated/embedded payloads WITHOUT
    decoding anything, the binary counterpart of shared_passages.
    Fixed-offset chunking catches aligned duplication (exact copies,
    shared prefixes), by design; shifted edits are the text/minhash
    family's job. Scale shape: the join carries only (doc_id, hash)
    pairs and is linear in true chunk collisions; content-addressed
    hashes make hot buckets genuine duplication, not skew.

    Oracle note (ADVICE r5, same invariant as media_chunks): the Spark
    side chunks the UTF-8-ENCODED binary by BYTES while the oracle
    chunks the source text by CHARACTERS — equal only because the
    corpus is ASCII (octet_length(text) == length(text) for every
    doc, asserted during design and re-checked by
    test_media_oracle_ascii_invariant). A non-ASCII fixture must
    switch the oracle to encode()+byte substring."""
    from .operators.multimodal import chunk_media, media_table
    docs = _t(spark, sf_dir, "documents")
    ch = (chunk_media(media_table(docs), chunk_bytes=64)
          .select("doc_id", F.col("chunk_md5").alias("h")).distinct())
    sz = ch.groupBy("doc_id").agg(F.count("*").alias("nc"))
    p = (ch.alias("l").join(ch.alias("r"), "h")
         .filter(F.col("l.doc_id") < F.col("r.doc_id"))
         .groupBy(F.col("l.doc_id").alias("doc_a"),
                  F.col("r.doc_id").alias("doc_b"))
         .agg(F.count("*").alias("n_shared")))
    return (p.join(sz.select(F.col("doc_id").alias("doc_a"),
                             F.col("nc").alias("n_a")), "doc_a")
            .join(sz.select(F.col("doc_id").alias("doc_b"),
                            F.col("nc").alias("n_b")), "doc_b")
            .filter(2 * F.col("n_shared") >= F.least("n_a", "n_b"))
            .select("doc_a", "doc_b",
                    F.col("n_shared").cast("bigint").alias("n_shared"),
                    F.col("n_a").cast("bigint").alias("n_a"),
                    F.col("n_b").cast("bigint").alias("n_b")))


@register(
    "customer_rfm_segments",
    """
    WITH mx AS (
      SELECT max(epoch_us(o_orderdate) // 86400000000) AS mx_day
      FROM orders),
    rfm AS (
      SELECT o_custkey AS c_custkey,
             (mx_day - max(epoch_us(o_orderdate) // 86400000000))::BIGINT
               AS recency_days,
             count(*)::BIGINT AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(14,2)))::DOUBLE AS monetary
      FROM orders CROSS JOIN mx
      GROUP BY o_custkey, mx_day),
    scored AS (
      SELECT c_custkey, recency_days, frequency, monetary,
             ntile(4) OVER (ORDER BY recency_days ASC, c_custkey)
               AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, c_custkey)
               AS f_score,
             ntile(4) OVER (ORDER BY monetary DESC, c_custkey)
               AS m_score
      FROM rfm)
    SELECT c_custkey, recency_days, frequency, monetary,
           r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
           m_score::BIGINT AS m_score,
           CASE WHEN r_score = 1 AND f_score = 1 THEN 'champion'
                WHEN r_score >= 3 AND f_score >= 3 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored""",
    "relational", "analytics",
)
def customer_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: recency (days since last order,
    against the corpus max date as 'today'), frequency (orders),
    monetary (exact-DECIMAL spend) — quartiled with ntile over unique
    tie-broken orderings (metric, custkey) so the quartile assignment
    is deterministic on both engines. The per-customer aggregate is
    the one wide stage; the ntile global sorts run on the
    customer-cardinality rollup, not the fact table. At 100 TB replace
    the exact ntile with approx-quantile thresholds (the rollup is
    still ~customers-sized, so even exact holds far up the scale)."""
    orders = _t(spark, sf_dir, "orders")
    day = (F.col("o_orderdate").cast("timestamp").cast("long") / 86400) \
        .cast("long")
    mx = orders.agg(F.max(day).alias("mx_day"))
    rfm = (orders.crossJoin(F.broadcast(mx))
           .groupBy(F.col("o_custkey").alias("c_custkey"), "mx_day")
           .agg(F.max(day).alias("last_day"),
                F.count("*").alias("frequency"),
                F.sum(dec("o_totalprice", 14)).cast("double")
                 .alias("monetary"))
           .select("c_custkey",
                   (F.col("mx_day") - F.col("last_day")).cast("long")
                   .alias("recency_days"),
                   F.col("frequency").cast("long").alias("frequency"),
                   "monetary"))
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col("c_custkey"))
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("c_custkey"))
    m_w = Window.orderBy(F.col("monetary").desc(), F.col("c_custkey"))
    scored = rfm.select(
        "c_custkey", "recency_days", "frequency", "monetary",
        F.ntile(4).over(r_w).cast("long").alias("r_score"),
        F.ntile(4).over(f_w).cast("long").alias("f_score"),
        F.ntile(4).over(m_w).cast("long").alias("m_score"))
    return scored.withColumn(
        "segment",
        F.when((F.col("r_score") == 1) & (F.col("f_score") == 1), "champion")
         .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "at_risk")
         .otherwise("regular"))


def _staged_events_stream(spark, sf_dir, n_files: int = 4):
    """Stage the events table as n_files parquet files and stream them
    one per micro-batch — a REAL multi-batch replay (the single-file
    testdata layout would otherwise collapse to one batch)."""
    import tempfile

    d = tempfile.mkdtemp(prefix="sgs_staged_")
    (load_table(spark, sf_dir, "events")
     .withColumn("ts", F.expr("unix_micros(ts)"))  # stage as BIGINT micros
     .repartition(n_files)
     .write.mode("overwrite").parquet(d))
    src = (
        spark.readStream.schema(
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string")
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    return src.withColumn("ts", F.timestamp_micros("ts"))


@register(
    "stream_incremental_state",
    """
    SELECT event_type, count(*)::BIGINT AS cnt,
           SUM(CAST(value AS DECIMAL(14,2)))::DOUBLE AS total
    FROM events GROUP BY event_type""",
    "streaming", "R3",
)
def stream_incremental_state(spark, sf_dir):
    """Queryable state (R3, chapter7/QueryableState.scala:47-49) as an
    incrementally-maintained aggregate: the events table replayed as 4
    micro-batches, a complete-mode streaming aggregation merging each
    batch into keyed state, and the memory sink exposing the latest
    state to SQL — the materialized-view pattern. The final state must
    equal the one-shot batch aggregate (the oracle), which is exactly
    Spark's unified batch/stream contract; DECIMAL partials make the
    4-batch merge order irrelevant to the hash."""
    tune(spark)
    src = _staged_events_stream(spark, sf_dir, n_files=4)
    agg = src.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(dec("value", 14)).cast("double").alias("total"))
    return _run_to_memory(spark, agg, "stream_incremental_state_result",
                          mode="complete")


@register(
    "stream_rolling_max_state",
    """
    SELECT user_id, value, event_id FROM (
      SELECT user_id, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1""",
    "streaming", "A2",
)
def stream_rolling_max_state(spark, sf_dir):
    """A2's rolling max-by as REAL streaming state
    (chapter5/KeyedTransformations.scala:49-52): per user, the running
    argmax of value maintained across 4 replayed micro-batches in
    complete mode. The reference emits the running max per input
    record; the queryable final state after the last record — what the
    oracle computes with a window rank — is the same state this
    aggregation holds. Lexicographic struct-max gives a unique
    tie-break (value, then event_id)."""
    tune(spark)
    src = _staged_events_stream(spark, sf_dir, n_files=4)
    agg = (src.groupBy("user_id")
           .agg(F.max(F.struct("value", "event_id")).alias("m"))
           .select("user_id", F.col("m.value").alias("value"),
                   F.col("m.event_id").alias("event_id")))
    return _run_to_memory(spark, agg, "stream_rolling_max_state_result",
                          mode="complete")


@register(
    "dataset_mixture_rates",
    """
    WITH s AS (
      SELECT source, count(*)::BIGINT AS n_docs FROM documents
      GROUP BY source),
    t AS (SELECT sum(n_docs)::BIGINT AS total,
                 count(*)::BIGINT AS n_sources FROM s)
    SELECT source, n_docs,
           CASE WHEN total >= n_sources * n_docs THEN 1.0
                ELSE ((2 * total * 1000000 + n_sources * n_docs)
                      // (2 * n_sources * n_docs)) / 1e6
           END AS sample_rate,
           CAST(floor(n_docs * least(1.0, (total::DOUBLE / n_sources)
                                          / n_docs)) AS BIGINT)
             AS expected_kept
    FROM s CROSS JOIN t""",
    "llm", "sampling",
)
def dataset_mixture_rates(spark, sf_dir):
    """Dataset mixing: per-source downsampling rates that rebalance the
    corpus toward a uniform source mixture (the static-weights form of
    training-data mixture control). Over-represented sources get rate
    target/n, the rest keep everything; applying the rate is
    hash_split_sample's deterministic md5-bucket keep. One tiny hash
    agg + a broadcast scalar; all arithmetic is single divisions over
    identical operands, so both engines emit identical doubles."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    t = s.agg(F.sum("n_docs").cast("long").alias("total"),
              F.count("*").alias("n_sources"))
    rate = F.least(
        F.lit(1.0),
        (F.col("total").cast("double") / F.col("n_sources"))
        / F.col("n_docs"))
    return (s.crossJoin(F.broadcast(t))
            .select("source", F.col("n_docs").cast("long").alias("n_docs"),
                    F.when(F.col("total") >=
                           F.col("n_sources") * F.col("n_docs"), F.lit(1.0))
                     .otherwise(_ratio6(F.col("total"),
                                        F.col("n_sources")
                                        * F.col("n_docs")))
                     .alias("sample_rate"),
                    F.floor(F.col("n_docs") * rate).cast("long")
                     .alias("expected_kept")))


def _staged_sentinel_side(spark, ev, etype: str, sid: int,
                          far: int, cols: list[str]) -> DataFrame:
    """Stage one event-type slice of the (BIGINT-micros ts) events table
    plus a far-future sentinel row, and return it as a streaming
    DataFrame. Each side gets its OWN directory (two independent file
    sources, as two real streams would be): a self-join re-scans one
    file source twice, which proved unreliable for batch/listing
    alignment. One file per side: the sentinel must ride in the same
    file as the data so the bounded replay is a single deterministic
    batch (staging is a replay harness, not the scale path)."""
    import tempfile

    d = tempfile.mkdtemp(prefix=f"sgs_sentinel_{etype}_")
    side = ev.filter(F.col("event_type") == etype).select(
        "event_id", "ts", "user_id")
    # SQL literal, not createDataFrame: parallelize() spreads one row
    # over defaultParallelism partitions, each paying a Python-worker
    # spin-up — measured ~5 s per staged side at gate SF; the
    # LocalRelation stays JVM-side and costs nothing
    sent = spark.sql(
        f"SELECT {int(sid)}::BIGINT AS event_id, {int(far)}::BIGINT AS ts, "
        f"{int(sid)}::BIGINT AS user_id")
    side.unionByName(sent).coalesce(1).write.mode("overwrite").parquet(d)
    return (spark.readStream
            .schema("event_id bigint, ts bigint, user_id bigint")
            .parquet(d)
            .select(F.col("event_id").alias(cols[0]), "user_id",
                    F.timestamp_micros("ts").alias(cols[1])))


@register(
    "stream_left_outer_join",
    """
    WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id,
           (epoch_us(e.ts) // 1000) AS err_ms,
           COALESCE((epoch_us(c.ts) // 1000), -1) AS click_ms
    FROM e LEFT JOIN c
      ON c.user_id = e.user_id
     AND c.ts > e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts""",
    "streaming", "J1",
)
def stream_left_outer_join(spark, sf_dir):
    """Left-outer stream-stream interval join with watermark-conditioned
    null emission: errors x clicks per user, 1 h lookback. The inner
    matches emit as they join; an unmatched error emits its null row
    only once the watermark passes the end of its join window (no later
    click can change the answer) — Spark evicts the row from join state
    and emits it null-extended in the same move, so outer-join state
    stays O(lookback x rate) at any scale. To make the bounded replay
    equal the batch left join (the oracle), two far-future sentinel
    rows (filtered from the output) push the final watermark beyond
    every real row; the trailing no-data micro-batch then flushes every
    pending unmatched error. click_ms is COALESCEd to -1 on both
    engines so the hash never sees an engine-specific null encoding."""
    tune(spark)
    from .streaming.pipelines import stream_interval_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("unix_micros(ts)"))  # stage as BIGINT micros
    far = ev.agg(F.max("ts")).first()[0] + 48 * 3600 * 10**6
    errors = _staged_sentinel_side(
        spark, ev, "error", -1, far, ["event_id", "err_ts"])
    clicks = _staged_sentinel_side(
        spark, ev, "click", -2, far, ["click_id", "click_ts"]).drop("click_id")
    out = stream_interval_join(
        errors, clicks, keys=["user_id"], left_ts="err_ts",
        right_ts="click_ts", lookback="1 hour", how="leftOuter")
    # NO sentinel filter inside the streaming plan: a filter on a
    # left-side column is legally pushed below the join AND below the
    # EventTimeWatermark node (outer joins preserve left columns), which
    # would strip the sentinel before it can advance the watermark —
    # exactly the off-by-one this design exists to avoid. The sentinels
    # never reach the output anyway: the error sentinel's join window is
    # still open at end-of-stream (withheld — the semantics under test)
    # and the click sentinel matches no error. The batch-side filter on
    # the materialized result below is belt-and-braces only.
    out = out.select(
        "event_id", "user_id",
        F.expr("unix_micros(err_ts) div 1000").alias("err_ms"),
        F.coalesce(F.expr("unix_micros(click_ts) div 1000"),
                   F.lit(-1).cast("long")).alias("click_ms"))
    res = _run_to_memory(spark, out, "stream_left_outer_join_result")
    return res.filter(F.col("event_id") >= 0)


@register(
    "stream_full_outer_join",
    """
    WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT COALESCE(e.event_id, -1) AS event_id,
           COALESCE(e.user_id, c.user_id) AS user_id,
           COALESCE((epoch_us(e.ts) // 1000), -1) AS err_ms,
           COALESCE((epoch_us(c.ts) // 1000), -1) AS click_ms
    FROM e FULL JOIN c
      ON c.user_id = e.user_id
     AND c.ts > e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts""",
    "streaming", "J1",
)
def stream_full_outer_join(spark, sf_dir):
    """Full-outer stream-stream interval join: both unmatched sides get
    their null-extension, each under its own eviction horizon — an
    error flushes once the watermark passes its join-window end
    (err_ts), a click once no future error can reach back to it
    (click_ts + lookback). The join helper coalesces the equi-key from
    whichever side is present, so right-only rows keep their user_id.
    Same sentinel-flushed replay as stream_left_outer_join; both
    sentinels stay withheld (their own windows never close), and the
    batch-side filter removes nothing at this data but guards a future
    corpus with negative ids. All nullable outputs are COALESCEd to -1
    identically on both engines."""
    tune(spark)
    from .streaming.pipelines import stream_interval_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("unix_micros(ts)"))
    far = ev.agg(F.max("ts")).first()[0] + 48 * 3600 * 10**6
    errors = _staged_sentinel_side(
        spark, ev, "error", -1, far, ["event_id", "err_ts"])
    clicks = _staged_sentinel_side(
        spark, ev, "click", -2, far, ["click_id", "click_ts"]).drop("click_id")
    out = stream_interval_join(
        errors, clicks, keys=["user_id"], left_ts="err_ts",
        right_ts="click_ts", lookback="1 hour", how="fullOuter")
    out = out.select(
        F.coalesce("event_id", F.lit(-1).cast("long")).alias("event_id"),
        "user_id",
        F.coalesce(F.expr("unix_micros(err_ts) div 1000"),
                   F.lit(-1).cast("long")).alias("err_ms"),
        F.coalesce(F.expr("unix_micros(click_ts) div 1000"),
                   F.lit(-1).cast("long")).alias("click_ms"))
    res = _run_to_memory(spark, out, "stream_full_outer_join_result")
    return res.filter(F.col("user_id") >= 0)


@register(
    "flatmap_split_udtf",
    SENSORS_CTE + """
    SELECT token, count(*)::BIGINT AS cnt FROM (
      SELECT unnest(string_split(id, '_')) AS token FROM sensors
    ) GROUP BY token""",
    "reference", "P5", "udtf",
)
def flatmap_split_udtf(spark, sf_dir):
    """P5 as a Spark 4 Python UDTF (functions/udtfs.py) — the
    open-ended FlatMapFunction surface of the reference
    (chapter5/BasicTransformations.scala:91-95) when no builtin can
    express the 1->N logic; LATERAL-correlated per input row,
    Arrow-batched across the JVM<->Python hop. The JVM fast path for
    this particular split lives in `flatmap_split_tokens` (same
    oracle); this entry proves the general UDTF path end-to-end."""
    from .functions.udtfs import register_udtfs

    s = _sensors(spark, sf_dir)
    register_udtfs(spark)
    s.createOrReplaceTempView("udtf_sensors_in")
    return spark.sql("""
        SELECT t.token, count(*) AS cnt
        FROM udtf_sensors_in, LATERAL split_tokens(id) t
        GROUP BY t.token""")


@register(
    "token_heavy_hitters",
    """
    SELECT token, count(*)::BIGINT AS weight FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ) GROUP BY token ORDER BY weight DESC, token LIMIT 20""",
    "llm", "sketch",
)
def token_heavy_hitters(spark, sf_dir):
    """Top-20 corpus tokens via per-partition Misra-Gries summaries
    (operators/sketches.py:heavy_hitters) — the shuffle carries at most
    k*numPartitions candidate rows instead of every (token, count)
    pair, the map-side-pruned path a web-scale vocabulary needs.
    Oracle-checkable because MG is EXACT when distinct tokens per
    partition <= k (vocab 31 << k=256 here); the general approximate
    regime is exercised in tests with tiny k. Ties at the top-20
    boundary break on token text on both engines."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.sketches import heavy_hitters

    tokens = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token"))
    return heavy_hitters(tokens, "token", k=256, top=20)


@register(
    "value_quantile_sketch",
    """
    SELECT event_type, p, TRUE AS rank_err_ok
    FROM (SELECT DISTINCT event_type FROM events)
    CROSS JOIN (VALUES (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)) t(p)""",
    "llm", "sketch", "A5",
)
def value_quantile_sketch(spark, sf_dir):
    """Per-event-type p50/p90/p99 of value via the mergeable t-digest
    pandas UDAF tree (operators/sketches.py) — the reference's
    AggregateFunction accumulator contract
    (chapter6/WindowFunctions.scala:87-105) with a bounded-centroid
    accumulator. The digest's floats are algorithm-specific, so the
    gate row hashes a CHECKABLE RANK-ERROR BOUND instead: for each
    (event_type, p) the estimate's realized rank — the fraction of
    values <= estimate, computed by broadcasting the tiny estimate
    table back over events — must sit within 0.02 of p (t-digest
    delta=100 guarantees ~q(1-q)/delta, well inside). The oracle
    asserts TRUE per cell, so a digest drifting out of its bound
    hash-fails the row. The salted two-level tree keeps every task's
    state at <= ~2*delta centroids, so the same plan holds when one
    event_type carries 10^10 rows."""
    ev = _t(spark, sf_dir, "events")
    from .operators.sketches import tdigest_quantiles

    est = tdigest_quantiles(ev, "event_type", "value", [0.5, 0.9, 0.99])
    long = est.select(
        "event_type",
        F.expr("stack(3, 0.5D, q50, 0.9D, q90, 0.99D, q99) AS (p, est)"))
    joined = ev.select("event_type", "value").join(
        F.broadcast(long), "event_type")
    return (joined.groupBy("event_type", "p")
            .agg(F.avg(F.when(F.col("value") <= F.col("est"), 1.0)
                       .otherwise(0.0)).alias("rank_frac"))
            .select("event_type", "p",
                    (F.abs(F.col("rank_frac") - F.col("p")) <= 0.02)
                    .alias("rank_err_ok")))

@register(
    "value_quantile_kll",
    """
    SELECT event_type, n, p, TRUE AS rank_err_ok
    FROM (SELECT event_type, count(*)::BIGINT AS n
          FROM events GROUP BY event_type)
    CROSS JOIN (VALUES (0.5::DOUBLE), (0.9::DOUBLE), (0.99::DOUBLE)) t(p)""",
    "llm", "sketch", "A5",
)
def value_quantile_kll(spark, sf_dir):
    """Per-event-type p50/p90/p99 via the KLL sketch
    (operators/sketches.py:kll_quantiles — Karnin-Lang-Liberty 2016,
    the production standard in Apache DataSketches) beside the
    t-digest entry above. Two memory-bounded stages: mapInPandas
    batch partials (no whole-group materialization anywhere), then a
    per-key levelwise merge. The gate row hashes TWO checkable
    invariants instead of algorithm floats: the sketch's total
    weight must equal the EXACT per-key row count (KLL compaction
    preserves weight exactly — 2m items at weight w become m at 2w),
    and each estimate's realized rank must sit within 0.02 + 1/n of
    p (sketch error is O(1/cap), cap=256). A compaction bug breaks
    the first; accuracy drift breaks the second; either hash-fails."""
    ev = _t(spark, sf_dir, "events")
    from .operators.sketches import kll_quantiles

    est = kll_quantiles(ev, "event_type", "value", [0.5, 0.9, 0.99],
                        cap=256)
    long = est.select(
        "event_type", F.col("n").cast("bigint").alias("n"),
        F.expr("stack(3, 0.5D, q50, 0.9D, q90, 0.99D, q99) AS (p, est)"))
    joined = ev.select("event_type", "value").join(
        F.broadcast(long), "event_type")
    return (joined.groupBy("event_type", "n", "p")
            .agg(F.avg(F.when(F.col("value") <= F.col("est"), 1.0)
                       .otherwise(0.0)).alias("rank_frac"))
            .select("event_type", "n", "p",
                    (F.abs(F.col("rank_frac") - F.col("p"))
                     <= F.lit(0.02) + F.lit(1.0) / F.col("n"))
                    .alias("rank_err_ok")))


@register(
    "events_scd2_intervals",
    """
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, event_type, us, chg,
             sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM o),
    runs AS (
      SELECT user_id, event_type, run_id::BIGINT AS version,
             min(us)::BIGINT AS valid_from_us,
             count(*)::BIGINT AS n_events
      FROM r GROUP BY user_id, event_type, run_id)
    SELECT user_id, event_type, version, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY version) AS valid_to_us,
           n_events,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY version) IS NULL AS is_current
    FROM runs""",
    "llm", "window_functions",
)
def events_scd2_intervals(spark, sf_dir):
    """Changelog -> SCD type-2 dimension build (gaps-and-islands): each
    user's event stream collapses into runs of consecutive identical
    event_type; each run becomes a versioned validity interval
    [valid_from_us, valid_to_us) with the last run open (is_current).
    The lakehouse pattern for turning an append-only event log into a
    slowly-changing dimension snapshot.

    Scale shape: ONE shuffle on user_id serves all three passes — the
    lag/run-id windows, the per-run groupBy (user_id is a prefix of the
    grouping key, so hash(user_id) already satisfies its distribution),
    and the final lead() window. State per task is a single user's rows
    ordered by time, never the whole log. Runs-per-user is bounded by
    events-per-user, so the output never exceeds the input and the
    interval table is typically orders of magnitude smaller — the right
    input for a broadcast as-of enrichment downstream (J1's idiom)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")), 1).otherwise(0)
    runs = (
        ev.withColumn("chg", chg)
        .withColumn("run_id", F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "event_type",
                 F.col("run_id").cast("bigint").alias("version"))
        .agg(F.min("us").cast("bigint").alias("valid_from_us"),
             F.count("*").alias("n_events"))
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from_us").over(wv)
    return runs.select(
        "user_id", "event_type", "version", "valid_from_us",
        valid_to.alias("valid_to_us"), "n_events",
        valid_to.isNull().alias("is_current"))

@register(
    "edit_distance_pairs",
    """
    WITH b AS (
      SELECT doc_id, text,
             array_to_string((string_split(text, ' '))[1:4], ' ') AS blk
      FROM documents)
    SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
           levenshtein(a.text, c.text)::BIGINT AS dist,
           1.0 - levenshtein(a.text, c.text)::DOUBLE
               / greatest(length(a.text), length(c.text)) AS sim
    FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE 1.0 - levenshtein(a.text, c.text)::DOUBLE
              / greatest(length(a.text), length(c.text)) >= 0.9""",
    "llm", "dedup",
)
def edit_distance_pairs(spark, sf_dir):
    """Edit-distance near-dup pairs — the character-level modality the
    token-level family (minhash/simhash/ngram-jaccard) misses: it
    catches single-character typo edits that leave most shingles
    intact but also scores transpositions/insertions exactly.
    Candidates are blocked on the first-4-token prefix (deterministic,
    reproducible in SQL — unlike banded minhash, prefix blocking needs
    no hash agreement between engines), then scored with the built-in
    JVM `levenshtein` and kept at normalized similarity >= 0.9
    (1 - dist/max_len, identical expression tree on both engines).

    Scale shape: the self-join shuffles on the block key, so work is
    sum over blocks of |block|^2 — never corpus^2. At 100 TB you cap
    hot blocks (the df-cap idiom from ngram_jaccard_pairs) and switch
    the scorer to the threshold-bounded 3-arg `levenshtein(l, r, k)`
    (O(k*len) early-exit, Spark 3.5+) once an oracle no longer needs
    DuckDB's 2-arg semantics. O(len^2) DP cost per pair stays JVM-side
    whole-stage-codegen — no Python in the loop."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b = docs.withColumn(
        "blk", F.array_join(F.slice(F.split(F.col("text"), " "), 1, 4), " "))
    a, c = b.alias("a"), b.alias("c")
    dist = F.levenshtein(F.col("a.text"), F.col("c.text"))
    sim = (F.lit(1.0) - dist.cast("double")
           / F.greatest(F.length("a.text"), F.length("c.text")))
    return (
        a.join(c, (F.col("a.blk") == F.col("c.blk"))
               & (F.col("a.doc_id") < F.col("c.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("c.doc_id").alias("doc_b"),
                dist.cast("bigint").alias("dist"), sim.alias("sim"))
        .filter(F.col("sim") >= 0.9))

@register(
    "stream_semi_join",
    """
    WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, (epoch_us(e.ts) // 1000) AS err_ms
    FROM e WHERE EXISTS (
      SELECT 1 FROM c
      WHERE c.user_id = e.user_id
        AND c.ts > e.ts - INTERVAL 1 HOUR AND c.ts <= e.ts)""",
    "streaming", "J1",
)
def stream_semi_join(spark, sf_dir):
    """Left-semi stream-stream interval join: errors preceded by a
    click from the same user within 1 h — attribution/guard semantics
    ("only act on errors from engaged users") without ever shipping the
    right side's columns. Each matched error emits EXACTLY once, when
    its first match arrives; further clicks re-match state but cannot
    re-emit, and unmatched errors never emit at all (no null extension
    to wait for — the cheap little sibling of the outer variants).
    State obeys the same two-sided eviction horizons as the inner join,
    O(lookback x rate). Same sentinel-flushed replay harness as
    stream_left_outer_join; the error sentinel matches nothing (its
    user_id -1 pairs with the click sentinel's -2) and the batch-side
    filter is belt-and-braces."""
    tune(spark)
    from .streaming.pipelines import stream_interval_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("unix_micros(ts)"))
    far = ev.agg(F.max("ts")).first()[0] + 48 * 3600 * 10**6
    errors = _staged_sentinel_side(
        spark, ev, "error", -1, far, ["event_id", "err_ts"])
    clicks = _staged_sentinel_side(
        spark, ev, "click", -2, far, ["click_id", "click_ts"]).drop("click_id")
    out = stream_interval_join(
        errors, clicks, keys=["user_id"], left_ts="err_ts",
        right_ts="click_ts", lookback="1 hour", how="leftSemi")
    out = out.select(
        "event_id", "user_id",
        F.expr("unix_micros(err_ts) div 1000").alias("err_ms"))
    res = _run_to_memory(spark, out, "stream_semi_join_result")
    return res.filter(F.col("event_id") >= 0)

def _pagerank_sql(iterations: int = 10, damping: float = 0.85,
                  decimals: int = 6) -> str:
    """Unrolled power-iteration PageRank as chained CTEs — the exact
    arithmetic of operators/graph.py:pagerank (symmetrized LSH edges,
    per-round dangling-mass redistribution), 10 fixed rounds, ranks
    rounded to 6 decimals so order-dependent double summation cannot
    flip the hash (residual cross-engine error ~1e-12 << 5e-7)."""
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        # MATERIALIZED: DuckDB inlines plain CTEs per reference; each
        # r{i} is referenced twice downstream, so inlining would double
        # the plan per iteration (2^10 scans by r10)
        steps.append(f"""
    d{i} AS MATERIALIZED (
      SELECT COALESCE(sum(r.rank), 0.0) AS dm
      FROM {prev} r LEFT JOIN deg g ON r.id = g.src
      WHERE g.src IS NULL),
    c{i} AS MATERIALIZED (
      SELECT e.dst AS id, sum(r.rank / g.deg) AS contrib
      FROM edges e
      JOIN {prev} r ON e.src = r.id
      JOIN deg g ON g.src = e.src
      GROUP BY e.dst),
    r{i} AS MATERIALIZED (
      SELECT ids.id,
             ({1.0 - damping} / nn.n
              + {damping} * (SELECT dm FROM d{i}) / nn.n
              + {damping} * COALESCE(c.contrib, 0.0)) AS rank
      FROM ids LEFT JOIN c{i} c ON ids.id = c.id CROSS JOIN nn)""")
        prev = f"r{i}"
    return f"""
    WITH pairs AS MATERIALIZED ({_minhash_pairs_sql()}),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    deg AS MATERIALIZED (
      SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
    ids AS MATERIALIZED (SELECT doc_id AS id FROM documents),
    nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM ids),
    r0 AS MATERIALIZED (
      SELECT id, 1.0 / nn.n AS rank FROM ids CROSS JOIN nn),
    {",".join(steps)}
    SELECT id AS doc_id, round(rank, {decimals}) AS rank
    FROM {prev}
    ORDER BY round(rank, {decimals}) DESC, id LIMIT 20"""


@register(
    "doc_pagerank",
    _pagerank_sql(),
    "llm", "graph", "iterative",
)
def doc_pagerank(spark, sf_dir):
    """PageRank centrality over the MinHash-LSH near-dup graph — the
    top-20 'template' documents: high rank marks docs whose text
    recurs (with edits) across many others, exactly the boilerplate a
    curation pass inspects first. Same edge set as dedup_clusters, so
    the two queries share the LSH candidate machinery; power iteration
    (operators/graph.py:pagerank) does one rank-to-edges shuffle per
    round with map-side partial sums, dangling mass redistributed.
    Oracle: the SAME 10 fixed rounds unrolled as chained SQL CTEs
    (_pagerank_sql). Iterative double summation is order-dependent
    across engines, so both sides round to 6 decimals (residual error
    ~1e-12, five orders under the rounding grain) and order by
    (rounded rank DESC, doc_id) — a deterministic tolerance hash; the
    analytic fixed-point and stochasticity tests in
    tests/test_operators.py carry the un-rounded correctness.
    Top-20 is TakeOrderedAndProject with doc_id tie-break."""
    from .operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
    ranks = pagerank(docs.select(F.col("doc_id").alias("id")),
                     pairs.select("doc_a", "doc_b"),
                     src_col="doc_a", dst_col="doc_b", iterations=10)
    return (ranks.select(F.col("id").alias("doc_id"),
                         F.round("rank", 6).alias("rank"))
            .orderBy(F.desc("rank"), "doc_id").limit(20))

@register(
    "events_value_bands",
    """
    WITH stats AS (
      SELECT event_type, min(value) AS mn, max(value) AS mx
      FROM events GROUP BY event_type),
    bands AS (
      SELECT event_type, k AS band,
             mn + k * ((mx - mn) / 5.0) AS lo,
             CASE WHEN k < 4 THEN mn + (k + 1) * ((mx - mn) / 5.0)
                  ELSE mx + 1.0 END AS hi
      FROM stats, range(0, 5) t(k))
    SELECT b.event_type, b.band::BIGINT AS band, b.lo AS lo, b.hi AS hi,
           count(*)::BIGINT AS n,
           SUM(CAST(e.value AS DECIMAL(14,2)))::DOUBLE AS total
    FROM events e JOIN bands b
      ON e.event_type = b.event_type
     AND e.value >= b.lo AND e.value < b.hi
    GROUP BY b.event_type, b.band, b.lo, b.hi""",
    "llm", "range_join",
)
def events_value_bands(spark, sf_dir):
    """Range join demo: per-type equal-width value bands (derived from
    min/max, last band padded so the max lands inside) range-joined
    back to the fact rows via operators/joins.py:range_join — interval
    bucketing turns the non-equi containment predicate into a hash
    join on (cell, event_type). Catalyst's native plan for this join
    is BroadcastNestedLoopJoin (fine for 25 bands, quadratic doom once
    the interval table outgrows a broadcast); the bucketed plan is the
    one that survives a fact x big-dim range join at 100 TB, and a
    plan test pins the absence of nested-loop/cartesian nodes. Band
    edges use one shared (mx-mn)/5 term on both engines so boundary
    membership is bit-identical; aggregates are the usual BIGINT count
    + DECIMAL-then-DOUBLE sum."""
    from .operators.joins import range_join

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"))
    w = (F.col("mx") - F.col("mn")) / F.lit(5.0)
    bands = (
        stats.select(
            "event_type", "mn", "mx",
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("band"))
        .select(
            "event_type", "band",
            (F.col("mn") + F.col("band") * w).alias("lo"),
            F.when(F.col("band") < 4,
                   F.col("mn") + (F.col("band") + 1) * w)
             .otherwise(F.col("mx") + 1.0).alias("hi")))
    joined = range_join(ev, bands, "value", "lo", "hi",
                        granularity=25.0, extra_keys=["event_type"])
    return joined.groupBy(
        "event_type", F.col("band").cast("bigint").alias("band"),
        "lo", "hi"
    ).agg(F.count("*").alias("n"),
          F.sum(dec("value", 14)).cast("double").alias("total"))

@register(
    "events_multires_rollup",
    """
    WITH base AS (
      SELECT event_type, epoch_us(ts) AS us,
             CAST(value AS DECIMAL(14,2)) AS v
      FROM events),
    minute AS (
      SELECT event_type, us // 60000000 AS m,
             count(*)::BIGINT AS n, SUM(v) AS tot
      FROM base GROUP BY event_type, us // 60000000),
    hour AS (
      SELECT event_type, m // 60 AS h,
             SUM(n)::BIGINT AS n, SUM(tot) AS tot
      FROM minute GROUP BY event_type, m // 60),
    day AS (
      SELECT event_type, h // 24 AS d,
             SUM(n)::BIGINT AS n, SUM(tot) AS tot
      FROM hour GROUP BY event_type, h // 24)
    SELECT 'minute' AS resolution, (m * 60000000)::BIGINT AS bucket_us,
           event_type, n, tot::DOUBLE AS total FROM minute
    UNION ALL
    SELECT 'hour', (h * 3600000000)::BIGINT, event_type, n, tot::DOUBLE
    FROM hour
    UNION ALL
    SELECT 'day', (d * 86400000000)::BIGINT, event_type, n, tot::DOUBLE
    FROM day""",
    "llm", "rollup",
)
def events_multires_rollup(spark, sf_dir):
    """Hypertable-style multi-resolution rollup (the continuous-
    aggregate cascade): raw -> minute -> hour -> day, where every
    coarser level re-aggregates the FINER level's partials instead of
    rescanning raw. Only the raw->minute aggregation touches the full
    fact table (and map-side partial aggregation shrinks even that
    shuffle to distinct-bucket size); hour and day shuffle
    minute-/hour-sized inputs — geometrically shrinking work, which is
    why a 100 TB hypertable maintains its rollup pyramid incrementally
    rather than re-aggregating raw per resolution. Sums stay DECIMAL
    through every level (exact, so cascaded == direct aggregation
    bit-for-bit — the property that makes partial rollups trustworthy)
    and cast to DOUBLE only in the final projection; the oracle
    mirrors the same cascade."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us"),
        dec("value", 14).alias("v"))
    minute = ev.groupBy(
        "event_type", F.expr("us div 60000000").alias("m")
    ).agg(F.count("*").alias("n"), F.sum("v").alias("tot"))
    hour = minute.groupBy(
        "event_type", F.expr("m div 60").alias("h")
    ).agg(F.sum("n").cast("bigint").alias("n"), F.sum("tot").alias("tot"))
    day = hour.groupBy(
        "event_type", F.expr("h div 24").alias("d")
    ).agg(F.sum("n").cast("bigint").alias("n"), F.sum("tot").alias("tot"))

    def lvl(df, tag, col, size):
        return df.select(
            F.lit(tag).alias("resolution"),
            (F.col(col) * size).cast("bigint").alias("bucket_us"),
            "event_type", "n", F.col("tot").cast("double").alias("total"))

    return (lvl(minute, "minute", "m", 60_000_000)
            .unionAll(lvl(hour, "hour", "h", 3_600_000_000))
            .unionAll(lvl(day, "day", "d", 86_400_000_000)))

@register(
    "length_weighted_sample",
    """
    WITH stats AS (
      SELECT sum(n_chars)::BIGINT AS wsum, count(*)::BIGINT AS n
      FROM documents),
    h AS (
      SELECT doc_id, n_chars, wsum, n,
             ('0x' || substr(md5('wsamp-' || doc_id::VARCHAR), 1, 15))::BIGINT
               AS u
      FROM documents CROSS JOIN stats)
    SELECT doc_id, n_chars,
           (n * n_chars) / (5.0 * wsum) AS p_inclusion,
           (5.0 * wsum) / (n * n_chars) AS ht_weight
    FROM h
    WHERE u::HUGEINT * (5 * wsum)::HUGEINT
        < n_chars::HUGEINT * n::HUGEINT * 1152921504606846976::HUGEINT""",
    "llm", "sampling",
)
def length_weighted_sample(spark, sf_dir):
    """Importance sampling with P(keep) proportional to document LENGTH
    at overall rate 1/5 — the token-budget sampler: each token (not
    each doc) gets equal inclusion probability, so the sampled corpus
    hits ~1/5 of the token budget without length bias, and ht_weight
    (1/p, Horvitz-Thompson) makes downstream statistics unbiased.

    The keep decision is EXACT integer arithmetic — u/2^60 < n·w/(5·wsum)
    cross-multiplied into DECIMAL(38)/HUGEINT products — on a salted
    md5 of the stable doc_id: deterministic under retries and data
    appends (rand() is neither), reproducible bit-for-bit by the SQL
    oracle, no floating-point boundary ambiguity. The corpus-level
    (wsum, n) scalars ride a broadcast 1-row cross join; the keep
    test itself is a narrow scan — zero fact shuffles at any scale.
    Docs heavy enough that p would exceed 1 are simply always kept
    (none at this data; at 100 TB that's the standard weight cap)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    stats = docs.agg(F.sum("n_chars").cast("bigint").alias("wsum"),
                     F.count("*").alias("n"))
    d = lambda c: c.cast("decimal(38,0)")
    u = F.conv(F.substring(
        F.md5(F.concat(F.lit("wsamp-"), F.col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("bigint")
    h = docs.crossJoin(F.broadcast(stats)).withColumn("u", u)
    return (
        h.filter(d(F.col("u")) * d(F.lit(5) * F.col("wsum"))
                 < d(F.col("n_chars")) * d(F.col("n"))
                 * d(F.lit(1152921504606846976)))
        .select(
            "doc_id", "n_chars",
            ((F.col("n") * F.col("n_chars")) / (F.lit(5.0) * F.col("wsum")))
            .alias("p_inclusion"),
            ((F.lit(5.0) * F.col("wsum")) / (F.col("n") * F.col("n_chars")))
            .alias("ht_weight")))


# ======================================================================
# Round 2: sequence packing, reservoir sampling, model inference,
# incremental signature maintenance
# ======================================================================

@register(
    "doc_sequence_packing",
    """
    WITH t AS (
      SELECT doc_id, doc_id % 16 AS bucket,
             len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
      FROM documents),
    c AS (
      SELECT *,
             COALESCE(sum(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cum_before
      FROM t)
    SELECT doc_id, bucket, n_tokens,
           (cum_before % 64)::BIGINT AS offset,
           (bucket * 4294967296 + cum_before // 64)::BIGINT AS pack_id
    FROM c""",
    "llm", "packing",
)
def doc_sequence_packing(spark, sf_dir):
    """Concat-and-chunk sequence packing (operators/packing.py): every
    document gets a (pack_id, offset) slot in a 64-token-budget
    training sequence. Deterministic bucketing + one per-bucket window
    cumsum = one shuffle; buckets pack in parallel and scale with the
    data. The reference has no such operator; this is the LLM-pipeline
    surface (prep for pretraining batches)."""
    from .operators.packing import pack_sequences
    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=64, n_buckets=16)


@register(
    "stratified_reservoir",
    """
    WITH h AS (
      SELECT lang AS stratum, doc_id,
             ('0x' || substr(md5('rsv-' || doc_id::VARCHAR), 1, 15))::BIGINT
               AS u
      FROM documents),
    r AS (
      SELECT stratum, doc_id,
             row_number() OVER (PARTITION BY stratum
                                ORDER BY u, doc_id) AS rnk
      FROM h)
    SELECT stratum AS lang, doc_id, rnk::BIGINT AS rnk
    FROM r WHERE rnk <= 25""",
    "llm", "sampling",
)
def stratified_reservoir(spark, sf_dir):
    """Stratified reservoir sample, exactly 25 docs per language
    (operators/sampling.py): deterministic bottom-k-by-hash semantics
    through a mergeable two-stage accumulator — per-partition Arrow
    candidate pruning (<= k rows per stratum per partition survive),
    then one exact window over the tiny candidate set. The corpus is
    never shuffled; the oracle is the direct global ranking."""
    from .operators.sampling import stratified_reservoir as rsv
    docs = _t(spark, sf_dir, "documents")
    return rsv(docs, stratum_col="lang", k=25, id_col="doc_id")


def _quality_model_sql() -> str:
    from .operators.inference import score_sql_expr
    return f"""
    WITH feats AS (
      SELECT doc_id,
             length(text)::BIGINT AS n_chars,
             len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words,
             len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b'))::BIGINT
               AS n_stop
      FROM documents)
    SELECT doc_id, n_chars, n_words, n_punct, n_stop,
           {score_sql_expr()} AS score
    FROM feats"""


@register(
    "quality_model_scores",
    _quality_model_sql(),
    "llm", "inference",
)
def quality_model_scores(spark, sf_dir):
    """Batched model inference (operators/inference.py): JVM-side
    feature extraction feeds an Arrow-batched pandas UDF running a
    vectorized logistic forward pass — the scale shape for "score the
    corpus with a quality classifier" (swap the numpy expression for a
    real model without touching the plumbing). Zero shuffles; the SQL
    twin evaluates the identical expression, so the Python inference
    path is value-checked end to end."""
    from .operators.inference import quality_model_scores as score
    docs = _t(spark, sf_dir, "documents")
    return score(docs)


@register(
    "minhash_incremental",
    _minhash_sig_sql(
        src="updated",
        prefix="""updated AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 3 THEN text || ' upd' ELSE text END
               AS text
      FROM documents WHERE doc_id % 10 <> 7),
    """),
    "llm", "dedup", "incremental",
)
def minhash_incremental(spark, sf_dir):
    """Incremental MinHash maintenance (operators/dedup.py:
    minhash_delta): a simulated CDC changelog (10% of docs updated, 10%
    deleted) patches the prior signature table — shingling runs only
    over the changelog, the prior table is anti-joined against a
    BROADCAST of the changed ids (the 100 TB signature table never
    shuffles). Oracle = full recompute over the updated corpus, so the
    delta path is proven bit-identical to the batch path."""
    docs = _t(spark, sf_dir, "documents")
    prior = dedup.minhash_signatures(docs, num_hashes=16, n=3)
    changes = (
        docs.filter((F.col("doc_id") % 10).isin(3, 7))
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 3, "upsert")
             .otherwise("delete").alias("op"),
            F.when(F.col("doc_id") % 10 == 3,
                   F.concat(F.col("text"), F.lit(" upd")))
             .otherwise(F.col("text")).alias("text")))
    return dedup.minhash_delta(prior, changes, num_hashes=16, n=3)


_SEMDEDUP_SQL = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 ORDER BY vec_id LIMIT 256),
    a AS (
      SELECT vec_id, cent_id, v, norm FROM (
        SELECT n.vec_id, c.cent_id, n.v, n.norm,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cnorm)
                   DESC, c.cent_id) AS r
        FROM n CROSS JOIN c) WHERE r = 1),
    p AS (
      SELECT l.vec_id, min(r.vec_id) AS nbr_min
      FROM a l JOIN a r USING (cent_id)
      WHERE l.vec_id <> r.vec_id
        AND list_dot_product(l.v, r.v) / (l.norm * r.norm) >= 0.35
      GROUP BY l.vec_id)
    SELECT a.vec_id, a.cent_id AS cell,
           least(a.vec_id, COALESCE(nbr_min, a.vec_id))::BIGINT AS keep_id,
           (a.vec_id = least(a.vec_id, COALESCE(nbr_min, a.vec_id))) AS kept
    FROM a LEFT JOIN p USING (vec_id)"""


_SEMDEDUP_AUTO_SQL = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 ORDER BY vec_id
      -- the self-tuned budget: clamp(floor(sqrt(corpus)), 16, 65536)
      LIMIT (SELECT greatest(16, least(65536,
               CAST(floor(sqrt(count(*))) AS BIGINT))) FROM n)),
    a AS (
      SELECT vec_id, cent_id, v, norm FROM (
        SELECT n.vec_id, c.cent_id, n.v, n.norm,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cnorm)
                   DESC, c.cent_id) AS r
        FROM n CROSS JOIN c) WHERE r = 1),
    p AS (
      SELECT l.vec_id, min(r.vec_id) AS nbr_min
      FROM a l JOIN a r USING (cent_id)
      WHERE l.vec_id <> r.vec_id
        AND list_dot_product(l.v, r.v) / (l.norm * r.norm) >= 0.35
      GROUP BY l.vec_id)
    SELECT a.vec_id, a.cent_id AS cell,
           least(a.vec_id, COALESCE(nbr_min, a.vec_id))::BIGINT AS keep_id,
           (a.vec_id = least(a.vec_id, COALESCE(nbr_min, a.vec_id))) AS kept
    FROM a LEFT JOIN p USING (vec_id)"""


@register(
    "embedding_semantic_dedup",
    _SEMDEDUP_AUTO_SQL,
    "llm", "dedup", "similarity",
)
def embedding_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (operators/similarity.py:
    semantic_dedup): nearest-centroid cells confine the quadratic
    cosine comparison, centroids ride a broadcast, and a vector is
    dropped when a lower-id neighbor in its cell clears the threshold.
    The deterministic id-sampled quantizer makes the full path —
    assignment argmax, pair pruning, keeper election —
    oracle-checkable; embedding_near_pairs is the brute-force twin
    this replaces at scale. Since r11 (VERDICT r10 #1) the DEFAULT
    centroid budget is the sqrt-corpus clamp — the oracle reproduces
    it with a computed LIMIT — so the within-cell pair join grows
    n^1.5 by default instead of occupancy-quadratic; pass
    max_centroids to pin a fixed nlist (the recall gate does)."""
    from .operators.similarity import semantic_dedup
    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.35)


@register(
    "semantic_dedup_auto",
    _SEMDEDUP_AUTO_SQL,
    "llm", "dedup", "similarity",
)
def semantic_dedup_auto(spark, sf_dir):
    """Occupancy-held-constant SemDeDup
    (operators/similarity.py:semantic_dedup_auto): the centroid
    budget self-tunes to floor(sqrt(corpus rows)) — clamped to
    [16, 65536] — so cell occupancy stays ~sqrt(n) and the
    within-cell pair join grows n^1.5 instead of the fixed-256
    variant's measured occupancy-quadratic 18.4x per decade. The
    budget comes from one count action and the oracle reproduces it
    with a computed LIMIT, so the whole path — budget, assignment
    argmax, pair pruning, keeper election — stays hash-checked.

    Since the r11 default flip this is hash-identical to
    embedding_semantic_dedup BY CONSTRUCTION (both run the sqrt
    budget at threshold 0.35) — retained deliberately as the named
    self-tuning contract and the registration point for the clamp
    bounds; drop-count parity between the two names is itself a
    cross-check."""
    from .operators.similarity import semantic_dedup_auto as _f
    emb = _t(spark, sf_dir, "embeddings")
    return _f(emb, threshold=0.35)


@register(
    "semantic_dedup_sweep",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 ORDER BY vec_id
      -- the sqrt-corpus default budget (r11 flip, VERDICT r10 #1)
      LIMIT (SELECT greatest(16, least(65536,
               CAST(floor(sqrt(count(*))) AS BIGINT))) FROM n)),
    a AS (
      SELECT vec_id, cent_id, v, norm FROM (
        SELECT n.vec_id, c.cent_id, n.v, n.norm,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cnorm)
                   DESC, c.cent_id) AS r
        FROM n CROSS JOIN c) WHERE r = 1),
    bl AS (
      SELECT l.vec_id,
             max(list_dot_product(l.v, r.v) / (l.norm * r.norm))
               AS best_lower
      FROM a l JOIN a r USING (cent_id)
      WHERE r.vec_id < l.vec_id
      GROUP BY l.vec_id),
    pd AS (
      SELECT a.vec_id, bl.best_lower
      FROM a LEFT JOIN bl USING (vec_id)),
    ts AS (SELECT unnest([0.30, 0.35, 0.40, 0.45])::DOUBLE AS threshold)
    SELECT ts.threshold,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN pd.best_lower >= ts.threshold
                    THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
           ((2 * sum(CASE WHEN pd.best_lower >= ts.threshold
                          THEN 1 ELSE 0 END)::BIGINT * 1000000
             + count(*)) // (2 * count(*))) / 1e6 AS drop_frac
    FROM pd CROSS JOIN ts GROUP BY ts.threshold""",
    "llm", "dedup", "similarity", "diagnostics",
)
def semantic_dedup_sweep(spark, sf_dir):
    """SemDeDup threshold sweep
    (operators/similarity.py:semantic_dedup_sweep): drop counts and
    fractions at cosine thresholds 0.30/0.35/0.40/0.45 from ONE
    assignment + ONE within-cell pair pass — per doc, the max cosine
    to any lower-id cell-mate; dropped at t iff that max clears t.
    The tuning diagnostic to run before committing a threshold (the
    semantic sibling of lsh_band_sweep); each row's n_dropped equals
    embedding_semantic_dedup(threshold=t)'s drop count by
    construction. Since r11 both default to the sqrt-corpus centroid
    budget (VERDICT r10 #1), reproduced in the oracle by a computed
    LIMIT, so the sweep's pair pass grows n^1.5 like the dedup it
    tunes."""
    from .operators.similarity import semantic_dedup_sweep as _f
    emb = _t(spark, sf_dir, "embeddings")
    return _f(emb)


_SEMDEDUP_SNM_SQL = """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 ORDER BY vec_id LIMIT 256),
    a AS (
      SELECT vec_id, cent_id, v, norm, ccos FROM (
        SELECT n.vec_id, c.cent_id, n.v, n.norm,
               list_dot_product(n.v, c.cv) / (n.norm * c.cnorm) AS ccos,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cnorm)
                   DESC, c.cent_id) AS r
        FROM n CROSS JOIN c) WHERE r = 1),
    rk AS (
      SELECT vec_id, cent_id, v, norm,
             (row_number() OVER (
                PARTITION BY cent_id ORDER BY ccos DESC, vec_id) - 1)
               // 16 AS ck
      FROM a),
    rr AS (
      SELECT vec_id AS rid, cent_id AS rcell, v AS rv, norm AS rnorm,
             unnest([ck, ck + 1]) AS jc
      FROM rk),
    ed AS (
      SELECT l.vec_id AS ida, r.rid AS idb
      FROM rk l JOIN rr r ON l.cent_id = r.rcell AND l.ck = r.jc
      WHERE l.vec_id <> r.rid
        AND list_dot_product(l.v, r.rv) / (l.norm * r.rnorm) >= 0.35),
    sym AS (SELECT ida, idb FROM ed
            UNION ALL SELECT idb, ida FROM ed),
    nm AS (SELECT ida AS vec_id, min(idb) AS nbr_min
           FROM sym GROUP BY ida)
    SELECT rk.vec_id, rk.cent_id AS cell,
           least(rk.vec_id, COALESCE(nm.nbr_min, rk.vec_id))::BIGINT
             AS keep_id,
           (rk.vec_id = least(rk.vec_id,
                              COALESCE(nm.nbr_min, rk.vec_id))) AS kept
    FROM rk LEFT JOIN nm USING (vec_id)"""


@register(
    "semantic_dedup_snm",
    _SEMDEDUP_SNM_SQL,
    "llm", "dedup", "similarity",
)
def semantic_dedup_snm(spark, sf_dir):
    """Sorted-neighborhood SemDeDup
    (operators/similarity.py:semantic_dedup_snm): the linear-scale
    variant of embedding_semantic_dedup. Within each centroid cell,
    members are ranked by cosine-to-centroid and compared only
    against their own and the adjacent 16-chunk — O(occupancy *
    chunk) instead of the plain variant's O(occupancy^2), which the
    100x probe measured at 18.4x per 10x data. Same keeper-election
    semantics and output schema, so a pipeline swaps the two on a
    size threshold; the chunk self-join is pinned shuffle_hash."""
    from .operators.similarity import semantic_dedup_snm as _f
    emb = _t(spark, sf_dir, "embeddings")
    return _f(emb, threshold=0.35, chunk=16)


@register(
    "semantic_dedup_snm_recall",
    f"""
    SELECT count(*)::BIGINT AS n_vectors,
           sum(CASE WHEN NOT p.kept THEN 1 ELSE 0 END)::BIGINT
             AS dropped_plain,
           sum(CASE WHEN NOT s.kept THEN 1 ELSE 0 END)::BIGINT
             AS dropped_snm,
           sum(CASE WHEN NOT p.kept AND NOT s.kept THEN 1 ELSE 0 END)
             ::BIGINT AS dropped_both,
           CASE WHEN sum(CASE WHEN NOT p.kept THEN 1 ELSE 0 END) = 0
                THEN 1.0
                ELSE ((2 * sum(CASE WHEN NOT p.kept AND NOT s.kept
                                    THEN 1 ELSE 0 END)::BIGINT * 1000000
                       + sum(CASE WHEN NOT p.kept THEN 1 ELSE 0 END))
                      // (2 * sum(CASE WHEN NOT p.kept
                                  THEN 1 ELSE 0 END)::BIGINT)) / 1e6
           END AS drop_recall
    FROM ({_SEMDEDUP_SQL}) p JOIN ({_SEMDEDUP_SNM_SQL}) s
    USING (vec_id)""",
    "llm", "dedup", "similarity", "diagnostic",
)
def semantic_dedup_snm_recall(spark, sf_dir):
    """Recall gate for the sorted-neighborhood approximation — the
    same honesty contract the Hamming ANN path carries
    (ann_hamming_recall): of the vectors the PLAIN quadratic
    SemDeDup drops, what fraction does the linear SNM variant also
    drop? One row: corpus size, drop counts for both variants, their
    intersection, and drop_recall. SNM can only MISS pairs (its
    comparison set is a subset), so dropped_snm <= dropped_plain and
    any recall shortfall is exactly the rank-distant near-dup tail
    the chunk width trades away.

    Both variants PIN max_centroids=256: the subset invariant only
    holds under the SAME quantizer, so this gate must not follow
    semantic_dedup's r11 sqrt-budget default — it compares the SNM
    approximation at a matched fixed nlist (the oracle's fixed-256
    _SEMDEDUP_SQL / _SEMDEDUP_SNM_SQL pair stays its twin)."""
    from .operators.similarity import semantic_dedup, semantic_dedup_snm
    emb = _t(spark, sf_dir, "embeddings")
    p = semantic_dedup(emb, threshold=0.35, max_centroids=256) \
        .select("vec_id", F.col("kept").alias("kept_p"))
    s = semantic_dedup_snm(emb, threshold=0.35, chunk=16) \
        .select("vec_id", F.col("kept").alias("kept_s"))
    j = p.join(s, "vec_id")
    dp = F.sum(F.when(~F.col("kept_p"), 1).otherwise(0)).cast("long")
    ds = F.sum(F.when(~F.col("kept_s"), 1).otherwise(0)).cast("long")
    db = F.sum(F.when((~F.col("kept_p")) & (~F.col("kept_s")), 1)
               .otherwise(0)).cast("long")
    return j.agg(
        F.count("*").cast("long").alias("n_vectors"),
        dp.alias("dropped_plain"),
        ds.alias("dropped_snm"),
        db.alias("dropped_both"),
    ).select(
        "n_vectors", "dropped_plain", "dropped_snm", "dropped_both",
        F.when(F.col("dropped_plain") == 0, F.lit(1.0))
         .otherwise(_ratio6(F.col("dropped_both"),
                            F.col("dropped_plain")))
         .alias("drop_recall"))


@register(
    "semantic_decontaminate",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    b AS (
      SELECT vec_id AS bench_id, v AS bv, norm AS bnorm
      FROM n WHERE vec_id % 97 = 3 ORDER BY vec_id LIMIT 64),
    -- corpus = everything not in the CAPPED bench set: modulo-sampled
    -- rows beyond the 64-row cap are ordinary corpus and ARE audited
    c AS (SELECT * FROM n
          WHERE vec_id NOT IN (SELECT bench_id FROM b)),
    s AS (
      SELECT c.vec_id, b.bench_id,
             list_dot_product(c.v, b.bv) / (c.norm * b.bnorm) AS cos
      FROM c CROSS JOIN b),
    f AS (
      SELECT vec_id, bench_id, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, bench_id) AS r
      FROM s WHERE cos >= 0.35)
    SELECT vec_id, bench_id, round(cos, 6) AS cosine
    FROM f WHERE r = 1""",
    "llm", "similarity", "quality",
)
def semantic_decontaminate(spark, sf_dir):
    """Embedding-level decontamination
    (operators/similarity.py:semantic_decontaminate): corpus vectors
    sitting above cosine 0.35 of any benchmark vector, with the
    best-matching benchmark id — the paraphrase-level complement to
    bloom_decontaminate / decontaminate_overlap's verbatim n-gram
    checks. Benchmark = deterministic id-sample, ordered-limit
    capped at 64 (the fixed-work contract of the ANN query sets);
    the plan broadcasts the benchmark side and scores the corpus in
    one scan-linear pass — corpus x |bench|, never corpus x
    corpus."""
    from .operators.similarity import semantic_decontaminate as _f
    emb = _t(spark, sf_dir, "embeddings")
    return _f(emb, threshold=0.35)


@register(
    "embedding_outliers",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 ORDER BY vec_id LIMIT 256),
    a AS (
      SELECT vec_id, cent_id, ccos FROM (
        SELECT n.vec_id, c.cent_id,
               list_dot_product(n.v, c.cv) / (n.norm * c.cnorm) AS ccos,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cnorm)
                   DESC, c.cent_id) AS r
        FROM n CROSS JOIN c) WHERE r = 1),
    u AS (
      SELECT vec_id, cent_id, CAST(round(ccos * 1000) AS BIGINT) AS x
      FROM a),
    st AS (
      SELECT cent_id, count(*)::BIGINT AS cn,
             sum(x)::HUGEINT AS s, sum(x * x)::HUGEINT AS q
      FROM u GROUP BY cent_id)
    SELECT u.vec_id, u.cent_id AS cell, u.x AS ccos_milli,
           st.cn AS cell_n
    FROM u JOIN st USING (cent_id)
    WHERE st.cn >= 8
      AND (st.cn * u.x - st.s) * (st.cn * u.x - st.s)
          > 9 * (st.cn * st.q - st.s * st.s)""",
    "llm", "similarity", "quality",
)
def embedding_outliers(spark, sf_dir):
    """Embedding outlier screen
    (operators/similarity.py:embedding_outliers): vectors more than 3
    cell-standard-deviations from their cell's mean
    cosine-to-centroid — the data-hygiene pass that catches corrupt /
    truncated / mis-embedded vectors before dedup, ANN, or mixing
    consume them. The z-test is a pure-integer cross-multiplication
    over once-quantized milli-unit cosines (no float mean, variance,
    or sqrt on any engine — DECIMAL/HUGEINT sums), so the flag set is
    engine-bit-identical. Two cell-keyed shuffles, broadcast
    centroids, zero pair joins — the cheapest member of the
    embedding-quality family."""
    from .operators.similarity import embedding_outliers as _f
    emb = _t(spark, sf_dir, "embeddings")
    return _f(emb, z=3, min_cell=8)


@register(
    "jsonl_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "sources", "llm",
)
def jsonl_roundtrip(spark, sf_dir):
    """JSONL ingest/egress (sources/files.py): stage the documents
    table as gzip JSONL, read it back schema-first, and prove the
    round trip is lossless (oracle = the original table). The staging
    write is the egress path a corpus release uses; the schema-first
    read is the ingest path for crawler/annotation dumps — neither
    infers schema (a second full scan at 100 TB) and parquet remains
    the query-side format."""
    import tempfile
    from .sources.files import DOCUMENTS_SCHEMA, read_jsonl, write_jsonl
    docs = _t(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="sgs_jsonl_")
    write_jsonl(docs, d, partitions=4)
    return read_jsonl(spark, d, DOCUMENTS_SCHEMA)


@register(
    "orc_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "sources", "llm",
)
def orc_roundtrip(spark, sf_dir):
    """ORC ingest/egress (sources/files.py:write_orc/read_orc): stage
    the documents table as zlib ORC and read it back — the columnar
    interchange path for Hive/Presto-standardized consumers. ORC is
    self-describing (footer schema, no inference pass) and, unlike the
    JSONL/CSV edges, supports pushdown, so a round trip must be
    byte-lossless including the full text column (oracle = the
    original table)."""
    import tempfile
    from .sources.files import read_orc, write_orc
    docs = _t(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="sgs_orc_")
    write_orc(docs, d, partitions=4)
    return read_orc(spark, d)


@register(
    "csv_roundtrip",
    "SELECT doc_id, lang, source, n_chars FROM documents",
    "sources", "llm",
)
def csv_roundtrip(spark, sf_dir):
    """CSV ingest/egress twin of jsonl_roundtrip (text column excluded:
    free text in CSV is an escaping minefield — the docstring IS the
    guidance: ship text in JSONL/parquet, keep CSV for flat metadata
    exports)."""
    import tempfile
    from .sources.files import DOCUMENTS_SCHEMA, read_csv, write_csv
    from pyspark.sql import types as T
    schema = T.StructType([f for f in DOCUMENTS_SCHEMA if f.name != "text"])
    docs = _t(spark, sf_dir, "documents").drop("text")
    d = tempfile.mkdtemp(prefix="sgs_csv_")
    write_csv(docs, d, partitions=4)
    return read_csv(spark, d, schema)


@register(
    "mixture_temperature_rates",
    """
    WITH s AS (
      SELECT source, count(*)::BIGINT AS n_docs FROM documents
      GROUP BY source),
    p AS (
      SELECT source, n_docs,
             pow(n_docs, 0.7) AS w,
             sum(pow(n_docs, 0.7)) OVER () AS wsum,
             sum(n_docs) OVER ()::BIGINT AS total
      FROM s)
    SELECT source, n_docs,
           round(w / wsum, 6) AS target_share,
           round((w / wsum) * total / n_docs, 6) AS sample_weight
    FROM p""",
    "llm", "sampling",
)
def mixture_temperature_rates(spark, sf_dir):
    """Temperature-scaled mixture weighting (the multilingual-corpus
    recipe: target share of source s ∝ n_s^alpha, alpha=0.7 —
    up-weights small sources without flattening to uniform).
    sample_weight > 1 means repeat/up-sample, < 1 means downsample via
    hash_split_sample's md5 keep. Work is one source-sized hash agg;
    the window normalization runs over the handful of sources, not the
    corpus."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()
    p = s.select(
        "source", F.col("n_docs").cast("long").alias("n_docs"),
        F.pow("n_docs", F.lit(0.7)).alias("w"),
        F.sum(F.pow("n_docs", F.lit(0.7))).over(w).alias("wsum"),
        F.sum("n_docs").over(w).cast("long").alias("total"))
    return p.select(
        "source", "n_docs",
        F.round(F.col("w") / F.col("wsum"), 6).alias("target_share"),
        F.round((F.col("w") / F.col("wsum")) * F.col("total")
                / F.col("n_docs"), 6).alias("sample_weight"))


@register(
    "user_hll_rollup",
    """
    SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type""",
    "llm", "sketch",
)
def user_hll_rollup(spark, sf_dir):
    """Distinct users per event type via MERGEABLE sketch partials
    (operators/sketches.py:hll_partials/hll_rollup): daily Datasketches
    HLL sketches union into per-type totals — the storable rollup
    count_distinct can't express (distinct isn't mergeable; at 100 TB
    the daily partials are bytes and the fact table is scanned once,
    ever). The gate row hashes a CHECKABLE BOUND rather than the raw
    estimate (which is only exact while the lgk=14 sketch stays in
    sparse mode — a precondition that breaks at larger SFs):
    within_bound asserts the unioned estimate lands within 4 % of the
    exact distinct count (~5 sigma of lgk=14's 0.81 % rsd), so the row
    stays green at any scale factor and hash-fails exactly when the
    sketch leaves its published envelope. Raw-estimate accuracy is
    tolerance-tested in tests/test_sketches.py."""
    from .operators.sketches import hll_partials, hll_rollup
    ev = _t(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000").alias("d")
    parts = hll_partials(ev, ["event_type"], day, "user_id", lgk=14)
    rolled = hll_rollup(parts, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"))
    return (exact.join(F.broadcast(rolled), "event_type")
            .select("event_type", "n_exact",
                    (F.abs(F.col("est_distinct") - F.col("n_exact"))
                     <= F.greatest(F.lit(1.0), F.col("n_exact") * 0.04))
                    .alias("within_bound")))


@register(
    "data_quality_checks",
    """
    SELECT 'lineitem_qty_range' AS check,
           sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50
                    THEN 1 ELSE 0 END)::BIGINT AS violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_negative_price',
           sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range',
           sum(CASE WHEN l_discount < 0 OR l_discount > 1
                    THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'orders_null_custkey',
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'lineitem_pk_unique',
           COALESCE(sum(n - 1), 0)::BIGINT
    FROM (SELECT count(*) AS n FROM lineitem
          GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'orders_custkey_resolves',
           count(*)::BIGINT
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL""",
    "llm", "quality",
)
def data_quality_checks(spark, sf_dir):
    """The batch-promotion validation gate (operators/quality_checks.py):
    range / nullability expectations ride ONE pass per fact table
    (conditional aggregates, merged map-side), primary-key uniqueness
    is one groupBy on the key, and referential integrity is a
    left-anti join against the dimension key set (planner-broadcast
    while it fits; no forced hint since r12 — the customer dim is
    SF-scaled). Output is the tiny (check, violations) table a
    pipeline stores per batch and alerts on."""
    from .operators.quality_checks import (
        check_columns, check_references, check_unique)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    row_checks = check_columns(li, {
        "lineitem_qty_range":
            (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50),
        "lineitem_negative_price": F.col("l_extendedprice") < 0,
        "lineitem_discount_range":
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
    })
    order_checks = check_columns(orders, {
        "orders_null_custkey": F.col("o_custkey").isNull(),
    })
    pk = check_unique(li, ["l_orderkey", "l_linenumber"],
                      "lineitem_pk_unique")
    fk = check_references(orders, "o_custkey", cust, "c_custkey",
                          "orders_custkey_resolves")
    return (row_checks.unionByName(order_checks)
            .unionByName(pk).unionByName(fk))


@register(
    "partition_pruned_scan",
    """
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'error'""",
    "layout", "sources",
)
def partition_pruned_scan(spark, sf_dir):
    """Directory-level file skipping (sources/layout.py:
    write_cell_partitioned): the events table staged partitioned by
    event_type, then read back filtered to one type — the filter
    becomes a PartitionFilter (asserted in tests/test_layout.py), so
    at 100 TB the scan opens 1/|types| of the files and reads zero
    bytes of the rest. The oracle is the same filter over the unstaged
    table: pruning must never change results."""
    import tempfile
    from .sources.layout import write_cell_partitioned
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type")
    d = tempfile.mkdtemp(prefix="sgs_part_")
    write_cell_partitioned(ev, d, "event_type")
    return (spark.read.parquet(d)
            .filter(F.col("event_type") == "error")
            .select("event_id", "user_id", "value"))


@register(
    "bucketed_colocated_join",
    """
    SELECT o.o_orderkey, o.o_totalprice,
           count(*)::BIGINT AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS items_total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice""",
    "layout", "join",
)
def bucketed_colocated_join(spark, sf_dir):
    """Shuffle-free fact-fact join (sources/layout.py:write_bucketed):
    orders and lineitem both persisted bucketed+sorted by orderkey on
    the same bucket count, so the join AND the downstream per-order
    aggregate run with ZERO Exchange (asserted in tests/test_layout.py)
    — bucketing pays the shuffle once at write time, every subsequent
    query on the key skips it. At 100 TB this is the difference
    between re-shuffling 100 TB per query and never shuffling it
    again."""
    import os
    from .sources.layout import write_bucketed
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    # pid-suffixed names: concurrent gate runs must not fight over one
    # managed-table location
    t_o, t_l = f"sgs_orders_bkt_{os.getpid()}", f"sgs_lineitem_bkt_{os.getpid()}"
    write_bucketed(orders, t_o, "o_orderkey", buckets=8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                   t_l, "o_orderkey", buckets=8)
    o = spark.table(t_o)
    l = spark.table(t_l)
    return (o.join(l, "o_orderkey")
            .groupBy("o_orderkey", "o_totalprice")
            .agg(F.count("*").alias("n_items"),
                 F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                  .cast("double").alias("items_total"))
            .select(F.col("o_orderkey"), "o_totalprice", "n_items",
                    "items_total"))


@register(
    "stream_upsert_state",
    """
    SELECT user_id, count(*)::BIGINT AS n,
           SUM(CAST(value AS DECIMAL(18,6)))::DOUBLE AS total
    FROM events GROUP BY user_id""",
    "streaming", "K3", "sinks",
)
def stream_upsert_state(spark, sf_dir):
    """K3's scale path end to end (streaming/sinks.py:
    parquet_upsert_writer — the driver-free twin of the reference's
    Derby upsert, IdempotentSinkFunctionExample.scala:72-109): events
    staged as three files replay as three micro-batches of update-mode
    per-user aggregates; each batch MERGEs into a hash-bucketed parquet
    table via dynamic partition overwrite (read touched buckets,
    anti-join updated keys, rewrite only those buckets — no driver
    collect anywhere). The final table must equal the batch aggregate,
    whatever the batch split was. Sums run in DECIMAL so accumulation
    order can't move the hash."""
    import os
    import tempfile
    from .streaming.sinks import parquet_upsert_writer

    tune(spark)
    ev = _t(spark, sf_dir, "events").select("user_id", "value", "ts")
    stage = tempfile.mkdtemp(prefix="sgs_upsert_in_")
    # three ts-range slices -> three deterministic micro-batches
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    bounds = [lo, lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3, hi]
    for i in range(3):
        cond = (F.col("ts") >= bounds[i]) & (
            (F.col("ts") < bounds[i + 1]) if i < 2
            else (F.col("ts") <= bounds[3]))
        (ev.filter(cond).drop("ts").coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(stage, f"f{i}")))
    agg = (spark.readStream.schema("user_id bigint, value double")
           .option("maxFilesPerTrigger", 1)
           .option("recursiveFileLookup", "true").parquet(stage)
           .groupBy("user_id")
           .agg(F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("total"))
           .select("user_id", F.struct("n", "total").alias("v")))
    table = tempfile.mkdtemp(prefix="sgs_upsert_state_")
    # state partitions sized to the replay volume, as _run_to_memory
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        q = (agg.writeStream
             .foreachBatch(parquet_upsert_writer(table, "user_id", "v", 4))
             .outputMode("update")
             .option("checkpointLocation",
                     tempfile.mkdtemp(prefix="sgs_ck_"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (spark.read.parquet(table)
            .select("user_id", F.col("v.n").alias("n"),
                    F.col("v.total").cast("double").alias("total")))


@register(
    "stream_ingest_compact",
    """
    SELECT event_type, count(*)::BIGINT AS n,
           count(DISTINCT user_id)::BIGINT AS users
    FROM events GROUP BY event_type""",
    "streaming", "layout", "sources",
)
def stream_ingest_compact(spark, sf_dir):
    """The ingestion path end to end: the events stream lands via
    foreachBatch as batchId-keyed, event_type-partitioned parquet
    (each micro-batch OVERWRITES its own `ingest_batch=<id>` directory,
    so a retried batch after a partial failure replaces — never
    duplicates — its rows: genuinely idempotent re-runs), the landing
    zone is then compacted (sources/layout.py:compact_parquet —
    streaming sinks are THE small-files factory at 100 TB), and the
    compacted zone is read back and aggregated. Oracle = the same
    aggregate over the original table: the whole land→compact→serve
    chain must be lossless."""
    import os
    import tempfile
    from .sources.layout import compact_parquet

    tune(spark)
    land = tempfile.mkdtemp(prefix="sgs_land_")
    serve = tempfile.mkdtemp(prefix="sgs_serve_")
    ckpt = tempfile.mkdtemp(prefix="sgs_ckpt_")
    src = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type")

    def land_batch(batch_df, batch_id):
        # one directory per micro-batch, overwritten on replay — the
        # standard exactly-once landing idiom for object stores
        (batch_df.write.mode("overwrite")
         .partitionBy("event_type")
         .parquet(os.path.join(land, f"ingest_batch={batch_id}")))

    q = (src.writeStream.foreachBatch(land_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    compact_parquet(spark, land, serve)
    return (spark.read.parquet(serve)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.count_distinct("user_id").alias("users")))


@register(
    "weighted_reservoir_sample",
    """
    WITH h AS (
      SELECT lang AS stratum, doc_id,
             -ln((('0x' || substr(md5('wrsv-' || doc_id::VARCHAR), 1, 15))
                  ::BIGINT::DOUBLE + 1.0) / 1152921504606846976.0)
               / n_chars::DOUBLE AS u
      FROM documents),
    r AS (
      SELECT stratum, doc_id,
             row_number() OVER (PARTITION BY stratum
                                ORDER BY u, doc_id) AS rnk
      FROM h)
    SELECT stratum AS lang, doc_id, rnk::BIGINT AS rnk
    FROM r WHERE rnk <= 25""",
    "llm", "sampling",
)
def weighted_reservoir_sample(spark, sf_dir):
    """Length-weighted sampling WITHOUT replacement, exactly 25 docs
    per language (operators/sampling.py:weighted_reservoir —
    Efraimidis–Spirakis exponential clocks on deterministic hashes):
    longer docs proportionally likelier, no duplicates, merge-exact
    across partitions. Complements length_weighted_sample, which is
    with-replacement-style Bernoulli keeps with HT weights; this one
    guarantees the fixed per-stratum budget."""
    from .operators.sampling import weighted_reservoir
    docs = _t(spark, sf_dir, "documents")
    return weighted_reservoir(docs, stratum_col="lang", k=25,
                              id_col="doc_id", weight_col="n_chars")


def _scd2_enrich_sql() -> str:
    return f"""
    WITH dim AS ({REGISTRY["events_scd2_intervals"].oracle}),
    f AS (
      SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, f.us::BIGINT AS us,
           dim.event_type AS dim_event_type, dim.version, dim.is_current
    FROM f JOIN dim USING (user_id)
    WHERE f.us >= dim.valid_from_us
      AND (dim.valid_to_us IS NULL OR f.us < dim.valid_to_us)"""


@register(
    "events_scd2_enrich",
    _scd2_enrich_sql(),
    "llm", "join", "window_functions",
)
def events_scd2_enrich(spark, sf_dir):
    """Point-in-time (temporal) join: each purchase event enriched with
    the SCD2 dimension version active at ITS OWN timestamp —
    valid_from_us <= ts < valid_to_us, open current interval included.
    The lakehouse query every SCD2 build exists to serve.

    Scale shape: equi-join on user_id (both sides already hash that
    key) + interval predicate as a post-join filter — per-user interval
    counts are bounded by runs-per-user, so the join never blows up the
    way a global range join would; no new shuffle beyond the two
    keyed inputs. Every purchase matches exactly one interval
    (intervals tile each user's timeline from their first event)."""
    dim = events_scd2_intervals(spark, sf_dir).select(
        "user_id", F.col("event_type").alias("dim_event_type"),
        "version", "valid_from_us", "valid_to_us", "is_current")
    facts = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"))
    j = facts.join(dim, "user_id").filter(
        (F.col("us") >= F.col("valid_from_us"))
        & (F.col("valid_to_us").isNull()
           | (F.col("us") < F.col("valid_to_us"))))
    return j.select("event_id", "user_id", "us", "dim_event_type",
                    "version", "is_current")



@register(
    "langid_ngram_profiles",
    """
    WITH gr AS (
      SELECT doc_id, lang AS true_lang,
             substring(lower(text), i, 3) AS g
      FROM (SELECT doc_id, lang, text,
                   unnest(generate_series(1, length(text) - 2)) AS i
            FROM documents WHERE length(text) >= 3)),
    dc AS (SELECT doc_id, true_lang, g, count(*) AS c
           FROM gr GROUP BY 1, 2, 3),
    dp AS (SELECT doc_id, true_lang, g, doc_rank FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY c DESC, g) AS doc_rank FROM dc)
           WHERE doc_rank <= 30),
    lc AS (SELECT true_lang AS lang, g, count(*) AS c
           FROM gr GROUP BY 1, 2),
    lp AS (SELECT lang, g, lang_rank FROM (
             SELECT *, row_number() OVER (PARTITION BY lang
                        ORDER BY c DESC, g) AS lang_rank FROM lc)
           WHERE lang_rank <= 100),
    ls AS (SELECT DISTINCT lang FROM lp),
    dist AS (
      SELECT dp.doc_id, dp.true_lang, ls.lang,
             sum(coalesce(abs(dp.doc_rank - lp.lang_rank),
                          100))::BIGINT AS d
      FROM dp CROSS JOIN ls
      LEFT JOIN lp ON lp.lang = ls.lang AND lp.g = dp.g
      GROUP BY 1, 2, 3),
    pred AS (
      SELECT doc_id, lang AS pred_lang FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY d, lang) AS r FROM dist)
      WHERE r = 1)
    SELECT d.lang, p.pred_lang, count(*)::BIGINT AS n_docs
    FROM documents d LEFT JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY 1, 2""",
    "llm", "text",
)
def langid_ngram_profiles(spark, sf_dir):
    """Trained language ID (operators/text.py:langid_ngram_confusion
    — Cavnar & Trenkle 1994 rank profiles): per-lang top-100
    char-3-gram profiles trained from the corpus' own labels, docs
    classified by out-of-place distance from their top-30 profile
    (missing gram = 100), confusion matrix out. All-integer ranks and
    distances; the language profiles broadcast into the scoring join;
    the only corpus-sized shuffles are the (doc, gram) count and the
    per-doc rank window."""
    docs = _t(spark, sf_dir, "documents")
    return text.langid_ngram_confusion(docs)


@register(
    "stream_curation_gate",
    f"""
    SELECT doc_id, n_feats, logweight
    FROM ({_dsir_sql()}) WHERE logweight > 0""",
    "streaming", "llm", "sampling",
)
def stream_curation_gate(spark, sf_dir):
    """Online data curation: documents replayed as a bounded stream
    and scored per-row against a FROZEN DSIR model (trained in batch
    on the same corpus), keeping in-domain-leaning docs
    (logweight > 0). The production pattern for filtering a live
    crawl: the <= 512-row model collects ONCE into a map literal that
    ships inside the task binary, so the streaming query is entirely
    STATELESS and shuffle-free — per-row tokenize, hash, map-lookup
    fold, filter. No stream-side state store, no stream-static join,
    nothing to checkpoint beyond source offsets; at any stream rate
    the cost is pure scan CPU. Oracle = the batch DSIR weights with
    the same gate."""
    import tempfile

    from .operators.sampling import (_dsir_doc_buckets,
                                     dsir_model_from_buckets)
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    fb = _dsir_doc_buckets(docs, F.col("lang") == "de", 512,
                           "text", "doc_id").localCheckpoint(eager=False)
    model = dsir_model_from_buckets(fb, 512).collect()  # <= 512 rows
    # r12: the bucket domain is DENSE [0, 512) — ship the model as a
    # positional array literal probed by element_at(arr, b+1), an O(1)
    # index, instead of a map literal whose GetMapValue is a linear
    # scan of all entries per feature
    du_by_b = {r["b"]: r["du"] for r in model}
    du_arr = F.lit([int(du_by_b.get(b, 0)) for b in range(512)]) \
        .cast("array<bigint>")

    d = tempfile.mkdtemp(prefix="sgs_gate_")
    # r12: parallel staging (the stream_decontaminate_gate fix) — the
    # per-row tokenize/hash/fold is interpreted HOF work, so a 1-file
    # micro-batch ran it on one core; 2 x cores files at cores per
    # trigger keeps the 2-batch replay with a fully parallel scan
    par = spark.sparkContext.defaultParallelism
    (docs.select("doc_id", "text").repartition(2 * par)
     .write.mode("overwrite").parquet(d))
    src = (spark.readStream.schema("doc_id bigint, text string")
           .option("maxFilesPerTrigger", par).parquet(d))
    grams = F.expr(
        "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws)-1), "
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i+1))) "
        "ELSE CAST(array() AS array<string>) END")
    feats = (src
             .select("doc_id",
                     F.expr("regexp_extract_all(lower(text), "
                            "'[a-z0-9]+', 0)").alias("ws"))
             .select("doc_id", F.concat(F.col("ws"), grams).alias("fs")))
    bucket = lambda f: (  # noqa: E731
        F.conv(F.substring(F.md5(f), 1, 15), 16, 10).cast("long") % 512)
    units = F.aggregate(
        "fs", F.lit(0).cast("long"),
        lambda acc, f: acc + F.element_at(
            du_arr, (bucket(f) + 1).cast("int")))
    scored = feats.select(
        "doc_id", F.size("fs").cast("long").alias("n_feats"),
        scalar_fn.units6(units).alias("logweight"))
    out = scored.filter(F.col("logweight") > 0)
    return _run_to_memory(spark, out, "stream_curation_gate_result")


@register(
    "stream_decontaminate_gate",
    r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % 65536 AS b
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 3, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 3), ' ')))
                     AS g
            FROM w)),
    bid AS (SELECT doc_id FROM documents
            WHERE doc_id % 89 = 0 ORDER BY doc_id LIMIT 64),
    bench AS (
      SELECT DISTINCT b FROM sh
      WHERE doc_id IN (SELECT doc_id FROM bid)),
    -- corpus = everything not in the CAPPED bench set: modulo-sampled
    -- docs beyond the 64-doc cap are ordinary corpus and ARE gated
    c AS (SELECT * FROM sh
          WHERE doc_id NOT IN (SELECT doc_id FROM bid)),
    sz AS (SELECT doc_id, count(*)::BIGINT AS n_buckets
           FROM c GROUP BY doc_id),
    ov AS (
      SELECT c.doc_id, count(*)::BIGINT AS n_overlap
      FROM c JOIN bench USING (b) GROUP BY c.doc_id)
    SELECT s.doc_id, s.n_buckets,
           COALESCE(o.n_overlap, 0)::BIGINT AS n_overlap,
           ((2 * COALESCE(o.n_overlap, 0)::BIGINT * 1000000
             + s.n_buckets) // (2 * s.n_buckets)) / 1e6
             AS overlap_frac
    FROM sz s LEFT JOIN ov o USING (doc_id)
    WHERE COALESCE(o.n_overlap, 0) / s.n_buckets::DOUBLE >= 0.25""",
    "streaming", "llm", "decontamination",
)
def stream_decontaminate_gate(spark, sf_dir):
    """Decontamination ON INGEST — the streaming member of the
    decontamination family (bloom_decontaminate /
    decontaminate_overlap / semantic_decontaminate are its batch
    siblings): documents replayed as a bounded stream are flagged
    when >= 25% of their distinct 4-gram hash BUCKETS collide with
    the benchmark's bucket set. The stream_curation_gate contract:
    the eval index is bounded by eval-suite size — ENFORCED by an
    ordered-limit cap of 64 benchmark docs (the ANN query-set
    contract; both driver SFs sit under the cap, so it binds only on
    scaled corpora; uncapped, the replica-dense 10x probe grew the
    map literal past what codegen can fold cheaply; the corpus side
    anti-joins that CAPPED id set, so sampled docs beyond the cap are
    ordinary corpus and still gated) — collects ONCE
    into a map literal that ships inside the task binary, and the
    streaming query stays entirely STATELESS and shuffle-free —
    per-row shingle, bucket, map-probe, fold. Nothing to checkpoint
    beyond source offsets.

    Bucket-level matching is the PREFILTER semantics (deterministic
    md5 buckets, so the oracle reproduces every false positive
    bit-for-bit); a batch exact-confirm downstream is the
    bloom_decontaminate pattern. Threshold 0.25 sits well above the
    occupancy noise floor measured at sf0.1 (median bucket-collision
    frac 0.043, p99 0.16).

    Optimization r12 (results bit-identical, oracle unchanged):
    the bench bucket index is computed from the 64 BENCH docs only
    (semi-join pushed BEFORE the shingle pipeline — the old plan
    shingled and distinct'd the whole corpus just to semi-join 64 ids
    after, a full-corpus waste that grows linearly at scale), and the
    per-element probe is array_intersect against a sorted array
    literal (hash-set membership) instead of element_at on a literal
    map — GetMapValue on an ArrayBasedMapData literal is a LINEAR
    scan per probe, O(|bench buckets|) per gram. Measured at sf0.1:
    scoring 3.2 s -> 1.6 s, index build full-corpus -> 64 docs."""
    import tempfile

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.expr(
        "CASE WHEN size(ws) >= 4 THEN transform(sequence(1, size(ws)-3), "
        "i -> concat_ws(' ', slice(ws, i, 4))) "
        "ELSE CAST(array() AS array<string>) END")
    bucket = lambda g: (  # noqa: E731
        F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        % F.lit(65536))
    # eval suites are FIXED-SIZE in reality — enforce it with the same
    # ordered-limit cap the ANN query sets use, so the shipped index
    # can never grow with the corpus (uncapped, the replica-dense 10x
    # probe ballooned the bench set to ~28k buckets)
    bench_ids = (docs.filter(F.col("doc_id") % 89 == 0)
                 .orderBy("doc_id").limit(64).select("doc_id"))
    bench_buckets = sorted(
        r.b for r in
        docs.join(F.broadcast(bench_ids), "doc_id", "leftsemi")
        .select(words.alias("ws")).select(grams.alias("gs"))
        .select(F.explode("gs").alias("g"))
        .select(bucket(F.col("g")).alias("b"))
        .distinct().collect())
    barr = F.lit([int(b) for b in bench_buckets]).cast("array<bigint>")

    d = tempfile.mkdtemp(prefix="sgs_decon_gate_")
    # corpus = anti-join against the CAPPED bench id set, not the raw
    # modulo predicate: sampled docs beyond the 64-doc cap are
    # ordinary corpus and must still be gated (ADVICE r9).
    # r12: stage 2 x defaultParallelism files and trigger
    # defaultParallelism files per micro-batch — still a 2-micro-batch
    # replay, but each batch's scan is as many TASKS as cores instead
    # of ONE. The per-gram bucket pipeline is a higher-order transform
    # (never codegen'd, interpreted eval), so a 1-file batch ran it on
    # a single core (measured 7 s across the replay at sf0.1; 1.6 s
    # with the parallel staging). On a cluster input splits exceed
    # cores naturally — this makes the local replay match that shape
    # rather than serializing on a staging artifact. The gate is
    # stateless, so emission is identical under any batching.
    par = spark.sparkContext.defaultParallelism
    (docs.join(F.broadcast(bench_ids), "doc_id", "left_anti")
     .select("doc_id", "text").repartition(2 * par)
     .write.mode("overwrite").parquet(d))
    src = (spark.readStream.schema("doc_id bigint, text string")
           .option("maxFilesPerTrigger", par).parquet(d))
    bs = (src.select("doc_id", words.alias("ws"))
          .select("doc_id", grams.alias("gs"))
          .select("doc_id",
                  F.array_distinct(F.expr(
                      "transform(gs, g -> CAST(conv(substring(md5(g), 1,"
                      " 15), 16, 10) AS BIGINT) % 65536)")).alias("bs")))
    n = F.size("bs").cast("long")
    # bs is distinct, so |array_intersect(bs, bench)| IS the distinct
    # overlap count — one hash-set build per row, O(1) per element
    o = F.size(F.array_intersect("bs", barr)).cast("long")
    scored = bs.filter(F.size("bs") > 0).select(
        "doc_id", n.alias("n_buckets"), o.alias("n_overlap"),
        _ratio6(o, n).alias("overlap_frac"))
    out = scored.filter(
        F.col("n_overlap") / F.col("n_buckets").cast("double") >= 0.25)
    return _run_to_memory(spark, out, "stream_decontaminate_gate_result")


@register(
    "decontamination_by_benchmark",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    b AS (
      SELECT vec_id AS bench_id, v AS bv, norm AS bnorm
      FROM n WHERE vec_id % 97 = 3 ORDER BY vec_id LIMIT 64),
    c AS (SELECT * FROM n
          WHERE vec_id NOT IN (SELECT bench_id FROM b)),
    s AS (
      SELECT b.bench_id, c.vec_id,
             list_dot_product(c.v, b.bv) / (c.norm * b.bnorm) AS cos
      FROM c CROSS JOIN b
      WHERE list_dot_product(c.v, b.bv) / (c.norm * b.bnorm) >= 0.35),
    agg AS (
      SELECT bench_id, count(*)::BIGINT AS n_contaminated,
             round(max(cos), 6) AS max_cosine
      FROM s GROUP BY bench_id),
    worst AS (
      SELECT bench_id, vec_id AS worst_vec_id FROM (
        SELECT bench_id, vec_id,
               row_number() OVER (PARTITION BY bench_id
                                  ORDER BY cos DESC, vec_id) AS r
        FROM s) WHERE r = 1)
    SELECT b.bench_id,
           coalesce(agg.n_contaminated, 0)::BIGINT AS n_contaminated,
           agg.max_cosine,
           worst.worst_vec_id
    FROM b LEFT JOIN agg USING (bench_id)
           LEFT JOIN worst USING (bench_id)""",
    "llm", "similarity", "decontamination", "diagnostics",
)
def decontamination_by_benchmark(spark, sf_dir):
    """Decontamination ATTRIBUTION — the per-eval-item view of the
    embedding decontamination pass (semantic_decontaminate answers
    "which corpus docs are contaminated?"; this answers "which
    BENCHMARK items leaked, how badly, and what is the worst
    offending doc?" — the report an eval team reads to decide which
    eval items to retire). Per capped benchmark vector: the count of
    corpus vectors above the cosine threshold, the max cosine, and
    the worst offender's id (ties to the smallest id); benches with
    no hit report 0/NULL so the row set is always the full capped
    bench. One corpus x |bench| broadcast scan — same linear shape
    as the per-doc pass, aggregated the other way."""
    from .operators.similarity import cosine, with_norm

    emb = _t(spark, sf_dir, "embeddings")
    base = with_norm(emb).select("vec_id", "v", "norm")
    bench = (base.filter(F.col("vec_id") % 97 == 3)
             .orderBy("vec_id").limit(64)
             .select(F.col("vec_id").alias("bench_id"),
                     F.col("v").alias("bv"), F.col("norm").alias("bnorm")))
    corpus = base.join(
        F.broadcast(bench.select(F.col("bench_id").alias("vec_id"))),
        "vec_id", "left_anti")
    s = (corpus.crossJoin(F.broadcast(bench))
         .withColumn("cos", cosine(F.col("v"), F.col("bv"),
                                   F.col("norm"), F.col("bnorm")))
         .filter(F.col("cos") >= 0.35)
         .select("bench_id", "vec_id", "cos"))
    agg = s.groupBy("bench_id").agg(
        F.count("*").cast("long").alias("n_contaminated"),
        F.round(F.max("cos"), 6).alias("max_cosine"),
        # max of (cos, -vec_id): highest cosine, ties -> smallest id
        (-F.max(F.struct(F.col("cos"),
                         (-F.col("vec_id")).alias("nv"))).getField("nv"))
        .cast("long").alias("worst_vec_id"))
    return (bench.select("bench_id").join(agg, "bench_id", "left")
            .select("bench_id",
                    F.coalesce("n_contaminated", F.lit(0)).cast("long")
                    .alias("n_contaminated"),
                    "max_cosine", "worst_vec_id"))


@register(
    "stream_semantic_decon_gate",
    # oracle = the batch twin's SQL verbatim: the stream gate scores
    # the same capped-bench/anti-joined corpus, so batch and stream
    # must hash-match
    REGISTRY["semantic_decontaminate"].oracle,
    "streaming", "llm", "decontamination", "similarity",
)
def stream_semantic_decon_gate(spark, sf_dir):
    """Embedding-level decontamination ON INGEST — the paraphrase
    member of the streaming gate family (stream_decontaminate_gate
    catches verbatim n-gram leaks; reworded eval items share no
    4-gram but still sit next to the original in embedding space).
    The embeddings table replays as a bounded stream and every
    incoming vector is scored against the CAPPED benchmark set
    (vec_id % 97 == 3, ordered-limit 64 — the ANN query-set
    contract; the staged corpus anti-joins those capped ids, so
    sampled vectors beyond the cap are ordinary corpus and still
    gated) by the same vectorized bit-exact kernel as the batch twin
    (similarity.py:nearest_ref_vec, dimension-sequential fold-order
    accumulation): the whole gate is STATELESS — per-batch Arrow
    argmax against a driver-collected 64-row reference, no joins, no
    state store; nothing to checkpoint beyond source offsets. Flags
    rows whose best benchmark cosine clears 0.35; oracle = the batch
    semantic_decontaminate SQL, so streaming and batch results are
    hash-identical."""
    import tempfile

    from .operators.similarity import nearest_ref_vec, with_norm

    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    base = with_norm(emb).select("vec_id", "v", "norm")
    bench = (base.filter(F.col("vec_id") % 97 == 3)
             .orderBy("vec_id").limit(64)
             .select(F.col("vec_id").alias("bench_id"),
                     F.col("v").alias("bv"), F.col("norm").alias("bnorm")))
    d = tempfile.mkdtemp(prefix="sgs_sem_gate_")
    (emb.join(F.broadcast(bench.select(F.col("bench_id").alias("vec_id"))),
              "vec_id", "left_anti")
     .select("vec_id", "embedding").repartition(8)
     .write.mode("overwrite").parquet(d))
    # r12: 8 staged files, 4 per trigger — still a multi-micro-batch
    # replay, but each batch's Arrow kernel runs on 4 tasks instead of
    # serializing on one (measured 3.6 -> 2.2 s; 32 tiny files was
    # WORSE — per-task Arrow overhead dominates under ~100 rows).
    src = (spark.readStream.schema("vec_id bigint, embedding array<float>")
           .option("maxFilesPerTrigger", 4).parquet(d))
    sbase = with_norm(src).select("vec_id", "v", "norm")
    best = nearest_ref_vec(sbase, bench, ref_id_col="bench_id",
                           ref_vec_col="bv", ref_norm_col="bnorm")
    out = (best.filter(F.col("ccos") >= 0.35)
           .select("vec_id", "bench_id",
                   F.round("ccos", 6).alias("cosine")))
    return _run_to_memory(spark, out, "stream_semantic_decon_gate_result")


@register(
    "stream_embedding_outlier_gate",
    # oracle = the batch outlier screen's SQL verbatim: gating the
    # replayed corpus against stats frozen FROM that corpus must
    # reproduce the batch flag set exactly
    REGISTRY["embedding_outliers"].oracle,
    "streaming", "llm", "similarity", "quality",
)
def stream_embedding_outlier_gate(spark, sf_dir):
    """Corrupt-vector screening ON INGEST — the streaming member of
    the embedding-quality family (embedding_outliers is its batch
    twin): a batch pass freezes per-cell statistics (occupancy n,
    integer milli-cosine sums s and q — the same once-quantized
    integers as the batch z-test), then the embeddings table replays
    as a bounded stream and every incoming vector is assigned by the
    vectorized bit-exact kernel (nearest_ref_vec) and z-tested
    against the FROZEN stats of its cell via a stream-static join —
    the production shape for poisoning/corruption screening of a
    live embedding feed against a trusted reference distribution.
    Fully STATELESS: per-batch Arrow assignment + a broadcastable
    #cells-sized static join; offsets-only checkpoint. Because the
    frozen stats come from the same corpus being replayed, the
    flagged set is BIT-IDENTICAL to the batch screen — the oracle is
    embedding_outliers' SQL verbatim, and the same pure-integer
    cross-multiplication decides the flag on every engine."""
    import tempfile

    from .operators.similarity import (
        nearest_ref_vec,
        sampled_centroids,
        with_norm,
    )

    tune(spark)
    z, min_cell = 3, 8
    emb = load_table(spark, sf_dir, "embeddings")
    base = with_norm(emb).select("vec_id", "v", "norm")
    cents = sampled_centroids(base, 23, "vec_id")
    # freeze per-cell integer stats from the trusted batch pass
    u = nearest_ref_vec(base, cents, "vec_id").select(
        "vec_id", "cent_id",
        F.round(F.col("ccos") * 1000).cast("long").alias("x"))
    st = (u.groupBy("cent_id")
          .agg(F.count("*").cast("long").alias("n"),
               F.sum("x").cast("decimal(38,0)").alias("s"),
               F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)")
               .alias("q"))
          # lazy: the first micro-batch's stream-static join
          # materializes the frozen stats once; later batches read
          # the persisted blocks (r12 job-fold)
          .localCheckpoint(eager=False))

    d = tempfile.mkdtemp(prefix="sgs_outlier_gate_")
    # r12: same parallel staging as stream_semantic_decon_gate (8
    # files, 4 per trigger: 2 batches x 4 kernel tasks)
    emb.select("vec_id", "embedding").repartition(8) \
       .write.mode("overwrite").parquet(d)
    src = (spark.readStream.schema("vec_id bigint, embedding array<float>")
           .option("maxFilesPerTrigger", 4).parquet(d))
    sbase = with_norm(src).select("vec_id", "v", "norm")
    su = nearest_ref_vec(sbase, cents, "vec_id").select(
        "vec_id", "cent_id",
        F.round(F.col("ccos") * 1000).cast("long").alias("x"))
    j = su.join(st, "cent_id")          # stream-static, #cells-sized
    nd = F.col("n").cast("decimal(38,0)")
    dlt = nd * F.col("x").cast("decimal(38,0)") - F.col("s")
    lhs = dlt * dlt
    rhs = F.lit(z * z) * (nd * F.col("q") - F.col("s") * F.col("s"))
    out = (j.filter((F.col("n") >= min_cell) & (lhs > rhs))
           .select("vec_id", F.col("cent_id").alias("cell"),
                   F.col("x").alias("ccos_milli"),
                   F.col("n").alias("cell_n")))
    return _run_to_memory(spark, out,
                          "stream_embedding_outlier_gate_result")


@register(
    "stream_trending_tokens",
    """
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM documents),
    c AS (SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token)
    SELECT token, cnt FROM (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM c) WHERE rnk <= 20""",
    "streaming", "llm", "text",
)
def stream_trending_tokens(spark, sf_dir):
    """Trending terms as REAL streaming state: the documents table
    replayed as a bounded stream, tokens exploded JVM-side, counts
    maintained in complete-mode state across micro-batches, top-20
    taken from the final materialized state (deterministic tie-break
    on token). The streaming shape of vocabulary monitoring — state is
    vocab-sized, not corpus-sized, and the oracle is the batch term
    frequency query."""
    import tempfile

    tune(spark)
    d = tempfile.mkdtemp(prefix="sgs_trend_")
    (load_table(spark, sf_dir, "documents").select("doc_id", "text")
     .repartition(4).write.mode("overwrite").parquet(d))
    src = (spark.readStream.schema("doc_id bigint, text string")
           .option("maxFilesPerTrigger", 1).parquet(d))
    toks = src.select(F.explode(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    state = _run_to_memory(spark, counts, "stream_trending_tokens_result",
                           mode="complete")
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return (state.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 20).select("token", "cnt"))


@register(
    "key_skew_report",
    """
    WITH k AS (
      SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY user_id),
    s AS (
      SELECT count(*)::BIGINT AS n_keys, sum(n)::BIGINT AS total,
             max(n)::BIGINT AS max_n,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS BIGINT)
               AS p50,
             CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n) AS BIGINT)
               AS p99
      FROM k)
    SELECT n_keys, total, p50, p99, max_n,
           ((2 * max_n * n_keys * 1000000 + total) // (2 * total)) / 1e6
             AS max_over_mean
    FROM s""",
    "llm", "skew", "diagnostics",
)
def key_skew_report(spark, sf_dir):
    """Shuffle-key skew diagnostics — the report to run BEFORE picking
    a join/agg strategy at 100 TB: per-key count distribution (p50,
    p99, max) and the hot-key ratio max/mean. A max_over_mean in the
    hundreds says salting or AQE skew-join is mandatory; ~1 says plain
    hash partitioning is fine. One groupBy on the key, then percentile
    over the key-sized rollup (never the fact table)."""
    ev = _t(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    s = k.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("max_n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
         .cast("long").alias("p50"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY n)")
         .cast("long").alias("p99"))
    return s.select(
        "n_keys", "total", "p50", "p99", "max_n",
        # max/mean = max_n*n_keys/total: count rational (r13 tie class)
        _ratio6(F.col("max_n") * F.col("n_keys"), F.col("total"))
        .alias("max_over_mean"))


@register(
    "partition_backfill",
    """
    SELECT event_id, user_id, event_type,
           CASE WHEN event_type = 'error' THEN value * 2.0 ELSE value END
             AS value
    FROM events""",
    "layout", "sources",
)
def partition_backfill(spark, sf_dir):
    """Idempotent single-partition backfill (the daily re-land):
    events staged partitioned by event_type, then ONE partition
    re-written with corrected values under dynamic partition overwrite
    — `INSERT OVERWRITE` semantics that replace only the partitions
    present in the write, leaving every other partition's files
    untouched (static overwrite mode would wipe the table). The oracle
    is the corrected full table: the backfill must be surgical AND
    lossless. At 100 TB this is how a bad day of data gets fixed
    without rewriting the year."""
    import tempfile

    tune(spark)
    d = tempfile.mkdtemp(prefix="sgs_backfill_")
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(d)

    corrected = (ev.filter(F.col("event_type") == "error")
                 .withColumn("value", F.col("value") * 2.0))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (corrected.write.partitionBy("event_type")
         .mode("overwrite").parquet(d))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (spark.read.parquet(d)
            .select("event_id", "user_id", "event_type", "value"))


@register(
    "cdc_snapshot_merge",
    """
    WITH snap AS (
      SELECT user_id, value, us FROM (
        SELECT user_id, value, epoch_us(ts) AS us,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id < 5000) WHERE rn = 1),
    chg AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'delete'
                  ELSE 'upsert' END AS op,
             value, epoch_us(ts) AS us, event_id
      FROM events WHERE event_id >= 5000),
    latest AS (
      SELECT user_id, op, value, us FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY us DESC, event_id DESC) AS rn
        FROM chg) WHERE rn = 1)
    SELECT user_id, value, us::BIGINT AS us FROM snap
    WHERE user_id NOT IN (SELECT user_id FROM latest)
    UNION ALL
    SELECT user_id, value, us::BIGINT AS us FROM latest
    WHERE op = 'upsert'""",
    "llm", "cdc",
)
def cdc_snapshot_merge(spark, sf_dir):
    """MERGE INTO semantics without a table format (operators/cdc.py:
    apply_changelog): the first half of the event log collapses to a
    latest-value-per-user snapshot, the second half replays as a CDC
    changelog (errors = deletes, rest = upserts), last-write-wins per
    key. One window over the changelog + one broadcast anti-join
    against the snapshot — the 100 TB snapshot side never shuffles.
    The generic form of minhash_delta's signature maintenance."""
    from .operators.cdc import apply_changelog
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc())
    snap = (ev.filter(F.col("event_id") < 5000)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "value", "us"))
    chg = (ev.filter(F.col("event_id") >= 5000)
           .select("user_id",
                   F.when(F.col("event_type") == "error", "delete")
                    .otherwise("upsert").alias("op"),
                   "value", "us", "event_id"))
    return apply_changelog(snap, chg, key="user_id",
                           order_cols=["us", "event_id"])


# ======================================================================
# Round 3 additions: retrieval scoring, bloom pruning, budget selection
# ======================================================================

@register(
    "bm25_topk",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    stats AS (
      SELECT count(*)::DOUBLE AS N, avg(len(words))::DOUBLE AS avgdl FROM w),
    tok AS (
      SELECT doc_id, len(words)::BIGINT AS dl, unnest(words) AS term FROM w),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
      FROM tok WHERE term IN ('spark', 'join', 'window')
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    scored AS (
      SELECT t.doc_id,
             ln(1.0 + (s.N - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.5)
               / (t.tf + 1.5 * (1 - 0.75 + 0.75 * t.dl / s.avgdl)) AS c
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s)
    SELECT doc_id, round(sum(c), 6) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 20""",
    "llm", "text", "retrieval",
)
def bm25_topk(spark, sf_dir):
    """BM25 top-20 documents for a fixed query-term set (k1=1.5,
    b=0.75 — dyadic constants so float arithmetic is engine-exact).
    Term filter lands right after the explode; doc length rides with
    the tokens (no corpus-sized dl join); N/avgdl broadcast as a 1-row
    scalar; top-k is TakeOrderedAndProject, never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    return text.bm25_topk(docs, ["spark", "join", "window"],
                          k1=1.5, b=0.75, topk=20)


@register(
    "wav_frame_features",
    """
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 97 AS n FROM documents),
    i AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    s AS (
      SELECT doc_id, n, i, i // 16 AS frame_idx,
             ((doc_id * 31 + i * 17) % 4001) - 2000 AS v,
             CASE WHEN (i + 1) % 16 != 0 AND i + 1 < n
                  THEN ((doc_id * 31 + (i + 1) * 17) % 4001) - 2000
             END AS nxt
      FROM i)
    SELECT doc_id, frame_idx::BIGINT AS frame_idx,
           count(*)::BIGINT AS n_in_frame,
           sum(CASE WHEN nxt IS NOT NULL
                    AND ((v >= 0) != (nxt >= 0)) THEN 1
                    ELSE 0 END)::BIGINT AS zero_crossings,
           sum(abs(v))::BIGINT AS abs_sum
    FROM s GROUP BY 1, 2""",
    "llm", "multimodal",
)
def wav_frame_features(spark, sf_dir):
    """Frame-level ZCR/energy over TRULY DECODED PCM
    (multimodal.py:wav_frame_features): 16-sample frames, per-frame
    zero-crossing count (sign flips within the frame) and integer
    absolute-amplitude sum — the codec-free voice-activity/silence
    screen, executed on real decoded samples. The oracle recomputes
    every frame from the closed-form sample function with the same
    within-frame neighbor rule; all-integer arithmetic, so the match
    is exact."""
    docs = _t(spark, sf_dir, "documents")
    return multimodal.wav_frame_features(
        multimodal.wav_media_table(docs), frame=16)


@register(
    "hybrid_retrieval_rrf",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    stats AS (
      SELECT count(*)::DOUBLE AS N, avg(len(words))::DOUBLE AS avgdl FROM w),
    tok AS (
      SELECT doc_id, len(words)::BIGINT AS dl, unnest(words) AS term FROM w),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf, min(dl) AS dl
      FROM tok WHERE term IN ('spark', 'join', 'window')
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    scored AS (
      SELECT t.doc_id,
             ln(1.0 + (s.N - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.5)
               / (t.tf + 1.5 * (1 - 0.75 + 0.75 * t.dl / s.avgdl)) AS c
      FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s),
    lex20 AS (
      SELECT doc_id, round(sum(c), 6) AS bm25
      FROM scored GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id LIMIT 20),
    lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
      FROM lex20),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    q AS (SELECT v AS qv, norm AS qnorm FROM n WHERE vec_id = 0),
    sem0 AS (
      SELECT vec_id AS doc_id,
             list_dot_product(qv, v) / (qnorm * norm) AS cos
      FROM n, q WHERE vec_id != 0),
    sem20 AS (
      SELECT doc_id, cos FROM sem0 ORDER BY cos DESC, doc_id LIMIT 20),
    sem AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
      FROM sem20),
    fused AS (
      SELECT doc_id, l.lex_rank::BIGINT AS lex_rank,
             s.sem_rank::BIGINT AS sem_rank,
             round(coalesce(1.0 / (60 + l.lex_rank), 0)
                   + coalesce(1.0 / (60 + s.sem_rank), 0), 6) AS rrf
      FROM lex l FULL OUTER JOIN sem s USING (doc_id))
    SELECT doc_id, lex_rank, sem_rank, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""",
    "llm", "retrieval", "similarity",
)
def hybrid_retrieval_rrf(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion — the RAG-pipeline
    op that merges a LEXICAL ranking (BM25 top-20 for the fixed term
    set, text.py:bm25_topk) with a SEMANTIC ranking (exact cosine
    top-20 against doc 0's embedding as the query) via
    RRF(d) = sum over lists of 1/(60 + rank_d). Scale shape: each
    side is one corpus scan ending in TakeOrderedAndProject (never a
    global sort); rank windows run over the 20 fused candidates only;
    the fusion join touches <= 40 rows. Ranks use unique (score,
    doc_id) tie-breaks so both engines derive identical lists; the
    6-dp rounding happens on scores AND on the fused RRF, keeping the
    float surface engine-exact as in bm25_topk/ann_topk_bruteforce."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex20 = text.bm25_topk(docs, ["spark", "join", "window"],
                           k1=1.5, b=0.75, topk=20)
    lex = (lex20.withColumn(
        "lex_rank",
        F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")))
        .select("doc_id", "lex_rank"))
    base = similarity.with_norm(emb)
    qv = (base.filter(F.col("vec_id") == 0)
          .select(F.col("v").alias("qv"), F.col("norm").alias("qnorm")))
    sem0 = (base.crossJoin(F.broadcast(qv))
            .filter(F.col("vec_id") != 0)
            .select(F.col("vec_id").alias("doc_id"),
                    similarity.cosine(F.col("qv"), F.col("v"),
                                      F.col("qnorm"), F.col("norm"))
                    .alias("cos")))
    sem20 = sem0.orderBy(F.col("cos").desc(), "doc_id").limit(20)
    sem = (sem20.withColumn(
        "sem_rank",
        F.row_number().over(Window.orderBy(F.col("cos").desc(), "doc_id")))
        .select("doc_id", "sem_rank"))
    fused = (lex.join(sem, "doc_id", "full")
             .select(
                 "doc_id",
                 F.col("lex_rank").cast("bigint").alias("lex_rank"),
                 F.col("sem_rank").cast("bigint").alias("sem_rank"),
                 F.round(
                     F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")),
                                F.lit(0.0))
                     + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("sem_rank")),
                                  F.lit(0.0)), 6).alias("rrf")))
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)


def _rerank_cross_encoder_sql() -> str:
    hybrid = REGISTRY["hybrid_retrieval_rrf"].oracle
    return rf"""
    WITH cand AS MATERIALIZED (SELECT doc_id, rrf FROM ({hybrid})),
    scored AS (
      SELECT d.doc_id, c.rrf,
             ((2 * len(list_intersect(
                     list_distinct(string_split_regex(trim(d.text), '\s+')),
                     ['spark', 'join', 'window']))::BIGINT * 1000000
               + len(list_distinct(list_concat(
                     list_distinct(string_split_regex(trim(d.text), '\s+')),
                     ['spark', 'join', 'window']))))
              // (2 * len(list_distinct(list_concat(
                     list_distinct(string_split_regex(trim(d.text), '\s+')),
                     ['spark', 'join', 'window'])))::BIGINT)) / 1e6
               AS ce_score
      FROM documents d JOIN cand c USING (doc_id)),
    fin AS (
      SELECT doc_id, rrf, ce_score,
             round(ce_score + 0.05 * rrf, 6) AS final_score
      FROM scored)
    SELECT doc_id, rrf, ce_score, final_score,
           row_number() OVER (ORDER BY final_score DESC, doc_id)::BIGINT
             AS rerank
    FROM fin"""


@register(
    "rerank_cross_encoder",
    _rerank_cross_encoder_sql(),
    "llm", "retrieval", "rerank",
)
def rerank_cross_encoder(spark, sf_dir):
    """Retrieve-then-rerank (operators/similarity.py:
    rerank_cross_encoder): the hybrid RRF retriever's top-10 becomes
    a BROADCAST candidate set whose texts are fetched in one corpus
    scan with a broadcast hash-filter — the expensive pair scorer
    then runs on k rows, never a corpus-sized pair join. The scorer
    is the model slot (production: a batched cross-encoder pandas
    UDF); the stub scores Jaccard(query terms, doc tokens) in
    closed form so the oracle re-derives the entire two-stage
    pipeline — retrieval ranks, candidate set, scores, and the final
    reranking — and any plumbing drift hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    cand = (hybrid_retrieval_rrf(spark, sf_dir)
            .select("doc_id", "rrf"))
    return similarity.rerank_cross_encoder(
        docs, cand, ["spark", "join", "window"], rrf_weight=0.05)


@register(
    "bloom_decontaminate",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT AS shingle
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 3, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 3), ' ')))
                     AS g
            FROM w)),
    sz AS (SELECT doc_id, count(*)::BIGINT AS n_shingles
           FROM sh GROUP BY doc_id),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 89 = 0),
    ov AS (
      SELECT c.doc_id, count(*)::BIGINT AS n_overlap
      FROM (SELECT * FROM sh WHERE doc_id % 89 <> 0) c
      JOIN bench b USING (shingle)
      GROUP BY c.doc_id)
    SELECT o.doc_id, s.n_shingles, o.n_overlap,
           ((2 * o.n_overlap * 1000000 + s.n_shingles)
            // (2 * s.n_shingles::BIGINT)) / 1e6 AS overlap_frac,
           (o.n_overlap / s.n_shingles::DOUBLE >= 0.05) AS contaminated
    FROM ov o JOIN sz s USING (doc_id)""",
    "llm", "dedup", "decontamination", "bloom",
)
def bloom_decontaminate(spark, sf_dir):
    """Decontamination via a distributed Bloom prefilter
    (operators/bloom.py): the benchmark 4-gram set becomes a 16 KiB
    broadcast bitmap; corpus shingles are bloom-probed (Arrow-batched
    numpy bit tests) BEFORE any join, then exact-confirmed with a
    broadcast semi join — the same pattern as Spark's runtime
    row-level filtering, made explicit. Result is bit-identical to
    the plain exact overlap (the oracle), so false positives cost
    only work, never correctness."""
    from .operators.bloom import bloom_benchmark_overlap
    docs = _t(spark, sf_dir, "documents")
    bench_docs = docs.filter(F.col("doc_id") % 89 == 0)
    corpus = docs.filter(F.col("doc_id") % 89 != 0)
    return bloom_benchmark_overlap(corpus, bench_docs, n=4,
                                   frac_threshold=0.05)


@register(
    "corpus_budget_selection",
    f"""
    WITH q AS ({_quality_sql()}),
    s AS (
      SELECT doc_id, n_words, quality_score,
             sum(n_words) OVER (
               ORDER BY quality_score DESC, n_words ASC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM q)
    SELECT doc_id, n_words::BIGINT AS n_words, quality_score
    FROM s WHERE cum <= 10000""",
    "llm", "sampling", "selection",
)
def corpus_budget_selection(spark, sf_dir):
    """Token-budgeted corpus selection: greedy prefix by (quality
    desc, length asc, doc_id) until 10k tokens are spent — the
    'best docs under a budget' curriculum cut. NOT a global window:
    operators/selection.py resolves the cut two-phase (tiny bucket
    histogram -> wholesale keep/drop -> exact cumsum only inside the
    single cutoff bucket), so at 100 TB no single-partition ordering
    ever happens. Integer weights end-to-end, so the budget arithmetic
    is exact in both engines."""
    from .operators.selection import budget_prefix_select
    docs = _t(spark, sf_dir, "documents")
    q = text.quality_score(docs).select(
        "doc_id", F.col("n_words").cast("bigint").alias("n_words"),
        "quality_score")
    q4 = (F.col("quality_score") * 4).cast("int")
    bucket = ((F.lit(4) - q4) * 1024
              + F.least((F.col("n_words") / 16).cast("int"), F.lit(1023)))
    df = q.withColumn("__bucket", bucket)
    sel = budget_prefix_select(
        df, "__bucket", "n_words", 10_000,
        order_cols=[F.col("n_words").asc(), F.col("doc_id").asc()])
    return sel.select("doc_id", "n_words", "quality_score")


@register(
    "zorder_clustered_scan",
    """
    SELECT event_id, user_id, event_type, value FROM events
    WHERE user_id BETWEEN 40 AND 60
      AND value BETWEEN 100.0 AND 200.0""",
    "layout", "storage",
)
def zorder_clustered_scan(spark, sf_dir):
    """Z-order (Morton-curve) data layout: rewrite events clustered on
    the interleaved (user_id, value) key, then run a two-sided range
    scan over the copy. Every output file is a tight hyper-rectangle
    in (user_id, value) space, so parquet min/max stats prune the 2-D
    box down to a handful of files — a 1-D sort can only prune its
    leading column (quantified in tests/test_layout.py). At 100 TB the
    rewrite is one range-repartition paid at write time; the scan-side
    win repeats on every query. sources/layout.py:write_zordered."""
    import tempfile
    from .sources.layout import write_zordered
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    d = tempfile.mkdtemp(prefix="sgs_zorder_")
    write_zordered(ev, d, ["user_id", "value"], bits=8, n_files=32)
    return (spark.read.parquet(d)
            .filter(F.col("user_id").between(40, 60)
                    & F.col("value").between(100.0, 200.0)))


@register(
    "snapshot_diff_changelog",
    """
    WITH snap AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id < 5000) WHERE rn = 1),
    snap2 AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1)
    SELECT coalesce(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'insert'
                WHEN n.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           o.value AS old_value, n.value AS new_value
    FROM snap o FULL OUTER JOIN snap2 n USING (user_id)
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.value IS DISTINCT FROM n.value""",
    "llm", "cdc",
)
def snapshot_diff_changelog(spark, sf_dir):
    """Derive an incremental changelog from two full snapshots — the
    inverse of cdc_snapshot_merge, for sources with no CDC feed. One
    full-outer join on the key (the information-theoretic minimum for
    a diff of unsorted tables); round-trips through apply_changelog
    (tested). operators/cdc.py:snapshot_diff."""
    from .operators.cdc import snapshot_diff
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc())

    def latest(d):
        return (d.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1).select("user_id", "value"))

    old = latest(ev.filter(F.col("event_id") < 5000))
    new = latest(ev)
    return snapshot_diff(old, new, "user_id", ["value"])


@register(
    "corpus_shuffle_shards",
    """
    WITH k AS (
      SELECT doc_id, md5(doc_id::VARCHAR || 'r3') AS key FROM documents),
    s AS (
      SELECT doc_id, key,
             ('0x' || substr(key, 1, 15))::BIGINT % 64 AS shard FROM k)
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard
                              ORDER BY key, doc_id)::BIGINT AS pos
    FROM s""",
    "llm", "sampling", "shuffle",
)
def corpus_shuffle_shards(spark, sf_dir):
    """Deterministic global corpus shuffle into 64 training shards
    (doc_id, shard, pos): md5-keyed pseudorandom total order — stable
    under retries and engine choice, reshuffled per epoch by rotating
    the seed. Terasort shape: one hash shuffle + per-shard local sort,
    n_shards sized so each shard sorts in one task.
    operators/sampling.py:shuffle_shards."""
    from .operators.sampling import shuffle_shards
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(docs, "doc_id", n_shards=64, seed="r3")


@register(
    "substring_dup_stats",
    """
    WITH d AS (
      SELECT doc_id, text, length(text)::BIGINT AS n FROM documents
      WHERE length(text) >= 30),
    p AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, n - 29 + 1),
               i -> ('0x' || substr(md5(substr(text, i::INT, 30)), 1, 15))::BIGINT))
               AS g
      FROM d),
    c AS (SELECT g FROM p GROUP BY g HAVING count(*) >= 2),
    dup AS (
      SELECT p.doc_id, count(*)::BIGINT AS n_dup
      FROM p JOIN c USING (g) GROUP BY p.doc_id)
    SELECT d.doc_id, (d.n - 29)::BIGINT AS n_positions,
           coalesce(dup.n_dup, 0)::BIGINT AS n_dup,
           ((2 * coalesce(dup.n_dup, 0)::BIGINT * 1000000 + (d.n - 29))
            // (2 * (d.n - 29))) / 1e6 AS dup_frac
    FROM d LEFT JOIN dup USING (doc_id)""",
    "llm", "dedup", "text",
)
def substring_dup_stats(spark, sf_dir):
    """ExactSubstr-style duplicated-substring fraction per document:
    every 30-char window is hashed in place (the explode ships 8-byte
    longs, never substrings); a window is duplicated if its hash
    occurs twice anywhere in the corpus. Catches boilerplate that
    crosses token/sentence boundaries — the char-level complement of
    shared_passages. operators/dedup.py:substring_dup_stats."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.substring_dup_stats(docs, L=30)


_CMS_PROBES = "'data','table','query','spark','the','value','row','join','window','scan'"


@register(
    "token_cms_counts",
    f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents),
    x AS (SELECT term,
                 ('0x' || substr(md5(term), 1, 15))::BIGINT % 2147483647 AS x
          FROM tok),
    cells AS (
      SELECT i, pos, count(*)::BIGINT AS c FROM (
        SELECT 0 AS i, ((506952114 * x + 17) % 2147483647) % 512 AS pos FROM x
        UNION ALL
        SELECT 1, ((1520856342 * x + 40520) % 2147483647) % 512 FROM x
        UNION ALL
        SELECT 2, ((387276923 * x + 81023) % 2147483647) % 512 FROM x
        UNION ALL
        SELECT 3, ((1401181151 * x + 121526) % 2147483647) % 512 FROM x)
      GROUP BY i, pos),
    n AS (SELECT count(*)::DOUBLE AS N FROM tok),
    probes AS (SELECT unnest([{_CMS_PROBES}]) AS term),
    px AS (SELECT term,
                  ('0x' || substr(md5(term), 1, 15))::BIGINT % 2147483647 AS x
           FROM probes),
    pc AS (
      SELECT term, i, pos FROM (
        SELECT term, 0 AS i,
               ((506952114 * x + 17) % 2147483647) % 512 AS pos FROM px
        UNION ALL
        SELECT term, 1, ((1520856342 * x + 40520) % 2147483647) % 512 FROM px
        UNION ALL
        SELECT term, 2, ((387276923 * x + 81023) % 2147483647) % 512 FROM px
        UNION ALL
        SELECT term, 3, ((1401181151 * x + 121526) % 2147483647) % 512 FROM px)),
    est AS (
      SELECT pc.term, min(coalesce(c.c, 0))::BIGINT AS cms_est
      FROM pc LEFT JOIN cells c USING (i, pos) GROUP BY pc.term),
    exact AS (
      SELECT term, count(*)::BIGINT AS exact_cnt FROM tok
      WHERE term IN ({_CMS_PROBES}) GROUP BY term)
    SELECT e.term, coalesce(x2.exact_cnt, 0)::BIGINT AS exact_cnt,
           e.cms_est,
           (e.cms_est >= coalesce(x2.exact_cnt, 0)
            AND (e.cms_est - coalesce(x2.exact_cnt, 0))
                <= 2.0 * n.N / 512) AS within_bound
    FROM est e LEFT JOIN exact x2 USING (term) CROSS JOIN n""",
    "llm", "sketch",
)
def token_cms_counts(spark, sf_dir):
    """Count-min sketch point counts for a probe-term set, as PURE
    DataFrame ops: the sketch is a d x w = 4 x 512 cell aggregate
    (shuffle volume 2048 rows regardless of corpus size — the additive
    counterpart of the HLL partials), the estimate is min over rows.
    Deterministic universal hashes shared with the oracle, so the
    estimates hash-match exactly AND carry the analytic
    one-sided-error bound as a checked column.
    operators/sketches.py:cms_counts."""
    from .operators.sketches import cms_counts
    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
    probes = ["data", "table", "query", "spark", "the", "value", "row",
              "join", "window", "scan"]
    return cms_counts(tokens, "term", probes, d=4, w=512)


@register(
    "dataset_manifest",
    """
    SELECT source, lang, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS n_chars,
           bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS checksum
    FROM documents GROUP BY source, lang""",
    "llm", "quality", "layout",
)
def dataset_manifest(spark, sf_dir):
    """Partition-level dataset manifest: per (source, lang) cell, row
    count, char mass, and an ORDER-INDEPENDENT content checksum
    (bit_xor of 60-bit text hashes — commutative, overflow-free, and
    mergeable, so incremental producers can maintain it per batch).
    The manifest is what snapshot_diff-style sync and data_quality
    gates compare instead of re-reading 100 TB: one map-side-combined
    groupBy over a two-column projection."""
    docs = _t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")
    return (docs.select("source", "lang", "n_chars", h.alias("h"))
            .groupBy("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("n_chars"),
                 F.expr("bit_xor(h)").alias("checksum")))


@register(
    "pipeline_curation_v2",
    f"""
    WITH q AS ({_quality_sql()}),
    good AS (
      SELECT d.doc_id, d.text, q.n_words, q.quality_score
      FROM documents d JOIN q USING (doc_id)
      WHERE q.quality_score >= 0.75 AND d.doc_id % 97 <> 0),
    keep AS (
      SELECT min(doc_id) AS doc_id FROM (
        SELECT doc_id, md5(text) AS h FROM good) GROUP BY h),
    k AS (SELECT g.* FROM good g JOIN keep USING (doc_id)),
    w8 AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT AS shingle
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 7, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 7), ' ')))
                     AS g
            FROM w8)),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (shingle)
      WHERE s.doc_id % 97 <> 0),
    clean AS (SELECT * FROM k
              WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
    sel AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               sum(n_words) OVER (
                 ORDER BY quality_score DESC, n_words ASC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM clean) WHERE cum <= 8000),
    keyd AS (
      SELECT doc_id, md5(doc_id::VARCHAR || 'v2') AS key FROM sel),
    shardd AS (
      SELECT doc_id, key,
             ('0x' || substr(key, 1, 15))::BIGINT % 16 AS shard FROM keyd)
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard
                              ORDER BY key, doc_id)::BIGINT AS pos
    FROM shardd""",
    "llm", "pipeline",
)
def pipeline_curation_v2(spark, sf_dir):
    """The full curation chain as one job: quality filter (>= 0.75) ->
    exact dedup (min doc_id per md5) -> decontamination against the
    doc_id%97 benchmark set (bloom-prefiltered 8-gram overlap, exact
    via the confirm join, applied as a broadcast anti-join) -> 8k-token
    greedy-prefix budget cut (two-phase histogram, no global window) ->
    deterministic 16-shard training order. Returns (doc_id, shard,
    pos) — what a data loader consumes. Every stage is the standalone
    operator the registry checks individually; composed, the only
    corpus-sized shuffles are the dedup md5 groupBy and the shingle
    count — text itself never crosses the wire after the feature
    projection."""
    from .operators.bloom import bloom_benchmark_overlap
    from .operators.sampling import shuffle_shards
    from .operators.selection import budget_prefix_select
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    good = (corpus.select(
        "doc_id", "text",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
         .alias("n_words"),
        text.quality_score_col(F.col("text")).alias("quality_score"))
        .filter(F.col("quality_score") >= 0.75))
    keep = (good.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    # k feeds BOTH the decontamination shingling and the anti-join —
    # materialize so the quality+dedup prefix runs once per action
    k = good.join(keep, "doc_id").localCheckpoint(eager=False)
    dirty = (bloom_benchmark_overlap(k, bench, n=8, frac_threshold=1.0)
             .select("doc_id"))
    # r13 de-hint: `dirty` is contamination-sized — unbounded if the
    # corpus is heavily contaminated; AQE broadcasts it while small
    clean = k.join(dirty, "doc_id", "left_anti")
    q4 = (F.col("quality_score") * 4).cast("int")
    bucket = ((F.lit(4) - q4) * 1024
              + F.least((F.col("n_words") / 16).cast("int"), F.lit(1023)))
    # materialize the survivors (narrow: 3 cols) before the budget
    # resolve — the histogram collect AND the final selection both
    # consume `clean`, and recomputing the quality+dedup+decon chain
    # for each action doubles the pipeline
    clean = (clean.select("doc_id", "n_words", "quality_score")
             .withColumn("__bucket", bucket)
             .localCheckpoint(eager=False))
    sel = budget_prefix_select(
        clean, "__bucket", "n_words", 8_000,
        order_cols=[F.col("n_words").asc(), F.col("doc_id").asc()])
    return shuffle_shards(sel.select("doc_id"), "doc_id",
                          n_shards=16, seed="v2")


@register(
    "events_gap_fill",
    f"""
    WITH b AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
             {AVG6_SQL} AS v
      FROM events WHERE user_id < 20
      GROUP BY user_id, epoch_us(ts) // 3600000000),
    r AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
          FROM b GROUP BY user_id),
    grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS bucket FROM r),
    j AS (SELECT g.user_id, g.bucket, b.v
          FROM grid g LEFT JOIN b USING (user_id, bucket))
    SELECT user_id, bucket::BIGINT AS bucket,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           (v IS NULL) AS is_gap
    FROM j""",
    "relational", "timeseries",
)
def events_gap_fill(spark, sf_dir):
    """time_bucket_gapfill + LOCF: densify each user's hourly value
    series onto its own [first, last] hour range and carry the last
    observation forward through the gaps. Grid generation is per-key
    `sequence` (no global calendar cross join), the fill a per-key
    ordered window — partitions by user end to end.
    operators/timeseries.py:gap_fill_locf."""
    from .operators.timeseries import gap_fill_locf
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    b = (ev.select("user_id",
                   F.expr("unix_micros(ts) div 3600000000").alias("bucket"),
                   "value")
         .groupBy("user_id", "bucket")
         .agg(F.count("*").alias("cnt"), _cents_sum("value"))
         .select("user_id", "bucket", _avg6().alias("v")))
    return gap_fill_locf(b, "user_id", "bucket", "v")


@register(
    "quality_percentile_by_source",
    f"""
    WITH q AS ({_quality_sql()}),
    d AS (SELECT q.doc_id, s.source, q.quality_score
          FROM q JOIN documents s USING (doc_id))
    SELECT doc_id, source, quality_score,
           ((2 * (count(*) OVER (PARTITION BY source ORDER BY quality_score
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW))::BIGINT * 1000000
             + count(*) OVER (PARTITION BY source))
            // (2 * count(*) OVER (PARTITION BY source))) / 1e6 AS pct
    FROM d""",
    "llm", "quality",
)
def quality_percentile_by_source(spark, sf_dir):
    """Per-source quality-percentile calibration (cume_dist), computed
    the scale-correct way: NOT a row-level window — scores are
    aggregated to per-(source, score) counts first (tiny: sources x
    distinct scores), the cumulative distribution is a window over
    THAT aggregate, and docs join the result back via broadcast. At
    100 TB the row-level cume_dist would put each source's full corpus
    in one partition; this form shuffles counts only. Bit-identical to
    cume_dist by construction (ties share a score bucket)."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source",
        text.quality_score_col(F.col("text")).alias("quality_score"))
    g = (scored.groupBy("source", "quality_score")
         .agg(F.count("*").alias("c")))
    w = (Window.partitionBy("source").orderBy("quality_score")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy("source")
    dist = g.select(
        "source", "quality_score",
        _ratio6(F.sum("c").over(w), F.sum("c").over(wt)).alias("pct"))
    return scored.join(F.broadcast(dist), ["source", "quality_score"])\
                 .select("doc_id", "source", "quality_score", "pct")


@register(
    "leakage_free_split",
    f"""
    WITH c AS ({_dedup_clusters_sql()}),
    h AS (
      SELECT doc_id, cluster_id,
             ('0x' || substr(md5('split-' || cluster_id::VARCHAR), 1, 15))
               ::BIGINT % 100 AS r
      FROM c)
    SELECT doc_id, cluster_id,
           CASE WHEN r < 80 THEN 'train'
                WHEN r < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM h""",
    "llm", "dedup", "sampling",
)
def leakage_free_split(spark, sf_dir):
    """Leakage-free train/val/test split: the unit of assignment is
    the NEAR-DUP CLUSTER, not the document — a doc and its near
    duplicates always land in the same split, so eval can never see a
    paraphrase of a training row (the classic contamination channel
    doc-level hash splits leave open; hash_split_sample is that
    baseline). Composes minhash_lsh_pairs -> connected components ->
    one deterministic md5 draw PER CLUSTER broadcast onto members —
    after clustering, zero additional shuffles."""
    from .operators.graph import dedup_clusters as clusters
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
    comp = clusters(docs, pairs)
    r = F.pmod(
        F.conv(F.substring(F.md5(F.concat(
            F.lit("split-"), F.col("cluster_id").cast("string"))),
            1, 15), 16, 10).cast("bigint"),
        F.lit(100))
    return comp.select(
        "doc_id", "cluster_id",
        F.when(r < 80, "train").when(r < 90, "val")
         .otherwise("test").alias("split"))


@register(
    "ivf_incremental_assign",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 ORDER BY vec_id LIMIT 256),
    affinity AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY list_dot_product(v, cv)
                                         / (norm * cnorm) DESC,
                                         cent_id) AS r
      FROM n, c),
    assign AS (
      SELECT vec_id, cent_id AS cell FROM affinity WHERE r = 1)
    SELECT cell, count(*)::BIGINT AS n_vectors
    FROM assign GROUP BY cell""",
    "llm", "similarity", "cdc",
)
def ivf_incremental_assign(spark, sf_dir):
    """ANN index maintenance under a vector changelog: the prior index
    covers vec_id % 9 != 0; the % 9 == 0 vectors arrive as upserts and
    ONLY they pay the nearest-centroid assignment (broadcast centroids,
    anti-join on the changed ids). With the coarse quantizer fixed,
    the merged index is bit-identical to assigning the whole corpus —
    which is exactly what the oracle computes. Output: per-cell vector
    counts. operators/similarity.py:ivf_incremental_assign."""
    from .operators import similarity as sim
    emb = _t(spark, sf_dir, "embeddings")
    base = sim.with_norm(emb).select("vec_id", "v", "norm")
    cents = sim.sampled_centroids(base)
    prior = sim.assign_cells(
        base.filter(F.col("vec_id") % 9 != 0), cents)
    changes = (emb.filter(F.col("vec_id") % 9 == 0)
               .select("vec_id", "embedding", F.lit("upsert").alias("op")))
    merged = sim.ivf_incremental_assign(prior, changes, cents)
    return merged.groupBy("cell").agg(F.count("*").alias("n_vectors"))


@register(
    "part_cooccurrence_lift",
    """
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT count(DISTINCT o)::BIGINT AS n_orders FROM op),
    supp AS (SELECT p, count(*)::BIGINT AS s FROM op GROUP BY p),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, count(*)::BIGINT AS pair_cnt
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING count(*) >= 3)
    SELECT part_a, part_b, pair_cnt,
           ((2 * pair_cnt * 1000000 + sa.s) // (2 * sa.s)) / 1e6
             AS confidence_a_b,
           ((2 * pair_cnt * n.n_orders * 1000000 + sa.s * sb.s)
            // (2 * sa.s * sb.s)) / 1e6 AS lift
    FROM pairs
    JOIN supp sa ON sa.p = part_a
    JOIN supp sb ON sb.p = part_b
    CROSS JOIN n
    ORDER BY ((2 * pair_cnt * n.n_orders * 1000000 + sa.s * sb.s)
              // (2 * sa.s * sb.s)) / 1e6 DESC,
             part_a, part_b
    LIMIT 20""",
    "relational", "basket",
)
def part_cooccurrence_lift(spark, sf_dir):
    """Market-basket co-occurrence: part pairs ordered together, with
    support, confidence, and lift; top-20 by lift. The self-join is
    keyed on the order (pairs are per-basket quadratic, never
    corpus-quadratic — the same bounded-blocking shape as the dedup
    joins), part-keyed supports join back onto the pair aggregate
    planner-decided (SF-scaled: no forced broadcast since r12), top-k
    as TakeOrderedAndProject. The min-support HAVING prunes before the
    support join, so the heavy pair stream collapses map-side first."""
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct())
    n = li.select(F.countDistinct("o").cast("long").alias("n_orders"))
    supp = li.groupBy("p").agg(F.count("*").alias("s"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (a.join(b, (F.col("a.o") == F.col("b.o"))
                    & (F.col("a.p") < F.col("b.p")))
             .groupBy(F.col("a.p").alias("part_a"),
                      F.col("b.p").alias("part_b"))
             .agg(F.count("*").alias("pair_cnt"))
             .filter(F.col("pair_cnt") >= 3))
    sa = supp.select(F.col("p").alias("part_a"), F.col("s").alias("sa"))
    sb = supp.select(F.col("p").alias("part_b"), F.col("s").alias("sb"))
    # lift/confidence are count rationals (r13 tie class): exact 6-dp
    lift = _ratio6(F.col("pair_cnt") * F.col("n_orders"),
                   F.col("sa") * F.col("sb"))
    # sa/sb are part-keyed (SF-scaled): no broadcast hint (r12) — the
    # scalar n stays hinted
    return (pairs.join(sa, "part_a")
            .join(sb, "part_b")
            .crossJoin(F.broadcast(n))
            .select("part_a", "part_b", "pair_cnt",
                    _ratio6(F.col("pair_cnt"), F.col("sa"))
                     .alias("confidence_a_b"),
                    lift.alias("lift"))
            .orderBy(F.col("lift").desc(), "part_a", "part_b")
            .limit(20))


def _lsh_multiprobe_sql(num_planes: int = 8, dim: int = 64) -> str:
    planes = []
    for p in range(num_planes):
        comps = ",".join(repr(similarity._plane_component(p, d))
                         for d in range(dim))
        planes.append(
            f"(CASE WHEN list_dot_product(v, [{comps}]) >= 0 "
            f"THEN {1 << p} ELSE 0 END)")
    sig = " + ".join(planes)
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
             ({sig})::BIGINT AS sig
      FROM e),
    q AS (
      SELECT vec_id AS query_id, v AS qv, norm AS qnorm, sig AS qsig
      FROM n WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 256),
    scored AS (
      SELECT query_id, vec_id AS neighbor_id,
             list_dot_product(qv, v) / (qnorm * norm) AS cos
      FROM n JOIN q
        ON bit_count(xor(sig, qsig)) <= 1 AND vec_id != query_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank, round(cos, 6) AS cos
    FROM ranked WHERE rank <= 5"""


@register("ann_topk_lsh_multiprobe", _lsh_multiprobe_sql(),
          "llm", "similarity")
def ann_topk_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH top-5: each query probes its own bucket plus
    all 8 Hamming-1 neighbor buckets — the standard recall upgrade
    with NO index change (near vectors usually differ in exactly one
    hyperplane sign). Still an equi-join on the signature, so the
    partition-pruned serving layout is unchanged; recall gain over
    single-probe is measured in tests.
    operators/similarity.py:lsh_multiprobe_topk."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.lsh_multiprobe_topk(emb, k=5, query_mod=50,
                                         num_planes=8, dim=64)
    return out.select("query_id", "neighbor_id",
                      F.col("rank").cast("bigint").alias("rank"), "cos")


@register(
    "stratified_split_alloc",
    """
    WITH n AS (
      SELECT source, count(*)::BIGINT AS n_i FROM documents GROUP BY source),
    t AS (SELECT sum(n_i)::BIGINT AS N FROM n),
    alloc AS (
      SELECT source, n_i, (100 * n_i) // t.N AS base, (100 * n_i) % t.N AS rem
      FROM n CROSS JOIN t),
    e AS (SELECT (100 - sum(base))::BIGINT AS extra FROM alloc),
    r AS (SELECT source, base,
                 row_number() OVER (ORDER BY rem DESC, source) AS rr
          FROM alloc),
    k AS (SELECT source,
                 base + CASE WHEN rr <= e.extra THEN 1 ELSE 0 END AS k_i
          FROM r CROSS JOIN e),
    h AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5('alloc-' || doc_id::VARCHAR),
                                        1, 15))::BIGINT, doc_id) AS rnk
      FROM documents)
    SELECT h.source, h.doc_id, h.rnk::BIGINT AS rnk
    FROM h JOIN k USING (source) WHERE h.rnk <= k.k_i""",
    "llm", "sampling",
)
def stratified_split_alloc(spark, sf_dir):
    """Exactly 100 documents sampled proportionally across sources:
    largest-remainder allocation (integer-exact, engine-reproducible)
    + per-stratum bottom-k_i by deterministic hash on the mergeable
    reservoir plan. The 'sample exactly K rows, stratified' primitive
    eval-set builders need — hash_split_sample only hits K in
    expectation. operators/sampling.py:stratified_split_exact."""
    from .operators.sampling import stratified_split_exact
    docs = _t(spark, sf_dir, "documents")
    return stratified_split_exact(docs, "source", "doc_id",
                                  total_k=100, salt="alloc")


@register(
    "sliding_distinct_users",
    """
    WITH pane AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS h
      FROM events),
    w AS (
      SELECT DISTINCT user_id, h - off AS w_start
      FROM pane CROSS JOIN (SELECT unnest(range(0, 6)) AS off)
      WHERE h - off >= (SELECT min(epoch_us(ts) // 3600000000) FROM events))
    SELECT w_start::BIGINT AS w_start,
           count(*)::BIGINT AS distinct_users
    FROM w GROUP BY w_start""",
    "relational", "window", "distinct",
)
def sliding_distinct_users(spark, sf_dir):
    """Distinct users per 6-hour window sliding hourly, via PANE
    SHARING: events first dedupe to (user, hour-pane) — the only
    corpus-sized aggregation — then each tiny pane row fans out to the
    6 windows containing it and a second (user, window) dedupe feeds
    the count. The fan-out happens AFTER the cardinality collapse, so
    the 6x slide factor multiplies users x active-panes, never raw
    events — the exact-arithmetic version of merging per-pane HLL
    partials. Windows clipped to fully-formed starts (>= first pane)."""
    ev = _t(spark, sf_dir, "events")
    pane = (ev.select("user_id",
                      F.expr("unix_micros(ts) div 3600000000").alias("h"))
            .distinct())
    h_min = pane.agg(F.min("h").alias("h0"))
    offs = F.explode(F.sequence(F.lit(0), F.lit(5))).alias("off")
    w = (pane.select("user_id", "h", offs)
         .select("user_id", (F.col("h") - F.col("off")).alias("w_start"))
         .crossJoin(F.broadcast(h_min))
         .filter(F.col("w_start") >= F.col("h0"))
         .select("user_id", "w_start").distinct())
    return (w.groupBy("w_start")
            .agg(F.count("*").alias("distinct_users")))


@register(
    "doc_compression_ratio",
    """
    SELECT doc_id, length(text)::BIGINT AS n_chars,
           octet_length(encode(text))::BIGINT AS n_bytes,
           TRUE AS z_within_bound
    FROM documents""",
    "llm", "quality",
)
def doc_compression_ratio(spark, sf_dir):
    """Compression-ratio quality signal
    (operators/inference.py:compression_ratio). No SQL engine exposes
    zlib, so the gate row carries the CHECKABLE ENVELOPE instead of
    the raw ratio: z_within_bound is true iff the UDF's compressed
    length lands inside zlib's published bounds — at least the 8-byte
    minimal stream (2-byte header + empty stored block + 4-byte
    adler32) and at most compressBound(n) = n + n/1000 + 13 for the
    doc's UTF-8 byte length. The oracle recomputes n_chars/n_bytes
    exactly and asserts TRUE, so the row hash-fails if the compressor
    path returns garbage; the exact byte counts are additionally
    pinned against direct zlib calls in tests. The full
    (z_len, ratio) surface stays on the operator."""
    from .operators.inference import compression_ratio
    docs = _t(spark, sf_dir, "documents")
    full = compression_ratio(docs)  # one narrow scan, no join
    return full.select(
        "doc_id", "n_chars", "n_bytes",
        ((F.col("z_len") >= 8) &
         (F.col("z_len") <= F.col("n_bytes")
          + F.expr("n_bytes DIV 1000") + 13))
        .alias("z_within_bound"))


@register(
    "stream_manifest_maintenance",
    """
    SELECT event_type, count(*)::BIGINT AS n_rows,
           SUM(CAST(value AS DECIMAL(18,6)))::DOUBLE AS total_value,
           bit_xor(('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT)
             AS checksum
    FROM events GROUP BY event_type""",
    "streaming", "llm", "quality",
)
def stream_manifest_maintenance(spark, sf_dir):
    """dataset_manifest maintained INCREMENTALLY: events replay as
    three micro-batches; each batch's partial manifest (count,
    DECIMAL value mass, bit_xor id checksum) merges into the running
    manifest table by count-add / decimal-add / xor — every column
    commutative and associative, so the final manifest equals the
    batch manifest whatever the batch split (that equivalence IS the
    oracle check). The running table is |cells| rows at any scale;
    per batch only the batch's rows aggregate."""
    import os
    import tempfile

    tune(spark)
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type",
                                            "value", "ts")
    stage = tempfile.mkdtemp(prefix="sgs_manifest_in_")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    bounds = [lo, lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3, hi]
    for i in range(3):
        cond = (F.col("ts") >= bounds[i]) & (
            (F.col("ts") < bounds[i + 1]) if i < 2
            else (F.col("ts") <= bounds[3]))
        (ev.filter(cond).drop("ts").coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(stage, f"f{i}")))

    manifest_dir = tempfile.mkdtemp(prefix="sgs_manifest_state_")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15),
               16, 10).cast("bigint")

    def merge_batch(batch_df, batch_id):
        part = (batch_df
                .groupBy("event_type")
                .agg(F.count("*").alias("n_rows"),
                     F.sum(F.col("value").cast("decimal(18,6)"))
                      .cast("decimal(28,6)").alias("total_value"),
                     F.expr("bit_xor(h)").alias("checksum")))
        spark_l = batch_df.sparkSession
        prior_path = os.path.join(manifest_dir, "current")
        try:
            prior = spark_l.read.parquet(prior_path)
        except Exception:
            prior = None
        merged = (part if prior is None else
                  prior.unionByName(part)
                  .groupBy("event_type")
                  .agg(F.sum("n_rows").alias("n_rows"),
                       F.sum("total_value").cast("decimal(28,6)")
                        .alias("total_value"),
                       F.expr("bit_xor(checksum)").alias("checksum")))
        tmp = os.path.join(manifest_dir, f"tmp_{batch_id}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        spark_l.read.parquet(tmp).write.mode("overwrite").parquet(prior_path)

    src = (spark.readStream
           .schema("event_id bigint, event_type string, value double")
           .option("maxFilesPerTrigger", 1)
           .option("recursiveFileLookup", "true").parquet(stage)
           .withColumn("h", h))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        q = (src.writeStream.foreachBatch(merge_batch)
             .option("checkpointLocation", tempfile.mkdtemp(prefix="sgs_ck_"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (spark.read.parquet(os.path.join(manifest_dir, "current"))
            .select("event_type", "n_rows",
                    F.col("total_value").cast("double").alias("total_value"),
                    "checksum"))


@register(
    "purchase_touch_attribution",
    """
    WITH seq AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view', 'signup')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS touch
      FROM events)
    SELECT coalesce(touch, 'none') AS touch_type,
           count(*)::BIGINT AS n_purchases,
           SUM(CAST(value AS DECIMAL(18,6)))::DOUBLE AS total_value
    FROM seq WHERE event_type = 'purchase' GROUP BY 1""",
    "relational", "attribution",
)
def purchase_touch_attribution(spark, sf_dir):
    """Last-touch attribution: every purchase credits the user's most
    recent preceding touch event (click/view/signup) — the LOCF
    carry-forward idiom (one per-user ordered window, the same single
    user_id shuffle the sessionization family rides), then a tiny
    aggregate per touch type. Revenue sums run in DECIMAL so
    accumulation order cannot move the hash."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    touch = F.last(
        F.when(F.col("event_type").isin("click", "view", "signup"),
               F.col("event_type")), ignorenulls=True).over(w)
    return (ev.withColumn("touch", touch)
            .filter(F.col("event_type") == "purchase")
            .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
            .agg(F.count("*").alias("n_purchases"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                  .cast("double").alias("total_value")))


@register(
    "events_mad_anomalies",
    """
    WITH stats AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, s.med,
             abs(e.value - s.med) AS d
      FROM events e JOIN stats s USING (event_type)),
    mads AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.value,
           round((d.value - d.med) / m.mad, 6) AS mad_score
    FROM dev d JOIN mads m USING (event_type)
    WHERE d.d > 3 * m.mad""",
    "relational", "anomaly",
)
def events_mad_anomalies(spark, sf_dir):
    """Robust anomaly detection: flag events more than 3 MADs (median
    absolute deviation) from their type's median — the outlier test
    that, unlike z-scores (events_zscore_anomalies), outliers
    themselves cannot corrupt. Two grouped EXACT interpolated
    percentiles (each a single partial-aggregated shuffle over its
    grouping key) broadcast back onto the stream; the classic 1.4826
    normal-consistency factor is left out so the threshold stays in
    exact integer arithmetic. At 100 TB swap the exact percentile for
    the t-digest sketch (operators/sketches.py) — same plan shape."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    dev = (ev.join(F.broadcast(med), "event_type")
           .withColumn("d", F.abs(F.col("value") - F.col("med"))))
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(d, 0.5)").alias("mad"))
    return (dev.join(F.broadcast(mad), "event_type")
            .filter(F.col("d") > 3 * F.col("mad"))
            .select("event_id", "event_type", "value",
                    F.round((F.col("value") - F.col("med")) / F.col("mad"), 6)
                     .alias("mad_score")))


@register(
    "revenue_pareto_abc",
    """
    WITH u AS (
      SELECT user_id, SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    t AS (SELECT SUM(cents)::BIGINT AS total FROM u),
    c AS (
      SELECT user_id, cents,
             sum(cents) OVER (ORDER BY cents DESC, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM u)
    SELECT user_id, cents::BIGINT AS cents, cum::BIGINT AS cum_cents,
           ((2 * cum::BIGINT * 1000000 + t.total)
            // (2 * t.total)) / 1e6 AS cum_share,
           CASE WHEN cum <= 0.5 * t.total THEN 'A'
                WHEN cum <= 0.8 * t.total THEN 'B'
                ELSE 'C' END AS revenue_class
    FROM c CROSS JOIN t""",
    "relational", "analytics",
)
def revenue_pareto_abc(spark, sf_dir):
    """Pareto/ABC revenue classification with a per-user cumulative
    share — a GLOBAL running sum, computed scalably: the distributed
    three-step scan (operators/prefix.py — range-repartition+sort,
    driver-side P-value offsets, one Arrow cumsum pass) instead of a
    single-partition window. Revenue is scaled to integer cents so
    every partial sum is exact and order-free; the share division and
    class thresholds then operate on exact integers."""
    from .operators.prefix import ordered_prefix_sum
    ev = _t(spark, sf_dir, "events")
    u = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id",
                 F.round(F.col("value") * 100).cast("long").alias("c1"))
         .groupBy("user_id").agg(F.sum("c1").cast("long").alias("cents")))
    total = u.agg(F.sum("cents").cast("long").alias("total"))
    cum = ordered_prefix_sum(
        u, [F.col("cents").desc(), F.col("user_id").asc()], "cents",
        out_col="cum_cents", partitions=8)
    return (cum.crossJoin(F.broadcast(total))
            .select("user_id", "cents",
                    "cum_cents",
                    _ratio6(F.col("cum_cents"), F.col("total"))
                     .alias("cum_share"),
                    F.when(F.col("cum_cents") <= 0.5 * F.col("total"), "A")
                     .when(F.col("cum_cents") <= 0.8 * F.col("total"), "B")
                     .otherwise("C").alias("revenue_class")))


@register(
    "event_type_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events)
    SELECT prev, event_type AS next, count(*)::BIGINT AS n,
           ((2 * count(*) * 1000000
             + sum(count(*)) OVER (PARTITION BY prev))
            // (2 * (sum(count(*)) OVER (PARTITION BY prev))::BIGINT))
           / 1e6 AS p
    FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type""",
    "relational", "analytics",
)
def event_type_transitions(spark, sf_dir):
    """Clickstream transition matrix: per-user event sequences (lag on
    the single user_id ordering shuffle) collapse to first-order
    Markov transition counts and row-normalized probabilities. The
    normalizing window runs over the |types|^2 AGGREGATE, never the
    event stream — the same aggregate-then-window shape as the
    percentile calibration."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (ev.withColumn("prev", F.lag("event_type").over(w))
           .filter(F.col("prev").isNotNull()))
    g = (seq.groupBy("prev", F.col("event_type").alias("next"))
         .agg(F.count("*").alias("n")))
    wp = Window.partitionBy("prev")
    return g.select("prev", "next", "n",
                    _ratio6(F.col("n"), F.sum("n").over(wp)).alias("p"))


@register(
    "minhash_accuracy",
    f"""
    WITH lsh AS ({_minhash_pairs_sql()}),
    w2 AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh2 AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT AS shingle
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 2, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 2), ' ')))
                     AS g
            FROM w2)),
    sz2 AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh2 GROUP BY doc_id),
    inter2 AS (
      SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*)::BIGINT AS i2
      FROM sh2 l JOIN sh2 r USING (shingle)
      WHERE l.doc_id < r.doc_id GROUP BY 1, 2),
    jac AS (
      SELECT doc_a, doc_b,
             ((2 * i2 * 1000000 + (sa.sz + sb.sz - i2))
              // (2 * (sa.sz + sb.sz - i2))) / 1e6 AS jaccard
      FROM inter2 JOIN sz2 sa ON sa.doc_id = doc_a
                  JOIN sz2 sb ON sb.doc_id = doc_b)
    SELECT l.doc_a, l.doc_b, round(l.sig_sim, 6) AS sig_sim,
           coalesce(j.jaccard, 0) AS jaccard,
           round(abs(round(l.sig_sim, 6) - coalesce(j.jaccard, 0)), 6)
             AS abs_err
    FROM lsh l LEFT JOIN jac j USING (doc_a, doc_b)""",
    "llm", "dedup", "diagnostics",
)
def minhash_accuracy(spark, sf_dir):
    """Estimator-quality diagnostic: for every MinHash-LSH candidate
    pair, the signature-similarity ESTIMATE next to the exact 3-gram
    Jaccard and their absolute error — the evaluation pass that tells
    you whether H=16 hashes suffice before scaling the dedup run
    (E[|err|] ~ sqrt(J(1-J)/H)). The exact side reuses the sparse
    shingle equi-join at threshold 0, restricted by the join to the
    (already bucketed) candidate set."""
    docs = _t(spark, sf_dir, "documents")
    lsh = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                  threshold=0.5)
    jac = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.0)
    return (lsh.join(jac, ["doc_a", "doc_b"], "left")
            .select("doc_a", "doc_b",
                    F.round("sig_sim", 6).alias("sig_sim"),
                    F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
                    F.round(F.abs(F.round("sig_sim", 6)
                                  - F.coalesce("jaccard", F.lit(0.0))), 6)
                     .alias("abs_err")))


@register(
    "lsh_precision_recall",
    f"""
    WITH lsh AS ({_minhash_pairs_sql()}),
    w3 AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh3 AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT AS shingle
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 2, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 2), ' ')))
                     AS g
            FROM w3)),
    sz3 AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh3 GROUP BY doc_id),
    t2 AS (
      SELECT i.doc_a, i.doc_b FROM (
        SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
               count(*)::BIGINT AS i3
        FROM sh3 l JOIN sh3 r USING (shingle)
        WHERE l.doc_id < r.doc_id GROUP BY 1, 2) i
      JOIN sz3 sa ON sa.doc_id = i.doc_a
      JOIN sz3 sb ON sb.doc_id = i.doc_b
      WHERE i.i3 / (sa.sz + sb.sz - i.i3) >= 0.5),
    hits AS (SELECT count(*)::BIGINT AS tp FROM lsh
             JOIN t2 USING (doc_a, doc_b)),
    np AS (SELECT count(*)::BIGINT AS n_pred FROM lsh),
    nt AS (SELECT count(*)::BIGINT AS n_true FROM t2)
    SELECT np.n_pred, nt.n_true, hits.tp,
           ((2 * hits.tp * 1000000 + np.n_pred)
            // (2 * np.n_pred)) / 1e6 AS precision,
           ((2 * hits.tp * 1000000 + nt.n_true)
            // (2 * nt.n_true)) / 1e6 AS recall
    FROM np CROSS JOIN nt CROSS JOIN hits""",
    "llm", "dedup", "diagnostics",
)
def lsh_precision_recall(spark, sf_dir):
    """The dedup-quality scoreboard: MinHash-LSH candidate pairs
    (16 hashes, 4 bands, sig_sim >= 0.5) scored against exact 3-gram
    Jaccard >= 0.5 ground truth — one row: predicted pairs, true
    pairs, hits, precision, recall. At production scale the truth side
    is computed on a sample; here the corpus is small enough to score
    exactly. This is the number that justifies the banding parameters
    before a 100 TB run."""
    docs = _t(spark, sf_dir, "documents")
    pred = (dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
            .select("doc_a", "doc_b"))
    truth = (dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
             .select("doc_a", "doc_b"))
    tp = pred.join(truth, ["doc_a", "doc_b"]).count()
    n_pred, n_true = pred.count(), truth.count()
    # round inside Spark (HALF_UP, same as the oracle's round()) —
    # Python round() is banker's and can differ at .5 boundaries
    one = spark.createDataFrame(
        [(n_pred, n_true, tp)], "n_pred bigint, n_true bigint, tp bigint")
    return one.select(
        "n_pred", "n_true", "tp",
        _ratio6(F.col("tp"), F.col("n_pred")).alias("precision"),
        _ratio6(F.col("tp"), F.col("n_true")).alias("recall"))


@register(
    "lsh_tuning_sampled",
    f"""
    WITH sdocs AS (
      SELECT * FROM documents
      WHERE ('0x' || substr(md5('lshs-' || doc_id::VARCHAR), 1, 15))::BIGINT
            % 5 = 0),
    lsh AS ({_minhash_pairs_sql(src="sdocs")}),
    w3 AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM sdocs),
    sh3 AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT AS shingle
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 2, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 2), ' ')))
                     AS g
            FROM w3)),
    sz3 AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh3 GROUP BY doc_id),
    t2 AS (
      SELECT i.doc_a, i.doc_b FROM (
        SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
               count(*)::BIGINT AS i3
        FROM sh3 l JOIN sh3 r USING (shingle)
        WHERE l.doc_id < r.doc_id GROUP BY 1, 2) i
      JOIN sz3 sa ON sa.doc_id = i.doc_a
      JOIN sz3 sb ON sb.doc_id = i.doc_b
      WHERE i.i3 / (sa.sz + sb.sz - i.i3) >= 0.5),
    hits AS (SELECT count(*)::BIGINT AS tp FROM lsh
             JOIN t2 USING (doc_a, doc_b)),
    np AS (SELECT count(*)::BIGINT AS n_pred FROM lsh),
    nt AS (SELECT count(*)::BIGINT AS n_true FROM t2)
    SELECT np.n_pred, nt.n_true, hits.tp,
           (CASE WHEN np.n_pred > 0
                 THEN ((2 * hits.tp * 1000000 + np.n_pred)
                       // (2 * np.n_pred)) / 1e6 END) AS precision,
           (CASE WHEN nt.n_true > 0
                 THEN ((2 * hits.tp * 1000000 + nt.n_true)
                       // (2 * nt.n_true)) / 1e6 END) AS recall
    FROM np CROSS JOIN nt CROSS JOIN hits""",
    "llm", "dedup", "diagnostics",
)
def lsh_tuning_sampled(spark, sf_dir):
    """The SAMPLE-BOUND form of lsh_precision_recall — the intended
    production use (SCALE.md round-5 notes): a deterministic 20 % doc
    sample (salted md5 of doc_id, replayable, append-stable) pays the
    exact-Jaccard ground-truth cost on sample² density, not corpus²,
    while scoring the SAME banding parameters the full run will use.
    This is the cheap pre-flight that justifies (b, r, n) before a
    100 TB dedup; ratios are NULL-guarded for degenerate samples."""
    docs = _t(spark, sf_dir, "documents")
    keep = (F.conv(F.substring(
        F.md5(F.concat(F.lit("lshs-"), F.col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("bigint") % 5) == 0
    sample = docs.filter(keep)
    pred = (dedup.minhash_lsh_pairs(sample, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
            .select("doc_a", "doc_b"))
    truth = (dedup.ngram_jaccard_pairs(sample, n=3, threshold=0.5)
             .select("doc_a", "doc_b"))
    tp = pred.join(truth, ["doc_a", "doc_b"]).count()
    n_pred, n_true = pred.count(), truth.count()
    one = spark.createDataFrame(
        [(n_pred, n_true, tp)], "n_pred bigint, n_true bigint, tp bigint")
    return one.select(
        "n_pred", "n_true", "tp",
        F.when(F.col("n_pred") > 0,
               _ratio6(F.col("tp"), F.col("n_pred"))).alias("precision"),
        F.when(F.col("n_true") > 0,
               _ratio6(F.col("tp"), F.col("n_true"))).alias("recall"))


@register(
    "gopher_quality_flags",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    cnts AS (SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY 1, 2),
    per AS (
      SELECT doc_id, sum(cnt)::BIGINT AS n_words,
             count(*)::BIGINT AS n_distinct, max(cnt)::BIGINT AS top_cnt,
             sum(len(w) * cnt)::BIGINT AS n_chars,
             sum(CASE WHEN w IN ('the', 'and', 'of', 'to', 'a')
                      THEN cnt ELSE 0 END)::BIGINT AS stop_cnt,
             sum(CASE WHEN regexp_matches(w, '[a-zA-Z]')
                      THEN cnt ELSE 0 END)::BIGINT AS alpha_cnt
      FROM cnts GROUP BY doc_id),
    f AS (
      SELECT doc_id, n_words,
             (n_words >= 30 AND n_words <= 100000) AS flag_word_count,
             (n_chars >= 3 * n_words AND n_chars <= 10 * n_words)
               AS flag_mean_word_len,
             (stop_cnt >= 2) AS flag_stopwords,
             (5 * alpha_cnt >= 4 * n_words) AS flag_alpha_words,
             (10 * top_cnt <= n_words) AS flag_dominance,
             (5 * n_distinct >= 2 * n_words) AS flag_ttr
      FROM per)
    SELECT *,
           ((NOT flag_word_count)::INT + (NOT flag_mean_word_len)::INT
            + (NOT flag_stopwords)::INT + (NOT flag_alpha_words)::INT
            + (NOT flag_dominance)::INT + (NOT flag_ttr)::INT)::INT
             AS n_failed,
           ((NOT flag_word_count)::INT + (NOT flag_mean_word_len)::INT
            + (NOT flag_stopwords)::INT + (NOT flag_alpha_words)::INT
            + (NOT flag_dominance)::INT + (NOT flag_ttr)::INT) = 0 AS keep
    FROM f""",
    "llm", "text", "quality",
)
def gopher_quality_flags(spark, sf_dir):
    """Gopher-rule quality filter suite as per-rule diagnostics
    (operators/text.py:gopher_quality_flags): six boolean flags per
    document, every threshold an exact integer cross-multiplication.
    Complements the composite quality_score with the per-rule view a
    curation run tunes against."""
    docs = _t(spark, sf_dir, "documents")
    return text.gopher_quality_flags(docs)


@register(
    "events_cusum_drift",
    """
    WITH c AS (
      SELECT event_id, event_type, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    m AS (SELECT event_type, sum(cents) // count(*) AS target
          FROM c GROUP BY event_type),
    p AS (
      SELECT c.event_id, c.event_type, c.ts,
             sum(c.cents - m.target) OVER (
               PARTITION BY c.event_type ORDER BY c.ts, c.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
      FROM c JOIN m USING (event_type))
    SELECT event_id, event_type,
           (pre - least(0, min(pre) OVER (
              PARTITION BY event_type ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::BIGINT
             AS cusum_cents,
           (pre - least(0, min(pre) OVER (
              PARTITION BY event_type ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) > 20000
             AS drift
    FROM p""",
    "relational", "timeseries", "anomaly",
)
def events_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift detection per event type
    (operators/timeseries.py:cusum_flags): the sequential recursion
    S_i = max(0, S_{i-1} + x_i - k) rewritten as prefix-sum minus
    running-min, so one per-key ordered window computes it
    distributed. Target is the per-type integer mean (exact DIV);
    everything runs in integer cents; drift fires at 200.00 above
    the in-control baseline."""
    from .operators.timeseries import cusum_flags
    ev = (_t(spark, sf_dir, "events")
          .select("event_id", "event_type", "ts",
                  F.round(F.col("value") * 100).cast("long").alias("cents")))
    tgt = (ev.groupBy("event_type")
           .agg(F.expr(
               # exact integer FLOOR division (DuckDB // semantics):
               # DIV truncates toward zero, so subtract 1 when the
               # sum is negative with a remainder. count(*) > 0.
               "sum(cents) DIV count(*) - CASE WHEN sum(cents) % count(*) <> 0 "
               "AND sum(cents) < 0 THEN 1 ELSE 0 END").alias("target")))
    d = ev.join(F.broadcast(tgt), "event_type")
    out = cusum_flags(d, "event_type", [F.col("ts"), F.col("event_id")],
                      F.col("cents"), F.col("target"),
                      slack_units=0, h_units=20000)
    return out.select("event_id", "event_type",
                      F.col("cusum_units").alias("cusum_cents"), "drift")


@register(
    "events_trend_ols",
    """
    WITH c AS (
      SELECT event_type, epoch_us(ts) // 1000000 AS sec,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    mn AS (SELECT min(sec) AS mn FROM c),
    d AS (SELECT event_type, (sec - mn)::HUGEINT AS x, cents::HUGEINT AS y
          FROM c CROSS JOIN mn),
    g AS (SELECT event_type, count(*)::HUGEINT AS n, sum(x) AS sx,
                 sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM d GROUP BY event_type)
    SELECT event_type, n::BIGINT AS n,
           round(CASE WHEN n * sxx - sx * sx <> 0 THEN
             (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
             END, 9) AS slope,
           round(CASE WHEN n * sxx - sx * sx <> 0 THEN
             (sy * sxx - sx * sxy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
             END, 6) AS intercept
    FROM g""",
    "relational", "timeseries",
)
def events_trend_ols(spark, sf_dir):
    """Per-type least-squares value trend
    (operators/timeseries.py:ols_trend): slope/intercept from the five
    classical sums accumulated as exact DECIMAL(38,0) integers — one
    map-combined groupBy, no second pass, order-free. x is seconds
    since the corpus' first event (broadcast scalar), y integer cents;
    magnitudes stay within decimal38 up to ~1e9 rows x 1e8 s spans."""
    from .operators.timeseries import ols_trend
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("unix_micros(ts) div 1000000").alias("sec"),
                  F.round(F.col("value") * 100).cast("long").alias("cents")))
    mn = ev.agg(F.min("sec").alias("mn"))
    d = (ev.crossJoin(F.broadcast(mn))
         .select("event_type", (F.col("sec") - F.col("mn")).alias("x"),
                 F.col("cents")))
    return ols_trend(d, "event_type", F.col("x"), F.col("cents"))


@register(
    "neardup_triangle_stats",
    f"""
    WITH e AS (
      SELECT DISTINCT doc_a AS a, doc_b AS b
      FROM ({_minhash_pairs_sql()})),
    tri AS (
      SELECT w.a, w.x, w.y FROM (
        SELECT e1.a, e1.b AS x, e2.b AS y
        FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b) w
      JOIN e ON e.a = w.x AND e.b = w.y),
    cr AS (SELECT unnest([a, x, y]) AS id FROM tri),
    tc AS (SELECT id, count(*)::BIGINT AS triangles FROM cr GROUP BY id),
    dg AS (SELECT id, count(*)::BIGINT AS degree
           FROM (SELECT unnest([a, b]) AS id FROM e) GROUP BY id)
    SELECT d.doc_id AS id,
           coalesce(dg.degree, 0)::BIGINT AS degree,
           coalesce(tc.triangles, 0)::BIGINT AS triangles,
           CASE WHEN coalesce(dg.degree, 0) >= 2
                THEN ((2 * 2 * coalesce(tc.triangles, 0)::BIGINT
                       * 1000000 + dg.degree * (dg.degree - 1))
                      // (2 * dg.degree::BIGINT * (dg.degree - 1))) / 1e6
                ELSE 0.0 END AS lcc
    FROM documents d
    LEFT JOIN dg ON dg.id = d.doc_id
    LEFT JOIN tc ON tc.id = d.doc_id""",
    "llm", "dedup", "graph", "diagnostics",
)
def neardup_triangle_stats(spark, sf_dir):
    """Triangle count + local clustering coefficient over the
    MinHash-LSH near-dup graph (operators/graph.py:triangle_stats) —
    the density diagnostic that separates genuine duplicate clusters
    (triangle-rich) from chains of borderline matches before
    connected-components merges them."""
    from .operators.graph import triangle_stats
    docs = _t(spark, sf_dir, "documents")
    edges = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3,
                                    threshold=0.5)
    return triangle_stats(docs.select("doc_id"), edges, id_col="doc_id",
                          src_col="doc_a", dst_col="doc_b")


@register(
    "setsim_jaccard_prefix",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh_str AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(words) - 2, 0) + 1),
               i -> array_to_string(list_slice(words, i, i + 2), ' ')))
               AS shingle_str
      FROM w),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(shingle_str), 1, 15))::BIGINT AS shingle
      FROM sh_str),
    sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*)::BIGINT AS inter
      FROM sh l JOIN sh r USING (shingle)
      WHERE l.doc_id < r.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           ((2 * inter * 1000000 + (sa.sz + sb.sz - inter))
            // (2 * (sa.sz + sb.sz - inter))) / 1e6 AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = doc_a
               JOIN sz sb ON sb.doc_id = doc_b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.5""",
    "llm", "dedup",
)
def setsim_jaccard_prefix(spark, sf_dir):
    """PPJoin-style prefix-filtered exact Jaccard join
    (operators/dedup.py:setsim_prefix_join): same result set as
    ngram_jaccard_pairs at threshold 1/2 — the oracle is literally the
    same SQL — but candidates come from rarest-first PREFIX tokens
    (hot shingles never enter the index) and verification runs per
    candidate on sorted hash arrays. The high-threshold scale path for
    exact similarity joins."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.setsim_prefix_join(docs, n=3, t_num=1, t_den=2)


@register(
    "part_skyline",
    """
    WITH p AS (
      SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT)
               AS price_cents, p_size
      FROM part)
    SELECT s.p_partkey, s.price_cents, s.p_size
    FROM p s
    WHERE NOT EXISTS (
      SELECT 1 FROM p q
      WHERE q.price_cents <= s.price_cents AND q.p_size >= s.p_size
        AND (q.price_cents < s.price_cents OR q.p_size > s.p_size))""",
    "relational", "analytics",
)
def part_skyline(spark, sf_dir):
    """Skyline (Pareto frontier) over parts: cheapest-for-their-size
    parts no other part dominates (<= price AND >= size, strict in
    one). The oracle states dominance as NOT EXISTS (quadratic); the
    Spark plan is the 2-D scan form — aggregate max size per price
    (map-combined, O(distinct prices) rows), then a PARTITIONED
    running max over that aggregate: range-partition by price, scan
    each range independently (Window.partitionBy the range id), and
    carry history across ranges via a broadcast prefix-max of the
    per-range maxima (P rows, P = #partitions) — no single-partition
    window node anywhere, so the running max scales with distinct
    prices. One broadcast join back: a part survives iff it tops its
    own price group and beats every strictly-cheaper group's best
    size — no self-join over the fact table at any scale."""
    p = (_t(spark, sf_dir, "part")
         .select("p_partkey",
                 F.round(F.col("p_retailprice") * 100).cast("long")
                  .alias("price_cents"),
                 "p_size"))
    grp = (p.groupBy("price_cents").agg(F.max("p_size").alias("gmax"))
           .repartitionByRange(8, "price_cents")
           .withColumn("pid", F.spark_partition_id()))
    w_in = (Window.partitionBy("pid").orderBy("price_cents")
            .rowsBetween(Window.unboundedPreceding, -1))
    run = grp.withColumn("run_max", F.max("gmax").over(w_in))
    bounds = grp.groupBy("pid").agg(F.max("gmax").alias("pmax"))
    pre = (bounds.alias("a")
           .join(F.broadcast(bounds.select(F.col("pid").alias("bpid"),
                                           F.col("pmax").alias("bpmax"))),
                 F.col("bpid") < F.col("a.pid"), "left")
           .groupBy(F.col("a.pid").alias("pid"))
           .agg(F.max("bpmax").alias("prefix_max")))
    grp2 = (run.join(F.broadcast(pre), "pid", "left")
            # greatest() skips NULLs: first range + first row => NULL,
            # matching the unbounded-preceding semantics exactly
            .withColumn("cheaper_max",
                        F.greatest("run_max", "prefix_max"))
            .select("price_cents", "gmax", "cheaper_max"))
    return (p.join(F.broadcast(grp2), "price_cents")
            .filter((F.col("p_size") == F.col("gmax"))
                    & (F.col("cheaper_max").isNull()
                       | (F.col("cheaper_max") < F.col("p_size"))))
            .select("p_partkey", "price_cents", "p_size"))


@register(
    "user_lifecycle_states",
    """
    WITH act AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events),
    mx AS (SELECT max(day) AS max_day FROM act),
    cls AS (
      SELECT user_id, day,
             lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
      FROM act),
    a AS (
      SELECT day,
             count(*) FILTER (prev IS NULL)::BIGINT AS n_new,
             count(*) FILTER (prev = day - 1)::BIGINT AS n_retained,
             count(*) FILTER (prev IS NOT NULL AND prev < day - 1)::BIGINT
               AS n_resurrected
      FROM cls GROUP BY day),
    c AS (
      SELECT day + 1 AS day, count(*)::BIGINT AS n_churned
      FROM cls CROSS JOIN mx
      WHERE (nxt IS NULL AND day < max_day) OR nxt > day + 1
      GROUP BY day + 1)
    SELECT coalesce(a.day, c.day)::BIGINT AS day,
           coalesce(n_new, 0)::BIGINT AS n_new,
           coalesce(n_retained, 0)::BIGINT AS n_retained,
           coalesce(n_resurrected, 0)::BIGINT AS n_resurrected,
           coalesce(n_churned, 0)::BIGINT AS n_churned
    FROM a FULL OUTER JOIN c USING (day)""",
    "relational", "analytics",
)
def user_lifecycle_states(spark, sf_dir):
    """Growth accounting: classify every active user-day as
    new / retained (active yesterday) / resurrected (returned after a
    gap), and count churn on the first inactive day after an active
    one — the standard DAU decomposition whose identity
    DAU(t) = new + retained + resurrected and
    retained(t) = DAU(t-1) - churned(t) audits itself.

    Plan: distinct (user, day) — the only corpus-sized shuffle — then
    lag/lead on the per-user ordering, a per-day aggregate, and a
    full-outer merge of the churn-day counts (day-keyed, tiny). The
    global max day rides as a broadcast scalar so end-of-horizon
    non-activity is not miscounted as churn."""
    ev = _t(spark, sf_dir, "events")
    act = (ev.select("user_id",
                     F.expr("unix_micros(ts) div 86400000000").alias("day"))
           .distinct())
    mx = act.agg(F.max("day").alias("max_day"))
    w = Window.partitionBy("user_id").orderBy("day")
    cls = (act.withColumn("prev", F.lag("day").over(w))
           .withColumn("nxt", F.lead("day").over(w)))
    a = cls.groupBy("day").agg(
        F.sum(F.when(F.col("prev").isNull(), 1).otherwise(0))
         .cast("bigint").alias("n_new"),
        F.sum(F.when(F.col("prev") == F.col("day") - 1, 1).otherwise(0))
         .cast("bigint").alias("n_retained"),
        F.sum(F.when(F.col("prev") < F.col("day") - 1, 1).otherwise(0))
         .cast("bigint").alias("n_resurrected"))
    c = (cls.crossJoin(F.broadcast(mx))
         .filter((F.col("nxt").isNull() & (F.col("day") < F.col("max_day")))
                 | (F.col("nxt") > F.col("day") + 1))
         .select((F.col("day") + 1).alias("day"))
         .groupBy("day").agg(F.count("*").cast("bigint").alias("n_churned")))
    return (a.join(c, "day", "full_outer")
            .select(F.col("day").cast("bigint"),
                    F.coalesce("n_new", F.lit(0)).cast("bigint")
                     .alias("n_new"),
                    F.coalesce("n_retained", F.lit(0)).cast("bigint")
                     .alias("n_retained"),
                    F.coalesce("n_resurrected", F.lit(0)).cast("bigint")
                     .alias("n_resurrected"),
                    F.coalesce("n_churned", F.lit(0)).cast("bigint")
                     .alias("n_churned")))


@register(
    "ab_test_zscores",
    """
    WITH e AS (
      SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2
               AS bucket,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    g AS (
      SELECT event_type,
             count(*) FILTER (bucket = 0)::HUGEINT AS na,
             count(*) FILTER (bucket = 1)::HUGEINT AS nb,
             coalesce(sum(cents) FILTER (bucket = 0), 0)::HUGEINT AS sa,
             coalesce(sum(cents) FILTER (bucket = 1), 0)::HUGEINT AS sb,
             coalesce(sum(cents * cents) FILTER (bucket = 0), 0)::HUGEINT
               AS qa,
             coalesce(sum(cents * cents) FILTER (bucket = 1), 0)::HUGEINT
               AS qb
      FROM e GROUP BY event_type)
    SELECT event_type, na::BIGINT AS n_a, nb::BIGINT AS n_b,
           CASE WHEN na > 0
                THEN ((2 * sa::HUGEINT * 1000000 + 100 * na)
                      // (2 * 100 * na::HUGEINT)) / 1e6 END AS mean_a,
           CASE WHEN nb > 0
                THEN ((2 * sb::HUGEINT * 1000000 + 100 * nb)
                      // (2 * 100 * nb::HUGEINT)) / 1e6 END AS mean_b,
           CASE WHEN na > 1 AND nb > 1
                AND (na * qa - sa * sa > 0 OR nb * qb - sb * sb > 0)
                THEN round((sa::DOUBLE / na::DOUBLE - sb::DOUBLE / nb::DOUBLE)
                 / sqrt((na * qa - sa * sa)::DOUBLE
                        / (na * (na - 1))::DOUBLE / na::DOUBLE
                        + (nb * qb - sb * sb)::DOUBLE
                        / (nb * (nb - 1))::DOUBLE / nb::DOUBLE), 6) END AS z
    FROM g""",
    "relational", "analytics",
)
def ab_test_zscores(spark, sf_dir):
    """Two-sample Welch z-statistic per event type under a
    deterministic 50/50 user split (md5 of user_id — the same
    replayable hash-split idiom as hash_split_sample, so assignment
    never changes between runs). All moments (n, sum, sum of squares)
    accumulate as exact integers in ONE map-combined aggregate; the
    variance n*q - s*s is exact integer arithmetic and only the final
    mean/z divisions run in double. This is the guardrail query an
    experimentation pipeline runs at 100 TB — and the null split here
    doubles as an A/A sanity check (|z| should stay small)."""
    ev = _t(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    e = ev.select(
        "event_type",
        (dedup.base_hash(F.col("user_id").cast("string")) % 2).alias("bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    a0 = F.col("bucket") == 0
    g = e.groupBy("event_type").agg(
        F.sum(F.when(a0, 1).otherwise(0)).cast(d38).alias("na"),
        F.sum(F.when(~a0, 1).otherwise(0)).cast(d38).alias("nb"),
        F.coalesce(F.sum(F.when(a0, F.col("cents"))), F.lit(0))
         .cast(d38).alias("sa"),
        F.coalesce(F.sum(F.when(~a0, F.col("cents"))), F.lit(0))
         .cast(d38).alias("sb"),
        F.coalesce(F.sum(F.when(a0, F.col("cents") * F.col("cents"))),
                   F.lit(0)).cast(d38).alias("qa"),
        F.coalesce(F.sum(F.when(~a0, F.col("cents") * F.col("cents"))),
                   F.lit(0)).cast(d38).alias("qb"))
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    va = ((F.col("na") * F.col("qa") - F.col("sa") * F.col("sa"))
          .cast("double") / (F.col("na") * (F.col("na") - 1)).cast("double"))
    vb = ((F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb"))
          .cast("double") / (F.col("nb") * (F.col("nb") - 1)).cast("double"))
    # degenerate-split guards: a cell with 0/1 rows (or zero variance
    # on both arms) yields NULL in Spark's non-ANSI division but
    # inf/NaN in DuckDB — make both engines emit NULL explicitly
    z_ok = ((F.col("na") > 1) & (F.col("nb") > 1) &
            ((F.col("na") * F.col("qa") > F.col("sa") * F.col("sa")) |
             (F.col("nb") * F.col("qb") > F.col("sb") * F.col("sb"))))
    return g.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.when(F.col("na") > 0,
               _ratio6_dec(F.col("sa"), F.col("na") * 100)).alias("mean_a"),
        F.when(F.col("nb") > 0,
               _ratio6_dec(F.col("sb"), F.col("nb") * 100)).alias("mean_b"),
        F.when(z_ok, F.round((sa / na - sb / nb)
                             / F.sqrt(va / na + vb / nb), 6)).alias("z"))


@register(
    "inverted_index_postings",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    tf AS (SELECT w, doc_id, count(*)::BIGINT AS tf
           FROM tok GROUP BY w, doc_id)
    SELECT w AS term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf,
           string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
             AS postings
    FROM tf GROUP BY w""",
    "llm", "text", "retrieval",
)
def inverted_index_postings(spark, sf_dir):
    """Materialized inverted index: per term, document frequency,
    total term frequency, and the doc-ordered posting list
    ("doc:tf,doc:tf,...") — the artifact BM25 consumes implicitly,
    made explicit as a table a retrieval service can range-scan.

    Plan: explode → (term, doc) count (map-combined) → per-term
    aggregate whose collect_list is bounded by df; the posting string
    is built inside the aggregate (array_sort on (doc_id, tf) structs
    gives the canonical doc order on any engine). At 100 TB, hot
    stop-terms make df skew — shard those posting lists by
    (term, doc_id range) upstream; everything else is unchanged."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
    tf = tok.groupBy("w", "doc_id").agg(F.count("*").alias("tf"))
    return (tf.groupBy(F.col("w").alias("term"))
            .agg(F.count("*").cast("bigint").alias("df"),
                 F.sum("tf").cast("bigint").alias("total_tf"),
                 F.concat_ws(",", F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("doc_id", "tf"))),
                     lambda s: F.concat(s.doc_id.cast("string"), F.lit(":"),
                                        s.tf.cast("string"))))
                  .alias("postings")))


@register(
    "mutual_information_bands",
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    qs AS (
      SELECT quantile_cont(cents, 0.25) AS q1, quantile_cont(cents, 0.5)
               AS q2, quantile_cont(cents, 0.75) AS q3
      FROM c),
    b AS (
      SELECT event_type,
             CASE WHEN cents <= q1 THEN 0 WHEN cents <= q2 THEN 1
                  WHEN cents <= q3 THEN 2 ELSE 3 END AS band
      FROM c CROSS JOIN qs),
    xy AS (SELECT event_type, band, count(*)::BIGINT AS n
           FROM b GROUP BY 1, 2),
    tot AS (SELECT sum(n)::BIGINT AS total FROM xy),
    mx AS (SELECT event_type, sum(n)::BIGINT AS nx FROM xy GROUP BY 1),
    my AS (SELECT band, sum(n)::BIGINT AS ny FROM xy GROUP BY 1)
    SELECT xy.event_type, xy.band::INT AS band, xy.n,
           ((2 * xy.n * 1000000 + total) // (2 * total)) / 1e6 AS p_xy,
           round(ln((xy.n::DOUBLE * total::DOUBLE)
                    / (nx::DOUBLE * ny::DOUBLE)), 6) AS pmi,
           round(xy.n / total::DOUBLE
                 * ln((xy.n::DOUBLE * total::DOUBLE)
                      / (nx::DOUBLE * ny::DOUBLE)), 6) AS mi_term
    FROM xy CROSS JOIN tot
    JOIN mx USING (event_type) JOIN my USING (band)""",
    "relational", "analytics",
)
def mutual_information_bands(spark, sf_dir):
    """Mutual information between event type and value quartile —
    the cheap feature-relevance screen (sum of mi_term = MI; pmi
    shows WHICH cells carry the association). Quartiles are exact
    interpolated percentiles broadcast as one scalar row; the joint
    table is a |types| x 4 aggregate, so every post-aggregate join is
    broadcast-sized. Counts stay exact integers; only the final
    log/ratio runs in double (rounded at 6 dp)."""
    ev = _t(spark, sf_dir, "events")
    c = ev.select("event_type",
                  F.round(F.col("value") * 100).cast("long").alias("cents"))
    qs = c.agg(F.expr("percentile(cents, 0.25)").alias("q1"),
               F.expr("percentile(cents, 0.5)").alias("q2"),
               F.expr("percentile(cents, 0.75)").alias("q3"))
    b = (c.crossJoin(F.broadcast(qs))
         .select("event_type",
                 F.when(F.col("cents") <= F.col("q1"), 0)
                  .when(F.col("cents") <= F.col("q2"), 1)
                  .when(F.col("cents") <= F.col("q3"), 2)
                  .otherwise(3).alias("band")))
    xy = b.groupBy("event_type", "band").agg(
        F.count("*").cast("bigint").alias("n"))
    # marginals as windows over the |types| x 4 AGGREGATE (a handful
    # of rows) — one events scan total, instead of re-deriving xy for
    # each marginal join
    j = xy.select(
        "event_type", "band", "n",
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("total"),
        F.sum("n").over(Window.partitionBy("event_type")).cast("bigint")
         .alias("nx"),
        F.sum("n").over(Window.partitionBy("band")).cast("bigint")
         .alias("ny"))
    ratio = ((F.col("n").cast("double") * F.col("total").cast("double"))
             / (F.col("nx").cast("double") * F.col("ny").cast("double")))
    return j.select("event_type", F.col("band").cast("int").alias("band"),
                    "n",
                    _ratio6(F.col("n"), F.col("total")).alias("p_xy"),
                    F.round(F.log(ratio), 6).alias("pmi"),
                    F.round(F.col("n") / F.col("total") * F.log(ratio), 6)
                     .alias("mi_term"))


@register(
    "doc_containment_pairs",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT
               AS shingle
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 2, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 2), ' ')))
                     AS g
            FROM w)),
    sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, count(*)::BIGINT AS i
      FROM sh l JOIN sh r USING (shingle)
      WHERE l.doc_id < r.doc_id GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           ((2 * i * 1000000 + sa.sz) // (2 * sa.sz)) / 1e6
             AS cont_a_in_b,
           ((2 * i * 1000000 + sb.sz) // (2 * sb.sz)) / 1e6
             AS cont_b_in_a
    FROM inter JOIN sz sa ON sa.doc_id = doc_a
               JOIN sz sb ON sb.doc_id = doc_b
    WHERE i / sa.sz >= 0.8 OR i / sb.sz >= 0.8""",
    "llm", "dedup",
)
def doc_containment_pairs(spark, sf_dir):
    """Asymmetric containment similarity |A∩B| / |A| on 3-gram
    shingle sets — the measure that catches a short document embedded
    verbatim inside a longer one (quotes, boilerplate wrappers),
    which symmetric Jaccard dilutes below any usable threshold. Same
    sparse equi-join shape (and cost) as ngram_jaccard_pairs; only
    the final predicate differs."""
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W
    sh = (dedup.word_shingles(docs, n=3, distinct=False)
          .select("doc_id", dedup.base_hash(F.col("shingle")).alias("shingle"))
          .distinct()
          .withColumn("sz", F.count("*").over(W.partitionBy("doc_id"))))
    inter = (sh.alias("l").join(sh.alias("r"), "shingle")
             .filter(F.col("l.doc_id") < F.col("r.doc_id"))
             .groupBy(F.col("l.doc_id").alias("doc_a"),
                      F.col("r.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("i"),
                  F.max("l.sz").alias("sz_a"), F.max("r.sz").alias("sz_b")))
    return (inter
            .filter((F.col("i") / F.col("sz_a") >= 0.8)
                    | (F.col("i") / F.col("sz_b") >= 0.8))
            .select("doc_a", "doc_b",
                    _ratio6(F.col("i"), F.col("sz_a"))
                     .alias("cont_a_in_b"),
                    _ratio6(F.col("i"), F.col("sz_b"))
                     .alias("cont_b_in_a")))


@register(
    "doc_bigram_logppl",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(words) - 1, 0) + 1),
               i -> array_to_string(list_slice(words, i, i + 1), ' ')))
               AS bigram
      FROM w),
    dbc AS (SELECT doc_id, bigram, count(*)::BIGINT AS cnt
            FROM bg GROUP BY 1, 2),
    lm AS (SELECT bigram, sum(cnt)::BIGINT AS c12 FROM dbc GROUP BY 1),
    lm2 AS (
      SELECT bigram, c12,
             sum(c12) OVER (PARTITION BY string_split(bigram, ' ')[1])
               AS c1
      FROM lm),
    lp AS (
      SELECT bigram,
             CAST(round(ln(c12::DOUBLE / c1::DOUBLE) * 1000000000)
                  AS BIGINT) AS lp_units
      FROM lm2),
    sc AS (
      SELECT d.doc_id, sum(d.cnt)::BIGINT AS n_bigrams,
             sum(d.cnt * lp.lp_units)::BIGINT AS units
      FROM dbc d JOIN lp USING (bigram) GROUP BY d.doc_id)
    SELECT doc.doc_id,
           coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
           round(-sc.units / sc.n_bigrams::DOUBLE / 1000000000, 6)
             AS avg_neg_logprob
    FROM documents doc LEFT JOIN sc USING (doc_id)""",
    "llm", "text", "quality",
)
def doc_bigram_logppl(spark, sf_dir):
    """CCNet-style language-model perplexity scoring: every document's
    mean negative log-probability under the corpus' own bigram LM —
    the model-based quality filter (high score = improbable word
    sequences = likely junk) that complements the rule-based Gopher
    flags. The classic curation recipe thresholds this score per
    language before training.

    Determinism trick: each bigram's ln p(w2|w1) is rounded ONCE to
    integer nano-units (round(ln*1e9)), so the per-doc accumulation is
    an EXACT integer sum — float addition order (Spark partial aggs vs
    DuckDB's) can never move the hash; only the final per-doc division
    runs in double. Plan shape: one (doc, bigram) aggregate, the LM is
    a vocab²-sized aggregate with its w1 normalizer as a window over
    that table, and scoring is a shuffle_hash equi-join on the bigram
    key — the LM is vocab²-scaling (billions of distinct bigrams at
    corpus scale), so it must never broadcast; both sides arrive
    bigram-keyed from their aggregates, so the exchange is minimal.
    The corpus text shuffles once (the bigram explode).

    Note on the w1 normalizer window (VERDICT r10 watch item): it runs
    over the LM TABLE (one row per distinct bigram), not the corpus,
    so the exchange it implies is LM-sized BY CONSTRUCTION. If this LM
    ever gains a smoothing pass that joins corpus rows before the
    window, re-check that the window's input is still the aggregate —
    a corpus-keyed window here would be a scale-killer.
    """
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("__w"))
    bg = words.select("doc_id", F.explode(F.expr(
        "CASE WHEN size(__w) >= 2 THEN transform("
        "sequence(1, size(__w) - 1), i -> array_join(slice(__w, i, 2), ' ')) "
        "ELSE CAST(array() AS array<string>) END")).alias("bigram"))
    # r12: dbc feeds the LM aggregate AND the scoring join — pin it so
    # the bigram explode + (doc, bigram) aggregate runs once per
    # action instead of twice (the softdedup_weights fix, same shape)
    dbc = bg.groupBy("doc_id", "bigram").agg(
        F.count("*").cast("long").alias("cnt")) \
        .localCheckpoint(eager=False)
    lm = dbc.groupBy("bigram").agg(F.sum("cnt").cast("long").alias("c12"))
    w1 = Window.partitionBy(F.split(F.col("bigram"), " ")[0])
    lp = lm.select(
        "bigram",
        F.round(F.log(F.col("c12").cast("double")
                      / F.sum("c12").over(w1).cast("double"))
                * F.lit(1_000_000_000)).cast("long").alias("lp_units"))
    sc = (dbc.join(lp.hint("shuffle_hash"), "bigram")
          .groupBy("doc_id")
          .agg(F.sum("cnt").cast("long").alias("n_bigrams"),
               F.sum(F.col("cnt") * F.col("lp_units")).cast("long")
                .alias("units")))
    return (docs.select("doc_id").join(sc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).cast("bigint")
                     .alias("n_bigrams"),
                    F.round(-F.col("units")
                            / F.col("n_bigrams").cast("double")
                            / 1_000_000_000, 6).alias("avg_neg_logprob")))


@register(
    "segment_overlap_hll",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    ex AS (SELECT event_type, count(*)::BIGINT AS n FROM ut GROUP BY 1),
    pairs AS (
      SELECT l.event_type AS type_a, r.event_type AS type_b,
             count(*)::BIGINT AS n_inter_exact
      FROM ut l JOIN ut r ON l.user_id = r.user_id
                         AND l.event_type < r.event_type
      GROUP BY 1, 2)
    SELECT p.type_a, p.type_b,
           ea.n AS n_a_exact, eb.n AS n_b_exact, p.n_inter_exact,
           TRUE AS within_bound
    FROM pairs p JOIN ex ea ON ea.event_type = p.type_a
                 JOIN ex eb ON eb.event_type = p.type_b""",
    "llm", "sketch",
)
def segment_overlap_hll(spark, sf_dir):
    """Audience-overlap via HLL sketch SET OPERATIONS: pairwise
    distinct-user intersections between event types estimated by
    inclusion-exclusion — |A∩B| = |A| + |B| − |A∪B| — over MERGEABLE
    per-type sketches, with the union taken by the PAIRWISE
    `hll_union` scalar on the two stored sketches (sketch algebra in
    codegen — no re-aggregation, no fact rescan; the point at 100 TB:
    intersection has no native sketch, inclusion-exclusion over
    stored unions is the standard estimator). The whole query is ONE
    fact-table scan and THREE shuffles (the r4 form had 13 + two
    scans): a per-user type-set aggregate feeds (a) the per-type
    aggregate computing exact count AND sketch in one pass, and (b)
    the exact pair counts via an in-array pair expansion — replacing
    the former distinct + self-join-on-user + separate partials/
    rollup tree. The gate row hashes exact counts plus a CHECKABLE
    bound: within_bound asserts the estimate lands within 5 % of
    |A|+|B| (generous vs lgk=14's 0.8 % rsd compounded across three
    estimates)."""
    ev = _t(spark, sf_dir, "events")
    # localCheckpoint = the reuse point: one scan + one shuffle build
    # the per-user type sets, and BOTH downstream aggregates read the
    # materialized partitions (exchange reuse alone doesn't unify the
    # two branches — fresh scan nodes canonicalize differently)
    per_user = (ev.groupBy("user_id")
                .agg(F.array_sort(F.collect_set("event_type"))
                     .alias("types"))
                .localCheckpoint(eager=False))
    ut = per_user.select("user_id", F.explode("types").alias("event_type"))
    typ = ut.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    # ordered (type_a < type_b) pairs straight out of the sorted
    # per-user array — codegen array expressions, no self-join
    n_t = F.size("types")
    pair_col = F.flatten(F.transform(
        "types",
        lambda x, i: F.transform(
            F.slice("types", i + 2, n_t),
            lambda y: F.struct(x.alias("type_a"), y.alias("type_b")))))
    inter = (per_user.select(F.explode(pair_col).alias("p"))
             .groupBy(F.col("p.type_a").alias("type_a"),
                      F.col("p.type_b").alias("type_b"))
             .agg(F.count("*").cast("long").alias("n_inter_exact")))
    a = typ.select(F.col("event_type").alias("type_a"),
                   F.col("n").alias("n_a_exact"),
                   F.col("sk").alias("sk_a"))
    b = typ.select(F.col("event_type").alias("type_b"),
                   F.col("n").alias("n_b_exact"),
                   F.col("sk").alias("sk_b"))
    j = (inter.join(F.broadcast(a), "type_a")
              .join(F.broadcast(b), "type_b"))
    est_inter = (F.hll_sketch_estimate("sk_a")
                 + F.hll_sketch_estimate("sk_b")
                 - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")))
    return j.select(
        "type_a", "type_b", "n_a_exact", "n_b_exact", "n_inter_exact",
        (F.abs(est_inter - F.col("n_inter_exact"))
         <= F.greatest(F.lit(2.0),
                       0.05 * (F.col("n_a_exact") + F.col("n_b_exact"))))
        .alias("within_bound"))


def _staged_events_stream_ordered(spark, sf_dir, n_files: int = 4,
                                  order_cols: tuple = ("ts", "event_id")):
    """Stage events as n_files RANGE-PARTITIONED parquet files (file k
    holds the k-th `order_cols` range) and stream them one per
    micro-batch in order — an event-time-ORDERED multi-batch replay.
    FileStreamSource picks up pre-existing files oldest-first (path
    order breaks mtime ties), so both the part-file numbering and the
    explicitly ascending mtimes pin batch k to range k. This is what
    lets sequential-state streaming twins (CUSUM, the delta-alert
    trace) hash-match their batch oracle exactly, where the unordered
    `repartition` staging can only support order-insensitive
    aggregates."""
    import glob
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="sgs_ordstaged_")
    (load_table(spark, sf_dir, "events")
     .withColumn("ts", F.expr("unix_micros(ts)"))
     .repartitionByRange(n_files, *order_cols)
     .sortWithinPartitions(*order_cols)
     .write.mode("overwrite").parquet(d))
    base = 1_700_000_000
    for i, f in enumerate(sorted(glob.glob(os.path.join(d, "part-*")))):
        os.utime(f, (base + i, base + i))
    src = (
        spark.readStream.schema(
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string")
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    return src.withColumn("ts", F.timestamp_micros("ts"))


@register(
    "stream_cusum_drift",
    """
    WITH c AS (
      SELECT event_id, event_type, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    m AS (SELECT event_type, sum(cents) // count(*) AS target
          FROM c GROUP BY event_type),
    p AS (
      SELECT c.event_id, c.event_type, c.ts,
             sum(c.cents - m.target) OVER (
               PARTITION BY c.event_type ORDER BY c.ts, c.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
      FROM c JOIN m USING (event_type))
    SELECT event_id, event_type,
           (pre - least(0, min(pre) OVER (
              PARTITION BY event_type ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::BIGINT
             AS cusum_cents,
           (pre - least(0, min(pre) OVER (
              PARTITION BY event_type ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) > 20000
             AS drift
    FROM p""",
    "streaming", "anomaly",
)
def stream_cusum_drift(spark, sf_dir):
    """The CUSUM drift statistic as REAL keyed streaming state
    (streaming/stateful.py:cusum_trace_state): a 4-micro-batch
    event-time-ORDERED replay through applyInPandasWithState, each key
    holding (prefix sum, running min) and emitting the per-event
    (cusum, drift) trace in append mode. Because the replay is ordered
    (range-partitioned staging) and the state pair is the batch
    operator's closed form, the streamed trace hash-matches the SAME
    DuckDB oracle as the batch query events_cusum_drift — streaming
    state and the batch window provably compute one thing. The
    in-control target is the per-type integer mean, computed batch-
    side and broadcast (a model parameter, not stream state)."""
    from .streaming.stateful import cusum_trace_state
    tune(spark)
    ev = _t(spark, sf_dir, "events")
    tgt = (ev.select("event_type",
                     F.round(F.col("value") * 100).cast("long")
                      .alias("cents"))
           .groupBy("event_type")
           .agg(F.expr(
               # exact integer FLOOR division (DuckDB // semantics):
               # DIV truncates toward zero, so subtract 1 when the
               # sum is negative with a remainder. count(*) > 0.
               "sum(cents) DIV count(*) - CASE WHEN sum(cents) % count(*) <> 0 "
               "AND sum(cents) < 0 THEN 1 ELSE 0 END").alias("target")))
    src = _staged_events_stream_ordered(spark, sf_dir, n_files=4)
    d = (src.select("event_id", "event_type", "ts",
                    F.round(F.col("value") * 100).cast("long")
                     .alias("cents"))
         .join(F.broadcast(tgt), "event_type"))
    out = cusum_trace_state(d, h_units=20000, slack_units=0)
    return _run_to_memory(spark, out, "stream_cusum_drift_result")


@register(
    "part_neighbors_cosine",
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    supp AS (SELECT p, count(*)::BIGINT AS s FROM li GROUP BY p),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS c
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= 2),
    sym AS (
      SELECT pa AS item, pb AS neighbor, c FROM pairs
      UNION ALL
      SELECT pb AS item, pa AS neighbor, c FROM pairs),
    cos AS (
      -- equal supports make the cosine an exact count rational (the
      -- r13 tie class); unequal supports keep the float sqrt path,
      -- whose value is never a terminating 7-dp decimal
      SELECT item, neighbor, c,
             CASE WHEN si.s = sn.s
                  THEN ((2 * c * 1000000 + si.s) // (2 * si.s)) / 1e6
                  ELSE round(c / sqrt(si.s * sn.s), 6) END AS cosine
      FROM sym JOIN supp si ON si.p = item
               JOIN supp sn ON sn.p = neighbor),
    rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY item ORDER BY cosine DESC, neighbor) AS rn
      FROM cos)
    SELECT item, neighbor, c AS pair_cnt, cosine
    FROM rk WHERE rn <= 5""",
    "relational", "recommender",
)
def part_neighbors_cosine(spark, sf_dir):
    """Item-item collaborative filtering: each part's top-5 nearest
    neighbors by co-occurrence cosine c_ij / sqrt(c_i * c_j) — the
    classic memory-based recommender precompute. Pair generation is
    per-basket quadratic on the order key (never corpus-quadratic,
    same blocking as part_cooccurrence_lift), min-support prunes
    before the broadcast support joins, and the per-item top-5 ranks
    the PAIR AGGREGATE (bounded by surviving pairs, not baskets).
    Integer counts in, one sqrt/divide per surviving pair out."""
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("p")).distinct())
    supp = li.groupBy("p").agg(F.count("*").cast("long").alias("s"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (a.join(b, (F.col("a.o") == F.col("b.o"))
                    & (F.col("a.p") < F.col("b.p")))
             .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
             .agg(F.count("*").cast("long").alias("c"))
             .filter(F.col("c") >= 2))
    sym = (pairs.select(F.col("pa").alias("item"),
                        F.col("pb").alias("neighbor"), "c")
           .unionByName(pairs.select(F.col("pb").alias("item"),
                                     F.col("pa").alias("neighbor"), "c")))
    si = supp.select(F.col("p").alias("item"), F.col("s").alias("si"))
    sn = supp.select(F.col("p").alias("neighbor"), F.col("s").alias("sn"))
    # si/sn are part-keyed (SF-scaled): no broadcast hint (r12)
    # equal supports make the cosine an exact count rational (the r13
    # tie class); unequal supports keep the float sqrt path
    cos = (sym.join(si, "item")
           .join(sn, "neighbor")
           .select("item", "neighbor", "c",
                   F.when(F.col("si") == F.col("sn"),
                          _ratio6(F.col("c"), F.col("si")))
                    .otherwise(
                        F.round(F.col("c")
                                / F.sqrt(F.col("si") * F.col("sn")), 6))
                    .alias("cosine")))
    w = Window.partitionBy("item").orderBy(F.col("cosine").desc(),
                                           F.col("neighbor"))
    return (cos.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("item", "neighbor", F.col("c").alias("pair_cnt"),
                    "cosine"))


@register(
    "source_token_entropy",
    """
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    cnt AS (SELECT source, w, count(*)::BIGINT AS c
            FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, sum(c)::BIGINT AS n, count(*)::BIGINT AS vocab
            FROM cnt GROUP BY source),
    lp AS (
      SELECT c.source, c.c,
             CAST(round(ln(c.c::DOUBLE / t.n::DOUBLE) * 1000000000)
                  AS BIGINT) AS lp_units
      FROM cnt c JOIN tot t USING (source)),
    s AS (SELECT source, sum(c * lp_units)::BIGINT AS units
          FROM lp GROUP BY source)
    SELECT t.source, t.n AS n_tokens, t.vocab,
           round(-s.units / t.n::DOUBLE / 1000000000, 6) AS entropy,
           CASE WHEN t.vocab > 1
                THEN round((-s.units / t.n::DOUBLE / 1000000000)
                           / ln(t.vocab::DOUBLE), 6)
                ELSE 0.0 END AS norm_entropy
    FROM s JOIN tot t USING (source)""",
    "llm", "text", "quality",
)
def source_token_entropy(spark, sf_dir):
    """Per-source Shannon entropy of the word distribution — the
    source-level diversity signal (a low-entropy source is template
    spam or boilerplate; mixture weighting and dedup effort both key
    off it). Same integer-nano-unit log determinism as
    doc_bigram_logppl: each ln p is rounded once, the per-source
    accumulation is an exact integer sum, so the hash is safe from
    float addition order. Two map-combined aggregates keyed by
    (source, word) then source; norm_entropy = H / ln(vocab) gives the
    0-1 evenness score."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
    cnt = tok.groupBy("source", "w").agg(
        F.count("*").cast("long").alias("c"))
    ws = Window.partitionBy("source")
    lp = cnt.select(
        "source", "c",
        F.round(F.log(F.col("c").cast("double")
                      / F.sum("c").over(ws).cast("double"))
                * F.lit(1_000_000_000)).cast("long").alias("lp_units"),
        F.sum("c").over(ws).cast("long").alias("n"),
        F.count("*").over(ws).cast("long").alias("vocab"))
    s = lp.groupBy("source", "n", "vocab").agg(
        F.sum(F.col("c") * F.col("lp_units")).cast("long").alias("units"))
    ent = -F.col("units") / F.col("n").cast("double") / 1_000_000_000
    return s.select(
        "source", F.col("n").alias("n_tokens"), "vocab",
        F.round(ent, 6).alias("entropy"),
        F.when(F.col("vocab") > 1,
               F.round(ent / F.log(F.col("vocab").cast("double")), 6))
         .otherwise(F.lit(0.0)).alias("norm_entropy"))


@register(
    "events_decayed_counts",
    """
    WITH mx AS (SELECT max(epoch_us(ts)) AS t_end FROM events),
    u AS (
      SELECT event_type,
             CAST(round(exp(-ln(2) * (t_end - epoch_us(ts))
                            / 86400000000.0) * 1000000000) AS BIGINT)
               AS units
      FROM events CROSS JOIN mx)
    SELECT event_type, count(*)::BIGINT AS n_events,
           ((2 * sum(units)::HUGEINT * 1000000 + 1000000000)
            // 2000000000) / 1e6 AS decayed_count
    FROM u GROUP BY event_type""",
    "relational", "timeseries",
)
def events_decayed_counts(spark, sf_dir):
    """Exponentially-decayed activity counters (1-day half-life) per
    event type, evaluated at the corpus' last timestamp — the
    freshness-weighted popularity signal trending systems keep. The
    sequential recursion c = c·2^(−Δt/τ) + 1 has the order-free closed
    form Σ 2^(−(T−tᵢ)/τ), so it's ONE map-combined aggregate — and
    each term is rounded once to integer nano-units, making the sum
    exact and the hash order-proof. A streaming deployment holds
    (count, last_ts) per key and applies the same decay
    incrementally; the batch form here is its replay oracle."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.expr("unix_micros(ts)")).alias("t_end"))
    u = (ev.crossJoin(F.broadcast(mx))
         .select("event_type",
                 F.round(F.exp(-F.lit(float(__import__("math").log(2)))
                               * (F.col("t_end")
                                  - F.expr("unix_micros(ts)"))
                               / 86400000000.0)
                         * F.lit(1_000_000_000)).cast("long")
                  .alias("units")))
    return (u.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"),
                 # nano-unit sum beyond BIGINT ratio headroom at scale
                 _ratio6_dec(F.sum("units"), F.lit(1_000_000_000))
                  .alias("decayed_count")))


@register(
    "events_psi_drift",
    """
    WITH mx AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
                FROM events),
    c AS (
      SELECT event_type,
             CASE WHEN epoch_us(ts) * 2 < lo + hi THEN 0 ELSE 1 END
               AS half,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events CROSS JOIN mx),
    qs AS (SELECT quantile_cont(cents, 0.25) AS q1,
                  quantile_cont(cents, 0.5) AS q2,
                  quantile_cont(cents, 0.75) AS q3 FROM c),
    b AS (
      SELECT event_type, half,
             CASE WHEN cents <= q1 THEN 0 WHEN cents <= q2 THEN 1
                  WHEN cents <= q3 THEN 2 ELSE 3 END AS band
      FROM c CROSS JOIN qs),
    cell AS (
      SELECT event_type, band,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS n1
      FROM b GROUP BY 1, 2),
    w AS (
      SELECT event_type, band, n0, n1,
             sum(n0) OVER (PARTITION BY event_type) AS nt0,
             sum(n1) OVER (PARTITION BY event_type) AS nt1
      FROM cell),
    terms AS (
      SELECT event_type,
             CAST(round(((n0 + 0.5) / (nt0 + 2.0)
                         - (n1 + 0.5) / (nt1 + 2.0))
                        * ln(((n0 + 0.5) / (nt0 + 2.0))
                             / ((n1 + 0.5) / (nt1 + 2.0)))
                        * 1000000000) AS BIGINT) AS psi_units,
             abs(n0 * nt1 - n1 * nt0) AS ks_num, nt0 * nt1 AS ks_den
      FROM w)
    SELECT event_type,
           ((2 * sum(psi_units)::HUGEINT * 1000000 + 1000000000)
            // 2000000000) / 1e6 AS psi,
           ((2 * max(ks_num)::HUGEINT * 1000000 + max(ks_den))
            // (2 * max(ks_den)::HUGEINT)) / 1e6 AS max_band_gap
    FROM terms GROUP BY event_type""",
    "relational", "analytics", "anomaly",
)
def events_psi_drift(spark, sf_dir):
    """Population stability index per event type between the first and
    second half of the time range — THE standard drift monitor for a
    feature/serving pipeline (PSI > 0.2 = investigate). Bands are
    global exact quartiles (broadcast scalar); shares are
    Laplace-smoothed (n+½)/(nt+2) so a band empty in one half (the
    zero-cell case that breaks naive PSI) contributes a finite term;
    each PSI term (p0−p1)·ln(p0/p1) is rounded once to nano-units so
    the per-type sum is exact-integer; max_band_gap reports the
    largest per-band share difference (the discrete KS statistic)
    from pure integer cross-products. Everything after the two scans
    is a |types|x4-sized aggregate."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.min(F.expr("unix_micros(ts)")).alias("lo"),
                F.max(F.expr("unix_micros(ts)")).alias("hi"))
    c = (ev.crossJoin(F.broadcast(mx))
         .select("event_type",
                 F.when(F.expr("unix_micros(ts)") * 2
                        < F.col("lo") + F.col("hi"), 0).otherwise(1)
                  .alias("half"),
                 F.round(F.col("value") * 100).cast("long").alias("cents")))
    qs = c.agg(F.expr("percentile(cents, 0.25)").alias("q1"),
               F.expr("percentile(cents, 0.5)").alias("q2"),
               F.expr("percentile(cents, 0.75)").alias("q3"))
    b = (c.crossJoin(F.broadcast(qs))
         .select("event_type", "half",
                 F.when(F.col("cents") <= F.col("q1"), 0)
                  .when(F.col("cents") <= F.col("q2"), 1)
                  .when(F.col("cents") <= F.col("q3"), 2)
                  .otherwise(3).alias("band")))
    cell = b.groupBy("event_type", "band").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long")
         .alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long")
         .alias("n1"))
    wt = Window.partitionBy("event_type")
    w = (cell.withColumn("nt0", F.sum("n0").over(wt).cast("long"))
         .withColumn("nt1", F.sum("n1").over(wt).cast("long")))
    # Laplace-smoothed shares (n + 1/2) / (nt + 2): a band empty in one
    # half (the PSI zero-cell case) contributes a finite term instead
    # of dropping out or dividing by zero — deterministic rationals,
    # no epsilon tuning
    p0 = (F.col("n0") + 0.5) / (F.col("nt0") + 2.0)
    p1 = (F.col("n1") + 0.5) / (F.col("nt1") + 2.0)
    terms = w.select(
        "event_type",
        F.round((p0 - p1) * F.log(p0 / p1)
                * F.lit(1_000_000_000)).cast("long").alias("psi_units"),
        F.abs(F.col("n0") * F.col("nt1") - F.col("n1") * F.col("nt0"))
         .alias("ks_num"),
        (F.col("nt0") * F.col("nt1")).alias("ks_den"))
    return (terms.groupBy("event_type")
            .agg(_ratio6_dec(F.sum("psi_units"),
                             F.lit(1_000_000_000)).alias("psi"),
                 _ratio6_dec(F.max("ks_num"), F.max("ks_den"))
                 .alias("max_band_gap")))


@register(
    "benford_price_audit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM lineitem WHERE l_extendedprice > 0),
    c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n)::BIGINT AS total FROM c)
    SELECT digit, n,
           ((2 * n * 1000000 + total) // (2 * total)) / 1e6 AS observed,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford,
           round(abs(n / total::DOUBLE
                     - ln(1.0 + 1.0 / digit) / ln(10.0)), 6) AS abs_dev
    FROM c CROSS JOIN t""",
    "relational", "quality",
)
def benford_price_audit(spark, sf_dir):
    """Benford's-law first-digit audit of line-item prices — the
    classic forensic data-quality check (fabricated or truncated
    numeric columns drift from the log distribution). First digit is
    string arithmetic on exact integer cents (no float log10 on the
    data path); expected shares are the closed-form log₁₀(1 + 1/d).
    One map-combined digit aggregate + a broadcast scalar."""
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_extendedprice") > 0)
          .select(F.substring(F.round(F.col("l_extendedprice") * 100)
                              .cast("long").cast("string"), 1, 1)
                  .cast("int").alias("digit")))
    c = li.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("total"))
    benford = F.round(F.log(1.0 + 1.0 / F.col("digit"))
                      / F.log(F.lit(10.0)), 6)
    return (c.crossJoin(F.broadcast(t))
            .select("digit", "n",
                    _ratio6(F.col("n"), F.col("total"))
                     .alias("observed"),
                    benford.alias("benford"),
                    F.round(F.abs(F.col("n") / F.col("total")
                                  - F.log(1.0 + 1.0 / F.col("digit"))
                                  / F.log(F.lit(10.0))), 6)
                     .alias("abs_dev")))


@register(
    "clickstream_top_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
      SELECT p2 || '>' || p1 || '>' || event_type AS path,
             count(*)::BIGINT AS n
      FROM seq WHERE p2 IS NOT NULL GROUP BY 1)
    SELECT path, n FROM paths ORDER BY n DESC, path LIMIT 20""",
    "relational", "analytics",
)
def clickstream_top_paths(spark, sf_dir):
    """Path mining: the 20 most common 3-step event sequences across
    all user journeys — the navigation-pattern summary funnels are
    built from. Two lags on the single per-user ordering shuffle
    (shared with the whole sessionization family), a path aggregate
    over short strings, top-k as TakeOrderedAndProject with a
    deterministic tie-break."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (ev.select("event_type",
                     F.lag("event_type", 1).over(w).alias("p1"),
                     F.lag("event_type", 2).over(w).alias("p2"))
           .filter(F.col("p2").isNotNull()))
    return (seq.groupBy(F.concat_ws(">", "p2", "p1", "event_type")
                        .alias("path"))
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "path").limit(20))


@register(
    "source_zipf_slope",
    """
    WITH cnt AS (
      SELECT source, w, count(*)::BIGINT AS c FROM (
        SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents) GROUP BY 1, 2),
    rk AS (
      SELECT source, c,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, w) AS rank
      FROM cnt),
    u AS (
      SELECT source,
             CAST(round(ln(rank::DOUBLE) * 1000000000) AS HUGEINT) AS x,
             CAST(round(ln(c::DOUBLE) * 1000000000) AS HUGEINT) AS y
      FROM rk),
    g AS (SELECT source, count(*)::HUGEINT AS n, sum(x) AS sx,
                 sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM u GROUP BY source)
    SELECT source, n::BIGINT AS vocab,
           round(CASE WHEN n * sxx - sx * sx <> 0 THEN
             (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
             END, 9) AS zipf_slope
    FROM g""",
    "llm", "text", "diagnostics",
)
def source_zipf_slope(spark, sf_dir):
    """Zipf's-law fit per source: the OLS slope of ln(frequency) vs
    ln(rank) over the source's word distribution (natural text sits
    near −1; templated/boilerplate sources flatten toward 0 — a
    corpus-shape diagnostic next to entropy). Composes the ranked
    count aggregate with the decimal-exact five-sum OLS
    (operators/timeseries.py:ols_trend): both ln coordinates are
    rounded once to integer nano-units, so all five sums are exact and
    the slope is one double division. The rank window runs over the
    per-source VOCABULARY aggregate, never the token stream."""
    from .operators.timeseries import ols_trend
    docs = _t(spark, sf_dir, "documents")
    cnt = (docs.select("source",
                       F.explode(F.split(F.trim(F.col("text")), r"\s+"))
                        .alias("w"))
           .groupBy("source", "w").agg(F.count("*").cast("long").alias("c")))
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "w")
    rk = cnt.withColumn("rank", F.row_number().over(w))
    u = rk.select(
        "source",
        F.round(F.log(F.col("rank").cast("double"))
                * F.lit(1_000_000_000)).cast("long").alias("x"),
        F.round(F.log(F.col("c").cast("double"))
                * F.lit(1_000_000_000)).cast("long").alias("y"))
    fit = ols_trend(u, "source", F.col("x"), F.col("y"))
    return fit.select("source", F.col("n").alias("vocab"),
                      F.col("slope").alias("zipf_slope"))


@register(
    "order_cohort_ltv",
    """
    WITH o AS (
      SELECT o_custkey AS c,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    w AS (SELECT c, m, cents, min(m) OVER (PARTITION BY c) AS cohort
          FROM o),
    cell AS (
      SELECT (cohort // 12) * 100 + (cohort % 12) + 1 AS cohort_month,
             m - cohort AS month_offset,
             count(DISTINCT c)::BIGINT AS n_active,
             sum(cents)::BIGINT AS revenue_cents
      FROM w GROUP BY 1, 2)
    SELECT cohort_month::BIGINT AS cohort_month, month_offset::BIGINT
             AS month_offset, n_active, revenue_cents,
           sum(revenue_cents) OVER (
             PARTITION BY cohort_month ORDER BY month_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS cum_revenue_cents
    FROM cell""",
    "relational", "analytics",
)
def order_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value triangle: customers grouped by first-order
    month, revenue and active count per month offset, plus the
    cumulative LTV curve per cohort — the standard retention-economics
    view. One orders scan: the cohort label is a min-window on the
    per-customer partitioning, the triangle a (cohort, offset)
    aggregate, and the LTV cumsum a window over that SMALL aggregate.
    Revenue stays integer cents end to end."""
    o = (_t(spark, sf_dir, "orders")
         .select(F.col("o_custkey").alias("c"),
                 (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
                  .alias("m"),
                 F.round(F.col("o_totalprice") * 100).cast("long")
                  .alias("cents")))
    wc = Window.partitionBy("c")
    w = o.withColumn("cohort", F.min("m").over(wc))
    cell = (w.groupBy(
        ((F.col("cohort") / 12).cast("long") * 100
         + F.col("cohort") % 12 + 1).alias("cohort_month"),
        (F.col("m") - F.col("cohort")).alias("month_offset"))
        .agg(F.count_distinct("c").cast("long").alias("n_active"),
             F.sum("cents").cast("long").alias("revenue_cents")))
    wl = (Window.partitionBy("cohort_month").orderBy("month_offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return cell.select(
        F.col("cohort_month").cast("long"),
        F.col("month_offset").cast("long"),
        "n_active", "revenue_cents",
        F.sum("revenue_cents").over(wl).cast("long")
         .alias("cum_revenue_cents"))


@register(
    "part_demand_abc_xyz",
    """
    WITH wk AS (
      SELECT l_partkey AS part,
             date_diff('day', DATE '1970-01-01', l_shipdate::DATE) // 7
               AS week,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS wq,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev
      FROM lineitem GROUP BY 1, 2),
    st AS (
      SELECT part, count(*)::HUGEINT AS n, sum(wq)::HUGEINT AS s,
             sum(wq * wq)::HUGEINT AS q,
             sum(rev)::BIGINT AS revenue_cents
      FROM wk GROUP BY part),
    abc AS (
      SELECT part, n, s, q, revenue_cents,
             sum(revenue_cents) OVER (ORDER BY revenue_cents DESC, part
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(revenue_cents) OVER () AS total
      FROM st)
    SELECT part, n::BIGINT AS n_weeks, revenue_cents,
           CASE WHEN (cum - revenue_cents) * 10 < total * 8 THEN 'A'
                WHEN (cum - revenue_cents) * 100 < total * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CASE WHEN 4 * (n * q - s * s) <= s * s THEN 'X'
                WHEN (n * q - s * s) <= s * s THEN 'Y'
                ELSE 'Z' END AS xyz_class,
           ((2 * (n * q - s * s)::HUGEINT * 1000000 + (s * s)::HUGEINT)
            // (2 * (s * s)::HUGEINT)) / 1e6 AS cv2
    FROM abc""",
    "relational", "analytics",
)
def part_demand_abc_xyz(spark, sf_dir):
    """Inventory ABC/XYZ matrix: every part classified by revenue
    contribution (A = first 80% of the cumulative revenue ranking,
    B to 95%, C rest) and by demand variability (squared coefficient
    of variation over weekly demand: X ≤ 0.25, Y ≤ 1, Z beyond) —
    the planner's 9-cell stocking-policy grid. CV² classes compare
    EXACT integers (n·Σq² − S² cross-multiplied against rational
    thresholds); the ABC ranking is a global cumsum computed by the
    distributed three-step scan (operators/prefix.py) over the PART
    aggregate, integer cents so partial order is irrelevant."""
    from .operators.prefix import ordered_prefix_sum
    d38 = "decimal(38,0)"
    wk = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_partkey").alias("part"),
                  # datediv-by-7 week index: l_shipdate arrives as
                  # TIMESTAMP_NTZ under a vanilla session, so date
                  # arithmetic (not unix_micros) is the portable path
                  F.expr("datediff(cast(l_shipdate as date), "
                         "date'1970-01-01') div 7").alias("week"),
                  F.round(F.col("l_quantity") * 100).cast("long")
                   .alias("qc"),
                  F.round(F.col("l_extendedprice") * 100).cast("long")
                   .alias("rc"))
          .groupBy("part", "week")
          .agg(F.sum("qc").cast("long").alias("wq"),
               F.sum("rc").cast("long").alias("rev")))
    st = wk.groupBy("part").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("wq").cast(d38).alias("s"),
        F.sum(F.col("wq").cast(d38) * F.col("wq").cast(d38)).alias("q"),
        F.sum("rev").cast("long").alias("revenue_cents"))
    cum = ordered_prefix_sum(
        st, [F.col("revenue_cents").desc(), F.col("part").asc()],
        "revenue_cents", out_col="cum", partitions=8)
    total = st.agg(F.sum("revenue_cents").cast("long").alias("total"))
    var = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (cum.crossJoin(F.broadcast(total))
            .select("part", F.col("n").cast("long").alias("n_weeks"),
                    "revenue_cents",
                    # classify on the cumulative share BEFORE the part
                    # ("take parts until 80% is covered") — the literal
                    # cum<=80% rule would misclass a single dominant
                    # part as C, the classic ABC fencepost
                    F.when((F.col("cum") - F.col("revenue_cents")) * 10
                           < F.col("total") * 8, "A")
                     .when((F.col("cum") - F.col("revenue_cents")) * 100
                           < F.col("total") * 95, "B")
                     .otherwise("C").alias("abc_class"),
                    F.when(4 * var <= F.col("s") * F.col("s"), "X")
                     .when(var <= F.col("s") * F.col("s"), "Y")
                     .otherwise("Z").alias("xyz_class"),
                    # n*q - s^2 over s^2: exact integer rational
                    # beyond BIGINT headroom (r13 tie class)
                    _ratio6_dec(var, F.col("s") * F.col("s"))
                     .alias("cv2")))


def _curation_v3_sql() -> str:
    gopher = REGISTRY["gopher_quality_flags"].oracle
    ppl = REGISTRY["doc_bigram_logppl"].oracle
    return f"""
    WITH RECURSIVE gk AS (
      SELECT doc_id, n_words FROM ({gopher}) WHERE keep),
    ppl AS (SELECT * FROM ({ppl})),
    med AS (
      SELECT quantile_cont(avg_neg_logprob, 0.5) AS m
      FROM ppl WHERE n_bigrams > 0),
    surv AS (
      SELECT d.doc_id, d.lang, gk.n_words, ppl.avg_neg_logprob
      FROM documents d
      JOIN gk USING (doc_id) JOIN ppl USING (doc_id) CROSS JOIN med
      WHERE ppl.avg_neg_logprob <= med.m),
    pairs AS (
      SELECT doc_a, doc_b FROM ({_minhash_pairs_sql()})
      WHERE doc_a IN (SELECT doc_id FROM surv)
        AND doc_b IN (SELECT doc_id FROM surv)),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach(id, label) AS (
      SELECT doc_id, doc_id FROM surv
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON r.id = e.src),
    clusters AS (
      SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id)
    SELECT s.doc_id, s.lang, s.n_words, s.avg_neg_logprob
    FROM surv s JOIN clusters c USING (doc_id)
    WHERE c.cluster_id = s.doc_id"""


@register("pipeline_curation_v3", _curation_v3_sql(), "llm", "pipeline")
def pipeline_curation_v3(spark, sf_dir):
    """The round-3 quality signals composed into one curation job:
    Gopher rule suite (all six flags pass) AND bigram-LM perplexity at
    or below the corpus median (drop the improbable half) -> MinHash
    near-dup clustering over the SURVIVORS with only cluster canonicals
    kept. Each stage is the standalone oracle-checked operator; the
    oracle here is their literal SQL composition (recursive-CTE
    components over the survivor-induced pair graph — valid because
    LSH signatures and pair similarity are per-doc/pairwise, so
    survivor pairs equal full-corpus pairs restricted to survivors).
    Scale shape: the rule/LM filters are narrow doc-keyed aggregates
    that shrink the corpus BEFORE the shingle/cluster machinery runs —
    the cheap-stages-first ordering every production curation chain
    uses."""
    from .operators.graph import dedup_clusters as clusters
    docs = _t(spark, sf_dir, "documents")
    gk = (text.gopher_quality_flags(docs).filter(F.col("keep"))
          .select("doc_id", "n_words"))
    # r12: the perplexity table feeds BOTH the corpus-median aggregate
    # and the per-doc survivor join — unmaterialized, the whole bigram
    # LM (train + score, the pipeline's most expensive stage) executed
    # twice per action. One lazy checkpoint of the narrow
    # (doc_id, n_bigrams, avg_neg_logprob) rows pins it to one run.
    ppl = REGISTRY["doc_bigram_logppl"].fn(spark, sf_dir) \
        .localCheckpoint(eager=False)
    med = (ppl.filter(F.col("n_bigrams") > 0)
           .agg(F.expr("percentile(avg_neg_logprob, 0.5)").alias("m")))
    surv = (docs.join(gk, "doc_id")
            .join(ppl.select("doc_id", "avg_neg_logprob"), "doc_id")
            .crossJoin(F.broadcast(med))
            .filter(F.col("avg_neg_logprob") <= F.col("m")))
    surv_docs = surv.select("doc_id", "text", "lang", "n_words",
                            "avg_neg_logprob").localCheckpoint(eager=False)
    pairs = dedup.minhash_lsh_pairs(surv_docs, num_hashes=16, bands=4,
                                    n=3, threshold=0.5)
    cl = clusters(surv_docs.select("doc_id"), pairs)
    return (surv_docs.join(cl, "doc_id")
            .filter(F.col("cluster_id") == F.col("doc_id"))
            .select("doc_id", "lang", "n_words", "avg_neg_logprob"))


@register(
    "ann_topk_ivfpq",
    f"""
    WITH {_PQ_CODES_CTES},
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 ORDER BY vec_id LIMIT 256),
    affinity AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY list_dot_product(v, cv) / (norm * cnorm) DESC,
                        cent_id) AS r
      FROM n, c),
    assign AS (
      SELECT vec_id, cent_id AS cell FROM affinity WHERE r = 1),
    probes AS (
      SELECT a.vec_id AS query_id, a.cent_id AS cell
      FROM affinity a JOIN q ON a.vec_id = q.query_id
      WHERE a.r <= 2),
    ad AS (
      SELECT p.query_id, cd.vec_id AS neighbor_id, sum(t.d) AS adist
      FROM codes cd
      JOIN assign a ON a.vec_id = cd.vec_id
      JOIN probes p ON a.cell = p.cell
      JOIN tab t ON t.query_id = p.query_id
                AND t.s = cd.s AND t.code = cd.code
      WHERE cd.vec_id != p.query_id
      GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, neighbor_id, adist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rank
      FROM ad)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank,
           round(adist, 6) AS adist
    FROM ranked WHERE rank <= 5""",
    "llm", "ann",
)
def ann_topk_ivfpq(spark, sf_dir):
    """IVF-PQ top-k (operators/similarity.py:ivfpq_topk): the FAISS
    IndexIVFPQ recipe — inverted-file cells prune WHICH vectors are
    scored, PQ codes prune WHAT is read — composed from the repo's
    oracle-checked quantizer and code halves. Both halves are
    deterministic (id-sampled centroids and codebook), so the oracle
    reproduces cell assignment, nprobe=2 probing, AND the ADC
    distances in SQL — a full value check of the composition."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(emb, k=5, query_mod=50, nprobe=2)


@register(
    "supplier_return_wilson",
    """
    WITH s AS (
      SELECT l_suppkey AS supplier, count(*)::BIGINT AS n,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
               AS returns
      FROM lineitem GROUP BY l_suppkey),
    wb AS (
      SELECT supplier, n, returns,
             returns / n::DOUBLE AS rate,
             (returns / n::DOUBLE + 1.9208 / n
              - 1.96 * sqrt((returns / n::DOUBLE)
                            * (1 - returns / n::DOUBLE) / n
                            + 0.9604 / (n * n::DOUBLE)))
             / (1 + 3.8416 / n) AS lb
      FROM s WHERE n > 0)
    SELECT supplier, n, returns,
           ((2 * returns * 1000000 + n) // (2 * n)) / 1e6 AS return_rate,
           round(lb, 6) AS wilson_lb
    FROM wb""",
    "relational", "analytics",
)
def supplier_return_wilson(spark, sf_dir):
    """Return-rate ranking under uncertainty: each supplier's return
    rate with its Wilson-score 95% lower bound — the ranking statistic
    that stops a 1-of-2 supplier outranking a 40-of-100 one (raw rates
    can't be compared across sample sizes; the Wilson bound is the
    standard fix). One map-combined aggregate; the bound is pure
    column arithmetic over exact integer counts with the z=1.96
    constants pre-squared (1.9208 = z²/2, 3.8416 = z², 0.9604 =
    z²/4), identical on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_suppkey").alias("supplier")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
         .cast("long").alias("returns"))
    rate = F.col("returns") / F.col("n")
    lb = ((rate + 1.9208 / F.col("n")
           - 1.96 * F.sqrt(rate * (1 - rate) / F.col("n")
                           + 0.9604 / (F.col("n") * F.col("n"))))
          / (1 + 3.8416 / F.col("n")))
    return s.select("supplier", "n", "returns",
                    _ratio6(F.col("returns"), F.col("n"))
                    .alias("return_rate"),
                    F.round(lb, 6).alias("wilson_lb"))


@register(
    "events_burst_minutes",
    """
    WITH b AS (
      SELECT event_type, epoch_us(ts) // 60000000 AS minute,
             count(*)::HUGEINT AS c
      FROM events GROUP BY 1, 2),
    st AS (
      SELECT event_type, count(*)::HUGEINT AS n, sum(c)::HUGEINT AS s,
             sum(c * c)::HUGEINT AS q
      FROM b GROUP BY event_type)
    SELECT b.event_type, b.minute::BIGINT AS minute, b.c::BIGINT AS cnt,
           round((st.n * b.c - st.s)::DOUBLE
                 / sqrt((st.n * st.q - st.s * st.s)::DOUBLE), 6)
             AS sigma_score
    FROM b JOIN st USING (event_type)
    WHERE st.n * b.c > st.s
      AND (st.n * b.c - st.s) * (st.n * b.c - st.s)
          > 9 * (st.n * st.q - st.s * st.s)""",
    "relational", "timeseries", "anomaly",
)
def events_burst_minutes(spark, sf_dir):
    """Burst detection on per-minute arrival COUNTS: minutes whose
    event volume exceeds the type's mean by 3 standard deviations —
    rate anomalies, which the per-event value monitors (z-score, MAD,
    CUSUM) can't see. The 3-sigma test is EXACT integer arithmetic:
    c > mu + 3*sigma becomes n*c - S > 0 AND (n*c - S)^2 > 9(nQ - S^2)
    (cross-multiplied through by n^2), so no float ever decides a
    flag; sigma_score is reported in double for ranking only. One
    map-combined minute aggregate + a per-type moment aggregate
    broadcast back onto it — the minute table is |types| x minutes,
    never the event stream."""
    ev = _t(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    b = (ev.select("event_type",
                   F.expr("unix_micros(ts) div 60000000").alias("minute"))
         .groupBy("event_type", "minute")
         .agg(F.count("*").cast(d38).alias("c")))
    st = b.groupBy("event_type").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"))
    dev = F.col("n") * F.col("c") - F.col("s")
    var = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (b.join(F.broadcast(st), "event_type")
            .filter((dev > 0) & (dev * dev > 9 * var))
            .select("event_type", F.col("minute").cast("long"),
                    F.col("c").cast("long").alias("cnt"),
                    F.round(dev.cast("double")
                            / F.sqrt(var.cast("double")), 6)
                     .alias("sigma_score")))


@register(
    "embedding_top_pc",
    """
    WITH t AS (SELECT count(*)::BIGINT AS n FROM embeddings)
    SELECT unnest(generate_series(0, 63))::INT AS dim_idx, n AS n_vectors,
           TRUE AS unit_norm_ok, TRUE AS explained_ok, TRUE AS residual_ok
    FROM t""",
    "llm", "ann", "embeddings",
)
def embedding_top_pc(spark, sf_dir):
    """Top principal component of the embedding matrix by distributed
    power iteration (operators/similarity.py:top_principal_component)
    — the whitening/PCA preprocessing step embedding pipelines (e.g.
    SemDeDup) run before clustering. Each iteration is one narrow
    codegen scan producing a 64-float row; only that row reaches the
    driver. Iterated float linear algebra has no SQL twin, so the gate
    row carries CHECKABLE ENVELOPES computed from the solution itself:
    unit-norm loadings (|v|=1 within rounding), eigenvalue/explained
    consistency (0 < lambda, lambda <= trace so explained <= 1, and
    explained >= 1/(2 dim) — the Rayleigh quotient of a converging
    power iteration), and the eigen-residual ||Cv - lambda v|| <= 0.25
    lambda. The 0.25 bound is GUARANTEED by construction, not
    empirically: the operator iterates adaptively until its residual
    clears residual_target=0.125 (2x margin under this gate) or a
    4x-iteration budget trips — a corpus with a tiny spectral gap
    costs extra scans, not a red gate (measured 0.06-0.10 on the test
    corpora, converging within the 6 base iterations).
    The oracle recomputes dim_idx/n_vectors exactly and asserts TRUE;
    numpy parity of the actual loadings is pinned in tests. The full
    (loading, eigenvalue) surface stays on the operator."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    pc = similarity.top_principal_component(emb, dim=64, iterations=6)
    norm2 = F.sum(F.col("loading") * F.col("loading")).over(
        Window.partitionBy())  # 64 rows — a global window is fine here
    return pc.select(
        "dim_idx", "n_vectors",
        (F.abs(norm2 - 1.0) <= 1e-4).alias("unit_norm_ok"),
        ((F.col("eigenvalue") > 0)
         & (F.col("explained_ratio") <= 1.0 + 1e-9)
         & (F.col("explained_ratio") >= 1.0 / 128)).alias("explained_ok"),
        (F.col("residual_ratio") <= 0.25).alias("residual_ok"))


@register(
    "lineitem_quantity_equidepth",
    """
    WITH c AS (
      SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q FROM lineitem),
    b AS (
      SELECT quantile_cont(q, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
      FROM c),
    t AS (
      SELECT q,
             (CASE WHEN q <= bs[1] THEN 0 WHEN q <= bs[2] THEN 1
                   WHEN q <= bs[3] THEN 2 WHEN q <= bs[4] THEN 3
                   WHEN q <= bs[5] THEN 4 WHEN q <= bs[6] THEN 5
                   WHEN q <= bs[7] THEN 6 WHEN q <= bs[8] THEN 7
                   WHEN q <= bs[9] THEN 8 ELSE 9 END) AS bucket
      FROM c CROSS JOIN b)
    SELECT bucket::INT AS bucket, count(*)::BIGINT AS n,
           min(q)::BIGINT AS lo_centi, max(q)::BIGINT AS hi_centi,
           sum(q)::BIGINT AS sum_centi
    FROM t GROUP BY bucket""",
    "relational", "layout",
)
def lineitem_quantity_equidepth(spark, sf_dir):
    """Equi-depth histogram construction over l_quantity — the
    statistics primitive a cost-based optimizer (and any range-
    partitioner) builds: decile boundaries from ONE exact interpolated
    percentile pass (a broadcast scalar row), then a bucket-classify +
    aggregate second pass. Depth balance is inherent to the quantile
    boundaries; per-bucket min/max/sum ride along in integer
    centi-units. At 100 TB the exact percentile swaps for the t-digest
    sketch (operators/sketches.py) with the same two-pass shape."""
    c = (_t(spark, sf_dir, "lineitem")
         .select(F.round(F.col("l_quantity") * 100).cast("long")
                 .alias("q")))
    qs = c.agg(F.expr(
        "percentile(q, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .alias("bs"))
    t = c.crossJoin(F.broadcast(qs))
    bucket = F.lit(9)
    for i in range(8, -1, -1):
        bucket = F.when(F.col("q") <= F.col("bs")[i], i).otherwise(bucket)
    return (t.select("q", bucket.alias("bucket"))
            .groupBy(F.col("bucket").cast("int").alias("bucket"))
            .agg(F.count("*").cast("long").alias("n"),
                 F.min("q").cast("long").alias("lo_centi"),
                 F.max("q").cast("long").alias("hi_centi"),
                 F.sum("q").cast("long").alias("sum_centi")))


@register(
    "stream_ab_guardrail",
    """
    WITH e AS (
      SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2
               AS bucket,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    g AS (
      SELECT event_type,
             count(*) FILTER (bucket = 0)::HUGEINT AS na,
             count(*) FILTER (bucket = 1)::HUGEINT AS nb,
             coalesce(sum(cents) FILTER (bucket = 0), 0)::HUGEINT AS sa,
             coalesce(sum(cents) FILTER (bucket = 1), 0)::HUGEINT AS sb,
             coalesce(sum(cents * cents) FILTER (bucket = 0), 0)::HUGEINT
               AS qa,
             coalesce(sum(cents * cents) FILTER (bucket = 1), 0)::HUGEINT
               AS qb
      FROM e GROUP BY event_type)
    SELECT event_type, na::BIGINT AS n_a, nb::BIGINT AS n_b,
           CASE WHEN na > 0
                THEN ((2 * sa::HUGEINT * 1000000 + 100 * na)
                      // (2 * 100 * na::HUGEINT)) / 1e6 END AS mean_a,
           CASE WHEN nb > 0
                THEN ((2 * sb::HUGEINT * 1000000 + 100 * nb)
                      // (2 * 100 * nb::HUGEINT)) / 1e6 END AS mean_b,
           CASE WHEN na > 1 AND nb > 1
                AND (na * qa - sa * sa > 0 OR nb * qb - sb * sb > 0)
                THEN round((sa::DOUBLE / na::DOUBLE - sb::DOUBLE / nb::DOUBLE)
                 / sqrt((na * qa - sa * sa)::DOUBLE
                        / (na * (na - 1))::DOUBLE / na::DOUBLE
                        + (nb * qb - sb * sb)::DOUBLE
                        / (nb * (nb - 1))::DOUBLE / nb::DOUBLE), 6) END AS z
    FROM g""",
    "streaming", "analytics",
)
def stream_ab_guardrail(spark, sf_dir):
    """The A/B guardrail as a LIVE streaming metric: the events replay
    (4 micro-batches) maintains per-(type, bucket) moment state —
    count, Σcents, Σcents² as exact integers — in a complete-mode
    streaming aggregation; the Welch z is computed from the final
    state. Because every moment is a commutative integer sum, batch
    order CANNOT matter, so the streamed guardrail hash-matches the
    one-shot ab_test_zscores oracle with the plain (unordered) staged
    replay — the experimentation dashboard an online system keeps,
    with the batch query as its audit."""
    tune(spark)
    d38 = "decimal(38,0)"
    src = _staged_events_stream(spark, sf_dir, n_files=4)
    e = src.select(
        "event_type",
        (dedup.base_hash(F.col("user_id").cast("string")) % 2)
         .alias("bucket"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    agg = (e.groupBy("event_type", "bucket")
           .agg(F.count("*").cast(d38).alias("n"),
                F.sum("cents").cast(d38).alias("s"),
                F.sum(F.col("cents") * F.col("cents")).cast(d38)
                 .alias("q")))
    state = _run_to_memory(spark, agg, "stream_ab_guardrail_state",
                           mode="complete")
    a0 = F.col("bucket") == 0
    g = state.groupBy("event_type").agg(
        F.sum(F.when(a0, F.col("n")).otherwise(0)).cast(d38).alias("na"),
        F.sum(F.when(~a0, F.col("n")).otherwise(0)).cast(d38).alias("nb"),
        F.sum(F.when(a0, F.col("s")).otherwise(0)).cast(d38).alias("sa"),
        F.sum(F.when(~a0, F.col("s")).otherwise(0)).cast(d38).alias("sb"),
        F.sum(F.when(a0, F.col("q")).otherwise(0)).cast(d38).alias("qa"),
        F.sum(F.when(~a0, F.col("q")).otherwise(0)).cast(d38).alias("qb"))
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    va = ((F.col("na") * F.col("qa") - F.col("sa") * F.col("sa"))
          .cast("double") / (F.col("na") * (F.col("na") - 1)).cast("double"))
    vb = ((F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb"))
          .cast("double") / (F.col("nb") * (F.col("nb") - 1)).cast("double"))
    # degenerate-split guards: a cell with 0/1 rows (or zero variance
    # on both arms) yields NULL in Spark's non-ANSI division but
    # inf/NaN in DuckDB — make both engines emit NULL explicitly
    z_ok = ((F.col("na") > 1) & (F.col("nb") > 1) &
            ((F.col("na") * F.col("qa") > F.col("sa") * F.col("sa")) |
             (F.col("nb") * F.col("qb") > F.col("sb") * F.col("sb"))))
    return g.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.when(F.col("na") > 0,
               _ratio6_dec(F.col("sa"), F.col("na") * 100)).alias("mean_a"),
        F.when(F.col("nb") > 0,
               _ratio6_dec(F.col("sb"), F.col("nb") * 100)).alias("mean_b"),
        F.when(z_ok, F.round((sa / na - sb / nb)
                             / F.sqrt(va / na + vb / nb), 6)).alias("z"))


@register(
    "funnel_time_percentiles",
    """
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS v_us
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v_us
      GROUP BY e.user_id),
    lat AS (
      SELECT p.user_id, p.p_us - v.v_us AS us
      FROM p JOIN v USING (user_id))
    SELECT count(*)::BIGINT AS n_converted,
           ((2 * CAST(quantile_cont(us, 0.5) * 2 AS BIGINT) * 1000000
             + 2000000) // (2 * 2000000)) / 1e6 AS p50_s,
           round(quantile_cont(us, 0.9) / 1000000.0, 6) AS p90_s,
           round(max(us) / 1000000.0, 6) AS max_s
    FROM lat""",
    "relational", "analytics",
)
def funnel_time_percentiles(spark, sf_dir):
    """Conversion LATENCY distribution: per user, the time from first
    'view' to the first subsequent 'purchase', summarized as exact
    interpolated p50/p90/max — the metric funnel_conversion's step
    counts don't expose (HOW LONG the funnel takes, not just how
    often it completes). Two per-user min-aggregates joined on
    user_id (the second predicate-pushed to 'purchase' rows only),
    then one scalar percentile pass over the |converters|-sized
    latency table. Latencies stay integer microseconds until the
    final seconds division."""
    ev = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min(us).alias("v_us")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id", us.alias("e_us"))
         .join(v, "user_id")
         .filter(F.col("e_us") >= F.col("v_us"))
         .groupBy("user_id").agg(F.min("e_us").alias("p_us")))
    lat = (p.join(v, "user_id")
           .select((F.col("p_us") - F.col("v_us")).alias("us")))
    return lat.agg(
        F.count("*").cast("long").alias("n_converted"),
        # p50 of integer us is an exact half-integer: S/(2*10^6) is the
        # r13 tie class (2*p50 = S recovers the integer exactly)
        _ratio6((F.expr("percentile(us, 0.5)") * 2).cast("long"),
                F.lit(2_000_000)).alias("p50_s"),
        F.round(F.expr("percentile(us, 0.9)") / 1_000_000.0, 6)
         .alias("p90_s"),
        F.round(F.max("us") / 1_000_000.0, 6).alias("max_s"))


def _lsh_band_sweep_sql() -> str:
    truth = """
    w4 AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents),
    sh4 AS (
      SELECT DISTINCT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT AS shingle
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(words) - 2, 0) + 1),
                     i -> array_to_string(list_slice(words, i, i + 2), ' ')))
                     AS g
            FROM w4)),
    sz4 AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh4 GROUP BY doc_id),
    truth AS (
      SELECT i.doc_a, i.doc_b FROM (
        SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
               count(*)::BIGINT AS i4
        FROM sh4 l JOIN sh4 r USING (shingle)
        WHERE l.doc_id < r.doc_id GROUP BY 1, 2) i
      JOIN sz4 sa ON sa.doc_id = i.doc_a
      JOIN sz4 sb ON sb.doc_id = i.doc_b
      WHERE i.i4 / (sa.sz + sb.sz - i.i4) >= 0.5)"""
    per = []
    sel = []
    for b in (2, 4, 8):
        r = 16 // b
        per.append(f"lsh_{b} AS (SELECT DISTINCT doc_a, doc_b FROM "
                   f"({_minhash_pairs_sql(bands=b, rows=r, threshold=0.0)}))")
        sel.append(f"""
    SELECT {b} AS bands, {r} AS rows_per_band,
           (SELECT count(*) FROM lsh_{b})::BIGINT AS n_pred,
           (SELECT count(*) FROM truth)::BIGINT AS n_true,
           (SELECT count(*) FROM lsh_{b} JOIN truth USING (doc_a, doc_b))
             ::BIGINT AS tp,
           ((2 * (SELECT count(*) FROM lsh_{b} JOIN truth
                   USING (doc_a, doc_b))::BIGINT * 1000000
             + greatest((SELECT count(*) FROM lsh_{b}), 1))
            // (2 * greatest((SELECT count(*) FROM lsh_{b}), 1)::BIGINT))
           / 1e6 AS precision,
           ((2 * (SELECT count(*) FROM lsh_{b} JOIN truth
                   USING (doc_a, doc_b))::BIGINT * 1000000
             + greatest((SELECT count(*) FROM truth), 1))
            // (2 * greatest((SELECT count(*) FROM truth), 1)::BIGINT))
           / 1e6 AS recall""")
    return ("WITH " + truth.lstrip()[0:] + ",\n    "
            + ",\n    ".join(per) + "\n" + "\n    UNION ALL".join(sel))


@register("lsh_band_sweep", _lsh_band_sweep_sql(), "llm", "dedup",
          "diagnostics")
def lsh_band_sweep(spark, sf_dir):
    """The banding-parameter tuning table: candidate precision/recall
    for three (bands, rows) splits of the same 16-hash signature —
    2x8 (high precision), 4x4, 8x2 (high recall) — against exact
    3-gram Jaccard >= 0.5 truth. The S-curve trade-off
    P(candidate) = 1 - (1 - J^rows)^bands made measurable: THE table
    you consult before committing banding at 100 TB. Signatures are
    computed once per config from the shared shingle machinery; truth
    once."""
    docs = _t(spark, sf_dir, "documents")
    truth = (dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
             .select("doc_a", "doc_b").localCheckpoint(eager=False))
    # shingle + hash ONCE; each config only re-bands the stored
    # signature table (dedup.lsh_pairs_from_sigs)
    sigs = dedup.minhash_signatures(docs, num_hashes=16, n=3)         .localCheckpoint(eager=False)  # first config's stats action
    # materializes the shared signature table (r12 job-fold)
    n_true = truth.count()
    out = None
    for b in (2, 4, 8):
        pred = (dedup.lsh_pairs_from_sigs(sigs, num_hashes=16, bands=b,
                                          threshold=0.0,
                                          # sigs is already pinned above:
                                          # don't persist a per-config
                                          # copy (r12 ADVICE)
                                          materialize=False)
                .select("doc_a", "doc_b").distinct())
        # ONE action per config: n_pred and tp from the same left join
        stats = (pred.join(truth.withColumn("__t", F.lit(1)),
                           ["doc_a", "doc_b"], "left")
                 .agg(F.count("*").alias("n_pred"),
                      F.count("__t").alias("tp")).collect()[0])
        n_pred, tp = stats["n_pred"], stats["tp"]
        row = spark.createDataFrame(
            [(b, 16 // b, n_pred, n_true, tp)],
            "bands int, rows_per_band int, n_pred bigint, n_true bigint, "
            "tp bigint")
        row = row.select(
            "*",
            _ratio6(F.col("tp"), F.greatest(F.col("n_pred"), F.lit(1)))
             .alias("precision"),
            _ratio6(F.col("tp"), F.greatest(F.col("n_true"), F.lit(1)))
             .alias("recall"))
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "events_chi2_independence",
    """
    WITH c AS (
      SELECT event_type, hour(ts) AS hr, count(*)::HUGEINT AS n
      FROM events GROUP BY 1, 2),
    mx AS (SELECT event_type, sum(n) AS nx FROM c GROUP BY 1),
    my AS (SELECT hr, sum(n) AS ny FROM c GROUP BY 1),
    t AS (SELECT sum(n) AS total FROM c),
    cells AS (
      SELECT c.event_type, c.hr, c.n, mx.nx, my.ny, t.total,
             (c.n * t.total - mx.nx * my.ny) AS dev
      FROM c JOIN mx USING (event_type) JOIN my USING (hr)
      CROSS JOIN t)
    SELECT event_type,
           round(sum((dev::DOUBLE / total::DOUBLE)
                     * (dev::DOUBLE / total::DOUBLE)
                     / (nx::DOUBLE * ny::DOUBLE / total::DOUBLE)), 6)
             AS chi2_contrib,
           count(*)::BIGINT AS n_cells
    FROM cells GROUP BY event_type""",
    "relational", "analytics", "anomaly",
)
def events_chi2_independence(spark, sf_dir):
    """Chi-square independence screen between event type and
    hour-of-day: per-type contribution to the global X² statistic —
    the categorical complement of mutual_information_bands (MI
    measures association in nats; X² is the classical test statistic
    with a known null distribution). Deviations n·N − nx·ny are EXACT
    integer cross-products; only the final normalized square runs in
    double. One (type, hour) aggregate; marginals broadcast back onto
    the |types|x24 cell table."""
    ev = _t(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    c = (ev.select("event_type", F.hour("ts").alias("hr"))
         .groupBy("event_type", "hr")
         .agg(F.count("*").cast(d38).alias("n")))
    mx = c.groupBy("event_type").agg(F.sum("n").alias("nx"))
    my = c.groupBy("hr").agg(F.sum("n").alias("ny"))
    t = c.agg(F.sum("n").alias("total"))
    cells = (c.join(F.broadcast(mx), "event_type")
             .join(F.broadcast(my), "hr").crossJoin(F.broadcast(t)))
    dev = (F.col("n") * F.col("total")
           - F.col("nx") * F.col("ny")).cast("double")
    expected = (F.col("nx").cast("double") * F.col("ny").cast("double")
                / F.col("total").cast("double"))
    contrib = ((dev / F.col("total").cast("double"))
               * (dev / F.col("total").cast("double")) / expected)
    return (cells.groupBy("event_type")
            .agg(F.round(F.sum(contrib), 6).alias("chi2_contrib"),
                 F.count("*").cast("long").alias("n_cells")))


@register(
    "vocab_coverage_curve",
    """
    WITH cnt AS (
      SELECT w, count(*)::BIGINT AS c FROM (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents) GROUP BY w),
    rk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rank,
             sum(c) OVER (ORDER BY c DESC, w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cnt),
    t AS (SELECT sum(c)::BIGINT AS total, count(*)::BIGINT AS vocab
          FROM cnt),
    ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS k)
    SELECT k::INT AS k,
           coalesce((SELECT max(cum) FROM rk WHERE rank <= k), 0)::BIGINT
             AS covered,
           t.total AS total_tokens,
           ((2 * coalesce((SELECT max(cum) FROM rk WHERE rank <= k),
                          0)::BIGINT * 1000000 + t.total)
            // (2 * t.total)) / 1e6 AS coverage
    FROM ks CROSS JOIN t""",
    "llm", "text", "diagnostics",
)
def vocab_coverage_curve(spark, sf_dir):
    """Vocabulary coverage curve: the fraction of corpus token mass
    covered by the top-k most frequent words at doubling cutoffs —
    the sizing curve a tokenizer/vocabulary decision reads (where the
    curve saturates is where additional vocab stops paying). One
    frequency aggregate; the rank/cumsum window runs over the
    VOCABULARY (not the token stream); only the top-64 rows (the max
    cutoff) are ranked and broadcast — the curve per k needs nothing
    below rank 64, so the global window and the broadcast both see a
    constant-size table no matter how large the vocabulary grows."""
    docs = _t(spark, sf_dir, "documents")
    cnt = (docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+"))
                       .alias("w"))
           .groupBy("w").agg(F.count("*").cast("long").alias("c")))
    # TakeOrderedAndProject: distributed per-partition top-64 + merge,
    # never a single-partition sort of the full vocabulary
    top = cnt.orderBy(F.col("c").desc(), "w").limit(64)
    w = Window.orderBy(F.col("c").desc(), "w")  # over <= 64 rows
    rk = (top.withColumn("rank", F.row_number().over(w))
          .withColumn("cum", F.sum("c").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    t = cnt.agg(F.sum("c").cast("long").alias("total_tokens"))
    ks = spark.range(7).select(
        F.expr("CAST(shiftleft(1, CAST(id AS INT)) AS INT)").alias("k"))
    cov = (ks.join(F.broadcast(rk), F.col("rank") <= F.col("k"), "left")
           .groupBy("k")
           .agg(F.coalesce(F.max("cum"), F.lit(0)).cast("long")
                .alias("covered")))
    return (cov.crossJoin(F.broadcast(t))
            .select("k", "covered", "total_tokens",
                    _ratio6(F.col("covered"), F.col("total_tokens"))
                     .alias("coverage")))


@register(
    "gopher_rule_overlap",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    cnts AS (SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY 1, 2),
    per AS (
      SELECT doc_id, sum(cnt)::BIGINT AS n_words,
             count(*)::BIGINT AS n_distinct, max(cnt)::BIGINT AS top_cnt,
             sum(len(w) * cnt)::BIGINT AS n_chars,
             sum(CASE WHEN w IN ('the', 'and', 'of', 'to', 'a')
                      THEN cnt ELSE 0 END)::BIGINT AS stop_cnt,
             sum(CASE WHEN regexp_matches(w, '[a-zA-Z]')
                      THEN cnt ELSE 0 END)::BIGINT AS alpha_cnt
      FROM cnts GROUP BY doc_id),
    fails AS (
      SELECT doc_id, unnest(list_filter([
        CASE WHEN NOT (n_words >= 30 AND n_words <= 100000)
             THEN 'word_count' END,
        CASE WHEN NOT (n_chars >= 3 * n_words AND n_chars <= 10 * n_words)
             THEN 'mean_word_len' END,
        CASE WHEN NOT (stop_cnt >= 2) THEN 'stopwords' END,
        CASE WHEN NOT (5 * alpha_cnt >= 4 * n_words) THEN 'alpha_words' END,
        CASE WHEN NOT (10 * top_cnt <= n_words) THEN 'dominance' END,
        CASE WHEN NOT (5 * n_distinct >= 2 * n_words) THEN 'ttr' END],
        x -> x IS NOT NULL)) AS rule
      FROM per)
    SELECT l.rule AS rule_a, r.rule AS rule_b, count(*)::BIGINT AS n_docs
    FROM fails l JOIN fails r USING (doc_id)
    WHERE l.rule <= r.rule
    GROUP BY 1, 2""",
    "llm", "text", "quality", "diagnostics",
)
def gopher_rule_overlap(spark, sf_dir):
    """Rule-overlap matrix for the Gopher filter suite: how many
    documents fail each rule (diagonal) and each PAIR of rules
    jointly (off-diagonal) — the redundancy analysis that tells you
    which rule would drop nothing new if removed (its row ≈ its
    diagonal) before tuning thresholds at corpus scale. Failed-rule
    names explode per doc (≤ 6 rows each), and the pair join is
    per-doc-quadratic over those ≤ 6 rows — never corpus-quadratic."""
    docs = _t(spark, sf_dir, "documents")
    flags = text.gopher_quality_flags(docs)
    rules = ["word_count", "mean_word_len", "stopwords", "alpha_words",
             "dominance", "ttr"]
    arr = F.array(*[F.when(~F.col(f"flag_{r}"), F.lit(r)) for r in rules])
    fails = (flags.select("doc_id", F.explode(arr).alias("rule"))
             .filter(F.col("rule").isNotNull()))
    return (fails.alias("l").join(fails.alias("r"), "doc_id")
            .filter(F.col("l.rule") <= F.col("r.rule"))
            .groupBy(F.col("l.rule").alias("rule_a"),
                     F.col("r.rule").alias("rule_b"))
            .agg(F.count("*").cast("long").alias("n_docs")))


def _quality_corr_sql() -> str:
    qs = REGISTRY["quality_score"].oracle
    ppl = REGISTRY["doc_bigram_logppl"].oracle
    return f"""
    WITH qs AS (SELECT doc_id, quality_score FROM ({qs})),
    ppl AS (SELECT doc_id, n_bigrams, avg_neg_logprob FROM ({ppl})),
    j AS (
      SELECT CAST(round(qs.quality_score * 100) AS HUGEINT) AS x,
             CAST(round(ppl.avg_neg_logprob * 1000000) AS HUGEINT) AS y
      FROM qs JOIN ppl USING (doc_id) WHERE ppl.n_bigrams > 0),
    m AS (
      SELECT count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM j)
    SELECT n::BIGINT AS n,
           round((n * sxy - sx * sy)::DOUBLE
                 / sqrt((n * sxx - sx * sx)::DOUBLE)
                 / sqrt((n * syy - sy * sy)::DOUBLE), 6) AS pearson_r
    FROM m"""


@register("quality_signal_correlation", _quality_corr_sql(),
          "llm", "quality", "diagnostics")
def quality_signal_correlation(spark, sf_dir):
    """Pearson correlation between two independent quality signals —
    the rule-based composite quality_score and the model-based LM
    perplexity — the agreement check run before trusting either as a
    standalone filter (a strongly negative r says the cheap rules
    already capture most of what the LM sees; r near 0 says they are
    complementary). Both signals are already 2-/6-dp rounded, so
    scaling to integer units makes every moment sum EXACT; the final
    r is two square roots and a division. One join + one moment
    aggregate."""
    docs = _t(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    qs = docs.select("doc_id",
                     text.quality_score_col(F.col("text"))
                      .alias("quality_score"))
    ppl = REGISTRY["doc_bigram_logppl"].fn(spark, sf_dir)
    j = (qs.join(ppl.filter(F.col("n_bigrams") > 0), "doc_id")
         .select(F.round(F.col("quality_score") * 100).cast(d38).alias("x"),
                 F.round(F.col("avg_neg_logprob") * 1_000_000).cast(d38)
                  .alias("y")))
    m = j.agg(F.count("*").cast(d38).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx")
                 - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy")
                 - F.col("sy") * F.col("sy")).cast("double"))
    return m.select(F.col("n").cast("bigint").alias("n"),
                    F.round(num / dx / dy, 6).alias("pearson_r"))


@register(
    "events_value_autocorr",
    """
    WITH s AS (
      SELECT event_type,
             CAST(round(value * 100) AS HUGEINT) AS x,
             CAST(round(lead(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) * 100)
               AS HUGEINT) AS y
      FROM events),
    p AS (SELECT event_type, x, y FROM s WHERE y IS NOT NULL),
    m AS (
      SELECT event_type, count(*)::HUGEINT AS n, sum(x) AS sx,
             sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
             sum(y * y) AS syy
      FROM p GROUP BY event_type)
    SELECT event_type, n::BIGINT AS n_pairs,
           round((n * sxy - sx * sy)::DOUBLE
                 / sqrt((n * sxx - sx * sx)::DOUBLE)
                 / sqrt((n * syy - sy * sy)::DOUBLE), 6) AS lag1_autocorr
    FROM m""",
    "relational", "timeseries", "diagnostics",
)
def events_value_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation of event values per type — the
    memory-vs-noise diagnostic (near 0 = independent draws, so
    sequence models add nothing; high = temporal structure worth a
    forecaster). Consecutive pairs come from ONE lead() on the shared
    per-type ordering shuffle; Pearson moments accumulate as exact
    integer cents so the hash is order-proof; only the final
    normalization runs in double."""
    ev = _t(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = (ev.select("event_type",
                   F.round(F.col("value") * 100).cast(d38).alias("x"),
                   F.round(F.lead("value").over(w) * 100).cast(d38)
                    .alias("y"))
         .filter(F.col("y").isNotNull()))
    m = s.groupBy("event_type").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx")
                 - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy")
                 - F.col("sy") * F.col("sy")).cast("double"))
    return m.select("event_type", F.col("n").cast("bigint")
                    .alias("n_pairs"),
                    F.round(num / dx / dy, 6).alias("lag1_autocorr"))


@register(
    "stream_distinct_sketch",
    """
    SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY event_type""",
    "streaming", "sketch", "R3",
)
def stream_distinct_sketch(spark, sf_dir):
    """Distinct-user sketches maintained as STREAMING state: the
    events replay (4 micro-batches) feeds a complete-mode HLL
    aggregation per event type — the live distinct-count dashboard
    backed by mergeable sketch state instead of an unbounded exact
    set. Because HLL union is associative and commutative, the
    streamed sketch is BIT-IDENTICAL to the one-shot batch sketch
    whatever the batch split (asserted in tests); the gate row hashes
    the exact count plus the same 4%% error-bound boolean as
    user_hll_rollup, so the check stays green at any scale factor."""
    tune(spark)
    src = _staged_events_stream(spark, sf_dir, n_files=4)
    agg = (src.groupBy("event_type")
           .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")))
    state = _run_to_memory(spark, agg, "stream_distinct_sketch_state",
                           mode="complete")
    est = state.select("event_type",
                       F.hll_sketch_estimate("sk").alias("est"))
    exact = (_t(spark, sf_dir, "events").groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n_exact")))
    return (exact.join(F.broadcast(est), "event_type")
            .select("event_type", "n_exact",
                    (F.abs(F.col("est") - F.col("n_exact"))
                     <= F.greatest(F.lit(1.0), F.col("n_exact") * 0.04))
                    .alias("within_bound")))


@register(
    "user_activity_gini",
    """
    WITH u AS (
      SELECT user_id, count(*)::BIGINT AS x FROM events GROUP BY user_id),
    r AS (
      SELECT x, row_number() OVER (ORDER BY x, user_id) AS rk FROM u),
    m AS (
      SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
             sum(rk::HUGEINT * x)::HUGEINT AS srx
      FROM r)
    SELECT n::BIGINT AS n_users, sx::BIGINT AS n_events,
           (CASE WHEN 2 * srx - (n + 1) * sx < 0 THEN -1 ELSE 1 END)
           * ((2 * abs(2 * srx - (n + 1) * sx) * 1000000 + n * sx)
              // (2 * n * sx)) / 1e6 AS gini
    FROM m""",
    "relational", "analytics",
)
def user_activity_gini(spark, sf_dir):
    """Gini coefficient of per-user event counts — the heavy-user
    concentration number (0 = everyone equally active, →1 = a few
    users generate everything) that sizes both product risk and the
    key-skew a keyed pipeline must survive. Uses the closed form
    G = 2·Σ rank·x / (n·Σx) − (n+1)/n over ascending counts; the
    global rank comes from the distributed three-step scan
    (operators/prefix.py — rank = running count), so no
    single-partition window touches the user table, and all three
    moments are exact integers."""
    from .operators.prefix import ordered_prefix_sum
    ev = _t(spark, sf_dir, "events")
    u = (ev.groupBy("user_id").agg(F.count("*").cast("long").alias("x"))
         .withColumn("__one", F.lit(1).cast("long")))
    r = ordered_prefix_sum(
        u, [F.col("x").asc(), F.col("user_id").asc()], "__one",
        out_col="rk", partitions=8)
    d38 = "decimal(38,0)"
    m = r.agg(F.count("*").cast(d38).alias("n"),
              F.sum("x").cast(d38).alias("sx"),
              F.sum(F.col("rk").cast(d38) * F.col("x").cast(d38))
               .alias("srx"))
    return m.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("sx").cast("bigint").alias("n_events"),
        # gini = (2*srx - (n+1)*sx)/(n*sx): signed integer rational
        # beyond BIGINT headroom (r13 tie class)
        scalar_fn.sratio6_dec(
            2 * F.col("srx") - (F.col("n") + 1) * F.col("sx"),
            F.col("n") * F.col("sx")).alias("gini"))


@register(
    "events_runs_test",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type),
    s AS (
      SELECT e.event_type,
             CASE WHEN e.value > med.m THEN 1 ELSE 0 END AS up,
             lag(CASE WHEN e.value > med.m THEN 1 ELSE 0 END) OVER (
               PARTITION BY e.event_type ORDER BY e.ts, e.event_id)
               AS prev
      FROM events e JOIN med USING (event_type)),
    g AS (
      SELECT event_type,
             (1 + sum(CASE WHEN prev IS NOT NULL AND up <> prev
                           THEN 1 ELSE 0 END))::HUGEINT AS runs,
             sum(up)::HUGEINT AS n1,
             sum(1 - up) FILTER (TRUE)::HUGEINT AS n0
      FROM s GROUP BY event_type)
    SELECT event_type, runs::BIGINT AS runs,
           n1::BIGINT AS n_above, n0::BIGINT AS n_below,
           round((runs::DOUBLE
                  - (1.0 + 2.0 * n1 * n0 / (n1 + n0)::DOUBLE))
                 / sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
                        / ((n1 + n0)::DOUBLE * (n1 + n0)::DOUBLE
                           * (n1 + n0 - 1)::DOUBLE)), 6) AS z
    FROM g""",
    "relational", "timeseries", "diagnostics",
)
def events_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test per event type: is the above/below-
    median sequence random, or does it cluster (z << 0 = sticky
    regimes, z >> 0 = oscillation)? The nonparametric cousin of the
    lag-1 autocorrelation — sensitive to ANY serial dependence, not
    just linear. Run count = 1 + sign changes from one lag() on the
    shared per-type ordering shuffle; run/above/below counts are
    exact integers; only the final normal approximation divides in
    double."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = (ev.join(F.broadcast(med), "event_type")
         .select("event_type", "ts", "event_id",
                 F.when(F.col("value") > F.col("m"), 1).otherwise(0)
                  .alias("up"))
         .withColumn("prev", F.lag("up").over(w)))
    d38 = "decimal(38,0)"
    g = s.groupBy("event_type").agg(
        (1 + F.sum(F.when(F.col("prev").isNotNull()
                          & (F.col("up") != F.col("prev")), 1)
                   .otherwise(0))).cast(d38).alias("runs"),
        F.sum("up").cast(d38).alias("n1"),
        F.sum(1 - F.col("up")).cast(d38).alias("n0"))
    n1, n0 = F.col("n1").cast("double"), F.col("n0").cast("double")
    nn = n1 + n0
    mean = 1.0 + 2.0 * n1 * n0 / nn
    var = (2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
           / (nn * nn * (nn - 1)))
    return g.select(
        "event_type", F.col("runs").cast("bigint").alias("runs"),
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n0").cast("bigint").alias("n_below"),
        F.round((F.col("runs").cast("double") - mean) / F.sqrt(var), 6)
         .alias("z"))


# ======================================================================
# Round-5 continuation, session 3: privacy audit, table maintenance,
# corpus novelty. Deferred to the round-6 gate rotation like the other
# continuation additions (ROADMAP.md "Round-6 FIRST ACTION").
# ======================================================================

@register(
    "kanon_risk_audit",
    """
    WITH cls AS (
      SELECT c_mktsegment, c_nationkey,
             floor(c_acctbal / 2000)::BIGINT AS bal_band,
             count(*)::BIGINT AS sz
      FROM customer GROUP BY 1, 2, 3)
    SELECT c_mktsegment,
           sum(sz)::BIGINT AS n_customers,
           count(*)::BIGINT AS n_classes,
           min(sz)::BIGINT AS min_class_size,
           sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END)::BIGINT AS n_singletons,
           sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::BIGINT AS n_below_k,
           ((2 * sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::BIGINT
             * 1000000 + sum(sz))
            // (2 * sum(sz)::BIGINT)) / 1e6 AS pct_below_k
    FROM cls GROUP BY c_mktsegment""",
    "llm", "privacy", "diagnostics",
)
def kanon_risk_audit(spark, sf_dir):
    """k-anonymity risk audit (Sweeney 2002) over the quasi-identifier
    triple (nation, market segment, $2000 account-balance band): a
    release is k-anonymous when every equivalence class under the QI
    has at least k members. Reports, per market segment, the class
    census plus the records at risk — singletons (uniquely
    re-identifiable under the prosecutor model) and members of
    classes below k=5 — the audit a training-data pipeline runs
    BEFORE exporting structured records, complementing the text-side
    PII scrub (`scrub_audit_by_source`). Two hash aggregations, both
    with map-side partials; class keys are bounded by the QI domain
    (nations x segments x bands), so the second aggregate is tiny at
    any corpus scale. All counts exact integers; the single division
    happens once per output row."""
    cust = _t(spark, sf_dir, "customer")
    cls = (cust.groupBy(
               "c_mktsegment", "c_nationkey",
               F.floor(F.col("c_acctbal") / 2000).cast("long")
                .alias("bal_band"))
           .agg(F.count("*").cast("long").alias("sz")))
    return (cls.groupBy("c_mktsegment")
            .agg(F.sum("sz").cast("long").alias("n_customers"),
                 F.count("*").cast("long").alias("n_classes"),
                 F.min("sz").cast("long").alias("min_class_size"),
                 F.sum(F.when(F.col("sz") == 1, 1).otherwise(0))
                  .cast("long").alias("n_singletons"),
                 F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
                  .cast("long").alias("n_below_k"))
            .select("c_mktsegment", "n_customers", "n_classes",
                    "min_class_size", "n_singletons", "n_below_k",
                    _ratio6(F.col("n_below_k"), F.col("n_customers"))
                     .alias("pct_below_k")))


@register(
    "compaction_bin_packing",
    """
    WITH files AS (
      SELECT source, (doc_id // 50)::BIGINT AS file_id,
             sum(n_chars)::BIGINT AS bytes
      FROM documents GROUP BY 1, 2),
    staged AS (
      SELECT source, file_id, bytes,
             coalesce(sum(bytes) OVER (
               PARTITION BY source ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0)::BIGINT AS cum_before
      FROM files)
    SELECT source, (cum_before // 65536)::BIGINT AS bin,
           count(*)::BIGINT AS n_files,
           sum(bytes)::BIGINT AS bin_bytes,
           min(file_id)::BIGINT AS first_file,
           max(file_id)::BIGINT AS last_file
    FROM staged GROUP BY 1, 2""",
    "llm", "maintenance",
)
def compaction_bin_packing(spark, sf_dir):
    """Small-file compaction planning at metadata cost (the OPTIMIZE /
    bin-packing half of table maintenance, alongside
    `partition_backfill` and `zorder_clustered_scan`): each ingestion
    batch of 50 doc_ids lands one fragment per source partition, so
    the per-(source, batch) byte totals ARE the file manifest; files
    are then packed, in file order, into 64 KiB target bins via a
    running prefix sum — bin = floor(bytes_before / target), the
    sequential accumulate-to-target strategy Delta/Iceberg OPTIMIZE
    uses, computed as one window over file METADATA (never the data).
    The plan: one corpus-sized aggregate with map-side partials, then
    a per-source-partitioned window and a final tiny aggregate — at
    100 TB the window input is the file catalog (millions of rows,
    range-partitioned by source), not the corpus."""
    docs = _t(spark, sf_dir, "documents")
    files = (docs.groupBy(
                 "source",
                 F.floor(F.col("doc_id") / 50).cast("long")
                  .alias("file_id"))
             .agg(F.sum("n_chars").cast("long").alias("bytes")))
    w = Window.partitionBy("source").orderBy("file_id")
    staged = files.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("bytes").over(
                w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).cast("long"))
    return (staged
            .withColumn("bin", F.floor(F.col("cum_before") / 65536)
                        .cast("long"))
            .groupBy("source", "bin")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum("bytes").cast("long").alias("bin_bytes"),
                 F.min("file_id").cast("long").alias("first_file"),
                 F.max("file_id").cast("long").alias("last_file")))


@register(
    "doc_ngram_novelty",
    _SHINGLES_CTE + """,
    f AS (
      SELECT doc_id, shingle,
             min(doc_id) OVER (PARTITION BY shingle) AS first_doc
      FROM sh)
    SELECT doc_id, count(*)::BIGINT AS n_shingles,
           sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
             AS n_novel,
           ((2 * sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0
                     END)::BIGINT * 1000000 + count(*))
            // (2 * count(*))) / 1e6 AS novelty
    FROM f GROUP BY doc_id""",
    "llm", "text", "dedup",
)
def doc_ngram_novelty(spark, sf_dir):
    """Ingestion-order n-gram novelty: for each document, the fraction
    of its distinct word 3-shingles never seen in any EARLIER doc
    (doc_id = arrival order) — the forward-growing-corpus counterpart
    of the dup-ratio family: novelty ~1 marks genuinely new material,
    ~0 marks recombinations of known text (near-dup or boilerplate),
    and the corpus-level novelty decay is the diminishing-returns
    curve of continued crawling. Skew-immune formulation: instead of
    windowing or joining on the shingle key (a hot shingle in
    millions of docs would funnel its rows to one task), the novel
    count per doc is read off the first-occurrence table itself —
    groupBy(shingle).min(doc_id) collapses hot keys map-side, then
    groupBy(first_doc).count() is doc-bounded, and a final doc-keyed
    join attaches the per-doc denominator. Every shuffle has partial
    aggregation; the shingle explode is materialized once
    (localCheckpoint) for its two consumers. Oracle uses the direct
    window formulation over the same shingle set."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, n=3, distinct=True) \
        .localCheckpoint(eager=False)
    per_doc = sh.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"))
    novel = (sh.groupBy("shingle")
             .agg(F.min("doc_id").alias("first_doc"))
             .groupBy("first_doc")
             .agg(F.count("*").cast("long").alias("n_novel")))
    return (per_doc.join(novel,
                         per_doc.doc_id == novel.first_doc, "left")
            .select(per_doc.doc_id,
                    "n_shingles",
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                     .alias("n_novel"))
            .withColumn("novelty",
                        _ratio6(F.col("n_novel"), F.col("n_shingles"))))


# ======================================================================
# Round-5 continuation, session 3 (batch 2): retrieval ranking quality,
# quality-score calibration, differentially-private release. Deferred
# to the round-6 gate rotation (ROADMAP.md "Round-6 FIRST ACTION").
# ======================================================================

def _dcg_term_nanos(rel: int, pos: int) -> int:
    """Pre-folded DCG term rel/log2(pos+1) in integer nano-units.

    Computed ONCE here in Python and injected as literals into BOTH
    the Spark plan and the DuckDB oracle, so no runtime libm log2
    call can diverge between engines (the libm-1-ulp caveat in
    COVERAGE.md) and per-query DCG sums are order-free integer adds."""
    import math
    return round(rel / math.log2(pos + 1) * 1e9)


# reciprocal ranks as exact shared literals (round(1/p, 6))
_MRR_CONST = {1: 1.0, 2: 0.5, 3: 0.333333, 4: 0.25, 5: 0.2}


def _ndcg_sql() -> str:
    term = " ".join(
        f"WHEN t_rank = {r} AND s_rank = {p} "
        f"THEN {_dcg_term_nanos(6 - r, p)}"
        for r in range(1, 6) for p in range(1, 6))
    ideal = " ".join(
        f"WHEN {r} THEN {_dcg_term_nanos(6 - r, r)}" for r in range(1, 6))
    mrr = " ".join(
        f"WHEN {p} THEN {_MRR_CONST[p]}" for p in range(1, 6))
    return f"""
    WITH brute AS ({_BRUTE_TOPK_SQL}),
    lsh AS ({_lsh_topk_sql()}),
    j AS (
      SELECT l.query_id, l.rank AS s_rank, b.rank AS t_rank
      FROM lsh l LEFT JOIN brute b
        ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id),
    sys AS (
      SELECT query_id,
             count(*)::BIGINT AS n_results,
             count(t_rank)::BIGINT AS n_hits,
             sum(CASE {term} ELSE 0 END)::BIGINT AS dcg_nanos,
             min(CASE WHEN t_rank IS NOT NULL THEN s_rank END) AS first_hit
      FROM j GROUP BY query_id),
    ideal AS (
      SELECT query_id,
             sum(CASE rank {ideal} ELSE 0 END)::BIGINT AS idcg_nanos
      FROM brute GROUP BY query_id)
    SELECT i.query_id,
           coalesce(n_results, 0)::BIGINT AS n_results,
           coalesce(n_hits, 0)::BIGINT AS n_hits,
           ((2 * coalesce(dcg_nanos, 0)::BIGINT * 1000000 + idcg_nanos)
            // (2 * idcg_nanos)) / 1e6
             AS ndcg_at_5,
           coalesce(CASE first_hit {mrr} END, 0.0) AS mrr_at_5
    FROM ideal i LEFT JOIN sys ON i.query_id = sys.query_id"""


@register("ann_ndcg_mrr", _ndcg_sql(), "llm", "similarity")
def ann_ndcg_mrr(spark, sf_dir):
    """Ranking-quality evaluation of the ANN path: per-query nDCG@5
    and MRR@5 of the hyperplane-LSH top-k against the exact
    brute-force top-k as graded ground truth (truth rank r earns
    relevance 6-r). Complements `ann_recall_lsh` (set overlap) with
    ORDER-sensitive metrics — the pair a production retrieval stack
    tunes num_planes/nprobe against. All DCG discounts are pre-folded
    integer nano-unit literals shared by both engines (no runtime
    log2), so per-query sums are order-free; reciprocal ranks are the
    same five shared literals. Plan: both top-k builders are
    query-set-bounded (broadcast queries, per-partition local top-k);
    the truth join is broadcast-sized; everything after the top-k is
    ~k rows per query."""
    emb = _t(spark, sf_dir, "embeddings")
    brute = similarity.brute_force_topk(emb, k=5, query_mod=50)
    lshr = similarity.lsh_topk(emb, k=5, query_mod=50,
                               num_planes=8, dim=64)
    j = (lshr.select("query_id", "neighbor_id",
                     F.col("rank").alias("s_rank"))
         .join(brute.select("query_id", "neighbor_id",
                            F.col("rank").alias("t_rank")),
               ["query_id", "neighbor_id"], "left"))
    term = None
    for r in range(1, 6):
        for p in range(1, 6):
            cond = (F.col("t_rank") == r) & (F.col("s_rank") == p)
            val = F.lit(_dcg_term_nanos(6 - r, p))
            term = F.when(cond, val) if term is None else term.when(cond, val)
    sys_stats = (j.select(
        "query_id", "s_rank", "t_rank",
        F.coalesce(term, F.lit(0)).cast("long").alias("term_nanos"))
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_results"),
             F.count("t_rank").cast("long").alias("n_hits"),
             F.sum("term_nanos").cast("long").alias("dcg_nanos"),
             F.min(F.when(F.col("t_rank").isNotNull(),
                          F.col("s_rank"))).alias("first_hit")))
    ideal_term = None
    for r in range(1, 6):
        c = F.col("rank") == r
        v = F.lit(_dcg_term_nanos(6 - r, r))
        ideal_term = (F.when(c, v) if ideal_term is None
                      else ideal_term.when(c, v))
    ideal = (brute.select("query_id",
                          F.coalesce(ideal_term, F.lit(0)).cast("long")
                           .alias("it"))
             .groupBy("query_id")
             .agg(F.sum("it").cast("long").alias("idcg_nanos")))
    mrr = None
    for p in range(1, 6):
        c = F.col("first_hit") == p
        v = F.lit(_MRR_CONST[p])
        mrr = F.when(c, v) if mrr is None else mrr.when(c, v)
    return (ideal.join(sys_stats, "query_id", "left")
            .select("query_id",
                    F.coalesce("n_results", F.lit(0)).cast("long")
                     .alias("n_results"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                     .alias("n_hits"),
                    _ratio6(F.coalesce("dcg_nanos", F.lit(0)),
                            F.col("idcg_nanos")).alias("ndcg_at_5"),
                    F.coalesce(mrr, F.lit(0.0)).alias("mrr_at_5")))


def _calibration_sql() -> str:
    stop = " + ".join(
        f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"
        for w in text.STOPWORDS)
    return f"""
    WITH f AS (
      SELECT length(text)::BIGINT AS n_chars,
             len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words,
             len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
             ({stop})::BIGINT AS n_stop
      FROM documents),
    lab AS (
      SELECT least(n_chars // 100, 19)::BIGINT AS band,
             (CASE WHEN round(
               (CASE WHEN n_words >= 10 AND n_words <= 100000
                     THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN (n_chars - (n_words - 1)) / n_words >= 3
                      AND (n_chars - (n_words - 1)) / n_words <= 10
                     THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN n_punct / n_chars < 0.2 THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN n_stop / n_words > 0.01 THEN 0.25 ELSE 0.0 END),
               2) >= 0.75 THEN 1 ELSE 0 END)::BIGINT AS y
      FROM f),
    bands AS (
      SELECT band, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
      FROM lab GROUP BY band),
    seg AS (
      SELECT bi.band AS i, bj.band AS j,
             sum(bm.n)::BIGINT AS seg_n, sum(bm.pos)::BIGINT AS seg_pos
      FROM bands bi
      JOIN bands bj ON bi.band <= bj.band
      JOIN bands bm ON bm.band >= bi.band AND bm.band <= bj.band
      GROUP BY bi.band, bj.band),
    inner_min AS (
      SELECT b.band, s.i,
             min(s.seg_pos::DOUBLE / s.seg_n) AS m
      FROM bands b JOIN seg s ON s.i <= b.band AND s.j >= b.band
      GROUP BY b.band, s.i),
    fit AS (
      SELECT band, max(m) AS cal FROM inner_min GROUP BY band)
    SELECT b.band,
           b.n AS n_docs, b.pos AS n_pos,
           ((2 * b.pos * 1000000 + b.n) // (2 * b.n)) / 1e6 AS rate,
           round(cal, 6) AS calibrated
    FROM bands b JOIN fit USING (band)"""


@register("quality_calibration_isotonic", _calibration_sql(),
          "llm", "text", "diagnostics")
def quality_calibration_isotonic(spark, sf_dir):
    """Isotonic (monotone) calibration of a cheap curation signal:
    P(high composite quality | document-length band) fit by isotonic
    regression over the 20 length bands — the reliability-curve
    smoothing a pipeline applies before thresholding a cheap feature
    against an expensive gold label (Zadrozny & Elkan 2002). Uses the
    minimax characterization (equivalent to pool-adjacent-violators,
    pinned by test): cal(b) = max_{i<=b} min_{j>=b} mean(y over bands
    i..j). The corpus is touched by exactly ONE narrow scan + hash
    aggregate down to <=20 (band, n, pos) rows; the O(B^3) minimax
    runs on that catalog-sized table via broadcast range self-joins
    (BroadcastNestedLoopJoin over <=20-row sides — size-invariant at
    any corpus scale). Segment means are single exact-integer
    divisions, identical in both engines; no summation-order
    sensitivity anywhere."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    band = F.least(F.floor(F.length(t) / 100).cast("long"), F.lit(19))
    y = F.when(text.quality_score_col(t) >= 0.75, 1).otherwise(0)
    bands = (docs.select(band.alias("band"), y.alias("y"))
             .groupBy("band")
             .agg(F.count("*").cast("long").alias("n"),
                  F.sum("y").cast("long").alias("pos")))
    bands = bands.localCheckpoint(eager=False)
    bi = bands.select(F.col("band").alias("i"))
    bj = bands.select(F.col("band").alias("j"))
    bm = bands.select(F.col("band").alias("m"),
                      F.col("n").alias("mn"), F.col("pos").alias("mpos"))
    seg = (bi.join(bj, F.col("i") <= F.col("j"))
           .join(bm, (F.col("m") >= F.col("i")) & (F.col("m") <= F.col("j")))
           .groupBy("i", "j")
           .agg(F.sum("mn").cast("long").alias("seg_n"),
                F.sum("mpos").cast("long").alias("seg_pos")))
    tgt = bands.select(F.col("band").alias("tband"))
    inner = (tgt.join(seg, (F.col("i") <= F.col("tband"))
                      & (F.col("j") >= F.col("tband")))
             .groupBy("tband", "i")
             .agg(F.min(F.col("seg_pos").cast("double")
                        / F.col("seg_n")).alias("m")))
    fit = (inner.groupBy("tband").agg(F.max("m").alias("cal"))
           .withColumnRenamed("tband", "band"))
    return (bands.join(fit, "band")
            .select("band",
                    F.col("n").alias("n_docs"),
                    F.col("pos").alias("n_pos"),
                    _ratio6(F.col("pos"), F.col("n")).alias("rate"),
                    F.round("cal", 6).alias("calibrated")))


@register(
    "dp_noised_histogram",
    """
    WITH cells AS (
      SELECT event_type,
             ((epoch_us(ts) // 1000000) // 86400)::BIGINT AS day,
             count(*)::BIGINT AS c
      FROM events GROUP BY 1, 2),
    n AS (
      SELECT event_type, day, c,
             (('0x' || substr(md5('dp:' || event_type || ':'
                                  || day::VARCHAR), 1, 13))::BIGINT + 1)
               / 4503599627370498.0 - 0.5 AS s
      FROM cells),
    rel AS (
      SELECT event_type, day,
             (CASE WHEN c::HUGEINT * 1000000000
                        + round(-sign(s) * ln(1.0 - 2 * abs(s))
                                * 1e9)::BIGINT < 0
                   THEN -1 ELSE 1 END)
             * ((2 * abs(c::HUGEINT * 1000000000
                         + round(-sign(s) * ln(1.0 - 2 * abs(s))
                                 * 1e9)::BIGINT) * 1000000
                 + 1000000000::HUGEINT)
                // (2 * 1000000000::HUGEINT)) / 1e6 AS noisy_count
      FROM n)
    SELECT event_type, day, noisy_count
    FROM rel WHERE noisy_count >= 10.0""",
    "llm", "privacy", "diagnostics",
)
def dp_noised_histogram(spark, sf_dir):
    """Differentially-private histogram release (Dwork 2006): daily
    event-type counts with Laplace(1/eps) noise at eps=1 (sensitivity
    1 for user-level add/remove at one event), then partition
    selection — cells whose NOISY count falls below tau=10 are
    suppressed, so the released table never confirms the existence of
    small groups (the companion of `kanon_risk_audit` for count
    releases). Noise is the inverse-CDF transform of a 52-bit
    md5-derived uniform per cell key — deterministic, engine-neutral,
    no RNG — and is rounded once to integer nano-units (the
    `gumbel_topk` convention) so the release is bit-stable. One hash
    aggregate with map-side partials; noise is a narrow projection on
    the cell table (bounded by event_types x days, not the corpus)."""
    ev = _t(spark, sf_dir, "events")
    cells = (ev.select(
        "event_type",
        (F.expr("unix_micros(ts) div 1000000").cast("long") / 86400)
        .cast("long").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("c")))
    two52 = 4_503_599_627_370_496
    u = ((F.expr("CAST(conv(substr(md5(concat('dp:', event_type, ':', "
                 "CAST(day AS STRING))), 1, 13), 16, 10) AS BIGINT)")
          + 1) / F.lit(float(two52 + 2)))
    s = u - 0.5
    nanos = F.round(-F.signum(s) * F.log(F.lit(1.0) - 2 * F.abs(s))
                    * 1e9).cast("long")
    return (cells
            .select("event_type", "day",
                    # (c*1e9 + nanos)/1e9: signed integer rational
                    # beyond BIGINT headroom (r13 tie class)
                    scalar_fn.sratio6_dec(
                        F.col("c") * F.lit(1_000_000_000) + nanos,
                        F.lit(1_000_000_000))
                     .alias("noisy_count"))
            .filter(F.col("noisy_count") >= 10.0))


_GOPHER_KEEP_CTE = """
    tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents),
    cnts AS (SELECT doc_id, w, count(*) AS cnt FROM tok GROUP BY 1, 2),
    per AS (
      SELECT doc_id, sum(cnt)::BIGINT AS n_words,
             count(*)::BIGINT AS n_distinct, max(cnt)::BIGINT AS top_cnt,
             sum(len(w) * cnt)::BIGINT AS n_chars,
             sum(CASE WHEN w IN ('the', 'and', 'of', 'to', 'a')
                      THEN cnt ELSE 0 END)::BIGINT AS stop_cnt,
             sum(CASE WHEN regexp_matches(w, '[a-zA-Z]')
                      THEN cnt ELSE 0 END)::BIGINT AS alpha_cnt
      FROM cnts GROUP BY doc_id),
    gkeep AS (
      SELECT doc_id,
             (n_words >= 30 AND n_words <= 100000
              AND n_chars >= 3 * n_words AND n_chars <= 10 * n_words
              AND stop_cnt >= 2
              AND 5 * alpha_cnt >= 4 * n_words
              AND 10 * top_cnt <= n_words
              AND 5 * n_distinct >= 2 * n_words) AS keep_b
      FROM per)"""


def _kappa_sql() -> str:
    stop = " + ".join(
        f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"
        for w in text.STOPWORDS)
    return f"""
    WITH {_GOPHER_KEEP_CTE},
    qf AS (
      SELECT doc_id,
             length(text)::BIGINT AS n_chars,
             len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words,
             len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
             ({stop})::BIGINT AS n_stop
      FROM documents),
    qa AS (
      SELECT doc_id,
             (round(
               (CASE WHEN n_words >= 10 AND n_words <= 100000
                     THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN (n_chars - (n_words - 1)) / n_words >= 3
                      AND (n_chars - (n_words - 1)) / n_words <= 10
                     THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN n_punct / n_chars < 0.2 THEN 0.25 ELSE 0.0 END)
             + (CASE WHEN n_stop / n_words > 0.01 THEN 0.25 ELSE 0.0 END),
               2) >= 0.75) AS keep_a
      FROM qf),
    cm AS (
      SELECT count(*)::BIGINT AS n,
             sum((keep_a AND keep_b)::INT)::BIGINT AS n11,
             sum((keep_a AND NOT keep_b)::INT)::BIGINT AS n10,
             sum((NOT keep_a AND keep_b)::INT)::BIGINT AS n01,
             sum((NOT keep_a AND NOT keep_b)::INT)::BIGINT AS n00
      FROM qa JOIN gkeep USING (doc_id))
    SELECT n, n11, n10, n01, n00,
           ((2 * (n11 + n00) * 1000000 + n) // (2 * n)) / 1e6 AS po,
           ((2 * ((n11 + n10) * (n11 + n01)
                  + (n01 + n00) * (n10 + n00))::HUGEINT * 1000000
             + n::HUGEINT * n)
            // (2 * n::HUGEINT * n)) / 1e6 AS pe,
           (CASE WHEN n * (n11 + n00)
                      - ((n11 + n10) * (n11 + n01)
                         + (n01 + n00) * (n10 + n00)) < 0
                 THEN -1 ELSE 1 END)
           * ((2 * abs(n::HUGEINT * (n11 + n00)
                       - ((n11 + n10) * (n11 + n01)
                          + (n01 + n00) * (n10 + n00))) * 1000000
               + (n::HUGEINT * n
                  - ((n11 + n10) * (n11 + n01)
                     + (n01 + n00) * (n10 + n00))))
              // (2 * (n::HUGEINT * n
                       - ((n11 + n10) * (n11 + n01)
                          + (n01 + n00) * (n10 + n00))))) / 1e6 AS kappa
    FROM cm"""


@register("rater_agreement_kappa", _kappa_sql(),
          "llm", "text", "diagnostics")
def rater_agreement_kappa(spark, sf_dir):
    """Cohen's kappa (1960) between the engine's two document-quality
    raters — the composite heuristic score (keep when >= 0.75) and
    the six-rule Gopher suite (keep when all rules pass) — the
    chance-corrected agreement statistic a curation pipeline uses to
    decide whether two cheap filters are interchangeable or
    complementary (kappa ~1: redundant; ~0: independent). The whole
    confusion matrix reduces to five exact BIGINT counts; po, pe, and
    kappa are single divisions of integer cross-products (kappa =
    (n*agree - cross) / (n^2 - cross)), so no float summation order
    exists anywhere. Plan: the Gopher side is the usual explode +
    two-level doc-keyed aggregate; the heuristic side is a narrow
    scan; one doc_id-keyed join, then a single-row total aggregate."""
    docs = _t(spark, sf_dir, "documents")
    gk = (text.gopher_quality_flags(docs)
          .select("doc_id", F.col("keep").alias("keep_b")))
    qa = docs.select(
        "doc_id",
        (text.quality_score_col(F.col("text")) >= 0.75).alias("keep_a"))
    cm = (qa.join(gk, "doc_id")
          .agg(F.count("*").cast("long").alias("n"),
               F.sum(F.when(F.col("keep_a") & F.col("keep_b"), 1)
                     .otherwise(0)).cast("long").alias("n11"),
               F.sum(F.when(F.col("keep_a") & ~F.col("keep_b"), 1)
                     .otherwise(0)).cast("long").alias("n10"),
               F.sum(F.when(~F.col("keep_a") & F.col("keep_b"), 1)
                     .otherwise(0)).cast("long").alias("n01"),
               F.sum(F.when(~F.col("keep_a") & ~F.col("keep_b"), 1)
                     .otherwise(0)).cast("long").alias("n00")))
    n, n11, n10 = F.col("n"), F.col("n11"), F.col("n10")
    n01, n00 = F.col("n01"), F.col("n00")
    cross = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    return cm.select(
        "n", "n11", "n10", "n01", "n00",
        # po/pe/kappa are integer rationals (r13 tie class); kappa is
        # signed and its products exceed BIGINT headroom at scale
        _ratio6(n11 + n00, n).alias("po"),
        _ratio6_dec(cross, n * n).alias("pe"),
        scalar_fn.sratio6_dec(n * (n11 + n00) - cross,
                              n * n - cross).alias("kappa"))


@register(
    "embedding_int8_quant",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    el AS (
      SELECT vec_id,
             unnest(generate_series(1, len(v))) - 1 AS dim,
             unnest(v) AS x
      FROM e),
    p AS (
      SELECT dim, count(*)::BIGINT AS n_vals, min(x) AS mn, max(x) AS mx,
             (max(x) - min(x)) / 255.0 AS scale
      FROM el GROUP BY dim),
    q AS (
      SELECT el.dim, x,
             CASE WHEN scale = 0 THEN mn
                  ELSE mn + least(greatest(round((x - mn) / scale), 0),
                                  255) * scale
             END AS xhat
      FROM el JOIN p USING (dim)),
    u AS (
      SELECT dim,
             sum(round((x - xhat) * (x - xhat) * 1e12)::BIGINT)::BIGINT
               AS err_units
      FROM q GROUP BY dim)
    SELECT p.dim::BIGINT AS dim, n_vals,
           round(mn, 6) AS mn, round(mx, 6) AS mx,
           round(scale, 9) AS scale,
           err_units,
           ((2 * err_units::HUGEINT * 1000000000000
             + n_vals::HUGEINT * 1000000000000)
            // (2 * n_vals::HUGEINT * 1000000000000)) / 1e12 AS mse
    FROM p JOIN u USING (dim)""",
    "llm", "similarity", "diagnostics",
)
def embedding_int8_quant(spark, sf_dir):
    """Per-dimension asymmetric uint8 quantization calibration for the
    embedding store — the 4x-compression step an ANN serving layer
    applies before indexing at 100 TB: per-dim [min, max] from a
    corpus pass, scale = range/255, then the reconstruction MSE of
    round-to-nearest affine quantization, measured exactly. Per-
    element squared errors are rounded once to 1e-12 units and summed
    as BIGINT (order-free; bounded ~scale^2/4 per element); min/max
    are exact float32-in-double comparisons; the per-dim parameter
    table (64 rows) broadcasts back onto the exploded elements.
    Degenerate constant dimensions quantize to themselves (scale 0
    guard, identical in both engines). Plan: one explode, two
    dim-keyed partial aggregates, one broadcast join — linear in
    corpus cells, no driver-side math."""
    emb = _t(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    p = (el.groupBy("dim")
         .agg(F.count("*").cast("long").alias("n_vals"),
              F.min("x").alias("mn"), F.max("x").alias("mx"))
         .withColumn("scale", (F.col("mx") - F.col("mn")) / 255.0))
    j = el.join(F.broadcast(p), "dim")
    qv = F.least(F.greatest(
        F.round((F.col("x") - F.col("mn")) / F.col("scale")),
        F.lit(0.0)), F.lit(255.0))
    xhat = F.when(F.col("scale") == 0, F.col("mn")) \
        .otherwise(F.col("mn") + qv * F.col("scale"))
    u = (j.select("dim", ((F.col("x") - xhat) * (F.col("x") - xhat))
                  .alias("e2"))
         .select("dim", F.round(F.col("e2") * 1e12).cast("long")
                 .alias("eu"))
         .groupBy("dim").agg(F.sum("eu").cast("long").alias("err_units")))
    return (p.join(u, "dim")
            .select(F.col("dim").cast("long").alias("dim"), "n_vals",
                    F.round("mn", 6).alias("mn"),
                    F.round("mx", 6).alias("mx"),
                    F.round("scale", 9).alias("scale"),
                    "err_units",
                    # u/(n*1e12) at 12 dp: exact integer rational in
                    # DECIMAL(38,0) (r13 tie class, 12-dp variant)
                    _ratio12_dec(F.col("err_units"), F.col("n_vals"))
                    .alias("mse")))


@register(
    "bmp_dhash_dedup",
    """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 5 + doc_id % 7 AS h
      FROM documents),
    ox AS (SELECT doc_id, w, h, unnest(range(0, 9)) AS ox FROM d),
    oxy AS (SELECT doc_id, w, h, ox, unnest(range(0, 8)) AS oy FROM ox),
    g AS (
      SELECT doc_id, ox, oy,
             (doc_id + 7 * (((2 * ox + 1) * w) // 18)
                     + 13 * (((2 * oy + 1) * h) // 16)) % 256
             + (2 * doc_id + 3 * (((2 * ox + 1) * w) // 18)
                           + 5 * (((2 * oy + 1) * h) // 16)) % 256
             + (doc_id + (((2 * ox + 1) * w) // 18)
                         * (((2 * oy + 1) * h) // 16)) % 256 AS gray
      FROM oxy),
    b AS (
      SELECT l.doc_id, l.ox, l.oy,
             CASE WHEN r.gray > l.gray THEN 1 ELSE 0 END AS bit
      FROM g l JOIN g r ON r.doc_id = l.doc_id AND r.oy = l.oy
                       AND r.ox = l.ox + 1
      WHERE l.ox < 8),
    hsh AS (
      SELECT doc_id,
             sum(CASE WHEN oy >= 4 AND bit = 1
                      THEN 1::BIGINT << ((oy - 4) * 8 + ox)
                      ELSE 0 END)::BIGINT AS dhash_hi,
             sum(CASE WHEN oy < 4 AND bit = 1
                      THEN 1::BIGINT << (oy * 8 + ox)
                      ELSE 0 END)::BIGINT AS dhash_lo
      FROM b GROUP BY doc_id),
    grp AS (
      SELECT dhash_hi, dhash_lo, count(*)::BIGINT AS group_n,
             min(doc_id)::BIGINT AS canonical_id
      FROM hsh GROUP BY 1, 2)
    SELECT h.doc_id, h.dhash_hi, h.dhash_lo, group_n, canonical_id,
           h.doc_id != canonical_id AS is_dup
    FROM hsh h JOIN grp USING (dhash_hi, dhash_lo)""",
    "llm", "multimodal", "dedup",
)
def bmp_dhash_dedup(spark, sf_dir):
    """Perceptual-hash image dedup — the multimodal counterpart of
    exact_dedup: each asset's TRULY DECODED pixels (decode_bmp) are
    grayscaled (exact integer r+g+b), integer-midpoint-resampled to
    9x8, and difference-hashed (dHash, Krawetz 2013: bit = right
    neighbor brighter) into two 32-bit halves; assets sharing the
    64-bit hash form a duplicate group with the min-id canonical —
    robust to uniform brightness shifts, which the +d term in the
    synthetic pixel function exercises for real. The oracle
    recomputes every bit from the closed-form pixel function composed
    with the midpoint source mapping, so any decoder, grayscale,
    resample, or bit-packing error hash-fails. Plan: hash in the
    Arrow decode scan (payloads never shuffle — only 3 longs/asset
    leave it), then group stats via an unordered window over the ONE
    hash-keyed shuffle (a groupBy+self-join would duplicate the
    decode subtree into both join inputs and decode twice) —
    corpus-linear, the exact shape of exact_dedup at 100 TB; the two
    halves double as Hamming-blocking bands for a near-pair variant."""
    docs = _t(spark, sf_dir, "documents")
    hs = multimodal.bmp_dhash(multimodal.bmp_media_table(docs))
    grp = Window.partitionBy("dhash_hi", "dhash_lo")
    return (hs.select(
        "doc_id", "dhash_hi", "dhash_lo",
        F.count("*").over(grp).cast("long").alias("group_n"),
        F.min("doc_id").over(grp).cast("long").alias("canonical_id"))
        .withColumn("is_dup", F.col("doc_id") != F.col("canonical_id")))


@register(
    "ann_recall_truncated",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
             v[1:32] AS tv,
             sqrt(list_dot_product(v[1:32], v[1:32])) AS tnorm
      FROM e),
    q AS (
      SELECT vec_id AS query_id, v AS qv, norm AS qnorm,
             tv AS qtv, tnorm AS qtnorm
      FROM n WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 256),
    fr AS (
      SELECT query_id, vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_dot_product(qv, v) / (qnorm * norm) DESC,
                        vec_id) AS rank
      FROM n, q WHERE vec_id != query_id),
    tr AS (
      SELECT query_id, vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_dot_product(qtv, tv) / (qtnorm * tnorm) DESC,
                        vec_id) AS rank
      FROM n, q WHERE vec_id != query_id)
    SELECT f.query_id,
           count(t.neighbor_id)::BIGINT AS hits,
           round(count(t.neighbor_id) / 5.0, 6) AS recall
    FROM (SELECT * FROM fr WHERE rank <= 5) f
    LEFT JOIN (SELECT * FROM tr WHERE rank <= 5) t
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY f.query_id""",
    "llm", "similarity",
)
def ann_recall_truncated(spark, sf_dir):
    """Matryoshka-style truncated-dimension retrieval quality
    (Kusupati et al. 2022): recall@5 of exact cosine top-5 computed
    on the FIRST 32 of 64 dimensions against the full-dimension
    truth — the measurement a serving layer makes before halving its
    ANN index footprint (the dimension-truncation counterpart of
    embedding_int8_quant's precision-truncation MSE). Both rankings
    use the deterministic (cos DESC, id) tie-break on exact
    float32-in-double folds, so the top-5 SETS are engine-identical
    and the per-query hit count is an exact integer. Plan: two
    broadcast-query brute-force top-k passes over one corpus scan
    each, then a k-row-per-query join — no corpus-sized shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    full = similarity.brute_force_topk(emb, k=5, query_mod=50)
    trunc = similarity.brute_force_topk(
        emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding")),
        k=5, query_mod=50)
    hits = (full.select("query_id", "neighbor_id")
            .join(trunc.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count("*").cast("long").alias("hits")))
    return (full.select("query_id").distinct()
            .join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
                    F.round(F.coalesce("hits", F.lit(0)) / 5.0, 6)
                    .alias("recall")))


# ======================================================================
# Round 8: PII redaction, sliding-window top-k, streaming dynamic-gap
# sessions
# ======================================================================

@register(
    "pii_redaction_stats",
    """
    WITH enr AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 = 0
                  THEN ' contact u' || doc_id::VARCHAR || '@ex'
                       || (doc_id % 7)::VARCHAR || '.org'
                  ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' call +1-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
                       || '-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                  ELSE '' END ||
             CASE WHEN doc_id % 4 = 0
                  THEN ' from 10.' || (doc_id % 200)::VARCHAR || '.3.'
                       || ((doc_id * 7) % 250)::VARCHAR
                  ELSE '' END AS t
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}'))::BIGINT
             AS n_emails,
           len(regexp_extract_all(t,
             '[+]1-[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,
           len(regexp_extract_all(t,
             '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}'))::BIGINT
             AS n_ipv4s,
           regexp_replace(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '[+]1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
             '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}',
             '<IP>', 'g') AS redacted,
           length(regexp_replace(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               '[+]1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
             '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}',
             '<IP>', 'g'))::BIGINT AS redacted_len
    FROM enr""",
    "llm", "pii", "redaction",
)
def pii_redaction_stats(spark, sf_dir):
    """PII detection + redaction (operators/text.py:pii_redact) — the
    scrub stage every web-corpus curation pipeline runs before
    training (C4/Dolma-style regex redaction of emails, phone
    numbers, IPv4 addresses). The synthetic corpus carries no real
    PII, so the query first ENRICHES each doc deterministically from
    doc_id (doc_id % 3 -> an email, % 5 -> a phone, % 4 -> an IP —
    overlapping moduli give docs with 0-3 PII kinds); both engines
    build the identical enriched text, so the oracle genuinely
    exercises match + replacement semantics, not just zeros. Patterns
    use only bracket classes ([.], [+], [0-9]) — the same string is
    semantically identical under Java regex and RE2, with no
    lookarounds or shorthand escapes. Plan: pure narrow projection,
    zero shuffles, codegen'd regexp over one scan — at 100 TB this is
    parquet-scan-bound, the correct shape for a per-doc scrub."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.text import pii_redact

    did = F.col("doc_id")
    enriched = F.concat(
        F.col("text"),
        F.when(did % 3 == 0,
               F.concat(F.lit(" contact u"), did.cast("string"),
                        F.lit("@ex"), (did % 7).cast("string"),
                        F.lit(".org"))).otherwise(F.lit("")),
        F.when(did % 5 == 0,
               F.concat(F.lit(" call +1-"),
                        F.lpad((did % 1000).cast("string"), 3, "0"),
                        F.lit("-555-"),
                        F.lpad((did % 10000).cast("string"), 4, "0")))
         .otherwise(F.lit("")),
        F.when(did % 4 == 0,
               F.concat(F.lit(" from 10."), (did % 200).cast("string"),
                        F.lit(".3."), ((did * 7) % 250).cast("string")))
         .otherwise(F.lit("")))
    return pii_redact(docs.select("doc_id", enriched.alias("text")))


@register(
    "w_sliding_topk",
    """
    WITH m AS (
      SELECT event_type,
             (epoch_us(ts) // 900000000) * 900 - k.k * 900 AS w_start
      FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k),
    a AS (
      SELECT w_start, event_type, count(*)::BIGINT AS cnt
      FROM m GROUP BY 1, 2),
    r AS (
      SELECT w_start, event_type, cnt,
             row_number() OVER (PARTITION BY w_start
                                ORDER BY cnt DESC, event_type) AS rnk
      FROM a)
    SELECT w_start AS window_start, rnk::BIGINT AS rnk, event_type, cnt
    FROM r WHERE rnk <= 3""",
    "reference", "sliding", "topk",
)
def w_sliding_topk(spark, sf_dir):
    """Top-k ranking inside each sliding window — the trending-items
    shape (per 1-hour window hopping every 15 minutes, the 3 busiest
    event types with their counts; ROADMAP r7 candidate completing
    the sliding-window family beyond plain aggregates). Two-stage
    plan: window(size, slide) expands each row to its 4 covering
    windows BEFORE the partial aggregate (so the first shuffle moves
    partial counts, not row copies), then row_number over (window)
    ranks the per-window key counts. The rank partition holds at most
    |event_type domain| rows per window — small here; for unbounded
    key domains the TakeOrdered/bounded-heap pattern replaces the
    rank window, which is why the rank stage sits AFTER the count
    aggregation, never over raw events. Ties break on event_type on
    both engines; window starts are slide-aligned whole seconds.
    The plan lives in operators/aggregations.py:sliding_topk so the
    unit tests exercise the exact shipped logic against synthetic
    sources (ADVICE r8: no inline re-implementation drift)."""
    from .operators.aggregations import sliding_topk
    return sliding_topk(_t(spark, sf_dir, "events"))


@register(
    "stream_session_dynamic_gap",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS tu,
             (300 + (event_id % 3) * 600) * 1000000 AS g, value
      FROM events),
    mx AS (SELECT max(tu) AS mx FROM e),
    f AS (
      SELECT event_type, tu, g, value,
             max(tu + g) OVER (PARTITION BY event_type ORDER BY tu, g
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
      FROM e),
    s AS (
      SELECT event_type, tu, g, value,
             sum(CASE WHEN prev_end IS NULL OR tu > prev_end
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY tu, g
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM f),
    a AS (
      SELECT event_type, min(tu) AS session_start_us,
             max(tu + g) AS session_end_us,
             count(*)::BIGINT AS cnt,
             {AVG6_SQL} AS avg_value
      FROM s GROUP BY event_type, sid)
    SELECT event_type, session_start_us, session_end_us, cnt, avg_value
    FROM a, mx WHERE session_end_us <= mx""",
    "streaming", "session", "dynamic-gap",
)
def stream_session_dynamic_gap(spark, sf_dir):
    """Dynamic-gap session windows as REAL Structured Streaming — the
    streaming complement of the batch `w_session_dynamic_gap` (the
    last cell of the window matrix: the per-row gap expression under
    watermarked append mode). Gap = 5/15/25 min by event_id % 3, so
    the oracle can replay the merge exactly: per key a session
    continues while an event's time <= the running max of
    (t_i + gap_i), session end = max(t_i + g_i) — NOT last event +
    constant. Append mode emits a session exactly once when the
    watermark passes its end; the oracle keeps sessions whose end <=
    the final watermark (max event time, 0 s delay) — trailing
    still-open sessions correctly stay in state, not in the output.
    Exact integer-cent sums + half-up integer rounding (_avg6) make
    state-merge order unobservable in the hash. State is O(open
    sessions x types), watermark-evicted."""
    tune(spark)
    src = _staged_events_stream_ordered(spark, sf_dir, n_files=4)
    gap = (F.when(F.col("event_id") % 3 == 0, F.lit("5 minutes"))
           .when(F.col("event_id") % 3 == 1, F.lit("15 minutes"))
           .otherwise(F.lit("25 minutes")))
    agg = (src.withWatermark("ts", "0 seconds")
           .groupBy(F.session_window("ts", gap), "event_type")
           .agg(F.count("*").alias("cnt"), _cents_sum("value")))
    out = agg.select(
        "event_type",
        F.unix_micros("session_window.start").alias("session_start_us"),
        F.unix_micros("session_window.end").alias("session_end_us"),
        F.col("cnt").cast("bigint").alias("cnt"),
        _avg6().alias("avg_value"))
    return _run_to_memory(spark, out, "stream_session_dynamic_gap_result")


def _sign_pack_sql(lo: int, hi: int) -> str:
    """DuckDB twin of similarity.sign_pack_expr: integer shift-sum of
    sign bits lo..hi-1 (1-based component access matches element_at)."""
    return (f"list_sum([CASE WHEN v[i + 1] > 0 "
            f"THEN (1::BIGINT << (i - {lo})) ELSE 0::BIGINT END "
            f"for i in range({lo}, {hi})])::BIGINT")


_HAMMING_CTE = f"""
    WITH e AS (SELECT vec_id, embedding AS v FROM embeddings),
    p AS (
      SELECT vec_id, {_sign_pack_sql(0, 32)} AS w0,
             {_sign_pack_sql(32, 64)} AS w1
      FROM e),
    q AS (
      SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
      FROM p WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 256),
    s AS (
      SELECT query_id, vec_id AS neighbor_id,
             (bit_count(xor(w0, q0)) + bit_count(xor(w1, q1)))::BIGINT
               AS hamming
      FROM p, q WHERE vec_id != query_id),
    hr AS (
      SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY hamming, neighbor_id) AS rank
      FROM s)"""


@register(
    "ann_topk_hamming",
    _HAMMING_CTE + """
    SELECT query_id, neighbor_id, rank::BIGINT AS rank, hamming
    FROM hr WHERE rank <= 10""",
    "llm", "similarity",
)
def ann_topk_hamming(spark, sf_dir):
    """Binary-quantization ANN (operators/similarity.py:hamming_topk):
    sign-quantize each 64-dim vector to TWO BIGINT words (16 bytes —
    32x below float32, the compression step beyond
    embedding_int8_quant's int8), score with xor + popcount, exact
    Hamming top-10 per query with the (hamming, neighbor_id)
    tie-break. The pack is an integer fold over sign comparisons —
    zero float arithmetic — so Spark and DuckDB produce the packed
    words bit-for-bit and the whole ranking is engine-exact. Plan:
    broadcast query side, one corpus scan, codegen'd integer ops;
    at 100 TB the packed index is rows x 16 bytes."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.hamming_topk(emb, k=10, query_mod=50)


@register(
    "ann_hamming_recall",
    _HAMMING_CTE + """,
    n AS (
      SELECT vec_id, embedding::DOUBLE[] AS fv,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS norm
      FROM embeddings),
    fq AS (
      SELECT vec_id AS query_id, fv AS qv, norm AS qnorm
      FROM n WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT 256),
    cr AS (
      SELECT query_id, vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_dot_product(qv, fv) / (qnorm * norm) DESC,
                        vec_id) AS rank
      FROM n, fq WHERE vec_id != query_id)
    SELECT h.query_id,
           count(c.neighbor_id)::BIGINT AS hits,
           round(count(c.neighbor_id) / 10.0, 6) AS recall
    FROM (SELECT * FROM hr WHERE rank <= 10) h
    LEFT JOIN (SELECT * FROM cr WHERE rank <= 10) c
      ON h.query_id = c.query_id AND h.neighbor_id = c.neighbor_id
    GROUP BY h.query_id""",
    "llm", "similarity",
)
def ann_hamming_recall(spark, sf_dir):
    """Recall@10 of the 16-byte Hamming index against full-precision
    cosine truth — the measurement that decides whether 32x index
    compression is servable (the binary-quantization counterpart of
    ann_recall_truncated's dimension-halving and
    embedding_int8_quant's precision MSE). Both rankings use
    deterministic tie-breaks on engine-exact scores (integer
    Hamming; float32-in-double cosine folds), so the top-10 SETS are
    engine-identical and the per-query hit count is an exact
    integer. Plan: two broadcast-query brute-force passes over one
    corpus scan each + a k-rows-per-query join — no corpus-sized
    shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    ham = similarity.hamming_topk(emb, k=10, query_mod=50)
    cos = similarity.brute_force_topk(emb, k=10, query_mod=50)
    hits = (ham.select("query_id", "neighbor_id")
            .join(cos.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count("*").cast("long").alias("hits")))
    return (ham.select("query_id").distinct()
            .join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
                    F.round(F.coalesce("hits", F.lit(0)) / 10.0, 6)
                    .alias("recall")))


@register(
    "dup_ngram_char_fraction",
    r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, ws
      FROM w),
    tok2 AS (SELECT doc_id, pos, ws[pos] AS word FROM tok),
    g AS (
      SELECT doc_id, unnest(generate_series(1, len(ws) - 4)) AS s, ws
      FROM w WHERE len(ws) >= 5),
    gg AS (
      SELECT doc_id, s, array_to_string(ws[s : s + 4], ' ') AS gram
      FROM g),
    dup AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, s,
               count(*) OVER (PARTITION BY doc_id, gram) AS c
        FROM gg) WHERE c >= 2),
    covd AS (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT doc_id, unnest(generate_series(s, s + 4)) AS pos FROM dup)),
    dchars AS (
      SELECT t.doc_id, sum(length(t.word))::BIGINT AS dup_ngram_chars
      FROM tok2 t JOIN covd c ON t.doc_id = c.doc_id AND t.pos = c.pos
      GROUP BY t.doc_id),
    tot AS (
      SELECT doc_id, count(*)::BIGINT AS n_words,
             sum(length(word))::BIGINT AS word_chars
      FROM tok2 GROUP BY doc_id)
    SELECT t.doc_id, n_words, word_chars,
           COALESCE(dup_ngram_chars, 0)::BIGINT AS dup_ngram_chars,
           CASE WHEN word_chars = 0 THEN 0.0
                ELSE ((2 * COALESCE(dup_ngram_chars, 0)::BIGINT * 1000000
                       + word_chars) // (2 * word_chars)) / 1e6
                END AS dup_char_frac
    FROM tot t LEFT JOIN dchars d ON t.doc_id = d.doc_id""",
    "llm", "text", "quality",
)
def dup_ngram_char_fraction(spark, sf_dir):
    """Gopher's "fraction of characters in duplicate word n-grams"
    (Rae et al. 2021 Table A1; n=5) —
    operators/text.py:dup_ngram_char_fraction. Coverage-UNION
    semantics: overlapping duplicate grams count each word position
    once, making this a character-budget signal rather than a gram
    count (the missing member next to doc_repetition_stats' dup-word
    and top-bigram fractions). Every stage is doc_id-keyed (gram
    window, coverage distinct, position join) — no cross-doc state,
    no pair joins, partial aggregation throughout."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.text import dup_ngram_char_fraction as _f

    return _f(docs, n=5)


# ======================================================================
# Round 9: Gopher top-n-gram character fraction (n = 2, 3, 4)
# ======================================================================

@register(
    "top_ngram_char_fraction",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')),
                                        '[a-z0-9]+') AS w
      FROM documents),
    ns AS (SELECT unnest([2, 3, 4]) AS n),
    g AS (
      SELECT doc_id, n,
             unnest(list_transform(range(1, len(w) - n + 2),
                    i -> array_to_string(w[i : i + n - 1], ' '))) AS gram,
             list_sum(list_transform(w, x -> length(x))) AS wc
      FROM toks CROSS JOIN ns
      WHERE len(w) >= n),
    c AS (
      SELECT doc_id, n, gram, count(*)::BIGINT AS cnt, max(wc) AS wc
      FROM g GROUP BY doc_id, n, gram),
    r AS (
      SELECT doc_id, n, gram, cnt, wc,
             row_number() OVER (PARTITION BY doc_id, n
                                ORDER BY cnt DESC, gram) AS rn
      FROM c)
    SELECT doc_id, n::BIGINT AS n, gram AS top_gram, cnt AS top_count,
           ((2 * cnt * (length(gram) - (n - 1)) * 1000000 + wc)
            // (2 * wc::BIGINT)) / 1e6
             AS top_char_frac
    FROM r WHERE rn = 1""",
    "llm", "text", "quality",
)
def top_ngram_char_fraction(spark, sf_dir):
    """Gopher's "fraction of characters in the MOST FREQUENT word
    n-gram" for n = 2, 3, 4 (Rae et al. 2021 Table A1 — the
    count-weighted family; dup_ngram_char_fraction carries the
    coverage-union family for n >= 5). Per (doc, n): the argmax gram
    by (count DESC, gram ASC), its count, and
    count * gram_word_chars / total_word_chars.
    operators/text.py:top_ngram_char_fraction.

    Plan: ZERO shuffles — the doc_repetition_stats longest-equal-run
    fold generalized to also CARRY the winning gram through the
    aggregate, then one narrow explode over the three n values;
    nothing leaves the scan task, so at 100 TB this is
    parquet-scan-bound like every per-doc signal."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.text import top_ngram_char_fraction as _f

    return _f(docs)


# ======================================================================
# Round 9: SoftDeDup reweighting (reweight-not-remove dedup)
# ======================================================================

@register(
    "softdedup_weights",
    r"""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\s+') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, array_to_string(ws[i : i + 3], ' ') AS gram
      FROM (SELECT doc_id, ws,
                   unnest(generate_series(1, len(ws) - 3)) AS i
            FROM w WHERE len(ws) >= 4)),
    dgc AS (
      SELECT doc_id, gram, count(*)::BIGINT AS cnt FROM g GROUP BY 1, 2),
    lm AS (SELECT gram, sum(cnt)::BIGINT AS cg FROM dgc GROUP BY 1),
    lp AS (
      SELECT gram,
             CAST(round(ln(cg::DOUBLE
                           / (SELECT sum(cg) FROM lm)::DOUBLE)
                        * 1000000000) AS BIGINT) AS lp_units
      FROM lm),
    sc AS (
      SELECT d.doc_id, sum(d.cnt)::BIGINT AS n_grams,
             sum(d.cnt * lp.lp_units)::BIGINT AS units
      FROM dgc d JOIN lp USING (gram) GROUP BY 1),
    m AS (
      SELECT doc_id, n_grams,
             (CASE WHEN units < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(units)::HUGEINT * 1000000
                 + n_grams::HUGEINT * 1000000000)
                // (2 * n_grams::HUGEINT * 1000000000)) / 1e6
               AS mean_logp
      FROM sc),
    st AS (SELECT min(mean_logp) AS mn, max(mean_logp) AS mx FROM m)
    SELECT doc.doc_id,
           coalesce(m.n_grams, 0)::BIGINT AS n_grams,
           m.mean_logp AS mean_logp,
           CASE WHEN m.n_grams IS NULL THEN 1.0
                WHEN st.mx = st.mn THEN 1.0
                ELSE ((2 * (2 * (CAST(round(st.mx * 1000000) AS BIGINT)
                               - CAST(round(st.mn * 1000000) AS BIGINT))
                          - (CAST(round(m.mean_logp * 1000000) AS BIGINT)
                             - CAST(round(st.mn * 1000000) AS BIGINT)))
                       * 1000000
                       + 2 * (CAST(round(st.mx * 1000000) AS BIGINT)
                              - CAST(round(st.mn * 1000000) AS BIGINT)))
                      // (2 * 2 * (CAST(round(st.mx * 1000000) AS BIGINT)
                                   - CAST(round(st.mn * 1000000)
                                          AS BIGINT)))) / 1e6
           END AS softdedup_weight
    FROM documents doc LEFT JOIN m USING (doc_id) CROSS JOIN st""",
    "llm", "dedup", "quality",
)
def softdedup_weights(spark, sf_dir):
    """SoftDeDup reweighting (He et al. 2024): down-weight common
    documents instead of removing them —
    operators/text.py:softdedup_weights. Per doc: the mean log-prob
    of its word 4-grams under the corpus' own gram distribution
    (nano-unit integer accumulation, so the sum is exact on any
    engine), min-max normalized into a sampling weight with a 0.5
    floor. The reweight-not-remove member of the dedup family: hard
    dedup keeps/kills; this emits the per-doc sampling rate a
    temperature-mixing stage consumes downstream.

    Plan: corpus text shuffles once (the gram explode into a
    (doc, gram) partial-aggregated count); the gram LM and its total
    are broadcast; the corpus min/max is a second broadcast scalar —
    no pair joins, so at 100 TB this scales like any per-doc signal
    plus one vocab-sized broadcast."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.text import softdedup_weights as _f

    return _f(docs, n=4)


def _weighted_mixture_sql() -> str:
    sd = REGISTRY["softdedup_weights"].oracle
    mr = REGISTRY["mixture_temperature_rates"].oracle
    gf = REGISTRY["gopher_quality_flags"].oracle
    return f"""
    WITH sd AS (SELECT doc_id, softdedup_weight FROM ({sd})),
    mr AS (SELECT source, sample_weight FROM ({mr})),
    gk AS (SELECT doc_id, keep FROM ({gf})),
    d AS (SELECT doc_id, source FROM documents),
    u AS (
      SELECT d.source,
             CASE WHEN gk.keep THEN 1 ELSE 0 END AS kp,
             CAST(round(sd.softdedup_weight * 1000000) AS BIGINT)
               * CAST(round(mr.sample_weight * 1000000) AS BIGINT)
               AS units
      FROM d JOIN sd USING (doc_id) JOIN gk USING (doc_id)
             JOIN mr ON d.source = mr.source),
    agg AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(kp)::BIGINT AS n_kept,
             -- HUGEINT keeps the micro-unit sum exact past ~9e6 kept
             -- docs/source (a ::BIGINT cast here would defeat DuckDB's
             -- native HUGEINT sum promotion and overflow at scale)
             sum(kp * units)::HUGEINT AS eff_units
      FROM u GROUP BY source)
    SELECT source, n_docs, n_kept,
           ((2 * eff_units * 1000000 + 1000000000000::HUGEINT)
            // (2 * 1000000000000::HUGEINT)) / 1e6 AS eff_weight,
           CASE WHEN sum(eff_units) OVER () = 0 THEN 0.0
                ELSE ((2 * eff_units * 1000000 + sum(eff_units) OVER ())
                      // (2 * sum(eff_units) OVER ())) / 1e6
           END AS eff_share
    FROM agg"""


@register("pipeline_weighted_mixture", _weighted_mixture_sql(),
          "llm", "pipeline", "sampling")
def pipeline_weighted_mixture(spark, sf_dir):
    """The final weighting assembly a training-data writer consumes:
    per source, the EFFECTIVE document mass after the whole curation
    stack — Gopher keep gate (hard filter) x SoftDeDup commonness
    weight (soft dedup) x temperature mixture rate (source
    balancing) — plus each source's share of the total effective
    mass. This is the number that prices a source in the token
    budget once every per-doc signal has had its say; hard dedup
    keeps/kills, this rolls the keep-AND-reweight decisions into the
    sampling plan.

    Determinism: both 6-dp weights are lifted ONCE to integer
    micro-units, so the per-source accumulation is an exact BIGINT
    sum (order-independent on any engine); only the final
    normalization divides in double. Plan: three doc-keyed fact
    joins (softdedup weight, gopher keep, the label projection), the
    #sources-sized rate table broadcast, one source-keyed aggregate,
    and a #sources-window normalization — nothing wider than the
    gram explodes already inside the composed operators."""
    docs = _t(spark, sf_dir, "documents")
    sd = REGISTRY["softdedup_weights"].fn(spark, sf_dir) \
        .select("doc_id", "softdedup_weight")
    gk = REGISTRY["gopher_quality_flags"].fn(spark, sf_dir) \
        .select("doc_id", "keep")
    mr = REGISTRY["mixture_temperature_rates"].fn(spark, sf_dir) \
        .select("source", "sample_weight")
    d = docs.select("doc_id", "source")
    su = F.round(F.col("softdedup_weight") * 1_000_000).cast("long")
    mu = F.round(F.col("sample_weight") * 1_000_000).cast("long")
    u = (d.join(sd, "doc_id").join(gk, "doc_id")
         .join(F.broadcast(mr), "source")
         .select("source",
                 F.when(F.col("keep"), F.lit(1)).otherwise(F.lit(0))
                 .alias("kp"),
                 (su * mu).alias("units")))
    # per-doc units ~1e12; a BIGINT per-source sum would overflow past
    # ~1e6 docs/source, so the per-row product is cast to
    # DECIMAL(28,0), making Spark's sum type DECIMAL(38,0) (precision
    # + 10) — the ACCUMULATOR itself has ~1e38 headroom, exact and
    # order-independent like every DECIMAL partial in this repo (the
    # oracle sums in HUGEINT for the same reason); only the final
    # normalization divides in double, values unchanged at any SF
    # that fits either engine
    agg = u.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("kp").cast("long").alias("n_kept"),
        F.sum((F.col("kp") * F.col("units")).cast("decimal(28,0)"))
        .alias("eff_units"))
    w = Window.partitionBy()
    return agg.select(
        "source", "n_docs", "n_kept",
        # micro-unit sums beyond BIGINT headroom: exact 6-dp in DECIMAL
        _ratio6_dec(F.col("eff_units"),
                    F.lit(1_000_000_000_000)).alias("eff_weight"),
        F.when(F.sum("eff_units").over(w) == 0, F.lit(0.0))
         .otherwise(_ratio6_dec(F.col("eff_units"),
                                F.sum("eff_units").over(w)))
         .alias("eff_share"))


@register(
    "semantic_dedup_delta",
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
    c AS (
      SELECT vec_id AS cent_id, v AS cv, norm AS cnorm
      FROM n WHERE vec_id % 23 = 1 AND vec_id % 9 != 0
      ORDER BY vec_id LIMIT 256),
    asn AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT n.vec_id, c.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.v, c.cv) / (n.norm * c.cnorm)
                   DESC, c.cent_id) AS r
        FROM n CROSS JOIN c) WHERE r = 1),
    m AS (
      SELECT n.vec_id, n.v, n.norm, asn.cell
      FROM n JOIN asn USING (vec_id)),
    newv AS (SELECT * FROM m WHERE vec_id % 9 = 0),
    nbr AS (
      SELECT l.vec_id AS lid, min(r.vec_id) AS nbr_min
      FROM newv l JOIN m r USING (cell)
      WHERE r.vec_id < l.vec_id
        AND list_dot_product(l.v, r.v) / (l.norm * r.norm) >= 0.35
      GROUP BY l.vec_id)
    SELECT newv.vec_id, newv.cell,
           coalesce(nbr.nbr_min, newv.vec_id) AS keep_id,
           (nbr.nbr_min IS NULL) AS kept
    FROM newv LEFT JOIN nbr ON newv.vec_id = nbr.lid""",
    "llm", "similarity", "dedup", "cdc",
)
def semantic_dedup_delta(spark, sf_dir):
    """Incremental SemDeDup under a vector changelog
    (operators/similarity.py:semantic_dedup_delta): the prior corpus
    covers vec_id % 9 != 0; the % 9 == 0 vectors arrive as a batch
    and ONLY they pay assignment + one within-cell comparison against
    (history + batch) lower-id members — minhash_delta's changelog
    idiom on the embedding path, composed with
    ivf_incremental_assign's fixed-quantizer contract. Output is
    batch-sized: (vec_id, cell, keep_id, kept). The member join is
    pinned shuffle_hash (the corpus side must never broadcast); at
    scale it is a partition-pruned read of the probed cells only."""
    from .operators import similarity as sim
    emb = _t(spark, sf_dir, "embeddings")
    history = emb.filter(F.col("vec_id") % 9 != 0)
    incoming = emb.filter(F.col("vec_id") % 9 == 0)
    return sim.semantic_dedup_delta(history, incoming, threshold=0.35)
