package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Rule-based anomaly/alert operators (reference:
  * `/root/reference/python/stream_processor.py:35-39,255-321` and the
  * low-stock check in `cdc_processor.py:164-171`), expressed as batch
  * queries so DuckDB can referee. The streaming bindings are in
  * `graft.streaming.StreamOps`.
  *
  * Thresholds are scaled to the testdata's value distribution (events.value
  * ∈ [0, ~490]) the same way the reference hardcodes thresholds scaled to
  * its generator ($1000 orders against $10-$500 generated totals —
  * data_generator.py:86).
  *
  * Scale posture: every rule is filter-over-aggregate with keys
  * (user, day) / (type, hour) / (hour) — partial+final aggregation, no
  * state on the driver, and the alert union is a single pass.
  */
object AlertOps {

  /** C7: alert severity lookup (stream_processor.py:313-321) as a when
    * chain over the alert value. */
  private def severity(v: org.apache.spark.sql.Column) =
    when(v >= 400.0, "HIGH").when(v >= 300.0, "MEDIUM").otherwise("LOW")

  /** P7+C7: high-value alerts — the `total_amount > threshold` rule
    * (stream_processor.py:103-109) with severity enrichment. */
  def highValueAlerts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value") > 200.0)
      .select(
        col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("value"),
        lit("high_value_order").as("alert_type"),
        severity(col("value")).as("severity"))
      .orderBy("event_id")

  /** Alert-storm SUPPRESSION — the rate-limit every paging pipeline
    * puts between a rule and a human: within each (user, hour), only
    * the FIRST high-value alert pages; the rest are suppressed and
    * counted. Emits the per-(user, hour) suppression ledger — first
    * alert id/value, raw count, suppressed count — which is both the
    * dedup audit and the input to an escalate-on-N rule. First is the
    * (ts_ms, event_id) lexicographic min, the standing arrival
    * tie-break.
    *
    * Scale: one partial+final aggregate at (user, hour) grain — the
    * min(struct) pick and the counts ride the same buffer; no window,
    * no per-alert state. */
  def alertSuppression(spark: SparkSession, dir: String): DataFrame =
    highValueAlerts(spark, dir)
      .withColumn("hour_ms",
        expr("(ts_ms div 3600000) * 3600000"))
      .groupBy("user_id", "hour_ms")
      .agg(min(struct(col("ts_ms"), col("event_id"), col("value")))
        .as("first"),
        count(lit(1)).as("n_raw"))
      .select(col("user_id"), col("hour_ms"),
        col("first.event_id").as("first_event_id"),
        col("first.value").as("first_value"),
        col("n_raw"), (col("n_raw") - 1).as("n_suppressed"))
      .orderBy("user_id", "hour_ms")

  /** DuckDB oracle for [[alertSuppression]]. */
  private[graft] def alertSuppressionOracleSql: String =
    s"""WITH a AS (
       |  SELECT event_id, user_id,
       |    CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, value
       |  FROM events WHERE value > 200.0),
       |h AS (
       |  SELECT *, (ts_ms // 3600000) * 3600000 AS hour_ms FROM a),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, hour_ms
       |    ORDER BY ts_ms, event_id) AS rn,
       |    count(*) OVER (PARTITION BY user_id, hour_ms) AS n_raw
       |  FROM h)
       |SELECT user_id, CAST(hour_ms AS BIGINT) AS hour_ms,
       |  event_id AS first_event_id, value AS first_value,
       |  CAST(n_raw AS BIGINT) AS n_raw,
       |  CAST(n_raw - 1 AS BIGINT) AS n_suppressed
       |FROM r WHERE rn = 1
       |ORDER BY user_id, hour_ms""".stripMargin

  /** P7: bulk-activity rule — the `orders/min > 10` analog
    * (stream_processor.py:255-262) at per-(user, day) granularity. */
  def bulkActivityAlerts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= 5)
      .withColumn("alert_type", lit("bulk_orders"))
      .orderBy("user_id", "day")

  /** T4 batch analog: rapid-depletion velocity rule — per-key volume per
    * time bucket over a threshold (stream_processor.py:197-212: >50
    * units/min). Here: per (event_type, hour) summed value > 400. */
  def velocityAlerts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour_start"))
      .agg(BatchOps.moneySum(col("value")).as("hour_value"),
        count(lit(1)).as("n_events"))
      .filter(col("hour_value") > 400.0)
      .withColumn("alert_type", lit("rapid_stock_depletion"))
      .orderBy("event_type", "hour_start")

  /** A13: dominant-group anomaly — per window, flag when one group holds
    * more than the dominance share of events with a minimum sample size
    * (stream_processor.py:271-290: >80% one state, n>5; scaled here to a
    * ≥40% share of 5 uniform event types). Rank-1 selection uses a
    * deterministic (count desc, key asc) tiebreak. */
  def dominantGroupAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val perType = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("hour_start")
    val rankW = w.orderBy(col("n").desc, col("event_type"))
    perType
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") === 1)
      .withColumn("share", col("n").cast("double") / col("total").cast("double"))
      .filter(col("total") >= 5 && col("share") >= 0.4)
      .select(col("hour_start"), col("event_type").as("dominant_type"),
        col("n"), col("total"), col("share"),
        lit("dominant_group_anomaly").as("alert_type"))
      .orderBy("hour_start")
  }

  /** P7: low-stock alert (cdc_processor.py:164-171: stock < 10) over the
    * part dimension, p_size standing in for stock_quantity. */
  def lowStockAlerts(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_size") <= 5)
      .select(
        col("p_partkey"), col("p_name"), col("p_size"),
        lit("low_stock").as("alert_type"),
        when(col("p_size") <= 2, "HIGH").otherwise("MEDIUM").as("severity"))
      .orderBy("p_partkey")

  /** C8: pipeline health score — weighted sum of 5 component scores worth
    * 20 points each with partial-credit ratios, then banding
    * (etl_monitoring.py:253-288). Single-row global aggregate; the value
    * average goes through decimal so the score is order-independent. */
  def healthScore(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"),
        countDistinct(col("user_id")).as("n_users"),
        BatchOps.moneySum(col("value")).as("total_value"))
      .withColumn("freshness_score",
        when(col("n_events") > 0, 20.0).otherwise(0.0))
      .withColumn("error_score",
        lit(20.0) * (lit(1.0) -
          col("n_errors").cast("double") /
            greatest(col("n_events"), lit(1L)).cast("double")))
      .withColumn("activity_score",
        least(lit(20.0), lit(20.0) * col("n_users").cast("double") / 100.0))
      .withColumn("volume_score",
        least(lit(20.0), lit(20.0) * col("n_events").cast("double") / 5000.0))
      .withColumn("value_score",
        least(lit(20.0), lit(20.0) *
          (col("total_value") /
            greatest(col("n_events"), lit(1L)).cast("double")) / 100.0))
      .withColumn("health_score",
        col("freshness_score") + col("error_score") + col("activity_score") +
          col("volume_score") + col("value_score"))
      .withColumn("health_band",
        when(col("health_score") >= 90.0, "healthy")
          .when(col("health_score") >= 70.0, "degraded")
          .when(col("health_score") >= 50.0, "warning")
          .otherwise("critical"))
      .select("n_events", "n_errors", "n_users", "freshness_score",
        "error_score", "activity_score", "volume_score", "value_score",
        "health_score", "health_band")
}
