package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function operators (SURVEY.md §2.5).
  *
  * Scale notes: every window here is partitioned (by customer / user /
  * order-status), so execution is one shuffle on the partition key then
  * a per-partition sort — no single-partition global window appears in
  * any query, which is the pattern that would serialize at 100 TB.
  * Window ORDER BYs always carry a unique tiebreaker key so rank /
  * running frames are deterministic across engines.
  */
object Windows extends OpModule {

  val queries: Map[String, Q] = Map(
    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        row_number().over(w).cast("long").as("rn"))
        .orderBy("o_custkey", "rn")
    }),

    "win_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("user_id", "event_id")
    }),

    "win_running" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        round(sum("value").over(w), 4).as("run_sum"),
        count(lit(1)).over(w).as("run_cnt"))
        .orderBy("user_id", "event_id")
    }),

    "win_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, 0)
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        round(avg("value").over(w), 4).as("mov_avg"))
        .orderBy("user_id", "event_id")
    }),

    "win_first_last" -> ((s, d) => {
      // first_value / last_value / nth_value over a running frame; the
      // frame must be spelled out because last_value over the default
      // frame is just the current row.
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        first("o_orderkey").over(run).as("first_key"),
        last("o_orderkey").over(run).as("latest_key"),
        nth_value(col("o_orderkey"), 2).over(run).as("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "win_range_time" -> ((s, d) => {
      // RANGE frame over event time: trailing-1h per-user totals. The
      // frame bound is value-based (µs), so peers at the same instant
      // share one frame and the result is order-independent within
      // peers — no row-frame tiebreaker needed. Money-style decimal
      // sum keeps the double round engine-stable.
      val w = Window.partitionBy("user_id").orderBy(col("tus"))
        .rangeBetween(-3600L * 1000000L, 0L)
      Tables.events(s, d)
        .withColumn("tus", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          round(sum(Dec2(col("value"))).over(w), 4).cast("double").as("val_1h"))
        .orderBy("user_id", "event_id")
    }),

    "win_ntile_cume" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderstatus"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(cume_dist().over(w), 4).as("cd"),
        round(percent_rank().over(w), 4).as("pr"))
        .orderBy("o_orderstatus", "o_orderkey")
    }),
  )

  private val EventWin = "PARTITION BY user_id ORDER BY ts, event_id"
  private val OrderWin = "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey"

  val oracles: Map[String, String] = Map(
    "win_rank" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice,
         |  CAST(rank() OVER ($OrderWin) AS BIGINT) AS rnk,
         |  CAST(dense_rank() OVER ($OrderWin) AS BIGINT) AS drnk,
         |  CAST(row_number() OVER ($OrderWin) AS BIGINT) AS rn
         |FROM orders ORDER BY o_custkey, rn""".stripMargin,

    "win_topk_per_group" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |    CAST(row_number() OVER ($OrderWin) AS BIGINT) AS rn
         |  FROM orders
         |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "win_lag_lead" ->
      s"""SELECT user_id, event_id,
         |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER ($EventWin) AS gap_us,
         |  lead(event_type, 1) OVER ($EventWin) AS next_type
         |FROM events ORDER BY user_id, event_id""".stripMargin,

    "win_range_time" ->
      """SELECT user_id, event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(round(sum(CAST(value AS DECIMAL(12,2))) OVER w, 4) AS DOUBLE) AS val_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "win_running" ->
      s"""SELECT user_id, event_id,
         |  round(sum(value) OVER ($EventWin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum,
         |  count(*) OVER ($EventWin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt
         |FROM events ORDER BY user_id, event_id""".stripMargin,

    "win_moving_avg" ->
      s"""SELECT user_id, event_id,
         |  round(avg(value) OVER ($EventWin
         |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
         |FROM events ORDER BY user_id, event_id""".stripMargin,

    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS latest_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "win_ntile_cume" ->
      """SELECT o_orderstatus, o_orderkey,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
        |  round(cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey), 4) AS cd,
        |  round(percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey), 4) AS pr
        |FROM orders ORDER BY o_orderstatus, o_orderkey""".stripMargin,
  )
}
