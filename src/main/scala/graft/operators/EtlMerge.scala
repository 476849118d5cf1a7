package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental-load surface: MERGE-style upsert of a delta slice into
  * a base table, and an SCD2 (slowly-changing-dimension, type 2)
  * effective-date merge — the staple "apply the day's changes" family
  * of any ETL engine.
  *
  * Both are expressed as ONE full-outer join between base and delta
  * keyed on the business key (the relational core of MERGE INTO;
  * a transactional table format would add atomicity on top, not
  * different dataflow). The SCD2 variant emits its 1–2 output versions
  * per key from an in-row array-explode rather than re-joining base
  * once per action branch, so base is scanned once.
  *
  * Scale notes: the join shuffles both sides on the business key —
  * exactly the partitioning a bucketed base table would co-locate, and
  * the delta side is typically small enough to broadcast (at 100 TB
  * base with a daily delta, broadcast turns the merge into a map-only
  * scan of base). AQE handles a skewed business key. No window, no
  * collect, output is |base ∪ delta| (+1 row per changed SCD2 key).
  */
object EtlMerge extends OpModule {

  /** SCD2 effective date of the simulated delta batch. */
  private val ScdDate = "1997-06-01"

  val queries: Map[String, Q] = Map(
    "etl_merge_upsert" -> ((s, d) => {
      // base: customers except every 3rd key (so delta has true
      // inserts); delta: every 2nd key with updated name/balance.
      val base = Tables.customer(s, d).filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit(1).as("in_base"))
      val delta = Tables.customer(s, d).filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"),
          concat(col("c_name"), lit("#u")).as("d_name"),
          (col("c_acctbal") + 100).as("d_acctbal"),
          lit(1).as("in_delta"))
      base.join(delta, Seq("c_custkey"), "full_outer")
        .select(col("c_custkey"),
          coalesce(col("d_name"), col("c_name")).as("name"),
          coalesce(col("d_acctbal"), col("c_acctbal")).as("acctbal"),
          when(col("in_delta").isNotNull && col("in_base").isNotNull, "update")
            .when(col("in_delta").isNotNull, "insert")
            .otherwise("keep").as("action"))
        .orderBy("c_custkey")
    }),

    "etl_incremental" -> ((s, d) => {
      // High-water-mark incremental extraction — the "rows since the
      // last load" step. The watermark is the loaded slice's max
      // event-time (a one-row broadcast scalar, compared in µs so both
      // engines truncate ns identically); the delta summarizes per
      // day. At scale the watermark comes from load metadata instead
      // of a scan, but the delta-side plan is the same pushed filter.
      val e = Tables.events(s, d)
      val hwm = e.filter(col("ts") < lit("2024-01-15").cast("timestamp"))
        .agg(max(unix_micros(col("ts"))).as("hwm"))
      e.crossJoin(broadcast(hwm))
        .filter(unix_micros(col("ts")) > col("hwm"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
        .orderBy("day")
    }),

    "etl_scd2_merge" -> ((s, d) => {
      // base dimension: one open version per key (valid_from fixed,
      // valid_to null); delta: changed segment for every 5th key.
      // Changed keys close the old version at ScdDate and open a new
      // one; delta-only keys insert; untouched keys pass through —
      // all three actions from the single joined row via explode.
      val base = Tables.customer(s, d).filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          lit("1995-01-01").as("valid_from"))
      val delta = Tables.customer(s, d).filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"),
          concat(lit("NEW_"), col("c_mktsegment")).as("new_segment"))
      val nullStr = lit(null).cast("string")
      val versions =
        when(col("new_segment").isNotNull && col("segment").isNotNull, array(
          struct(col("segment").as("seg"), col("valid_from").as("vf"),
            lit(ScdDate).as("vt"), lit(false).as("cur")),
          struct(col("new_segment").as("seg"), lit(ScdDate).as("vf"),
            nullStr.as("vt"), lit(true).as("cur"))))
        .when(col("new_segment").isNotNull, array(
          struct(col("new_segment").as("seg"), lit(ScdDate).as("vf"),
            nullStr.as("vt"), lit(true).as("cur"))))
        .otherwise(array(
          struct(col("segment").as("seg"), col("valid_from").as("vf"),
            nullStr.as("vt"), lit(true).as("cur"))))
      base.join(delta, Seq("c_custkey"), "full_outer")
        .select(col("c_custkey"), explode(versions).as("v"))
        .select(col("c_custkey"), col("v.seg").as("segment"),
          col("v.vf").as("valid_from"), col("v.vt").as("valid_to"),
          col("v.cur").as("is_current"))
        .orderBy("c_custkey", "valid_from", "segment")
    }),
  )

  val oracles: Map[String, String] = Map(
    "etl_merge_upsert" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_acctbal, 1 AS in_base
        |  FROM customer WHERE c_custkey % 3 <> 0
        |), delta AS (
        |  SELECT c_custkey, c_name || '#u' AS d_name,
        |    c_acctbal + 100 AS d_acctbal, 1 AS in_delta
        |  FROM customer WHERE c_custkey % 2 = 0
        |)
        |SELECT c_custkey,
        |  coalesce(d_name, c_name) AS name,
        |  coalesce(d_acctbal, c_acctbal) AS acctbal,
        |  CASE WHEN in_delta IS NOT NULL AND in_base IS NOT NULL THEN 'update'
        |       WHEN in_delta IS NOT NULL THEN 'insert'
        |       ELSE 'keep' END AS action
        |FROM base FULL OUTER JOIN delta USING (c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "etl_incremental" ->
      """WITH hwm AS (
        |  SELECT max(epoch_us(ts)) AS hwm FROM events
        |  WHERE ts < TIMESTAMP '2024-01-15'
        |)
        |SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM events CROSS JOIN hwm
        |WHERE epoch_us(ts) > hwm
        |GROUP BY day ORDER BY day""".stripMargin,

    "etl_scd2_merge" ->
      """WITH base AS (
        |  SELECT c_custkey, c_mktsegment AS segment, '1995-01-01' AS valid_from
        |  FROM customer WHERE c_custkey % 3 <> 0
        |), delta AS (
        |  SELECT c_custkey, 'NEW_' || c_mktsegment AS new_segment
        |  FROM customer WHERE c_custkey % 5 = 0
        |), merged AS (
        |  SELECT b.c_custkey AS b_key, b.segment, b.valid_from,
        |         d.c_custkey AS d_key, d.new_segment
        |  FROM base b FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
        |)
        |SELECT coalesce(b_key, d_key) AS c_custkey, segment, valid_from,
        |  '1997-06-01' AS valid_to, false AS is_current
        |FROM merged WHERE new_segment IS NOT NULL AND segment IS NOT NULL
        |UNION ALL
        |SELECT coalesce(b_key, d_key), new_segment, '1997-06-01',
        |  CAST(NULL AS VARCHAR), true
        |FROM merged WHERE new_segment IS NOT NULL
        |UNION ALL
        |SELECT coalesce(b_key, d_key), segment, valid_from,
        |  CAST(NULL AS VARCHAR), true
        |FROM merged WHERE new_segment IS NULL
        |ORDER BY c_custkey, valid_from, segment""".stripMargin,
  )
}
