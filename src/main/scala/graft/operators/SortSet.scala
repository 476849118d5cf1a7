package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sort / limit / top-k / set operators (SURVEY.md §2.6).
  *
  * Scale notes: `orderBy` is a range-partitioned total sort (sampled
  * range boundaries, one shuffle); `orderBy().limit(k)` compiles to
  * TakeOrderedAndProject — per-partition top-k heaps merged on the
  * driver, no full sort, no shuffle of the full data. Set ops with
  * distinct semantics shuffle on the full row hash; `UNION ALL` is a
  * zero-shuffle concatenation.
  */
object SortSet extends OpModule {

  private def segSlice(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_nationkey")
  private def natSlice(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_nationkey") < 10)
      .select("c_custkey", "c_nationkey")

  val queries: Map[String, Q] = Map(
    "sort_multi" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"), col("c_mktsegment"),
        expr("nullif(c_nationkey, 5)").as("nk"), col("c_acctbal"))
        .orderBy(col("c_mktsegment").desc, col("nk").asc_nulls_first,
          col("c_acctbal").desc, col("c_custkey"))),

    "topk_global" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    "set_union" -> ((s, d) =>
      segSlice(s, d).union(natSlice(s, d)).distinct().orderBy("c_custkey")),

    "set_union_all" -> ((s, d) =>
      segSlice(s, d).union(natSlice(s, d)).orderBy("c_custkey", "c_nationkey")),

    "set_intersect" -> ((s, d) =>
      segSlice(s, d).intersect(natSlice(s, d)).orderBy("c_custkey")),

    "set_except" -> ((s, d) =>
      segSlice(s, d).except(natSlice(s, d)).orderBy("c_custkey")),

    "distinct_rows" -> ((s, d) =>
      Tables.customer(s, d).select("c_mktsegment", "c_nationkey")
        .distinct().orderBy("c_mktsegment", "c_nationkey")),
  )

  private val A = "SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"
  private val B = "SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 10"

  val oracles: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT c_custkey, c_mktsegment, nullif(c_nationkey, 5) AS nk, c_acctbal
        |FROM customer
        |ORDER BY c_mktsegment DESC, nk ASC NULLS FIRST, c_acctbal DESC, c_custkey""".stripMargin,

    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "set_union" -> s"SELECT * FROM ($A UNION $B) ORDER BY c_custkey",
    "set_union_all" -> s"SELECT * FROM ($A UNION ALL $B) ORDER BY c_custkey, c_nationkey",
    "set_intersect" -> s"SELECT * FROM ($A INTERSECT $B) ORDER BY c_custkey",
    "set_except" -> s"SELECT * FROM ($A EXCEPT $B) ORDER BY c_custkey",

    "distinct_rows" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
  )
}
