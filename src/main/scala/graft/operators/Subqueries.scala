package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Subqueries, unnest/explode, and pivot (SURVEY.md §2.7).
  *
  * The subquery trio runs through `spark.sql` on temp views so
  * Catalyst's own subquery rewrites are exercised: the scalar subquery
  * becomes a one-row broadcast, `IN (SELECT …)` becomes a left-semi
  * join, and the correlated Q17-shape is decorrelated into an
  * aggregate + join — all scale-safe plans (no per-row re-execution).
  */
object Subqueries extends OpModule {

  private def sql(tables: Seq[String], q: String): Q = (s, d) => {
    tables.foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
    s.sql(q)
  }

  /** "price above average" with the average comparison multiplied out
    * to exact decimal arithmetic (p·n > Σp): avg(p_retailprice) lands
    * EXACTLY on a 2-dp value in this data, so the float-avg form puts
    * every part priced at the mean one summation-order bit away from
    * flipping in or out of the result. */
  private val ScalarSql =
    """SELECT p_partkey, p_retailprice FROM part
      |WHERE CAST(p_retailprice AS DECIMAL(12,2)) * (SELECT count(*) FROM part)
      |    > (SELECT sum(CAST(p_retailprice AS DECIMAL(12,2))) FROM part)
      |ORDER BY p_partkey""".stripMargin

  private val InSql =
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      |ORDER BY o_orderkey""".stripMargin

  private val CorrelatedSql =
    """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_quantity
      |FROM lineitem l
      |WHERE l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      |                      WHERE l2.l_partkey = l.l_partkey)
      |ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_quantity""".stripMargin

  /** Correlated LATERAL derived table with ORDER BY + LIMIT — the
    * "top-N related rows per outer row" shape. Catalyst plans it as a
    * lateral join with a per-group limit, not a per-row re-execution;
    * DuckDB runs the identical text. Output key (c_custkey,
    * o_orderkey) is unique ⇒ total order. */
  private val LateralSql =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
      |) t
      |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "subq_scalar" -> sql(Seq("part"), ScalarSql),
    "subq_in" -> sql(Seq("orders", "customer"), InSql),
    "subq_correlated" -> sql(Seq("lineitem"), CorrelatedSql),
    "subq_lateral" -> sql(Seq("customer", "orders"), LateralSql),

    "explode_unnest" -> ((s, d) =>
      Tables.embeddings(s, d).filter(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"), col("val"))
        .orderBy("vec_id", "pos")),

    "date_spine" -> ((s, d) => {
      // Gap-filled monthly spine: sequence() generator from min to max
      // order month, LEFT-joined to per-month counts (months with no
      // orders appear as 0). The spine is one row exploded from a
      // single aggregate — broadcastable at any scale.
      val bounds = Tables.orders(s, d).agg(
        date_trunc("month", min("o_orderdate")).as("lo"),
        date_trunc("month", max("o_orderdate")).as("hi"))
      val spine = bounds.select(
        explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("mts"))
        .select(to_date(col("mts")).as("month_start"))
      val counts = Tables.orders(s, d)
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("m"))
        .agg(count(lit(1)).as("n"))
      spine.join(counts, col("m") === col("month_start"), "left")
        .select(col("month_start"), coalesce(col("n"), lit(0L)).as("n_orders"))
        .orderBy("month_start")
    }),

    "pivot_long" -> ((s, d) =>
      // unpivot/melt: wide numeric columns → (key, metric, value) rows.
      // Spark's native unpivot (Melt logical node); the oracle uses the
      // portable UNION ALL formulation.
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "val")
        .orderBy("p_partkey", "metric")),

    "pivot_wide" -> ((s, d) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val p = Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
      p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "subq_scalar" -> ScalarSql,
    "subq_in" -> InSql,
    "subq_correlated" -> CorrelatedSql,
    "subq_lateral" -> LateralSql,

    "explode_unnest" ->
      """SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS pos,
        |  unnest(embedding) AS val
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id, pos""".stripMargin,

    "date_spine" ->
      """WITH bounds AS (
        |  SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |         date_trunc('month', max(o_orderdate)) AS hi
        |  FROM orders
        |), spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month_start
        |  FROM bounds
        |), counts AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, count(*) AS n
        |  FROM orders GROUP BY 1
        |)
        |SELECT month_start, coalesce(n, 0) AS n_orders
        |FROM spine LEFT JOIN counts ON m = month_start
        |ORDER BY month_start""".stripMargin,

    "pivot_long" ->
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "pivot_wide" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
