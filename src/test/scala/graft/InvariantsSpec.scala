package graft

/** Cross-query algebraic invariants on the sf0.001 data — each one
  * checks a query against an independently computed fact, so a shared
  * bug in a query and its oracle can still be caught engine-side.
  */
class InvariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("dedup_exact copy counts add up to the corpus size") {
    val total = Tables.documents(spark, sf).count()
    val summed = q("dedup_exact").agg(org.apache.spark.sql.functions.sum("n_copies"))
      .collect().head.getLong(0)
    assert(summed === total)
  }

  test("semi and anti joins partition the customer table") {
    val customers = Tables.customer(spark, sf).count()
    assert(q("join_semi").count() + q("join_anti").count() === customers)
  }

  test("union distinct equals distinct of union all") {
    assert(q("set_union").count() === q("set_union_all").distinct().count())
  }

  test("top-k per group emits at most k rows per group") {
    val over = q("win_topk_per_group").groupBy("o_custkey").count()
      .filter("count > 3").count()
    assert(over === 0L)
  }

  test("windowed dedup keeps exactly one row per event_id") {
    val d = q("evt_late_dedup")
    assert(d.count() === d.select("event_id").distinct().count())
  }

  test("sliding windows see each event windowLength/slide times") {
    val events = Tables.events(spark, sf).count()
    val winSum = q("evt_sliding").agg(org.apache.spark.sql.functions.sum("cnt"))
      .collect().head.getLong(0)
    assert(winSum === events * 4) // 1h window, 15m slide
  }

  test("minhash signature pipeline is idempotent") {
    val a = q("dedup_minhash_sig").collect()
    val b = q("dedup_minhash_sig").collect()
    assert(a.toSeq === b.toSeq)
  }
}
