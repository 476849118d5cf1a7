package graft

import org.apache.spark.sql.Row

/** Hand-computed expectations for the union-timeline as-of join:
  * inclusive timestamp matching, latest-order-wins, max-key tiebreak
  * on equal dates, and inner-join semantics for events with no prior
  * order.
  */
class AsofJoinSpec extends SparkSpec {

  private val us = 1000000L // one second in µs

  private lazy val dir = {
    val d = Fixtures.tempDir()
    // user 1: orders at t=100s (key 10), t=200s (keys 20 & 21 same date).
    // user 2: order at t=500s (key 30).
    Fixtures.orders(spark, d, Seq(
      (10L, 1L, 100L * us),
      (20L, 1L, 200L * us),
      (21L, 1L, 200L * us),
      (30L, 2L, 500L * us)))
    // events: (event_id, ts_us, user_id, type, value)
    Fixtures.events(spark, d, Seq(
      (1L, 50L * us, 1L, "view", 1.0),   // before any order → dropped
      (2L, 100L * us, 1L, "view", 1.0),  // ts == orderdate → inclusive, key 10
      (3L, 150L * us, 1L, "view", 1.0),  // between orders → key 10
      (4L, 250L * us, 1L, "view", 1.0),  // after the tie → max key 21
      (5L, 400L * us, 2L, "view", 1.0),  // user 2, before their order → dropped
      (6L, 600L * us, 2L, "view", 1.0))) // user 2 → key 30
    d
  }

  test("as-of join picks the latest prior order with inclusive ts and max-key ties") {
    val got = SparkEntry.queries("join_asof")(spark, dir)
      .select("event_id", "last_order_key").collect().toSeq
    val expect = Seq(Row(2L, 10L), Row(3L, 10L), Row(4L, 21L), Row(6L, 30L))
    assert(got === expect)
  }
}
