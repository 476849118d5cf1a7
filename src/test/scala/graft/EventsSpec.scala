package graft

import org.apache.spark.sql.Row

/** Hand-computed sessionization and funnel expectations on a tiny
  * events fixture (30-minute session gap; view→click→purchase order).
  */
class EventsSpec extends SparkSpec {

  private val min = 60L * 1000000L // one minute in µs

  private lazy val dir = {
    val d = Fixtures.tempDir()
    Fixtures.events(spark, d, Seq(
      // user 1: events at 0, 10, 29 min (one session), then 70 min (new).
      (1L, 0L * min, 1L, "view", 1.0),
      (2L, 10L * min, 1L, "click", 2.0),
      (3L, 29L * min, 1L, "purchase", 3.0),
      (4L, 70L * min, 1L, "view", 4.0),
      // user 2: purchase BEFORE click → funnel not done.
      (5L, 0L * min, 2L, "view", 1.0),
      (6L, 5L * min, 2L, "purchase", 1.0),
      (7L, 90L * min, 2L, "click", 1.0)))
    d
  }

  test("sessionization splits on >30min gaps") {
    val got = SparkEntry.queries("evt_session")(spark, dir)
      .select("user_id", "session_id", "n_events").collect().toSeq
    val expect = Seq(
      Row(1L, 1L, 3L), Row(1L, 2L, 1L),
      Row(2L, 1L, 2L), Row(2L, 2L, 1L))
    assert(got === expect)
  }

  test("funnel requires strictly ordered view→click→purchase") {
    val got = SparkEntry.queries("evt_funnel")(spark, dir)
      .select("user_id", "funnel_done").collect().toSeq
    assert(got === Seq(Row(1L, true), Row(2L, false)))
  }

  test("tumbling windows bucket by hour") {
    val got = SparkEntry.queries("evt_tumbling")(spark, dir).collect()
    // hour 0: views @0 (users 1,2), click @10, purchases @29,@5;
    // hour 1: view @70, click @90.
    val byKey = got.map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byKey((0L, "view")) === 2L)
    assert(byKey((0L, "click")) === 1L)
    assert(byKey((0L, "purchase")) === 2L)
    assert(byKey((3600L, "view")) === 1L)
    assert(byKey((3600L, "click")) === 1L)
  }

  test("MAD outlier screen is robust to the outlier it flags") {
    val d = Fixtures.tempDir()
    // signup values 0,10,20,30,1000: median 20, deviations
    // {20,10,0,10,980} → MAD 10; only 980 > 3·MAD → one outlier.
    // (A mean/stddev screen would have its center dragged to 212.)
    Fixtures.events(spark, d, Seq(
      (1L, 1L * min, 1L, "signup", 0.0),
      (2L, 2L * min, 1L, "signup", 10.0),
      (3L, 3L * min, 1L, "signup", 20.0),
      (4L, 4L * min, 1L, "signup", 30.0),
      (5L, 5L * min, 1L, "signup", 1000.0)))
    val got = SparkEntry.queries("evt_mad_outliers")(spark, d).collect().toSeq
    assert(got === Seq(Row("signup", 5L, 20.0, 10.0, 1L)))
  }
}
