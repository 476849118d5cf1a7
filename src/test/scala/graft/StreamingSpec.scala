package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Event, Streams}

/** MemoryStream-driven checks of the Structured Streaming twins —
  * windows, sessionization, watermark dedup, and the funnel state
  * machine — since the DuckDB oracle cannot execute streams.
  */
class StreamingSpec extends SparkSpec {

  /** Fixtures sit in 2024, not at epoch 0: Spark's stream-stream join
    * state watermark (event-time watermark minus the join range,
    * clamped at zero) filters epoch-adjacent rows as late — a fixture
    * artifact that produced empty joins, not a library bug. */
  private val Base = 1704067200000L // 2024-01-01T00:00Z
  private val BaseMin = Base / 60000L

  private def ts(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  private def ev(id: Long, min: Long, user: Long, typ: String): Event =
    Event(id, ts(min), user, typ, 1.0)

  private def runToTable(name: String, df: org.apache.spark.sql.DataFrame,
                         mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("tumbling window counts by hour and type") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(ev(1, 0, 1, "view"), ev(2, 10, 1, "click"),
      ev(3, 70, 2, "view"), ev(4, 80, 2, "view"))
    runToTable("tumbling", Streams.tumblingCounts(in.toDF()), "complete")
    val got = spark.table("tumbling")
      .select("win_start", "event_type", "cnt").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000 - BaseMin, r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set((0L, "view", 1L), (0L, "click", 1L), (60L, "view", 2L)))
  }

  test("session window splits on gap and merges within it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(ev(1, 0, 1, "view"), ev(2, 20, 1, "view"),
      ev(3, 120, 1, "view"), ev(4, 0, 2, "view"))
    runToTable("sessions", Streams.sessionAgg(in.toDF()), "complete")
    val got = spark.table("sessions")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // user 1: [0,20] one session of 2, [120] one of 1; user 2: one of 1.
    assert(got === Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("dropDuplicatesWithinWatermark removes same-id replays") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(ev(1, 0, 1, "view"), ev(1, 1, 1, "view"), ev(2, 2, 1, "click"))
    runToTable("dedup", Streams.dedupEvents(in.toDF()), "append")
    assert(spark.table("dedup").select("event_id").collect()
      .map(_.getLong(0)).toSeq.sorted === Seq(1L, 2L))
  }

  test("stream-static join enriches each micro-batch against the dimension") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_key", "tier")
    val in = MemoryStream[Event]
    in.addData(ev(1, 0, 1, "view"), ev(2, 1, 2, "view"), ev(3, 2, 9L, "view"))
    val joined = Streams.enrichWithStatic(in.toDF(), dim, "user_id", "user_key")
    runToTable("enriched", joined, "append")
    val got = spark.table("enriched").select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      ev(1, 0, 1, "click"),
      ev(2, 30, 1, "purchase"),   // within 1h of click 1 → matched
      ev(3, 90, 1, "purchase"),   // 90min after click 1 → NOT matched
      ev(4, 10, 2, "purchase"))   // user 2 never clicked → NOT matched
    runToTable("attrib", Streams.clickToPurchase(in.toDF()), "append")
    val got = spark.table("attrib")
      .select("click_id", "p_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 - BaseMin))
    assert(got.toSeq === Seq((1L, 30L)))
  }

  test("funnel state machine emits once on strict view→click→purchase") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // user 1 completes across two micro-batches; user 2 is out of order.
    in.addData(ev(1, 0, 1, "view"), ev(2, 10, 1, "click"),
      ev(3, 0, 2, "purchase"), ev(4, 5, 2, "click"))
    val out = Streams.funnelHits(in.toDS())
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      in.addData(ev(5, 20, 1, "purchase"), ev(6, 10, 2, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got === Seq((1L, (Base + 20L * 60000L) * 1000L)))
  }

  test("transition pairs stitch across micro-batches per user") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(ev(1, 0, 1, "view"), ev(2, 10, 1, "click"),
      ev(3, 5, 2, "view"))
    val q = Streams.transitionPairs(in.toDS())
      .writeStream.format("memory").queryName("paths")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2 must pair its first event with batch 1's carried tail
      in.addData(ev(4, 20, 1, "purchase"), ev(5, 15, 2, "error"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("paths").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, "view", "click"), (1L, "click", "purchase"),
      (2L, "view", "error")))
  }

  test("streaming DAU counts distinct users per day") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // user 1 appears twice on day 1 (counted once); day 2 has two users.
    in.addData(ev(1, 0, 1, "view"), ev(2, 60, 1, "click"),
      ev(3, 1440, 1, "view"), ev(4, 1500, 2, "view"))
    runToTable("dau", Streams.dauCounts(in.toDF()), "complete")
    val got = spark.table("dau").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000 - BaseMin, r.getLong(1)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((0L, 1L), (1440L, 2L)))
  }

  test("streaming rolling actives count a user once per covering window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // user 1 active on days 0 and 1, user 2 on day 1 only: the window
    // ENDING after day 1 must count 2 distinct users, and user 1's two
    // active days must not double-count inside one window.
    in.addData(ev(1, 0, 1, "view"), ev(2, 1440, 1, "click"),
      ev(3, 1500, 2, "view"))
    runToTable("rolling", Streams.rollingActives(in.toDF()), "complete")
    val got = spark.table("rolling").collect()
      .map(r => (r.getTimestamp(0).getTime / 60000 - BaseMin, r.getLong(1)))
      .toMap
    // day-1 events fall in windows ending minute 1440·2 … 1440·8; the
    // window ending at minute 2880 covers both days → 2 distinct users.
    assert(got(2880L) === 2L)
    // the earliest window covering only day 0 has just user 1.
    assert(got(1440L) === 1L)
  }

  test("CDC compaction keeps the latest record per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // user 1: two versions in batch 1, a LATE (older) row in batch 2 —
    // the late row must bump n_versions but not un-win the newer record.
    in.addData(ev(1, 10, 1, "view"), ev(2, 20, 1, "click"),
      ev(3, 5, 2, "purchase"))
    val q = Streams.latestState(in.toDS())
      .writeStream.format("memory").queryName("cdc")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      in.addData(ev(4, 15, 1, "error"), ev(5, 30, 2, "view"))
      q.processAllAvailable()
    } finally q.stop()
    // memory sink in update mode appends each emission; the highest
    // version count per user is the compacted current state (collect
    // order across batches is not guaranteed).
    val got = spark.table("cdc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._4) }.toSet
    assert(got === Set((1L, 2L, "click", 3L), (2L, 5L, "view", 2L)))
  }

  test("cadence state machine flags the metronome user, not the bursty one") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // user 1: a metronome — 6 events exactly 10 min apart (5 gaps,
    // cv = 0) → bot. user 2: bursty human-ish gaps 1/50/2/40/7 min →
    // high cv, no flag. Split across two micro-batches to prove the
    // moments carry through state.
    in.addData(ev(1, 0, 1, "view"), ev(2, 10, 1, "view"),
      ev(3, 20, 1, "view"),
      ev(10, 0, 2, "view"), ev(11, 1, 2, "view"), ev(12, 51, 2, "view"))
    val q = Streams.cadenceStats(in.toDS())
      .writeStream.format("memory").queryName("cadence")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      in.addData(ev(4, 30, 1, "view"), ev(5, 40, 1, "view"),
        ev(6, 50, 1, "view"),
        ev(13, 53, 2, "view"), ev(14, 93, 2, "view"), ev(15, 100, 2, "view"))
      q.processAllAvailable()
    } finally q.stop()
    // update mode re-emits per batch; keep each user's max-n_gaps row.
    val fin = spark.table("cadence").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
      .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
    val u1 = fin.find(_._1 == 1L).get
    val u2 = fin.find(_._1 == 2L).get
    assert(u1._2 === 5L && u1._3 === 600.0 && u1._4 === 0.0 && u1._5,
      s"metronome user must flag: $u1")
    assert(u2._2 === 5L && !u2._5 && u2._4 > 0.5, s"bursty user must not flag: $u2")
  }

  test("cadenceStats replay equals the batch formulation of the same statistic") {
    // r5 verdict #8: the streaming twin's final state on a replayed
    // MemoryStream must equal a BATCH formulation of the identical
    // statistic (integer-second gap moments → mean, cv, flag) over the
    // same events — proving the O(1)-state surrogate computes the same
    // numbers as a batch job would, not merely "something similar".
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(
      ev(1, 0, 1, "view"), ev(2, 10, 1, "view"), ev(3, 20, 1, "view"),
      ev(4, 30, 1, "view"), ev(5, 40, 1, "view"), ev(6, 50, 1, "view"),
      ev(10, 0, 2, "view"), ev(11, 1, 2, "view"), ev(12, 51, 2, "view"),
      ev(13, 53, 2, "view"), ev(14, 93, 2, "view"), ev(15, 100, 2, "view"))
    val in = MemoryStream[Event]
    in.addData(events.take(7))
    val q = Streams.cadenceStats(in.toDS())
      .writeStream.format("memory").queryName("cadence_replay")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      in.addData(events.drop(7))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cadence_replay").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
      .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet
    // Batch formulation: same integer-second gaps (trunc == floor for
    // the non-negative deltas of a sorted stream), same moment sums,
    // same double formula text — bit-identical IEEE arithmetic.
    val batch = events.toDF()
      .select(col("user_id"),
        expr("(unix_micros(ts) - lag(unix_micros(ts), 1) OVER " +
          "(PARTITION BY user_id ORDER BY ts, event_id)) div 1000000").as("g"))
      .filter(col("g").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("g").as("sg"),
        sum(col("g") * col("g")).as("sq"))
      .select(col("user_id"), col("n"),
        (col("sg").cast("double") / col("n")).as("mean"),
        sqrt(greatest(col("sq").cast("double") / col("n")
          - (col("sg").cast("double") / col("n"))
            * (col("sg").cast("double") / col("n")), lit(0.0)))
          ./(col("sg").cast("double") / col("n")).as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(1) >= 5 && r.getDouble(2) > 0 && r.getDouble(3) <= 0.5))
      .toSet
    assert(streamed === batch,
      s"streaming final state diverged from the batch statistic:\n$streamed\nvs\n$batch")
  }

  test("rollingActives replay equals the batch sliding-window distinct count") {
    // r5 verdict #8, second surface: replayed streaming rolling
    // actives must equal the batch window() formulation over the same
    // events — same 7d/1d sliding windows, same exact distinct.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(
      ev(1, 0, 1, "view"), ev(2, 1440, 1, "click"), ev(3, 1500, 2, "view"),
      ev(4, 2900, 3, "view"), ev(5, 2950, 1, "view"))
    val in = MemoryStream[Event]
    in.addData(events.take(3))
    val q = Streams.rollingActives(in.toDF())
      .writeStream.format("memory").queryName("rolling_replay")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      in.addData(events.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("rolling_replay").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSet
    val batch = events.toDF()
      .select(window(col("ts"), "7 days", "1 day").as("w"), col("user_id"))
      .select(col("w.end").as("window_end"), col("user_id")).distinct()
      .groupBy("window_end").agg(count(lit(1)).as("active_7d"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSet
    assert(streamed === batch,
      s"streaming rolling actives diverged from the batch windows:\n$streamed\nvs\n$batch")
  }

  test("funnel keeps sub-millisecond precision (µs, not ms-truncated)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    // view and click land in the SAME millisecond, click 500 µs later —
    // ms-truncated ordering would see click == view and reject the
    // strict view<click chain.
    val view = ts(0)
    val click = ts(0); click.setNanos(500000)
    in.addData(Event(1, view, 9, "view", 1.0),
      Event(2, click, 9, "click", 1.0),
      Event(3, ts(1), 9, "purchase", 1.0))
    val q = Streams.funnelHits(in.toDS())
      .writeStream.format("memory").queryName("funnel_us")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("funnel_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((9L, Base * 1000L, Base * 1000L + 500L)))
  }
}
