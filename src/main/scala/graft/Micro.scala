package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe of this host's per-job scheduling floor (r13 verdict
  * #1): times N eager localCheckpoints / aggs / broadcasts of a
  * 25-row frame, warm, so the heavy-band audit can price "one more
  * lineage cut" and "one more AQE stage" in milliseconds. Not graded;
  * driver-side tooling only.
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.range(25).select(col("id").as("node"),
      (col("id") * 7 % 13).as("w"))

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) { f; i += 1 }
      println(f"[micro] $label%-40s ${(System.nanoTime() - t0) / 20 / 1e6}%8.1f ms/op")
    }

    time("count_25row_nojoin") { base.count(): Unit }
    val base1 = spark.range(0, 25, 1, 1).select(col("id").as("node"),
      (col("id") * 7 % 13).as("w"))
    time("count_25row_1part") { base1.count(): Unit }
    time("cut_25row") { base.localCheckpoint(true).count(): Unit }
    time("cut_25row_1part") { base1.localCheckpoint(true).count(): Unit }
    val ck1 = base1.localCheckpoint(true)
    time("groupby_count_on_ck1") { ck1.groupBy("node").agg(sum("w")).count(): Unit }
    val ck = base.localCheckpoint(true)
    time("groupby_count_on_ck") { ck.groupBy("node").agg(sum("w")).count(): Unit }
    time("cut_groupby_on_ck") {
      ck.groupBy("node").agg(sum("w").as("s")).localCheckpoint(true): Unit }
    time("join_bcast_on_ck") {
      ck.join(broadcast(ck.select(col("node").as("n2"), col("w").as("w2"))),
        col("node") === col("n2")).count(): Unit }
    time("agg_crossjoin_bcast") {
      ck.crossJoin(broadcast(ck.agg(sum("w").as("t")))).count(): Unit }
    // full 5-round hits-like chain on 1-PARTITION inputs: groupBy /
    // global window / merge join over SinglePartition children plan
    // ZERO exchanges — the whole iteration should be one stage.
    val e1 = spark.range(0, 625, 1, 1)
      .select((col("id") % 25).as("src"), (col("id") / 25).as("dst"),
        (col("id") % 7 + 1).cast("double").as("w"))
      .localCheckpoint(true)
    val nodes1 = spark.range(0, 25, 1, 1).select(col("id").as("node"))
      .localCheckpoint(true)
    time("hits_5round_1part_nocut") {
      val allW = org.apache.spark.sql.expressions.Window.partitionBy()
      var h = nodes1.withColumn("h", lit(1.0 / 25.0))
      var a = nodes1.withColumn("a", lit(0.0))
      for (_ <- 1 to 5) {
        val ar = e1.join(h.withColumnRenamed("node", "hn"), col("src") === col("hn"))
          .groupBy(col("dst")).agg(round(sum(col("h") * col("w")), 9).as("araw"))
        a = nodes1.join(ar, col("node") === col("dst"), "left")
          .select(col("node"), round(coalesce(col("araw"), lit(0.0))
            / sum("araw").over(allW), 9).as("a"))
        val hr = e1.join(a.withColumnRenamed("node", "an"), col("dst") === col("an"))
          .groupBy(col("src")).agg(round(sum(col("a") * col("w")), 9).as("hraw"))
        h = nodes1.join(hr, col("node") === col("src"), "left")
          .select(col("node"), round(coalesce(col("hraw"), lit(0.0))
            / sum("hraw").over(allW), 9).as("h"))
      }
      a.join(h, Seq("node")).count(): Unit
    }
    // one "hits-like round": join+groupBy+cut, twice (a and h halves)
    time("hits_round_2cuts") {
      val ar = ck.join(broadcast(ck.select(col("node").as("n2"), col("w").as("h"))),
          col("node") === col("n2"))
        .groupBy("node").agg(sum(col("w") * col("h")).as("araw"))
        .localCheckpoint(true)
      ar.crossJoin(broadcast(ar.agg(sum("araw").as("t"))))
        .select(col("node"), (col("araw") / col("t")).as("a"))
        .localCheckpoint(true): Unit }
    spark.stop()
  }
}
