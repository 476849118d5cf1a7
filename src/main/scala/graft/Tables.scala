package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated testdata surface
  * (see FIXTURES.md). All graded queries read through here so that a
  * future move to a real catalog / bucketed layout is one-file.
  *
  * Scale note: `spark.read.parquet` uses the vectorized parquet
  * reader with predicate pushdown + column pruning; at 100 TB the same
  * call works against a partitioned directory tree — nothing here
  * assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations, so the loader
    * branches on the dtype it actually gets instead of assuming one:
    *
    *  - NANOS: Spark 4's vectorized reader rejects ns outright
    *    ([PARQUET_TYPE_ILLEGAL]), so `nanosAsLong` loads raw ns longs
    *    and integer `div 1000` truncates to µs — ns longs (~1.7e18)
    *    exceed 2^53, so double division would corrupt low digits.
    *    DuckDB's `epoch_us` on TIMESTAMP_NS truncates identically.
    *  - MICROS (isAdjustedToUTC=false): loads as TIMESTAMP_NTZ; cast to
    *    session-local TimestampType. The session timezone is UTC
    *    (SparkEntry/Bench/Verify all pin it), so the cast is a value
    *    identity and `unix_micros`/`window()`/`date_format` agree with
    *    DuckDB's TIMESTAMP semantics.
    *  - MICROS (adjusted): already TimestampType; pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TIMESTAMP cast below is a value identity only under UTC;
    // pin it here so every entry point (driver, Bench, Verify, tests)
    // gets oracle-parity semantics regardless of host timezone.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = s.read.parquet(s"$d/events.parquet")
    val ts = raw.schema("ts").dataType match {
      case LongType          => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType  => col("ts").cast(TimestampType)
      case TimestampType     => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other — expected ns-as-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
