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

  /** Conf flag for the opt-in bucketed read path (see below). */
  val BucketedConf = "spark.graft.bucketedLayout"

  /** Hot-key bucketing layout for the big tables: hash-cluster each on
    * the key its repeated joins/windows cluster by, so those exchanges
    * vanish once the layout is materialized. Dimension tables
    * (region/nation/supplier/part) stay loose — they broadcast.
    */
  val bucketKeys: Map[String, String] = Map(
    "orders"     -> "o_orderkey",
    "lineitem"   -> "l_orderkey",
    "customer"   -> "c_custkey",
    "events"     -> "user_id",
    "documents"  -> "doc_id",
    "embeddings" -> "vec_id")

  /** One catalog table per (source dir, table): the dir fingerprint in
    * the name stops a bucketed sf0.001 layout from answering an sf0.1
    * read. */
  private[graft] def bucketedName(dir: String, name: String): String =
    s"graft_b_${java.lang.Integer.toHexString(dir.hashCode & 0x7fffffff)}_$name"

  /** Materialize the bucketed layout for `dir` into the session
    * catalog (one-time cost ≈ one shuffle per table — the pre-shuffle
    * that pays for itself the second time a 100 TB fact table is
    * joined on the same key). Reads go through the loose path here, so
    * events ts-normalization happens exactly once, at write time.
    */
  def materializeBucketed(s: SparkSession, dir: String,
      buckets: Int = 32): Unit =
    bucketKeys.foreach { case (n, k) =>
      graft.sources.Sources.writeBucketed(
        loose(s, dir, n), bucketedName(dir, n), k, buckets)
    }

  /** Drop the bucketed layout for `dir` (test hygiene / relayout). */
  def dropBucketed(s: SparkSession, dir: String): Unit =
    bucketKeys.keys.foreach { n =>
      s.sql(s"DROP TABLE IF EXISTS ${bucketedName(dir, n)}")
    }

  /** THE graded read path. Default: loose parquet (self-describing,
    * zero setup). When `spark.graft.bucketedLayout=true` AND the
    * bucketed catalog table for this (dir, name) exists, reads resolve
    * to it instead — every `SparkEntry.queries` entry then runs
    * UNCHANGED over the co-located layout and its bucket-key
    * joins/aggs/windows plan without an Exchange
    * (`BucketedLayoutSpec` locks result-identity and the no-shuffle
    * plan shape). Bucketed events were normalized at write time, so
    * the catalog branch skips the ts adapter by construction.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val bucketed =
      spark.conf.getOption(BucketedConf).contains("true") &&
        bucketKeys.contains(name) &&
        spark.catalog.tableExists(bucketedName(dir, name))
    if (bucketed) spark.table(bucketedName(dir, name))
    else loose(spark, dir, name)
  }

  private def loose(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") eventsLoose(spark, dir)
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
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")

  private def eventsLoose(s: SparkSession, d: String): DataFrame = {
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
