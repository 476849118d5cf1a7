package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting must be invisible to results and visible to the shuffle:
  * identical rows out, hot key spread across salt groups.
  */
class SkewSpec extends SparkSpec {

  private lazy val (skewed, dim) = {
    import spark.implicits._
    // 50k rows, ~90% on hot key 7
    val sk = (1 to 50000).map(i =>
      (if (i % 10 == 0) (i % 100).toLong else 7L, i.toLong)).toDF("k", "v")
    val d = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "name")
    (sk, d)
  }

  test("salted join is row-identical to the plain join") {
    val plain = skewed.join(dim, "k")
    val salted = Skew.saltedJoin(skewed, dim, "k", 8)
    assert(salted.count() === plain.count())
    val ps = plain.agg(sum("v"), count(lit(1))).collect().head
    val ss = salted.agg(sum("v"), count(lit(1))).collect().head
    assert(ps === ss)
    assert(salted.columns.toSet === plain.columns.toSet)
  }

  test("the hot key spreads across most salt values") {
    val spread = skewed
      .withColumn("s", Skew.rowSalt(skewed, 8))
      .filter(col("k") === 7).select("s").distinct().count()
    assert(spread >= 6, s"hot key landed in only $spread of 8 salt groups")
  }

  test("salt is deterministic across partition layouts") {
    // The row-content hash must distribute identically however the
    // input happens to be split (the old monotonically_increasing_id
    // salt did not — re-runs of the same data salted differently).
    def saltCounts(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("s", Skew.rowSalt(df, 8))
        .groupBy("k", "s").count().orderBy("k", "s").collect().toSeq
    assert(saltCounts(skewed.repartition(3)) === saltCounts(skewed.repartition(17)))
  }

  test("two-phase salted aggregation matches the direct aggregate") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum"))
      .orderBy("k").collect()
    val salted = Skew.saltedCountSum(skewed, "k", "v", 8)
      .orderBy("k").collect()
    assert(direct.toSeq === salted.toSeq)
  }
}
