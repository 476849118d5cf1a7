package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for hot join/aggregation keys.
  *
  * AQE's skew-join splitting re-plans oversized sort-merge partitions
  * at runtime and should be the first line of defense; explicit
  * salting is for what AQE cannot re-plan — a single hot key whose
  * rows must land in one shuffle block (hash aggregation state, map
  *_groups pipelines) or a build side cheap enough to replicate.
  * Salting trades `salts`× replication of the small side for a
  * `salts`-way spread of the hot key's rows across reducers.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Per-row salt from a hash of ALL the row's columns plus a fixed
    * seed — deterministic across re-runs and partition layouts (a
    * `monotonically_increasing_id`-based salt distributes the same
    * data differently depending on how the input was split). Exact
    * duplicate rows share a salt; for a hot key whose rows carry any
    * varying column this still spreads `salts` ways.
    */
  private[graft] def rowSalt(df: DataFrame, salts: Int) =
    pmod(hash(df.columns.map(col) :+ lit(0x9e3779): _*), lit(salts))

  /** Equi-join a skew-heavy probe side against a small dimension:
    * probe rows get a uniform deterministic-per-run salt, the
    * dimension is replicated across all salt values, and the join key
    * becomes (key, salt). Result is row-identical to the unsalted
    * join; the hot key's shuffle block splits `salts` ways.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = skewed.withColumn(SaltCol, rowSalt(skewed, salts))
    val replicated = dim.withColumn(SaltCol,
      explode(array((0 until salts).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase salted count/sum per key: partial aggregate on
    * (key, salt), final on key. Spark's own partial aggregation
    * already map-side-combines algebraic aggs; this shape is for
    * aggregation states partial-agg can't shrink (large collect-style
    * buffers) — demonstrated with count+sum for determinism. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame =
    df.withColumn(SaltCol, rowSalt(df, salts))
      .groupBy(col(key), col(SaltCol))
      .agg(count(lit(1)).as("__cnt"), sum(valueCol).as("__sum"))
      .groupBy(col(key))
      .agg(sum("__cnt").as("cnt"), sum("__sum").as("sum"))
}
