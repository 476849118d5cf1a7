package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-paired operator family. `SparkEntry` concatenates
  * all modules; the driver grades each `queries` entry against its
  * `oracles` twin run in DuckDB on the same parquet inputs.
  *
  * Determinism contract (every graded query):
  *   - ends in a total-order sort (unique key in the sort), so the
  *     row-order-sensitive hash compare is stable;
  *   - double-valued aggregates rounded to 4 digits (float summation
  *     order differs between engines);
  *   - computed integer columns cast to Long (DuckDB scalar fns
  *     return BIGINT; Spark's year()/length() return Int);
  *   - no raw timestamp output columns — format to string or cast to
  *     date (Spark writes UTC-adjusted µs timestamps, DuckDB emits
  *     naive ones; strings/dates compare identically).
  */
trait OpModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]

  /** Money column → exact 2-dp decimal. Prices/discounts/taxes in the
    * testdata are true 2-dp decimals stored as double; casting to
    * DECIMAL(12,2) recovers the exact value identically in Spark and
    * DuckDB, so downstream products/sums are exact and engine-portable
    * (double summation order differs between engines and flips
    * round-at-4 ties; decimal sums cannot).
    */
  protected def Dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(12,2)")
}
