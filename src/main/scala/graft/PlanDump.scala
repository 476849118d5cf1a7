package graft

import org.apache.spark.sql.SparkSession

/** Plan-evidence dumper (r16 optimization round, guide §1.2/§7.2):
  * writes `explain("formatted")` for the named queries to
  * `<outDir>/<query>_<suffix>.txt`, so before/after plan claims in
  * OPTIMIZATION_r16.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  *
  * Notes: SessionMemo is cleared before EACH dump so every plan is
  * the cold-session shape (memoized sub-chains appear as checkpoint
  * RDD-scan leaves only where a query's own body memoizes them —
  * that collapse IS the optimization being documented). Queries whose
  * terminal is a scopedPersist checkpoint show an RDD scan at the
  * top; the formatted plan of the un-checkpointed body is appended
  * for the bodies factored out for PlansSpec where that matters.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      graft.operators.SessionMemo.clear()
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val txt = try {
        graft.operators.OpModule.planOnly.set(true)
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"ERROR: ${e.getClass.getName}: ${e.getMessage}" }
      finally graft.operators.OpModule.planOnly.set(false)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] $name -> ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
