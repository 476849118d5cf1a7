package graft

/** Generic 100 TB-shape sweep over EVERY graded query (r11, r10
  * verdict #9): PlansSpec locks ~75 flagship shapes in detail; this
  * suite closes the remaining gap with the two invariants that hold
  * for ALL 306 graded queries, so a planner regression ANYWHERE fails
  * `sbt test` instead of a future bench:
  *
  *  1. No query may plan a shuffled CartesianProduct. (Gated
  *     cross-pair universes are fine — they plan as
  *     BroadcastNestedLoopJoin over a broadcast gated side, which is
  *     exactly the shape that scales; a CartesianProduct means BOTH
  *     sides shuffle everywhere.)
  *  2. Every window function must be partitioned, except the
  *     explicitly whitelisted queries whose global windows ride
  *     provably bounded frames (dimension-sized or gate-bounded —
  *     each listed with its bound below). A new unpartitioned window
  *     anywhere else is the classic single-partition scale killer.
  *
  * Plans are inspected WITHOUT executing (queryExecution.executedPlan
  * before any action): cartesians and window specs are structural,
  * not AQE-dependent. scopedPersist queries eagerly materialize at
  * construction and return a checkpoint scan — their inner shapes are
  * locked on factored bodies in PlansSpec; here they simply pass
  * (their terminal plan has no window/cartesian), and their
  * construction doubles as a smoke run.
  */
class PlanSweepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose global (unpartitioned) windows ride bounded frames
    * — the bound is the invariant; anything NOT listed here must
    * partition every window. */
  private val boundedGlobalWindows: Map[String, String] = Map(
    "etl_backfill_plan" -> "|missing days| rows (gap spine)",
    "etl_ttl_purge_plan" -> "|distinct days| rows (age ledger)",
    "text_zipf" -> "top-50 vocabulary frame",
    "mix_curriculum_order" -> "|sources| rank frame",
    "win_mom_growth" -> "monthly grain — ~|months| rows",
    "evt_abtest_hl" -> "gated <=2,500-pair HL median (user_id < 100)",
    "agg_gini" -> "two-phase bucket offsets — |buckets| frame, never |customers|",
    "agg_ks_test" -> "two-phase bucket offsets — |buckets| frame")

  /** Window specs whose argument list starts with a sort column (no
    * partition columns before the ordering) — the single-partition
    * shape. The first TOP-LEVEL argument is extracted paren-depth-
    * aware (r11 advice: a naive split on ',' truncates an ordering
    * expression that itself contains commas — e.g. pmod(x, 2) ASC →
    * head "pmod(x" with no " ASC" — and the single-partition shape
    * the sweep exists to catch escapes detection). */
  private def unpartitionedSpecs(plan: String): Seq[String] =
    plan.split("windowspecdefinition\\(").drop(1).toSeq
      .map(_.takeWhile(_ != '\n'))
      .filter { spec =>
        val head = new StringBuilder
        var depth = 0
        var done = false
        spec.foreach { c =>
          if (!done) c match {
            case '(' => depth += 1; head.append(c)
            case ')' =>
              if (depth == 0) done = true // the spec's own closing paren
              else { depth -= 1; head.append(c) }
            case ',' if depth == 0 => done = true
            case _ => head.append(c)
          }
        }
        val h = head.toString
        h.contains(" ASC") || h.contains(" DESC")
      }

  /** Every graded query's physical plan string, computed ONCE —
    * scopedPersist queries execute at construction, so per-test
    * recomputation would triple the suite's wall-clock. */
  private lazy val plans: Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.executedPlan.toString
    }

  test("spec parser catches comma-bearing unpartitioned orderings") {
    // The r11-advice escape case: ordered by an expression containing
    // a comma, no partition columns — must be detected; the same
    // expression BEHIND a partition column must pass.
    val bad = "Window [windowspecdefinition(pmod(x#1, 2) ASC NULLS FIRST, " +
      "specifiedwindowframe(RangeFrame, unboundedpreceding$(), currentrow$()))]"
    assert(unpartitionedSpecs(bad).nonEmpty,
      "comma-bearing unpartitioned ordering escaped detection")
    val ok = "Window [windowspecdefinition(grp#2, pmod(x#1, 2) ASC NULLS " +
      "FIRST, specifiedwindowframe(RangeFrame, unboundedpreceding$(), " +
      "currentrow$()))]"
    assert(unpartitionedSpecs(ok).isEmpty,
      "partitioned window falsely flagged")
  }

  test("no graded query plans a shuffled CartesianProduct") {
    val offenders =
      plans.collect { case (n, p) if p.contains("CartesianProduct") => n }
    assert(offenders.isEmpty,
      s"queries planning shuffled cartesians: ${offenders.mkString(", ")}")
  }

  test("every window is partitioned unless its global frame is provably bounded") {
    val offenders = plans.flatMap { case (name, plan) =>
      if (boundedGlobalWindows.contains(name)) None
      else {
        val bad = unpartitionedSpecs(plan)
        if (bad.nonEmpty) Some(s"$name: ${bad.head.take(120)}") else None
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned windows outside the bounded whitelist:\n" +
        offenders.mkString("\n"))
  }

  test("whitelisted global windows still exist where declared") {
    // The whitelist must not rot: if a listed query no longer plans
    // any global window (e.g. it was reshaped), the entry should be
    // removed so the sweep stays tight.
    val planMap = plans.toMap
    val stale = boundedGlobalWindows.keys.toSeq.sorted.filter { name =>
      planMap.get(name).forall(p => unpartitionedSpecs(p).isEmpty)
    }
    assert(stale.isEmpty,
      s"whitelist entries with no global window (remove them): ${stale.mkString(", ")}")
  }
}
