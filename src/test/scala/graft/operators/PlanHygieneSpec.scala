package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Global plan-hygiene sweep: EVERY registered query must analyze and
  * physical-plan at sf0.001, and none may plan a CartesianProduct —
  * Spark only emits one for a non-equi join it can neither broadcast
  * nor sort-merge, which at 100 TB is always a bug (the deliberate
  * small-side nested loops in this codebase — the 5-row threshold-bar
  * table, the 1-row scalar aggregates, the centroid chunks — all plan
  * as BroadcastNestedLoopJoin, never CartesianProduct). A per-operator
  * guard only protects the operators someone thought to guard; this
  * catches the next regression wherever it lands. */
class PlanHygieneSpec extends SparkSpec {

  test("every registered query plans without a CartesianProduct") {
    val d = "/root/testdata/sf0.001"
    val offenders = SparkEntry.all.flatMap { q =>
      val plan =
        try q.run(spark, d).queryExecution.executedPlan.toString
        catch {
          case e: Throwable => fail(s"${q.name} failed to plan at $d: $e")
        }
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian products planned by: $offenders")
    // keep the session clean for other suites — several operators cache
    spark.catalog.clearCache()
  }
}
