package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Suite-wide physical-plan audit: builds EVERY registered query's
  * executed plan against sf0.001 and asserts the one anti-pattern that
  * is never acceptable at 100 TB — a CartesianProduct (an unkeyed
  * both-sides-materialized join). Intentional small-side cross joins
  * compile to BroadcastNestedLoopJoin with a broadcast 1-row/k-row
  * build and are fine; CartesianProductExec means both sides shuffle
  * to every task — corpus² work no matter the data.
  *
  * Building the plan also smoke-tests that every query constructs
  * against the fixtures (iterative operators run their driver loops
  * during construction), so a registration typo fails here before the
  * driver's harness sees it. */
class PlanAuditSpec extends SparkSpec {

  test("no registered query plans a CartesianProduct") {
    val offenders =
      try SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
      } finally {
        // same leak sweep as Bench/Verify: constructing the iterative
        // operators persists/checkpoints loop frames the shared
        // test-JVM session would otherwise carry into every later suite
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
