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

  /** Builds every registered query's executed plan, applies `check`,
    * then sweeps ONLY the persistent RDDs this walk created (snapshot
    * diff) — unpersisting a frame another suite still holds would
    * truncate its lineage beyond recompute (ADVICE r7). */
  private def auditAll(check: (String, org.apache.spark.sql.execution.SparkPlan)
      => Option[String]): Seq[String] = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        check(name, fn(spark, sf).queryExecution.executedPlan)
    } finally {
      // clearCache is safe across suites (a dropped cache entry merely
      // recomputes); the RDD sweep is NOT (unpersisting a foreign
      // localCheckpoint truncates lineage for good), hence the snapshot
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
  }

  test("no registered query plans a CartesianProduct") {
    val offenders = auditAll { (name, plan) =>
      if (plan.toString.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}
