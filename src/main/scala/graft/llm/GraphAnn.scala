package graft.llm

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest-neighbor search — the third
  * production ANN family next to the IVF (q37) and PQ (q82/q178) tiers:
  * a navigable kNN graph (the NSW/Vamana shape behind HNSW and DiskANN,
  * Malkov & Yashunin 2018; Subramanya et al. 2019) built ONCE as a
  * stored table, served by bounded beam search.
  *
  * Spark-first re-expression: the serving structure is a plain
  * (src, dst, cos) adjacency TABLE, and one beam-search hop is one
  * equi-join of the (tiny, broadcast) frontier against it — no pointer
  * chasing, no driver-side traversal. A fixed hop budget H and beam
  * width B make the whole search a statically-unrolled DAG of H
  * (join → dedup → score → window-rank) stages, so the per-batch serve
  * cost is H corpus-column scans and B·degree·probes scored rows —
  * NOT a corpus-wide vector scan like the flat tiers.
  *
  * Graph construction is the standard two-layer recipe:
  *  - in-cell kNN edges: each node's [[Degree]] nearest neighbors
  *    inside its dynamic-k Lloyd block (the q147 kNN-join machinery —
  *    candidate volume ~N·targetBlock, row-linear);
  *  - bridge edges: each node's single nearest node in its SECOND-
  *    nearest cell (by int64 quantized centroid distance — the Lloyd
  *    assignment kernel), which restores cross-cell navigability that
  *    pure in-cell kNN graphs lack (they are disjoint cliques);
  *  - symmetrization: the union with every edge reversed, distinct —
  *    undirected navigability, degree ≤ 2·(Degree+1).
  *
  * Entry points are the per-cell medoids (min quantized distance to
  * own centroid) of the [[Entries]] largest cells — deterministic, and
  * spread across the densest regions.
  *
  * 100 TB shape: the build is the q147 kNN join plus one extra
  * N·targetBlock bridge join — row-linear candidate volume, document
  * bodies never move, only (id, id, double) edges shuffle. The serve
  * leg never shuffles the corpus: per hop, the frontier
  * (probes × [[Beam]] rows) broadcasts against the adjacency table and
  * the candidate list broadcasts against the embedding table — two
  * broadcast-hash joins whose big sides stream. Raw-vector reads per
  * probe are bounded by B·degree·H, constant in N at fixed parameters
  * — the property that makes graph ANN the serving standard.
  */
object GraphAnn {

  /** In-cell kNN out-degree of the graph build. */
  val Degree: Int = 4

  /** Beam width of the search — candidates kept per probe per hop. */
  val Beam: Int = 16

  /** Hop budget — the number of frontier expansions. The search DAG is
    * statically unrolled H times (and the oracle's CTE chain with it),
    * so H is a structural constant, not a tuning knob. */
  val Hops: Int = 3

  /** Number of entry cells (largest first) whose medoids seed beams. */
  val Entries: Int = 4

  private def dot = VectorFunctions.floatDot _

  /** The three build frames: the blocked corpus `v(vec_id, embedding,
    * nrm, cluster)`, the symmetrized adjacency `edges(src, dst, cos)`,
    * and the [[Entries]]-row entry-node frame `entries(node)`. */
  private[llm] def graphFrames(embeddings: DataFrame,
                               targetBlock: Int = 128, iters: Int = 2,
                               dim: Int = 64)
      : (DataFrame, DataFrame, DataFrame) = {
    val (v, centsRaw) =
      Similarity.dynamicKBlockedWithCents(embeddings, targetBlock, iters, dim)
    // consumed by the bridge rank AND the entry medoids — materialize
    // the tiny (k, dim) frame once (the dynamicKBlocked discipline)
    val cents = centsRaw.localCheckpoint()
    val q = Similarity.quantized(embeddings, 1000)

    // per-node distance to EVERY updated centroid (the Lloyd assignment
    // shape): bridge cell = rank 2, medoid rank uses the own-cell row
    val ranked = q.crossJoin(broadcast(cents))
      .withColumn("dist", VectorFunctions.longSqDist(col("qe"), col("ce")))
      .select(col("vec_id"), col("cluster"), col("dist"))
    val wb = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist"), col("cluster"))
    val bcell = ranked.withColumn("rn", row_number().over(wb))
      .filter(col("rn") === 2)
      .select(col("vec_id"), col("cluster").as("bcell"))

    // cosine between the `a`/`b` sides of the self-joins below
    def pairCos: org.apache.spark.sql.Column =
      round(dot(col("a.embedding"), col("b.embedding")) /
        (col("a.nrm") * col("b.nrm")), 4)

    // layer 1: in-cell kNN (the q147 join at k = Degree)
    val wk = Window.partitionBy(col("a.vec_id"))
      .orderBy(col("cos").desc, col("b.vec_id"))
    val knn = v.as("a").join(v.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("cos", pairCos)
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= Degree)
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"), col("cos"))

    // layer 2: one bridge edge into the second-nearest cell
    val bridge = v.as("a").join(bcell, col("a.vec_id") === bcell("vec_id"))
      .join(v.as("b"),
        col("b.cluster") === col("bcell") &&
          col("b.vec_id") =!= col("a.vec_id"))
      .withColumn("cos", pairCos)
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") === 1)
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"), col("cos"))

    val dir = knn.unionAll(bridge)
    val edges = dir.unionAll(
        dir.select(col("dst").as("src"), col("src").as("dst"), col("cos")))
      .distinct()

    // entry medoids of the Entries largest cells: TakeOrderedAndProject
    // for the cell pick (never a global single-partition window)
    val topc = v.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("cluster"))
      .limit(Entries)
      .select(col("cluster"))
    val own = ranked.join(v.select(col("vec_id"), col("cluster")),
      Seq("vec_id", "cluster"))
    val we = Window.partitionBy(col("cluster"))
      .orderBy(col("dist"), col("vec_id"))
    val entries = own.join(broadcast(topc), "cluster")
      .withColumn("rn", row_number().over(we))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("node"))

    (v, edges, entries)
  }

  /** q201: the stored navigable-graph build, emitted as the adjacency
    * table itself — (src, dst, cos), symmetrized and deduplicated. The
    * oracle rebuilds it through the shared dynamic-k Lloyd CTE, so a
    * green hash pins BOTH edge layers and the symmetrization. */
  def knnGraph(embeddings: DataFrame): DataFrame = {
    val (_, edges, _) = graphFrames(embeddings)
    edges.orderBy(col("src"), col("dst"))
  }

  /** Scores a (probe_id, node) candidate frame: the candidate list is
    * the broadcast side twice — against the corpus for the node vector
    * and against the probe frame for the query vector — so the corpus
    * only ever STREAMS. House cosine discipline: round(4) before any
    * ranking, ties on ascending node id. */
  private def scored(cand: DataFrame, base: DataFrame,
                     probes: DataFrame): DataFrame =
    base.join(broadcast(cand), base("vec_id") === cand("node"))
      .join(broadcast(probes), "probe_id")
      .withColumn("cos",
        round(dot(col("pe"), col("embedding")) / (col("pn") * col("nrm")), 4))
      .select(col("probe_id"), col("node"), col("cos"))

  /** Beam search over a prebuilt graph: [[Hops]] statically-unrolled
    * frontier expansions from the entry medoids, beam [[Beam]] per
    * probe, final top-k from the last beam. Every hop's beam is a tiny
    * (probes·B) frame — localCheckpoint'd so the unrolled DAG stays
    * flat for Catalyst (the dynamicKBlocked lineage lesson) and each
    * hop's joins replan against materialized sizes. */
  private[llm] def beamFrom(probes: DataFrame, base: DataFrame,
                            edges: DataFrame, entries: DataFrame,
                            k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("node"))
    def rank(s: DataFrame, lim: Int): DataFrame =
      s.withColumn("rn", row_number().over(w)).filter(col("rn") <= lim)

    val c0 = probes.select(col("probe_id")).crossJoin(broadcast(entries))
      .filter(col("node") =!= col("probe_id"))
    var beam = rank(scored(c0, base, probes), Beam)
      .select(col("probe_id"), col("node")).localCheckpoint()
    for (_ <- 1 to Hops) {
      val expand = edges.join(broadcast(beam), col("src") === col("node"))
        .select(col("probe_id"), col("dst").as("node"))
      val cand = beam.unionAll(expand)
        .filter(col("node") =!= col("probe_id"))
        .distinct()
      beam = rank(scored(cand, base, probes), Beam)
        .select(col("probe_id"), col("node")).localCheckpoint()
    }
    rank(scored(beam, base, probes), k)
      .select(col("probe_id"), col("node").as("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** q202: build + search in one self-contained query — the registered
    * probe set (vec_id < nProbes) beam-searched through the fresh
    * graph. The oracle replays the whole chain: blocking, both edge
    * layers, symmetrization, entry medoids, and all [[Hops]] unrolled
    * expansions with identical rounding and tie rules. */
  def beamTopK(embeddings: DataFrame, nProbes: Int = 10,
               k: Int = 5): DataFrame = {
    val (v, edgesRaw, entriesRaw) = graphFrames(embeddings)
    val edges = edgesRaw.localCheckpoint()
    val entries = entriesRaw.localCheckpoint()
    val base = v.select(col("vec_id"), col("embedding"), col("nrm"))
    beamFrom(Similarity.probesFrame(embeddings, nProbes), base,
      edges, entries, k)
  }

  /** Writes the two serving tables — `edges(src, dst, cos)` and
    * `entries(node)` — under `root`. The build (Lloyd blocking + two
    * kNN layers) runs here, once per corpus; the serve leg reads the
    * adjacency back and pays only the H broadcast-join hops. */
  private[llm] def writeGraphIndex(embeddings: DataFrame,
                                   root: String): Unit =
    Similarity.sweepAfter(embeddings.sparkSession) {
      val (_, edges, entries) = graphFrames(embeddings)
      edges.write.mode("overwrite").parquet(s"$root/edges")
      entries.write.mode("overwrite").parquet(s"$root/entries")
    }

  /** q203: the q202 search SERVED from the stored graph (oracle: q202's
    * VERBATIM — store ≡ recompute). First call per corpus builds under
    * the shared [[graft.FsUtil.ServedRoots]] cache; afterwards the
    * query-time work is what a production graph-ANN tier pays: H
    * frontier joins against the stored adjacency plus B·degree·H
    * vector reads per probe — constant in N. */
  def beamTopKServed(embeddings: DataFrame, corpusTag: String,
                     nProbes: Int = 10, k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    val root = graft.FsUtil.ServedRoots.getOrBuild(
      Similarity.corpusKey(embeddings, "vec_id", s"gann:$corpusTag",
        Similarity.embSig),
      "graft_gann_served_")(writeGraphIndex(embeddings, _))
    serveRoot(root, Similarity.probesFrame(embeddings, nProbes),
      embeddings, k)
  }

  private[llm] def serveRoot(root: String, probes: DataFrame,
                             embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val base = embeddings.select(col("vec_id"), col("embedding"),
      Similarity.l2norm(col("embedding")).as("nrm"))
    beamFrom(probes, base,
      spark.read.parquet(s"$root/edges"),
      spark.read.parquet(s"$root/entries"), k)
  }

  /** The q203 serve leg under Structured Streaming (foreachBatch):
    * probe vectors arrive as micro-batches and run the identical beam
    * search against the STORED graph — stream ≡ batch proved in
    * StreamingSpec against [[beamTopKServed]]'s rows. The root resolves
    * once per stream tag (the ivfPqStreamBatch discipline: corpusKey's
    * corpus aggregate must not run on the per-batch hot path). */
  def graphSearchStreamBatch(embeddings: DataFrame, corpusTag: String,
                             outDir: String, k: Int = 5)(
      batch: DataFrame, batchId: Long): Unit = {
    val probes = batch.select(col("vec_id").as("probe_id"),
      col("embedding").as("pe"),
      Similarity.l2norm(col("embedding")).as("pn"))
    val root = Similarity.streamRootFor(s"gann:$corpusTag") {
      graft.FsUtil.ServedRoots.getOrBuild(
        Similarity.corpusKey(embeddings, "vec_id", s"gann:$corpusTag",
          Similarity.embSig),
        "graft_gann_served_")(writeGraphIndex(embeddings, _))
    }
    serveRoot(root, probes, embeddings, k)
      .write.mode("append").parquet(outDir)
    ()
  }

  // ---------------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------------

  /** CTE suffix shared by both oracles: updated centroids `c2` over the
    * blocked corpus `v` (from [[Similarity.dynamicKBlockedCteSql]]),
    * per-node centroid distances, bridge cells, both edge layers, and
    * the symmetrized `edges`. */
  private def edgesCteSql: String =
    s"""${Similarity.lloydRecomputeCte("a2", "c2")},
      |bp AS (SELECT q.vec_id, c2.cluster,
      |    CAST(list_sum(list_transform(range(64), i ->
      |      (q.qe[i + 1] - c2.ce[i + 1]) * (q.qe[i + 1] - c2.ce[i + 1]))) AS BIGINT) AS dist
      |  FROM q CROSS JOIN c2),
      |br AS (SELECT vec_id, cluster AS bcell FROM
      |    (SELECT *, row_number() OVER (PARTITION BY vec_id
      |       ORDER BY dist, cluster) rn FROM bp) WHERE rn = 2),
      |knnc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
      |    round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      z -> z[1]::DOUBLE * z[2]::DOUBLE)) / (a.nrm * b.nrm), 4) AS cos
      |  FROM v a JOIN v b ON a.cluster = b.cluster AND a.vec_id != b.vec_id),
      |knn AS (SELECT src, dst, cos FROM
      |    (SELECT *, row_number() OVER (PARTITION BY src
      |       ORDER BY cos DESC, dst) rn FROM knnc) WHERE rn <= $Degree),
      |bwc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
      |    round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      z -> z[1]::DOUBLE * z[2]::DOUBLE)) / (a.nrm * b.nrm), 4) AS cos
      |  FROM v a JOIN br ON br.vec_id = a.vec_id
      |            JOIN v b ON b.cluster = br.bcell AND b.vec_id != a.vec_id),
      |bw AS (SELECT src, dst, cos FROM
      |    (SELECT *, row_number() OVER (PARTITION BY src
      |       ORDER BY cos DESC, dst) rn FROM bwc) WHERE rn = 1),
      |dir AS (SELECT * FROM knn UNION ALL SELECT * FROM bw),
      |edges AS (SELECT DISTINCT src, dst, cos FROM
      |    (SELECT src, dst, cos FROM dir
      |     UNION ALL SELECT dst, src, cos FROM dir))""".stripMargin

  val knnGraphSql: String =
    s"""${Similarity.dynamicKBlockedCteSql},
      |$edgesCteSql
      |SELECT src, dst, cos FROM edges ORDER BY src, dst""".stripMargin

  /** One unrolled hop: expand `prev` through `edges`, dedup, rescore
    * every candidate (identical re-rounding — carried beam nodes score
    * to the same value), keep the beam. */
  private def hopCte(prev: String, name: String): String =
    s"""${name}c AS (SELECT DISTINCT probe_id, node FROM
      |    (SELECT probe_id, node FROM $prev
      |     UNION ALL
      |     SELECT b.probe_id, e.dst AS node
      |     FROM $prev b JOIN edges e ON e.src = b.node)
      |  WHERE node != probe_id),
      |${name}s AS (SELECT c.probe_id, c.node,
      |    round(list_sum(list_transform(list_zip(p.pe, n.embedding),
      |      z -> z[1]::DOUBLE * z[2]::DOUBLE)) / (p.pn * n.nrm), 4) AS cos
      |  FROM ${name}c c JOIN probes p USING (probe_id)
      |                  JOIN v n ON n.vec_id = c.node),
      |$name AS (SELECT probe_id, node, cos FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY cos DESC, node) rn FROM ${name}s) WHERE rn <= $Beam)""".stripMargin

  val beamTopKSql: String = {
    val hops = (1 to Hops).map(i => hopCte(s"b${i - 1}", s"b$i"))
      .mkString(",\n")
    s"""${Similarity.dynamicKBlockedCteSql},
      |$edgesCteSql,
      |topc AS (SELECT cluster FROM
      |    (SELECT cluster, count(*) AS n FROM v GROUP BY cluster
      |     ORDER BY n DESC, cluster LIMIT $Entries)),
      |nd AS (SELECT bp.vec_id, bp.cluster, bp.dist
      |       FROM bp JOIN v ON v.vec_id = bp.vec_id AND v.cluster = bp.cluster
      |               JOIN topc ON topc.cluster = bp.cluster),
      |ent AS (SELECT vec_id AS node FROM
      |    (SELECT vec_id, row_number() OVER (PARTITION BY cluster
      |       ORDER BY dist, vec_id) rn FROM nd) WHERE rn = 1),
      |probes AS (SELECT vec_id AS probe_id, embedding AS pe, nrm AS pn
      |           FROM v WHERE vec_id < 10),
      |b0c AS (SELECT probe_id, node FROM probes CROSS JOIN ent
      |        WHERE node != probe_id),
      |b0s AS (SELECT c.probe_id, c.node,
      |    round(list_sum(list_transform(list_zip(p.pe, n.embedding),
      |      z -> z[1]::DOUBLE * z[2]::DOUBLE)) / (p.pn * n.nrm), 4) AS cos
      |  FROM b0c c JOIN probes p USING (probe_id)
      |             JOIN v n ON n.vec_id = c.node),
      |b0 AS (SELECT probe_id, node, cos FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY cos DESC, node) rn FROM b0s) WHERE rn <= $Beam),
      |$hops
      |SELECT probe_id, node AS neighbor_id, cos, CAST(rn AS BIGINT) AS rnk
      |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
      |        ORDER BY cos DESC, node) rn FROM b$Hops)
      |WHERE rn <= 5 ORDER BY probe_id, rnk""".stripMargin
  }
}
