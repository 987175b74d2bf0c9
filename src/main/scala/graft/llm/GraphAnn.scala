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
  * Entry points are PER-PROBE: each probe's beam seeds with the
  * medoids (min quantized distance to own centroid, per cell) of its
  * [[SeedCells]] nearest cells by centroid cosine — the DiskANN-style
  * "start near the query" rule, measured 3× better than fixed global
  * entries on the isotropic fixture (PERF.md r12).
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

  /** In-cell kNN out-degree of the graph build. r13: raised 4 → 16 —
    * the N=1e5 GraphSweep showed graph QUALITY, not search budget, was
    * the recall ceiling on the isotropic corpus (degree 4 capped at
    * 3400 bp even at beam 192; degree 16 reaches 6000 bp — PERF.md
    * r13). The build's candidate-join volume is unchanged (the in-cell
    * window just KEEPS more rows), and edges stay (long, long, double)
    * triples. */
  val Degree: Int = 16

  /** Beam width of the search — candidates kept per probe per hop.
    * r13: raised 24 → 96 to match the degree-16 graph (the measured
    * knee: 5400–6000 bp at N=1e5; per-probe vector reads stay bounded
    * by Beam·degree·Hops, constant in N). */
  val Beam: Int = 96

  /** Hop budget — the number of frontier expansions. The search DAG is
    * statically unrolled H times (and the oracle's CTE chain with it),
    * so H is a structural constant, not a tuning knob. */
  val Hops: Int = 3

  /** Per-probe entry cells: each probe's beam is seeded with the
    * MEDOIDS of its [[SeedCells]] nearest blocking cells (by centroid
    * cosine), the DiskANN-style "start near the query" rule. Measured
    * on the sf0.1 fixture (PERF.md r12): probe-seeded entries more than
    * triple the recall of fixed global entry points (1600 → 4800 bp) at
    * the same beam budget, and at ~13% visited the graph matches the
    * IVF tier's recall at its 13% scan budget while its per-probe
    * vector reads stay bounded by Beam·degree·Hops — constant in N.
    * Since r13 the rank is TWO-LEVEL (the [[Similarity.twoLevelBlocked]]
    * tree): [[SeedCoarse]] nearest coarse cells first (√k-row
    * broadcast), then the [[SeedCells]] nearest fine children — the
    * per-probe rank work and the broadcast are bounded at √k instead of
    * the former k = N/128 full-centroid scan. */
  val SeedCells: Int = 6

  /** Coarse cells probed by the seed rank — 3·√k fine children ranked
    * per probe, comfortably above [[SeedCells]] on any balanced tree. */
  val SeedCoarse: Int = 3

  /** The seed budgets SCALE with the stored tree (r13, AnnScale): at
    * N = 1e5 a FIXED 6-cell seed covers 6 of ~800 fine cells and beam
    * recall collapsed to 1000 bp — the entry points must track the cell
    * count exactly like the IVF probe budget does. Dynamic rule, both
    * engines: seed cells = max(SeedCells, ⌈0.13·|fine|⌉) (the
    * [[Similarity.IvfProbeFrac]] budget over the fine-cell count),
    * coarse cells ranked = max(SeedCoarse, ⌈0.4·|coarse|⌉). At every
    * oracle fixture the dynamic values equal the constants (|fine| ≤ 16,
    * |coarse| ≤ 4), so fixture hashes are unchanged; at N = 1e5 the
    * seed rank widens to ~104 of 797 cells and recall recovers (PERF.md
    * r13). The counts come from the stored centroid TABLES (not a
    * corpus aggregate), so the served legs derive them identically —
    * store ≡ recompute is preserved. */
  private def seedBudgets(cents: DataFrame,
                          coarse: DataFrame): DataFrame = {
    val sc = cents.agg(greatest(lit(SeedCells.toLong),
      ceil(lit(Similarity.IvfProbeFrac) * count(lit(1)).cast("double"))
        .cast("long")).as("scells"))
    val gc = coarse.agg(greatest(lit(SeedCoarse.toLong),
      ceil(lit(0.4) * count(lit(1)).cast("double"))
        .cast("long")).as("gcells"))
    sc.crossJoin(gc)
  }

  private def dot = VectorFunctions.floatDot _

  /** The build frames: the blocked corpus `v(vec_id, embedding, nrm,
    * cluster)`, the symmetrized adjacency `edges(src, dst, cos)`, the
    * per-cell entry medoids `medoids(cluster, node)`, the fine blocking
    * centroids `cents(cluster, parent, ce)` and the coarse centroids
    * `coarse(cluster, ce)` the two-level seed rank probes against. */
  private[llm] def graphFrames(embeddings: DataFrame,
                               targetBlock: Int = 128, iters: Int = 2,
                               dim: Int = 64, degree: Int = Degree)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val b = Similarity.twoLevelBlocked(embeddings, targetBlock, iters, dim)
    val v = b.v

    // per-node distance to the updated fine centroids of its CANDIDATE
    // cells (the two-level prune — never all k cells): bridge cell =
    // nearest FOREIGN candidate (ADVICE r12: a rank-2-over-all rule
    // could land in-cell when the assignment and the updated-centroid
    // rank disagree; foreign-only rank 1 cannot), medoid rank uses the
    // own-cell row. Consumed twice — checkpoint (blocked discipline).
    val cand = b.cand.localCheckpoint()
    val own = v.select(col("vec_id"), col("cluster"))
    val wb = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist"), col("cluster"))
    val bcell = cand
      .join(own.withColumnRenamed("cluster", "ocell"), "vec_id")
      .filter(col("cluster") =!= col("ocell"))
      .withColumn("rn", row_number().over(wb))
      .filter(col("rn") === 1)
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
      .filter(col("rn") <= degree)
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

    // per-cell entry medoids: min distance to own centroid, tie vec_id
    val ownd = cand.join(own, Seq("vec_id", "cluster"))
    val we = Window.partitionBy(col("cluster"))
      .orderBy(col("dist"), col("vec_id"))
    val medoids = ownd
      .withColumn("rn", row_number().over(we))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("vec_id").as("node"))

    (v, edges, medoids, b.cents, b.coarse)
  }

  /** q201: the stored navigable-graph build, emitted as the adjacency
    * table itself — (src, dst, cos), symmetrized and deduplicated. The
    * oracle rebuilds it through the shared two-level Lloyd CTE, so a
    * green hash pins BOTH edge layers and the symmetrization. */
  def knnGraph(embeddings: DataFrame): DataFrame = {
    val (_, edges, _, _, _) = graphFrames(embeddings)
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

  /** Beam search over a prebuilt graph: each probe's beam is seeded
    * with the medoids of its [[SeedCells]] nearest cells (centroid-
    * cosine rank — the IVF coarse probe, so the graph serve pays the
    * same O(probes·k) coarse cost the IVF tier already pays), then
    * [[Hops]] statically-unrolled frontier expansions at beam [[Beam]],
    * final top-k from the last beam. Every hop's beam is a tiny
    * (probes·B) frame — localCheckpoint'd so the unrolled DAG stays
    * flat for Catalyst (the dynamicKBlocked lineage lesson) and each
    * hop's joins replan against materialized sizes. */
  private[llm] def beamFrom(probes: DataFrame, base: DataFrame,
                            edges: DataFrame, medoids: DataFrame,
                            cents: DataFrame, coarse: DataFrame,
                            k: Int, beam: Int = Beam,
                            hops: Int = Hops): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("node"))
    def rank(s: DataFrame, lim: Int): DataFrame =
      s.withColumn("rn", row_number().over(w)).filter(col("rn") <= lim)

    // seed: two-level cell rank (unrounded centroid cosine, ties on
    // ascending cell id at both levels) — SeedCoarse nearest coarse
    // cells via a √k-row broadcast, then the SeedCells nearest fine
    // children via a parent equi-join; the k-row fine frame is never
    // broadcast and never fully ranked
    val budgets = broadcast(seedBudgets(cents, coarse))
    val gcells = coarse.select(col("cluster").as("ccell"),
      transform(col("ce"), x => x.cast("double")).as("gcent"))
    val wg = Window.partitionBy(col("probe_id"))
      .orderBy(col("gcos").desc, col("ccell"))
    val pg = probes.crossJoin(broadcast(gcells))
      .withColumn("gcos", dot(col("pe"), col("gcent")) /
        (col("pn") * Similarity.l2norm(col("gcent"))))
      .withColumn("grnk", row_number().over(wg))
      .crossJoin(budgets)
      .filter(col("grnk") <= col("gcells"))
      .select(col("probe_id"), col("pe"), col("pn"), col("ccell"))
    val fcells = cents.select(col("parent"), col("cluster"),
      transform(col("ce"), x => x.cast("double")).as("centroid"))
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(col("ccos").desc, col("cluster"))
    val selc = broadcast(pg).join(fcells, col("ccell") === col("parent"))
      .withColumn("ccos", dot(col("pe"), col("centroid")) /
        (col("pn") * Similarity.l2norm(col("centroid"))))
      .withColumn("crnk", row_number().over(wc))
      .crossJoin(budgets)
      .filter(col("crnk") <= col("scells"))
      .select(col("probe_id"), col("cluster"))
    val c0 = selc.join(broadcast(medoids), "cluster")
      .filter(col("node") =!= col("probe_id"))
      .select(col("probe_id"), col("node"))
    var bm = rank(scored(c0, base, probes), beam)
      .select(col("probe_id"), col("node")).localCheckpoint()
    for (_ <- 1 to hops) {
      val expand = edges.join(broadcast(bm), col("src") === col("node"))
        .select(col("probe_id"), col("dst").as("node"))
      val cand = bm.unionAll(expand)
        .filter(col("node") =!= col("probe_id"))
        .distinct()
      bm = rank(scored(cand, base, probes), beam)
        .select(col("probe_id"), col("node")).localCheckpoint()
    }
    rank(scored(bm, base, probes), k)
      .select(col("probe_id"), col("node").as("neighbor_id"), col("cos"),
        col("rn").cast("long").as("rnk"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** q202: build + search in one self-contained query — the registered
    * probe set (vec_id < nProbes) beam-searched through the fresh
    * graph. The oracle replays the whole chain: blocking, both edge
    * layers, symmetrization, per-cell medoids, per-probe seed cells,
    * and all [[Hops]] unrolled expansions with identical rounding and
    * tie rules. */
  def beamTopK(embeddings: DataFrame, nProbes: Int = 10,
               k: Int = 5): DataFrame = {
    val (v, edgesRaw, medoidsRaw, cents, coarse) = graphFrames(embeddings)
    val edges = edgesRaw.localCheckpoint()
    val medoids = medoidsRaw.localCheckpoint()
    val base = v.select(col("vec_id"), col("embedding"), col("nrm"))
    beamFrom(Similarity.probesFrame(embeddings, nProbes), base,
      edges, medoids, cents, coarse, k)
  }

  /** Writes the four serving tables — `edges(src, dst, cos)`,
    * `medoids(cluster, node)`, the fine `centroids(cluster, parent,
    * ce)` and the `coarse(cluster, ce)` seed level — under `root`. The
    * build (two-level Lloyd blocking + two kNN layers) runs here, once
    * per corpus; the serve leg reads them back and pays only the
    * two-level seed rank plus the H broadcast-join hops. */
  private[llm] def writeGraphIndex(embeddings: DataFrame,
                                   root: String): Unit =
    Similarity.sweepAfter(embeddings.sparkSession) {
      val (_, edges, medoids, cents, coarse) = graphFrames(embeddings)
      edges.write.mode("overwrite").parquet(s"$root/edges")
      medoids.write.mode("overwrite").parquet(s"$root/medoids")
      cents.write.mode("overwrite").parquet(s"$root/centroids")
      coarse.write.mode("overwrite").parquet(s"$root/coarse")
    }

  /** q203: the q202 search SERVED from the stored graph (oracle: q202's
    * VERBATIM — store ≡ recompute). First call per corpus builds under
    * the shared [[graft.FsUtil.ServedRoots]] cache; afterwards the
    * query-time work is what a production graph-ANN tier pays: H
    * frontier joins against the stored adjacency plus B·degree·H
    * vector reads per probe — constant in N. */
  def beamTopKServed(embeddings: DataFrame, corpusTag: String,
                     nProbes: Int = 10, k: Int = 5): DataFrame = {
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
      spark.read.parquet(s"$root/medoids"),
      spark.read.parquet(s"$root/centroids"),
      spark.read.parquet(s"$root/coarse"), k)
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

  /** CTE suffix shared by both oracles, over the two-level prefix
    * ([[Similarity.dynamicKBlockedCteSql]]: blocked corpus `v`, updated
    * fine centroids `fc2`, pruned candidate distances `fpd`, final
    * assignment `fa2`): foreign-candidate bridge cells, both edge
    * layers, and the symmetrized `edges`. */
  private def edgesCteSql: String =
    s"""br AS (SELECT vec_id, cluster AS bcell FROM
      |    (SELECT d.vec_id, d.cluster, row_number() OVER (PARTITION BY d.vec_id
      |       ORDER BY d.dist, d.cluster) rn
      |     FROM fpd d JOIN fa2 o ON o.vec_id = d.vec_id
      |                          AND d.cluster != o.cluster) WHERE rn = 1),
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
      |edges AS MATERIALIZED (SELECT DISTINCT src, dst, cos FROM
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
      |$name AS MATERIALIZED (SELECT probe_id, node, cos FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY cos DESC, node) rn FROM ${name}s) WHERE rn <= $Beam)""".stripMargin

  val beamTopKSql: String = {
    val hops = (1 to Hops).map(i => hopCte(s"b${i - 1}", s"b$i"))
      .mkString(",\n")
    s"""${Similarity.dynamicKBlockedCteSql},
      |$edgesCteSql,
      |nd AS (SELECT d.vec_id, d.cluster, d.dist
      |       FROM fpd d JOIN fa2 o ON o.vec_id = d.vec_id
      |                            AND o.cluster = d.cluster),
      |medo AS MATERIALIZED (SELECT cluster, vec_id AS node FROM
      |    (SELECT cluster, vec_id, row_number() OVER (PARTITION BY cluster
      |       ORDER BY dist, vec_id) rn FROM nd) WHERE rn = 1),
      |gcells AS (SELECT cluster AS ccell,
      |             list_transform(ce, x -> x::DOUBLE) AS gcent FROM gc2),
      |fcells AS (SELECT cluster // (SELECT k FROM kk) AS parent, cluster,
      |             list_transform(ce, x -> x::DOUBLE) AS centroid FROM fc2),
      |probes AS MATERIALIZED (SELECT vec_id AS probe_id, embedding AS pe, nrm AS pn
      |           FROM v WHERE vec_id < 10),
      |pgc AS (SELECT p.probe_id, p.pe, p.pn, g.ccell,
      |    list_sum(list_transform(list_zip(p.pe, g.gcent), z -> z[1]::DOUBLE * z[2]))
      |      / (p.pn * sqrt(list_sum(list_transform(g.gcent, x -> x * x)))) AS gcos
      |  FROM probes p CROSS JOIN gcells g),
      |sb AS (SELECT
      |    (SELECT greatest($SeedCells, CAST(ceil(${Similarity.IvfProbeFrac} * count(*)) AS BIGINT)) FROM fc2) AS scells,
      |    (SELECT greatest($SeedCoarse, CAST(ceil(0.4 * count(*)) AS BIGINT)) FROM gc2) AS gcells),
      |pgs AS (SELECT probe_id, pe, pn, ccell FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY gcos DESC, ccell) grnk FROM pgc)
      |  WHERE grnk <= (SELECT gcells FROM sb)),
      |pcc AS (SELECT s.probe_id, f.cluster,
      |    list_sum(list_transform(list_zip(s.pe, f.centroid), z -> z[1]::DOUBLE * z[2]))
      |      / (s.pn * sqrt(list_sum(list_transform(f.centroid, x -> x * x)))) AS ccos
      |  FROM pgs s JOIN fcells f ON f.parent = s.ccell),
      |selc AS (SELECT probe_id, cluster FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY ccos DESC, cluster) crnk FROM pcc)
      |  WHERE crnk <= (SELECT scells FROM sb)),
      |b0c AS (SELECT probe_id, node FROM selc JOIN medo USING (cluster)
      |        WHERE node != probe_id),
      |b0s AS (SELECT c.probe_id, c.node,
      |    round(list_sum(list_transform(list_zip(p.pe, n.embedding),
      |      z -> z[1]::DOUBLE * z[2]::DOUBLE)) / (p.pn * n.nrm), 4) AS cos
      |  FROM b0c c JOIN probes p USING (probe_id)
      |             JOIN v n ON n.vec_id = c.node),
      |b0 AS MATERIALIZED (SELECT probe_id, node, cos FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY cos DESC, node) rn FROM b0s) WHERE rn <= $Beam),
      |$hops
      |SELECT probe_id, node AS neighbor_id, cos, CAST(rn AS BIGINT) AS rnk
      |FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
      |        ORDER BY cos DESC, node) rn FROM b$Hops)
      |WHERE rn <= 5 ORDER BY probe_id, rnk""".stripMargin
  }
}
