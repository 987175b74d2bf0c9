package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WRITE PATH of the graph-ANN tier (q206) — the one serving tier that
  * was still build-once/static after r12 (VERDICT r12 missing #2; the
  * IVF-flat and composed tiers got their LSM write paths in q193–q198).
  * The DiskANN incremental story re-expressed in segments:
  *
  *  - the gen-0 build freezes the two-level blocking
  *    ([[Similarity.twoLevelBlockedQ]]) and writes the node segment
  *    (`nodes0`: vec_id, cluster, qe), the edge segment (`edges0` —
  *    the α-pruned in-cell + foreign layers of [[insertEdges]],
  *    symmetrized) and the serving tables (fine + coarse centroids);
  *  - an arrival batch appends ONE node delta (frozen two-level
  *    assignment of live arrivals + tombstone rows — never touching
  *    the base) and ONE edge delta: each live arrival's α-pruned
  *    edges against the CURRENT live members of its cell and of its
  *    [[GraphAnn.ForeignCells]] nearest foreign candidate cells (the
  *    r14 static-tier recipe, same constants), both directions
  *    stored — O(batch) ingest;
  *  - the served graph resolves LIVENESS at read time: an edge from
  *    segment s is live iff neither endpoint was re-written after s
  *    and neither is tombstoned — a re-arrived node's stale edges die
  *    with its old vector (the lazy-repair degree erosion every
  *    incremental graph accepts until compaction);
  *  - when cumulative arrival rows cross [[Similarity.LsmDeltaPct]]
  *    percent of the base node count (the q193 trigger arithmetic,
  *    verbatim), COMPACTION rebuilds the whole graph FROM SCRATCH over
  *    the current live corpus — fresh blocking, fresh edges — and
  *    clears the deltas.
  *
  * Everything lives in the QUANTIZED integer domain (node vectors are
  * the milli-unit qe arrays; edge weights are round(qdot/(|a||b|), 4)
  * over int64 dots): arrival drift composes bit-exactly there, so the
  * oracle replays every generation — frozen assignments, same-batch
  * visibility, liveness, the trigger, and the post-compaction rebuild
  * through the z-prefixed from-scratch chain — hash-exactly.
  *
  * 100 TB shape (r14 — VERDICT r13 #1 closed): ingest touches the
  * batch + the probed cells alone. The node base is written
  * partitionBy(cluster) (the q193 serving layout), so the edge delta's
  * live-member view reads the base PRUNED to the batch's candidate
  * cells (static partition pruning on the literal cell list — a
  * batch-bounded census) and resolves latest-wins via broadcast
  * anti-join of the TOUCHED entity set (every entity re-written or
  * tombstoned since the base — delta-bounded, never the corpus) plus a
  * window over the delta rows alone. No full-corpus scan, shuffle, or
  * window appears anywhere in the per-batch path. Read-time liveness
  * joins broadcast the same touched set, whose size the compaction
  * trigger bounds at min([[Similarity.LsmDeltaPct]]%·base,
  * [[Similarity.LsmDeltaAbsMax]] rows) plus the in-flight batch;
  * compaction is the one corpus-sized pass, amortized by the
  * trigger. */
object GraphLifecycle {

  /** qe L2 norm as a double — the codegen'd dot kernel (bigint elements
    * widen to double; every product ≤ 6.4e7 and every partial sum
    * ≤ ~4e9 is exactly representable, so the double accumulation is
    * bit-identical to the integer fold and to the oracle's
    * list_sum-then-cast). */
  private def qNorm(qe: Column): Column =
    graft.functions.VectorFunctions.floatNorm(qe)

  /** round(int64 dot / (|a|·|b|), 4) — the lifecycle's edge weight, via
    * the codegen'd kernel (same exactness argument as [[qNorm]]; the
    * interpreted zip_with fold cost ~1 µs/element over the
    * N·targetBlock candidate pairs and made the first registered q206
    * run 65 s at sf0.1). */
  private def qCos(aQe: Column, bQe: Column, aN: Column, bN: Column): Column =
    round(graft.functions.VectorFunctions.floatDot(aQe, bQe) / (aN * bN), 4)

  /** Frozen two-level assignment + candidate distances of a batch
    * against the stored centroids: (vec_id, qe) →
    * (vec_id, cluster, dist) over the batch's candidate cells — the
    * argmin row is the assignment, the rest feed the bridge rank. */
  private def frozenCand2L(batch: DataFrame, coarse: DataFrame,
                           fine: DataFrame): DataFrame = {
    val wg = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist"), col("gcell"))
    val gtop = batch.crossJoin(broadcast(coarse.select(
        col("cluster").as("gcell"), col("ce").as("gce"))))
      .withColumn("dist", graft.functions.VectorFunctions.longSqDist(
        col("qe"), col("gce")))
      .withColumn("rn", row_number().over(wg))
      .filter(col("rn") <= Similarity.BlockCoarseProbes)
      .select(col("vec_id"), col("qe"), col("gcell"))
    gtop.join(fine.select(col("parent"), col("cluster"), col("ce")),
        col("gcell") === col("parent"))
      .withColumn("dist", graft.functions.VectorFunctions.longSqDist(
        col("qe"), col("ce")))
      .select(col("vec_id"), col("cluster"), col("dist"))
  }

  private def argminCell(cand: DataFrame): DataFrame =
    cand.groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"))

  /** The DIRECTED insert edges of `arr` (vec_id, qe, nq, cluster, with
    * `cand` distances) against the live member set `live` (vec_id, qe,
    * nq, cluster) — the r14 α-pruned recipe ([[GraphAnn.alphaPrune]],
    * same constants as the static tier): the in-cell pool
    * ([[GraphAnn.PoolIn]] nearest live members by qcos) pruned to
    * [[GraphAnn.DegreeIn]], plus the foreign pool ([[GraphAnn.PoolOut]]
    * across the arrival's [[GraphAnn.ForeignCells]] nearest foreign
    * candidate cells) pruned to [[GraphAnn.DegreeOut]]. Everything is
    * already in the quantized domain, so the α test's int64 distances
    * come straight off the stored qe arrays. Gen-0 build = inserting
    * everything against itself. */
  private def insertEdges(arr: DataFrame, cand: DataFrame,
                          live: DataFrame): DataFrame = {
    val wk = Window.partitionBy(col("a.vec_id"))
      .orderBy(col("cos").desc, col("b.vec_id"))
    def cosAB: Column = qCos(col("a.qe"), col("b.qe"),
      col("a.nq"), col("b.nq"))
    def qdAB: Column = graft.functions.VectorFunctions.longSqDist(
      col("a.qe"), col("b.qe"))
    // scell/dcell: the endpoints' cells, stored on the edge rows so the
    // serve's vector reads can prune to each hop's candidate cells (r15)
    def poolCols = Seq(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
      col("cos"), col("qd"), col("b.qe").as("qe"), col("rnk"),
      col("a.cluster").as("scell"), col("b.cluster").as("dcell"))
    val icp = arr.as("a").join(live.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("cos", cosAB)
      .withColumn("qd", qdAB)
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= GraphAnn.PoolIn)
      .select(poolCols: _*)
      .localCheckpoint()
    val wb = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist"), col("cluster"))
    val fcell = cand
      .join(arr.select(col("vec_id"), col("cluster").as("ocell")), "vec_id")
      .filter(col("cluster") =!= col("ocell"))
      .withColumn("rn", row_number().over(wb))
      .filter(col("rn") <= GraphAnn.ForeignCells)
      .select(col("vec_id"), col("cluster").as("fcell"))
    val fcp = arr.as("a")
      .join(fcell, col("a.vec_id") === fcell("vec_id"))
      .join(live.as("b"), col("b.cluster") === col("fcell"))
      .withColumn("cos", cosAB)
      .withColumn("qd", qdAB)
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= GraphAnn.PoolOut)
      .select(poolCols: _*)
      .localCheckpoint()
    val carry = Seq("scell", "dcell")
    GraphAnn.alphaPrune(icp, GraphAnn.DegreeIn, carry = carry)
      .unionAll(GraphAnn.alphaPrune(fcp, GraphAnn.DegreeOut, carry = carry))
  }

  /** Both directions of the insert edges — the stored segment rows,
    * each carrying its DESTINATION's cell (the node-read census) AND
    * its SOURCE's cell (`scell` — the r17 edge-pruning key: within a
    * segment the source's cell is fixed by that segment's live view,
    * so for any edge that stays LIVE the stored scell equals the
    * endpoint's current cell and a frontier-census prune on it is
    * exact), deduplicated AT WRITE (VERDICT r14 #2: symmetrization
    * dedup deferred to read time was a full-edge-set shuffle per serve
    * call; a live duplicate can only be within-segment — a
    * cross-segment duplicate's later copy implies an endpoint
    * re-arrival that kills the earlier copy — so write-time distinct ≡
    * the old read-time distinct on the live view; scell/dcell are
    * endpoint-determined within the segment, so carrying them leaves
    * the distinct set unchanged). */
  private def symmetrized(dir: DataFrame): DataFrame =
    dir.select(col("src"), col("dst"), col("cos"),
        col("scell"), col("dcell"))
      .unionAll(dir.select(col("dst").as("src"), col("src").as("dst"),
        col("cos"), col("dcell").as("scell"), col("scell").as("dcell")))
      .distinct()

  /** One node segment read back with a stable schema: the base is
    * written in the bucketed [[CellStore]] layout (r16), so `bucket` is
    * the inferred partition column and `cluster` comes back as a long
    * DATA column — the cast is a no-op kept for schema uniformity with
    * the delta segments' (vec_id, qe, cluster: long, gen, del), and the
    * explicit select drops the bucket column so unionByName and the
    * join keys agree across segments. */
  private def readNodeSeg(spark: SparkSession, p: String): DataFrame =
    spark.read.parquet(p).select(col("vec_id"), col("qe"),
      col("cluster").cast("long").as("cluster"), col("gen"), col("del"))

  /** The node segments' resolved view at the current store state:
    * latest-wins per entity across base ∪ deltas (ascending `gens`),
    * carrying (vec_id, qe, nq, cluster, gen, del). CORPUS-SIZED — used
    * only by the corpus-sized operations (compaction's fold, the audit
    * rows, the spec hooks); the per-batch ingest path resolves through
    * [[liveMembersIn]] instead. */
  private def resolvedNodes(spark: SparkSession, base: String,
                            deltas: Seq[String]): DataFrame = {
    val segs = (base +: deltas).zipWithIndex.map { case (p, i) =>
      readNodeSeg(spark, p).withColumn("segi", lit(i.toLong))
    }.reduce(_ unionByName _)
    segs.withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("segi").desc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qe"), col("cluster"), col("gen"),
        col("del"))
      .withColumn("nq", qNorm(col("qe")))
  }

  /** The number of bucket dirs under a base's node segment — derived
    * from the stored centroid table by the same deterministic rule the
    * write side used ([[CellStore.bucketCount]]); no meta file. */
  private def nodeBucketsOf(spark: SparkSession, base: String): Long =
    CellStore.bucketCount(
      graft.FsUtil.parquetRowCount(spark, s"$base/centroids"))

  /** The LIVE members of `cells` alone — the per-batch live-view
    * resolution (the q193/q194 serve discipline applied to ingest,
    * VERDICT r13 #1): the base scan prunes to the literal cell list
    * (bucket partition filter + pushed cluster IN-filter riding the
    * in-file cluster sort — [[CellStore.prunedTo]]), entities
    * re-written or tombstoned since the base are removed by broadcast
    * anti-join of the TOUCHED set (delta-bounded), and the deltas' own
    * latest-wins window runs over the delta rows alone. Equivalent to
    * `resolvedNodes(...).filter(!del && cluster ∈ cells)` — pinned by
    * GraphLifecycleSpec — at O(probed-cell buckets + delta rows)
    * instead of O(corpus). */
  private def liveMembersIn(spark: SparkSession, base: String,
                            cells: Seq[Long]): DataFrame = {
    val (b0, ds) = nodeSegs(base)
    val baseSeg = CellStore.prunedTo(spark.read.parquet(b0),
        nodeBucketsOf(spark, base), cells)
      .select(col("vec_id"), col("qe"),
        col("cluster").cast("long").as("cluster"), col("gen"), col("del"))
    liveMembersFrom(baseSeg,
      if (ds.isEmpty) None else Some(deltaLatest(spark, ds)),
      if (cells.isEmpty) lit(false) else col("cluster").isin(cells: _*))
  }

  /** The WHOLE live node view of a store state — the CORPUS-SIZED
    * resolution, used only where the whole corpus is genuinely needed
    * (the q212 recall legs' brute-force truth). The serve path reads
    * through [[liveMembers]] with each hop's candidate-cell predicate
    * instead (r15, VERDICT r14 #1). */
  private def liveNodesAll(spark: SparkSession, base: String): DataFrame =
    liveMembers(spark, base, lit(true))

  /** `pred` restricts BOTH the base scan (a partition filter when it is
    * a cluster IN-list, a pushed predicate otherwise) and the delta
    * view. The real invariant (ADVICE r15 #5): a CLUSTER predicate is
    * NOT entity-stable — a re-written node can change cells — so
    * correctness rests on [[liveMembersFrom]] anti-joining the base
    * against the UNFILTERED delta vec_id set; only per-entity-stable
    * predicates (vec_id ranges) may ever be pushed below that
    * anti-join. A refactor that filtered `dl` by `pred` BEFORE the
    * anti-join would silently resurrect the stale base row of any
    * entity that moved out of the predicate's cells. `dl` supplies a
    * precomputed (checkpointed) [[deltaLatest]] so a serve call's ~6
    * passes do not re-read the delta segments each time. */
  private def liveMembers(spark: SparkSession, base: String,
                          pred: Column,
                          dl: Option[DataFrame] = None): DataFrame = {
    val (b0, ds) = nodeSegs(base)
    liveMembersFrom(readNodeSeg(spark, b0),
      if (ds.isEmpty) None
      else Some(dl.getOrElse(deltaLatest(spark, ds))), pred)
  }

  /** The resolution body over an ALREADY-READ base segment frame — the
    * serve path builds the segment reads once per call and each pass
    * only adds its cell predicate (one file-index listing per serve,
    * not per pass). */
  private def liveMembersFrom(baseSeg0: DataFrame, dl: Option[DataFrame],
                              pred: Column): DataFrame = {
    val baseSeg = baseSeg0.filter(pred)
    val resolved = dl match {
      case None => baseSeg
      case Some(dLatest) =>
        baseSeg
          .join(broadcast(dLatest.select(col("vec_id"))),
            Seq("vec_id"), "left_anti")
          .unionByName(dLatest.filter(pred))
    }
    resolved.filter(!col("del"))
      .select(col("vec_id"), col("qe"), qNorm(col("qe")).as("nq"),
        col("cluster"))
  }

  /** The resolution body for the SERVE path's per-pass census FRAME
    * (VERDICT r15 #2 — the in-plan counterpart of [[liveMembersFrom]]):
    * the base scan prunes via [[CellStore.prunedToF]]'s broadcast
    * semi-join with dynamic partition pruning on the bucket column —
    * no per-pass driver collect — and the delta view prunes by the
    * same census semi-join on its CURRENT cluster. The liveness
    * invariant is unchanged: the anti-join uses the UNFILTERED delta
    * vec_id set (cluster predicates are not entity-stable — see
    * [[liveMembers]]). `baseRaw` is the already-listed base segment
    * read (one file-index listing per serve call, shared by all
    * passes). */
  private def liveMembersFromF(baseRaw: DataFrame, nb: Long,
                               dl: Option[DataFrame],
                               cellsF: DataFrame): DataFrame = {
    val baseSeg = CellStore.prunedToF(baseRaw, nb, cellsF)
      .select(col("vec_id"), col("qe"),
        col("cluster").cast("long").as("cluster"), col("gen"), col("del"))
    val resolved = dl match {
      case None => baseSeg
      case Some(dLatest) =>
        baseSeg
          .join(broadcast(dLatest.select(col("vec_id"))),
            Seq("vec_id"), "left_anti")
          .unionByName(dLatest.join(broadcast(cellsF),
            dLatest("cluster") === cellsF("cell"), "left_semi"))
    }
    resolved.filter(!col("del"))
      .select(col("vec_id"), col("qe"), qNorm(col("qe")).as("nq"),
        col("cluster"))
  }

  /** Latest-wins view of the DELTA segments alone (vec_id, qe, cluster,
    * gen, del) — the touched-entity raw material: delta-bounded, never
    * the corpus. */
  private def deltaLatest(spark: SparkSession,
                          ds: Seq[String]): DataFrame = {
    val d = ds.zipWithIndex.map { case (p, i) =>
      readNodeSeg(spark, p).withColumn("segi", lit(i.toLong))
    }.reduce(_ unionByName _)
    d.withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("segi").desc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qe"), col("cluster"), col("gen"),
        col("del"))
  }

  /** The LIVE edge view: an edge from segment s survives iff neither
    * endpoint was re-written after s and neither is tombstoned;
    * symmetrization dedup happened at segment WRITE (r15). Only the TOUCHED
    * entity set (re-written or tombstoned since the base — delta-
    * bounded, never the corpus) joins in: an untouched endpoint passes
    * every liveness test by construction. The broadcast is
    * DELTA-bounded, not batch-bounded (VERDICT r13 #2): it accumulates
    * every touched entity since the last compaction, so its size is
    * capped by the compaction trigger at
    * min([[Similarity.LsmDeltaPct]]%·base, [[Similarity.LsmDeltaAbsMax]]
    * rows) plus one in-flight batch — ~96 MB of (long, long, bool) rows
    * at the absolute floor, inside broadcast comfort at any corpus
    * size. Above that the trigger forces compaction, which empties the
    * set. */
  private def liveEdges(spark: SparkSession, nodes: DataFrame,
                        edgeSegs: Seq[(String, Long)]): DataFrame = {
    val es = edgeSegs.map { case (p, g) =>
        // explicit select: the base segment's read-back carries the
        // bucketed layout's cluster/bucket columns, the delta segments
        // carry scell — normalize to the liveness schema
        spark.read.parquet(p)
          .select(col("src"), col("dst"), col("cos"), col("dcell"))
          .withColumn("seg", lit(g))
      }.reduce(_ unionByName _)
    val touched = nodes.filter(col("gen") > 0 || col("del"))
      .select(col("vec_id"), col("gen"), col("del"))
    livenessFiltered(es, touched)
  }

  /** The liveness rule over a segment union carrying (src, dst, seg)
    * plus any passenger columns: an edge from segment s survives iff
    * neither endpoint was re-written after s and neither is
    * tombstoned. `touched` must be the UNFILTERED touched-entity set —
    * never cell-pruned (liveness is keyed on endpoints, which are
    * entity-stable only per segment). Passenger columns (cos, dcell,
    * the serve path's probe_id) ride through; the join temporaries and
    * seg are dropped. */
  private def livenessFiltered(es: DataFrame,
                               touched: DataFrame): DataFrame =
    es.join(broadcast(touched.select(col("vec_id").as("src"),
        col("gen").as("sg"), col("del").as("sd"))), Seq("src"), "left")
      .join(broadcast(touched.select(col("vec_id").as("dst"),
        col("gen").as("dg"), col("del").as("dd"))), Seq("dst"), "left")
      .filter(coalesce(col("sg"), lit(0L)) <= col("seg") &&
        coalesce(col("dg"), lit(0L)) <= col("seg") &&
        !coalesce(col("sd"), lit(false)) && !coalesce(col("dd"), lit(false)))
      // no distinct: segments are deduplicated at write ([[symmetrized]])
      // and cross-segment duplicates cannot both be live, so the filter
      // alone IS the live view — the read path pays no O(E) shuffle
      .drop("sg", "sd", "dg", "dd", "seg")

  /** The serve path's PER-HOP expansion over the live edge view (r17,
    * VERDICT r16 #1 — the adjacency twin of [[liveMembersFromF]]):
    * the frontier `bm(probe_id, node, cell)` broadcast-joins each
    * segment on src = node, with the bucketed edge BASE additionally
    * keyed on the frontier cell's bucket — dynamic partition pruning
    * plants off that key, so the hop's base scan IO is the frontier's
    * buckets, not all E rows — and the (batch-bounded) delta segments
    * keyed on their stored scell. The liveness joins then run on the
    * already-frontier-bounded rows against the UNFILTERED touched set
    * (the entity-stability invariant — liveness commutes with the
    * frontier join because they key on disjoint columns). Exact,
    * because a LIVE edge's stored scell equals its source's current
    * cell (no re-write after the segment, by the liveness rule
    * itself), which is the cell the frontier row carries; a STALE
    * edge the cell keys drop early would have been dropped by
    * liveness anyway. The segment reads happen once per serve call
    * (one file-index listing); each hop only adds its joins. */
  private def liveExpandFor(spark: SparkSession, base: String, nb: Long,
                            touched: DataFrame): DataFrame => DataFrame = {
    val e0 = spark.read.parquet(s"$base/edges0")
    val deltas = deltaGens(base).map(g =>
      spark.read.parquet(s"$base/edges$g") -> g.toLong)
    bm => {
      val b = broadcast(bm.select(col("probe_id"), col("node"),
          col("cell").cast("long").as("cell"),
          CellStore.bucketOf(col("cell").cast("long"), nb).as("bkt"))
        .filter(col("bkt") >= 0))
      val b0 = e0.join(b,
          e0("bucket") === b("bkt") && e0("src") === b("node"))
        .select(b("probe_id"), e0("src"), e0("dst"), e0("cos"),
          e0("dcell"), lit(0L).as("seg"))
      val ds = deltas.map { case (d, g) =>
        d.join(b, d("scell") === b("cell") && d("src") === b("node"))
          .select(b("probe_id"), d("src"), d("dst"), d("cos"),
            d("dcell"), lit(g).as("seg"))
      }
      livenessFiltered((b0 +: ds).reduce(_ unionByName _), touched)
        .select(col("probe_id"), col("dst").as("node"),
          col("dcell").as("cell"))
    }
  }

  /** Writes the gen-0 graph store under `root` from a quantized corpus
    * (vec_id, qe): frozen blocking tables, node segment, edge segment.
    * Node cells use the UNIFORM frozen rule — argmin over the node's
    * candidate cells against the stored fine centroids — the same rule
    * every later arrival is assigned by. */
  private def seedStore(q0: DataFrame, root: String, gen: Long): Unit = {
    val spark = q0.sparkSession
    Similarity.sweepAfter(spark) {
      val b = Similarity.twoLevelBlockedQ(q0, 128, 2, 64)
      b.cents.write.mode("overwrite").parquet(s"$root/centroids")
      b.coarse.write.mode("overwrite").parquet(s"$root/coarse")
      // b.cand IS the frozen-rule candidate frame (distances vs the
      // UPDATED fine centroids over each node's candidate cells) — the
      // exact frame [[frozenCand2L]] would recompute from the tables
      // just written; reuse it instead of paying the pass twice
      val cand = b.cand.localCheckpoint()
      val asg = argminCell(cand)
      val nodes = q0.join(asg, "vec_id")
        .select(col("vec_id"), col("qe"), col("cluster"),
          lit(gen).as("gen"), lit(false).as("del"))
        .localCheckpoint()
      // per-cell entry medoids (min own-cell distance, tie vec_id) —
      // the serve leg's entry points (q211), written at build/compaction
      // like the static tier's; a medoid later tombstoned or re-written
      // simply drops out of the serve's live-filtered entry set
      val wm = Window.partitionBy(col("cluster"))
        .orderBy(col("dist"), col("vec_id"))
      cand.join(asg, Seq("vec_id", "cluster"))
        .withColumn("rn", row_number().over(wm))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("vec_id").as("node"))
        .write.mode("overwrite").parquet(s"$root/medoids")
      // bucketed base segments (VERDICT r15 #1 / r16 #1 — see
      // [[CellStore]]): the ingest path's live-member read prunes to
      // the batch's candidate cells via bucket partition pruning + the
      // pushed cluster IN-filter, the serve's per-hop ADJACENCY read
      // prunes to the frontier's cell census on the edge base's
      // source-cell bucketing, and both file counts stay bounded
      // instead of one file per cell
      val nb = CellStore.bucketCount(
        graft.FsUtil.parquetRowCount(spark, s"$root/centroids"))
      CellStore.write(nodes, nb, s"$root/nodes0")
      val full = nodes.withColumn("nq", qNorm(col("qe")))
        .select(col("vec_id"), col("qe"), col("nq"), col("cluster"))
      CellStore.write(
        symmetrized(insertEdges(full, cand, full))
          .withColumnRenamed("scell", "cluster"),
        nb, s"$root/edges0")
    }
  }

  /** The CURRENT base root under a lifecycle store: the
    * highest-numbered `b<i>` (b0 = the seed; compaction writes b1, b2,
    * … — segment paths are never reused, the lsmStorePaths
    * discipline). Every reader — batch lifecycle, streaming ingest,
    * audits — resolves the store state this way. */
  private def currentBase(root: String): String = {
    val dirs = Option(new java.io.File(root).list()).getOrElse(Array.empty)
    val bs = dirs.filter(_.matches("b\\d+"))
    require(bs.nonEmpty,
      s"graph lifecycle store not seeded under $root — seedStore first")
    s"$root/${bs.maxBy(_.drop(1).toInt)}"
  }

  /** Live delta generation numbers (ascending) under a base root. */
  private def deltaGens(base: String): Seq[Int] =
    Option(new java.io.File(base).list()).getOrElse(Array.empty)
      .filter(_.matches("nodes[1-9]\\d*")).map(_.drop(5).toInt).sorted.toSeq

  private def nodeSegs(base: String): (String, Seq[String]) =
    (s"$base/nodes0", deltaGens(base).map(g => s"$base/nodes$g"))

  private def edgeSegPaths(base: String): Seq[(String, Long)] =
    (s"$base/edges0", 0L) +:
      deltaGens(base).map(g => s"$base/edges$g" -> g.toLong)

  /** One arrival batch (vec_id, qe, del) appended as node + edge delta
    * segments `nodes$g`/`edges$g` under the CURRENT base: frozen
    * assignment of live arrivals, tombstone node rows, insert edges
    * against the POST-batch live view (same-batch arrivals see each
    * other — deterministic, no within-batch order). Touches the batch
    * + the probed cells only — never the base segments. */
  private def ingestBatch(spark: SparkSession, base: String,
                          batch: DataFrame, g: Long): Unit = {
    val fine = spark.read.parquet(s"$base/centroids")
    val coarse = spark.read.parquet(s"$base/coarse")
    val liveArr = batch.filter(!col("del")).select(col("vec_id"), col("qe"))
    val cand = frozenCand2L(liveArr, coarse, fine).localCheckpoint()
    val nodes = liveArr.join(argminCell(cand), "vec_id")
      .select(col("vec_id"), col("qe"), col("cluster"),
        lit(g).as("gen"), lit(false).as("del"))
      .unionByName(batch.filter(col("del"))
        .select(col("vec_id"), col("qe"), lit(-1L).as("cluster"),
          lit(g).as("gen"), lit(true).as("del")))
      .localCheckpoint()
    nodes.write.mode("overwrite").parquet(s"$base/nodes$g")
    // the post-batch live view (latest-wins including this delta),
    // restricted to the batch's candidate cells — the only cells
    // insertEdges joins against (assigned and bridge cells are both
    // candidate cells by construction). The distinct-cell census is
    // batch-bounded (≤ batch × probes × children), so the collect is
    // the q192 batch-bounded-census shape, and the base read under
    // liveMembersIn partition-prunes to exactly these cells.
    val cells = cand.select(col("cluster")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val lv = liveMembersIn(spark, base, cells)
    val arr = nodes.filter(!col("del"))
      .withColumn("nq", qNorm(col("qe")))
      .select(col("vec_id"), col("qe"), col("nq"), col("cluster"))
    symmetrized(insertEdges(arr, cand, lv))
      .write.mode("overwrite").parquet(s"$base/edges$g")
  }

  /** Fires the q193 trigger against the current store state and, when
    * it fires, rebuilds FROM SCRATCH over the live corpus into the
    * next `b<i+1>` root (fresh blocking, fresh edges) and drops the old
    * base's delta segments. Returns whether compaction ran. Shared by
    * the batch lifecycle and the streaming ingest leg — one trigger,
    * two drivers. */
  private def maybeCompact(spark: SparkSession, root: String): Boolean = {
    val base = currentBase(root)
    val (b0, ds) = nodeSegs(base)
    val baseRows = graft.FsUtil.parquetRowCount(spark, b0)
    val deltaRows =
      if (ds.isEmpty) 0L
      else ds.map(graft.FsUtil.parquetRowCount(spark, _)).sum
    // the q193 percent trigger, plus an ABSOLUTE delta-row floor
    // (VERDICT r13 #2): at 1e9 nodes 5% of base is ~5e7 rows — past
    // broadcast comfort for the read-time liveness joins — so the
    // trigger also fires at LsmDeltaAbsMax rows outright, bounding the
    // touched-set broadcast at any corpus size. Inert at every oracle
    // fixture (the OR term is mirrored in the oracle's HAVING).
    val fires = deltaRows * 100L > baseRows * Similarity.LsmDeltaPct ||
      deltaRows > Similarity.LsmDeltaAbsMax
    if (fires) {
      val lq = resolvedNodes(spark, b0, ds)
        .filter(!col("del"))
        .select(col("vec_id"), col("qe"))
        .localCheckpoint()
      val idx = base.split('/').last.drop(1).toInt
      seedStore(lq, s"$root/b${idx + 1}", 0L)
      deltaGens(base).foreach { g =>
        graft.FsUtil.deleteRecursively(new java.io.File(s"$base/nodes$g"))
        graft.FsUtil.deleteRecursively(new java.io.File(s"$base/edges$g"))
      }
    }
    fires
  }

  /** q206: the graph-ANN lifecycle audit — gen-0 build, three arrival
    * generations (the q193 fixture bands: entities vec_id%100 ∈ {g,4},
    * +500·g milli-unit drift in the integer domain, vec_id%3 = 0
    * tombstoned), the [[Similarity.LsmDeltaPct]] trigger, and the
    * post-compaction from-scratch rebuild. One audit row per state
    * g0..g3 + g3c: live nodes, live edges, cumulative delta rows,
    * compacted flag, edge checksum. The oracle recomputes every state's
    * live edge view from scratch — frozen chain, per-generation
    * arrivals with same-batch visibility, the liveness rule — and the
    * g3c row through a fresh z-prefixed two-level chain over the g3
    * live set, behind the SAME integer trigger predicate. */
  def graphLifecycle(embeddings: DataFrame): DataFrame = {
    val scratch =
      java.nio.file.Files.createTempDirectory("graft_gannlc_").toString
    try graphLifecycleTo(embeddings, scratch)
    finally graft.FsUtil.deleteRecursively(new java.io.File(scratch))
  }

  /** The registered q206 form (r15, VERDICT r14 #4): the SAME audit
    * rows, read from the shared [[servedRootFor]] store — the suite
    * runs ONE lifecycle build per corpus, feeding q206's audit and
    * q211/q212's serve legs, instead of replaying the whole chain on a
    * scratch root a second time. The rows are computed during the build
    * (state by state, exactly [[graphLifecycleTo]]'s) and persisted
    * under the root; the oracle is unchanged. The scratch-root
    * [[graphLifecycle]] stays as the hermetic spec-only mode. */
  def graphLifecycleAudited(embeddings: DataFrame,
                            corpusTag: String): DataFrame = {
    val spark = embeddings.sparkSession
    spark.read.parquet(s"${servedRootFor(embeddings, corpusTag)}/audit")
      .orderBy(col("state"))
  }

  /** The q193 fixture band in the quantized domain. */
  private def arrivals(q0: DataFrame, g: Int): DataFrame = q0
    .filter(col("vec_id") % 100 === g || col("vec_id") % 100 === 4)
    .select(col("vec_id"),
      transform(col("qe"), x => x + lit(500L * g)).as("qe"),
      (col("vec_id") % 3 === 0).as("del"))

  /** One audit row over the CURRENT store state: live nodes, the live
    * edge view's count + checksum, cumulative delta rows, compacted
    * flag. */
  private def auditState(spark: SparkSession, root: String, state: String,
                         compacted: Long): DataFrame = {
    val base = currentBase(root)
    val (b0, ds) = nodeSegs(base)
    val nodes = resolvedNodes(spark, b0, ds).localCheckpoint()
    val nDelta =
      if (ds.isEmpty) 0L
      else ds.map(graft.FsUtil.parquetRowCount(spark, _)).sum
    liveEdges(spark, nodes, edgeSegPaths(base))
      .agg(count(lit(1)).as("n_edges"),
        sum(col("src") * 100000L + col("dst") +
          round(col("cos") * 10000).cast("long")).as("checksum"))
      .crossJoin(broadcast(nodes.filter(!col("del"))
        .agg(count(lit(1)).as("n_nodes"))))
      .select(lit(state).as("state"), col("n_nodes"), col("n_edges"),
        lit(nDelta).as("n_delta"), lit(compacted).as("compacted"),
        col("checksum"))
      .localCheckpoint()
  }

  private[graft] def graphLifecycleTo(embeddings: DataFrame, root: String,
                                      onState: String => Unit = _ => ())
      : DataFrame = {
    val spark = embeddings.sparkSession
    val q0 = Similarity.quantized(
      embeddings.select(col("vec_id"), col("embedding")), 1000)
      .localCheckpoint()
    seedStore(q0, s"$root/b0", 0L)
    require(graft.FsUtil.parquetRowCount(spark, s"$root/b0/nodes0") >= 100,
      "graphLifecycle: fixture needs >= 100 vectors for the oracle's " +
        "fires-first-at-g3 trigger contract to hold (the q193 guard)")
    val audits = scala.collection.mutable.ArrayBuffer(
      auditState(spark, root, "g0", 0L))
    onState("g0")
    for (g <- 1 to 3) {
      ingestBatch(spark, currentBase(root), arrivals(q0, g), g.toLong)
      audits += auditState(spark, root, s"g$g", 0L)
      onState(s"g$g")
      if (maybeCompact(spark, root)) {
        audits += auditState(spark, root, s"g${g}c", 1L)
        onState(s"g${g}c")
      }
    }
    audits.reduce(_ unionAll _).orderBy(col("state")).localCheckpoint()
  }

  /** Sweep hooks (ChurnSweep, r15): seed a store, append one arrival
    * batch WITHOUT the compaction trigger (the sweep measures erosion
    * at churn levels past the trigger, which maybeCompact would repair
    * on the spot), and force a from-scratch rebuild of the current live
    * set — the same body the trigger fires. */
  private[llm] def seedStoreAt(q0: DataFrame, root: String): Unit =
    seedStore(q0, s"$root/b0", 0L)

  private[llm] def ingestOnly(spark: SparkSession, root: String,
                              batch: DataFrame, g: Long): Unit =
    ingestBatch(spark, currentBase(root), batch, g)

  private[llm] def rebuildAt(spark: SparkSession, root: String): Unit = {
    val base = currentBase(root)
    val (b0, ds) = nodeSegs(base)
    val lq = resolvedNodes(spark, b0, ds)
      .filter(!col("del"))
      .select(col("vec_id"), col("qe"))
      .localCheckpoint()
    val idx = base.split('/').last.drop(1).toInt
    seedStore(lq, s"$root/b${idx + 1}", 0L)
  }

  /** Test hooks: the resolved (nodes, live-edge view) of the current
    * store state, and the fixture band — GraphLifecycleSpec pins the
    * liveness contract and the stream ≡ batch store equivalence
    * through these. */
  private[llm] def liveViewAt(spark: SparkSession,
                              root: String): (DataFrame, DataFrame) = {
    val base = currentBase(root)
    val (b0, ds) = nodeSegs(base)
    val nodes = resolvedNodes(spark, b0, ds)
    (nodes, liveEdges(spark, nodes, edgeSegPaths(base))
      .select(col("src"), col("dst"), col("cos")))
  }

  private[llm] def arrivalsOf(q0: DataFrame, g: Int): DataFrame =
    arrivals(q0, g)

  private[llm] def currentBaseOf(root: String): String = currentBase(root)

  /** Test hook for the per-batch live-member resolution — the spec pins
    * (a) liveMembersIn ≡ the corpus-sized resolvedNodes filtered to the
    * cells, and (b) that the base scan under it is partition-pruned. */
  private[llm] def liveMembersAt(spark: SparkSession, root: String,
                                 cells: Seq[Long]): DataFrame =
    liveMembersIn(spark, currentBase(root), cells)

  /** Test hook for the serve path's pruned per-hop EXPANSION (r17) —
    * the spec pins (a) liveExpandFor ≡ the full live edge view joined
    * against the same frontier, and (b) that the bucketed edge base
    * scan under it carries the DPP subquery. */
  private[llm] def liveExpandAt(spark: SparkSession, root: String,
                                frontier: DataFrame): DataFrame = {
    val base = currentBase(root)
    val (b0, ds) = nodeSegs(base)
    val dl =
      if (ds.isEmpty) None
      else Some(deltaLatest(spark, ds).localCheckpoint())
    val touched = dl match {
      case Some(d) => d.select(col("vec_id"), col("gen"), col("del"))
      case None => readNodeSeg(spark, b0).filter(lit(false))
        .select(col("vec_id"), col("gen"), col("del"))
    }
    liveExpandFor(spark, base, nodeBucketsOf(spark, base),
      touched)(frontier)
  }

  /** Beam search over ONE store state's LIVE view — the READ path of
    * the incremental graph index (q211). Base vectors = the live node
    * view read PER PASS through [[liveMembers]] pruned to the hop's
    * candidate-cell census (r15, VERDICT r14 #1: the base scan is a
    * static partition filter on the cluster-partitioned node segment +
    * broadcast touched-set anti-join + a window over the delta rows
    * alone — never a full-partition materialization per serve), edges =
    * the liveness-joined segment union ([[liveEdges]], deduplicated at
    * write), entry medoids = the stored build-time medoids
    * LIVE-FILTERED against the broadcast delta view (a tombstoned
    * medoid drops out; a re-written one keeps its ORIGINAL seed cell —
    * the oracle's m2 rule — while its census cell tracks its CURRENT
    * cluster so the pruned read still finds its vector), seed tables =
    * the store's frozen centroids. The search itself is
    * [[GraphAnn.beamFrom]] VERBATIM in the quantized domain — the
    * shared dot kernel widens int64 exactly and the edge weights were
    * stored with the same rounding, so serve ≡ the oracle
    * bit-for-bit. */
  private def serveStateWith(spark: SparkSession, base: String,
                             state: String, probes: DataFrame,
                             k: Int): DataFrame = {
    val (b0, ds) = nodeSegs(base)
    val dl =
      if (ds.isEmpty) None
      else Some(deltaLatest(spark, ds).localCheckpoint())
    val touched = dl match {
      case Some(d) => d.select(col("vec_id"), col("gen"), col("del"))
      case None => readNodeSeg(spark, b0).filter(lit(false))
        .select(col("vec_id"), col("gen"), col("del"))
    }
    val m0 = spark.read.parquet(s"$base/medoids")
    val medoids = (dl match {
      case None => m0.select(col("cluster"), col("node"),
        col("cluster").as("cell"))
      case Some(d) =>
        m0.join(broadcast(d.select(col("vec_id").as("node"),
            col("cluster").as("ncell"), col("del").as("ndel"))),
            Seq("node"), "left")
          .filter(!coalesce(col("ndel"), lit(false)))
          .select(col("cluster"), col("node"),
            coalesce(col("ncell"), col("cluster")).as("cell"))
    }).localCheckpoint()
    val baseRaw = spark.read.parquet(b0)
    val nb = nodeBucketsOf(spark, base)
    val baseFor: DataFrame => DataFrame = cellsF =>
      liveMembersFromF(baseRaw, nb, dl, cellsF)
        .select(col("vec_id"), col("qe").as("embedding"),
          col("nq").as("nrm"), col("cluster"))
    // the adjacency reads prune per hop (r17) — the serve no longer
    // materializes the whole O(E) live edge view per call
    GraphAnn.beamFrom(probes, baseFor,
        liveExpandFor(spark, base, nb, touched), medoids,
        spark.read.parquet(s"$base/centroids"),
        spark.read.parquet(s"$base/coarse"), k)
      .select(lit(state).as("state"), col("probe_id"), col("neighbor_id"),
        col("cos"), col("rnk"))
  }

  /** A state's registered probe set: the live view's vec_id < nProbes
    * rows with their CURRENT (possibly drifted) vectors — each serve
    * leg queries the corpus the state actually holds. The vec_id
    * predicate pushes into both segment scans (per-entity-stable, so it
    * commutes with latest-wins) — never a full live-view pass. */
  private def stateProbes(spark: SparkSession, base: String,
                          nProbes: Int): DataFrame =
    liveMembers(spark, base, col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("qe").as("pe"),
        col("nq").as("pn"))

  /** Builds (once per corpus, under the shared ServedRoots cache) the
    * full q206 lifecycle INCLUDING a segment snapshot of the
    * pre-compaction g2 state — a serving system pins a store state by
    * snapshotting its segment manifest; the local stand-in copies the
    * fixture-sized segment files. */
  private[llm] def servedRootFor(embeddings: DataFrame,
                                 corpusTag: String): String =
    graft.FsUtil.ServedRoots.getOrBuild(
      Similarity.corpusKey(embeddings, "vec_id", s"gannlcs:$corpusTag",
        Similarity.embSig),
      "graft_gannlc_served_") { r =>
      // the audit rows land in the store too (q206 reads them back —
      // one lifecycle build per corpus serves q206, q211 AND q212)
      graphLifecycleTo(embeddings, r, onState = { st =>
        if (st == "g2") graft.FsUtil.copyRecursively(
          new java.io.File(currentBase(r)), new java.io.File(s"$r/g2snap"))
      }).write.mode("overwrite").parquet(s"$r/audit")
      ()
    }

  /** q211: the graph lifecycle's SERVE leg — the q206 write path closed
    * into a read path. One beam search per served state: the
    * PRE-compaction g2 snapshot (base + 2 delta generations — the serve
    * must resolve latest-wins nodes, liveness-join 3 edge segments and
    * live-filter the gen-0 medoids at query time) and the
    * POST-compaction final state (a fresh single-segment store). The
    * oracle recomputes both states' live views through the q206 chains
    * and unrolls the identical beam search over each — the lifecycle
    * counterpart of the q203 store ≡ recompute proof. */
  def graphLifecycleServed(embeddings: DataFrame, corpusTag: String,
                           nProbes: Int = 10, k: Int = 5): DataFrame = {
    // the oracle's probe CTE and final rank are unrolled at the
    // registered constants (ADVICE r14 #2)
    require(nProbes == 10 && k == 5,
      "graphLifecycleServed is oracle-gated at nProbes=10, k=5")
    val spark = embeddings.sparkSession
    val root = servedRootFor(embeddings, corpusTag)
    val g2 = s"$root/g2snap"
    val fin = currentBase(root)
    serveStateWith(spark, g2, "g2", stateProbes(spark, g2, nProbes), k)
      .unionByName(serveStateWith(spark, fin, "g3c",
        stateProbes(spark, fin, nProbes), k))
      .orderBy(col("state"), col("probe_id"), col("rnk"))
  }

  /** The q211 serve leg under Structured Streaming (foreachBatch):
    * probe vectors (vec_id, qe — pre-quantized, the q193 stream
    * contract) arrive as micro-batches and run the identical beam
    * search against the CURRENT (post-compaction) store state —
    * stream ≡ batch proved in StreamingSpec against
    * [[graphLifecycleServed]]'s g3c rows. */
  def graphLifecycleServeStreamBatch(embeddings: DataFrame,
                                     corpusTag: String, outDir: String,
                                     k: Int = 5)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = Similarity.streamRootFor(s"gannlcs:$corpusTag") {
      servedRootFor(embeddings, corpusTag)
    }
    val probes = batch.select(col("vec_id").as("probe_id"),
      col("qe").as("pe"), qNorm(col("qe")).as("pn"))
    serveStateWith(spark, currentBase(root), "g3c", probes, k)
      .write.mode("append").parquet(outDir)
    ()
  }

  /** q212: the lifecycle serve's QUALITY per state — recall@k of the
    * q211 beam serve against the brute-force truth over each state's
    * OWN live corpus (quantized cosine, house ties), the q39/q210
    * acceptance-gate precedent applied to the incremental store. This
    * is the measured lazy-repair story: between compactions the graph
    * ERODES (a re-written node's old edges die with its vector and
    * nothing re-links its neighbors until compaction), so the
    * pre-compaction g2 recall vs the fresh post-compaction g3c recall
    * is the quantified cost of incremental ingest — a number the q206
    * scaladoc could only assert before. Truth cost = probes × live
    * rows per state (the q35 shape); the scoring joins are probes×k. */
  def graphLifecycleRecall(embeddings: DataFrame, corpusTag: String,
                           nProbes: Int = 10, k: Int = 5): DataFrame = {
    // the oracle unrolls the serve + truth chains at the registered
    // probe set and depth; other values would silently break parity
    // (ADVICE r14 #2) — the churn sweep uses [[recallLegAt]] directly
    require(nProbes == 10 && k == 5,
      "graphLifecycleRecall is oracle-gated at nProbes=10, k=5")
    val spark = embeddings.sparkSession
    val root = servedRootFor(embeddings, corpusTag)
    recallLegAt(spark, s"$root/g2snap", "g2", nProbes, k)
      .unionByName(recallLegAt(spark, currentBase(root), "g3c", nProbes, k))
      .orderBy(col("state"))
  }

  /** One state's recall@k row — the q212 leg, exposed for the churn
    * sweep (which measures at 100 probes, outside the oracle gate). */
  private[llm] def recallLegAt(spark: SparkSession, base: String,
                               state: String, nProbes: Int,
                               k: Int): DataFrame = {
    val live = liveNodesAll(spark, base).localCheckpoint()
    val probes = live.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("qe").as("pe"),
        col("nq").as("pn"))
      .localCheckpoint()
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val truth = live.join(broadcast(probes),
        col("probe_id") =!= col("vec_id"))
      .withColumn("cos", qCos(col("pe"), col("qe"), col("pn"), col("nq")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
    val got = serveStateWith(spark, base, state, probes, k)
      .select(col("probe_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    truth.join(got, Seq("probe_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(lit(state).as("state"), col("n_truth"), col("n_hits"),
        floor(lit(10000.0) * col("n_hits") / col("n_truth"))
          .cast("long").as("recall_bp"))
  }

  /** Test hook: the final served state's live probe rows (vec_id, qe)
    * — StreamingSpec feeds these as micro-batches to prove the q211
    * probe-stream leg ≡ the batch serve. */
  private[graft] def servedFinalProbes(embeddings: DataFrame,
                                       corpusTag: String,
                                       nProbes: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    val base = currentBase(servedRootFor(embeddings, corpusTag))
    liveMembers(spark, base, col("vec_id") < nProbes)
      .select(col("vec_id"), col("qe"))
  }

  /** The q206 ingest leg under Structured Streaming (foreachBatch):
    * arrival micro-batches (vec_id, qe, del — pre-quantized, the q193
    * stream contract) append one node + one edge delta each to the
    * store under `root` (seeded on the first batch from `embeddings`),
    * then run the SAME trigger → from-scratch compaction as the batch
    * lifecycle. StreamingSpec proves the streamed store state ≡ the
    * batch lifecycle's at every generation. Batch numbering continues
    * monotonically past any prior segment (paths never reused). */
  def graphIngestStreamBatch(embeddings: DataFrame, root: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!new java.io.File(s"$root/b0").exists()) {
      val q0 = Similarity.quantized(
        embeddings.select(col("vec_id"), col("embedding")), 1000)
        .localCheckpoint()
      seedStore(q0, s"$root/b0", 0L)
    }
    val base = currentBase(root)
    val g = (0 +: deltaGens(base)).max + 1
    ingestBatch(spark, base, batch, g.toLong)
    maybeCompact(spark, root)
    ()
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle
  // ---------------------------------------------------------------------

  private def qCosSql(a: String, b: String): String =
    s"round(list_sum(list_transform(list_zip($a.qe, $b.qe), " +
      s"z -> z[1] * z[2]))::DOUBLE / ($a.nq * $b.nq), 4)"

  private def qNormSql: String =
    "sqrt(list_sum(list_transform(qe, x -> x * x))::DOUBLE)"

  /** The whole lifecycle recomputed from scratch: frozen two-level
    * chain over the gen-0 corpus (the shared blocked prefix), uniform
    * frozen-rule node cells (`fpdx`), per-generation arrivals with
    * frozen assignments and same-batch visibility, both edge layers per
    * segment, the liveness rule per state, the q193 trigger, and the
    * post-compaction rebuild through the z-prefixed from-scratch
    * chain. */
  /** Shared CTE prefix of the q206 and q211 oracles: the whole
    * lifecycle recomputed from scratch through every state's live
    * node/edge views (`lvn`/`lv`/`lve`), the delta counter `dc`, and
    * the z-prefixed post-compaction rebuild ending in `zn0`/`zes`. */
  private def lifecycleCtes: String = {
    val P = Similarity.BlockCoarseProbes
    val PI = GraphAnn.PoolIn
    val PO = GraphAnn.PoolOut
    val FC = GraphAnn.ForeignCells
    s"""${Similarity.dynamicKBlockedCteSql},
      |n0 AS MATERIALIZED (SELECT q.vec_id, q.qe, o.cluster, $qNormSql AS nq
      |       FROM q JOIN fpdx o USING (vec_id)),
      |ar AS MATERIALIZED (SELECT g.range AS g, q.vec_id,
      |    list_transform(q.qe, x -> x + 500 * g.range) AS qe,
      |    (q.vec_id % 3 = 0) AS del
      |  FROM q CROSS JOIN range(1, 4) g
      |  WHERE q.vec_id % 100 = g.range OR q.vec_id % 100 = 4),
      |agtd AS (SELECT a.g, a.vec_id, c.cluster,
      |    CAST(list_sum(list_transform(range(64), i ->
      |      (a.qe[i + 1] - c.ce[i + 1]) * (a.qe[i + 1] - c.ce[i + 1]))) AS BIGINT) AS dist
      |  FROM (SELECT * FROM ar WHERE NOT del) a CROSS JOIN gc2 c),
      |agtop AS (SELECT g, vec_id, cluster AS ccell FROM
      |    (SELECT *, row_number() OVER (PARTITION BY g, vec_id
      |       ORDER BY dist, cluster) rn FROM agtd) WHERE rn <= $P),
      |acand AS MATERIALIZED (SELECT t.g, t.vec_id, f.cluster,
      |    CAST(list_sum(list_transform(range(64), i ->
      |      (a.qe[i + 1] - f.ce[i + 1]) * (a.qe[i + 1] - f.ce[i + 1]))) AS BIGINT) AS dist
      |  FROM agtop t
      |  JOIN ar a ON a.g = t.g AND a.vec_id = t.vec_id AND NOT a.del
      |  JOIN fc2 f ON f.cluster // (SELECT k FROM kk) = t.ccell),
      |aasg AS MATERIALIZED (SELECT g, vec_id, cluster FROM
      |    (SELECT *, row_number() OVER (PARTITION BY g, vec_id
      |       ORDER BY dist, cluster) rn FROM acand) WHERE rn = 1),
      |nd AS MATERIALIZED (SELECT 0 AS gen, vec_id, qe, cluster, FALSE AS del FROM n0
      |  UNION ALL
      |  SELECT a.g, a.vec_id, a.qe, s.cluster, FALSE
      |  FROM ar a JOIN aasg s ON s.g = a.g AND s.vec_id = a.vec_id
      |  WHERE NOT a.del
      |  UNION ALL
      |  SELECT g, vec_id, qe, -1, TRUE FROM ar WHERE del),
      |lvn AS MATERIALIZED (SELECT s, vec_id, qe, cluster, gen, del, $qNormSql AS nq FROM
      |    (SELECT i.range AS s, nd.*, row_number() OVER (
      |       PARTITION BY i.range, vec_id ORDER BY gen DESC) rn
      |     FROM nd CROSS JOIN range(4) i WHERE gen <= i.range)
      |  WHERE rn = 1),
      |lv AS (SELECT * FROM lvn WHERE NOT del),
      |e0icp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst,
      |    ${qCosSql("a", "b")} AS cos, ${GraphAnn.qdSql("a", "b")} AS qd,
      |    b.qe AS qe
      |  FROM n0 a JOIN n0 b ON a.cluster = b.cluster AND a.vec_id != b.vec_id),
      |e0icp AS MATERIALIZED (SELECT * FROM
      |    (SELECT *, row_number() OVER (PARTITION BY src
      |       ORDER BY cos DESC, dst) rnk FROM e0icp0) WHERE rnk <= $PI),
      |${GraphAnn.alphaPruneSql("e0icp", "e0ick", GraphAnn.DegreeIn)},
      |e0fcl AS (SELECT vec_id, cluster AS fcell FROM
      |    (SELECT d.vec_id, d.cluster, row_number() OVER (PARTITION BY d.vec_id
      |       ORDER BY d.dist, d.cluster) rn
      |     FROM fpd d JOIN fpdx o ON o.vec_id = d.vec_id
      |                           AND d.cluster != o.cluster) WHERE rn <= $FC),
      |e0fcp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst,
      |    ${qCosSql("a", "b")} AS cos, ${GraphAnn.qdSql("a", "b")} AS qd,
      |    b.qe AS qe
      |  FROM n0 a JOIN e0fcl fc ON fc.vec_id = a.vec_id
      |            JOIN n0 b ON b.cluster = fc.fcell),
      |e0fcp AS MATERIALIZED (SELECT * FROM
      |    (SELECT *, row_number() OVER (PARTITION BY src
      |       ORDER BY cos DESC, dst) rnk FROM e0fcp0) WHERE rnk <= $PO),
      |${GraphAnn.alphaPruneSql("e0fcp", "e0fck", GraphAnn.DegreeOut)},
      |av AS MATERIALIZED (SELECT a.g, a.vec_id, a.qe, s.cluster, $qNormSql AS nq
      |  FROM ar a JOIN aasg s ON s.g = a.g AND s.vec_id = a.vec_id
      |  WHERE NOT a.del),
      |ekp0 AS (SELECT a.g, a.vec_id AS src, m.vec_id AS dst,
      |    ${qCosSql("a", "m")} AS cos, ${GraphAnn.qdSql("a", "m")} AS qd,
      |    m.qe AS qe
      |  FROM av a JOIN lv m ON m.s = a.g AND m.cluster = a.cluster
      |                     AND m.vec_id != a.vec_id),
      |ekp AS MATERIALIZED (SELECT * FROM
      |    (SELECT *, row_number() OVER (PARTITION BY g, src
      |       ORDER BY cos DESC, dst) rnk FROM ekp0) WHERE rnk <= $PI),
      |${GraphAnn.alphaPruneSql("ekp", "ekk", GraphAnn.DegreeIn,
          Seq("g", "src"))},
      |afcl AS (SELECT g, vec_id, cluster AS fcell FROM
      |    (SELECT c.g, c.vec_id, c.cluster, row_number() OVER (
      |       PARTITION BY c.g, c.vec_id ORDER BY c.dist, c.cluster) rn
      |     FROM acand c JOIN aasg o ON o.g = c.g AND o.vec_id = c.vec_id
      |                            AND c.cluster != o.cluster) WHERE rn <= $FC),
      |afp0 AS (SELECT a.g, a.vec_id AS src, m.vec_id AS dst,
      |    ${qCosSql("a", "m")} AS cos, ${GraphAnn.qdSql("a", "m")} AS qd,
      |    m.qe AS qe
      |  FROM av a JOIN afcl fc ON fc.g = a.g AND fc.vec_id = a.vec_id
      |            JOIN lv m ON m.s = a.g AND m.cluster = fc.fcell),
      |afp AS MATERIALIZED (SELECT * FROM
      |    (SELECT *, row_number() OVER (PARTITION BY g, src
      |       ORDER BY cos DESC, dst) rnk FROM afp0) WHERE rnk <= $PO),
      |${GraphAnn.alphaPruneSql("afp", "afk", GraphAnn.DegreeOut,
          Seq("g", "src"))},
      |edir AS (SELECT 0 AS seg, src, dst, cos FROM e0ick
      |  UNION ALL SELECT 0, src, dst, cos FROM e0fck
      |  UNION ALL SELECT g, src, dst, cos FROM ekk
      |  UNION ALL SELECT g, src, dst, cos FROM afk),
      |eseg AS MATERIALIZED (SELECT seg, src, dst, cos FROM edir
      |  UNION ALL SELECT seg, dst, src, cos FROM edir),
      |lve AS (SELECT DISTINCT st.range AS s, e.src, e.dst, e.cos
      |  FROM eseg e CROSS JOIN range(4) st
      |  JOIN lvn a ON a.s = st.range AND a.vec_id = e.src
      |  JOIN lvn b ON b.s = st.range AND b.vec_id = e.dst
      |  WHERE e.seg <= st.range AND a.gen <= e.seg AND b.gen <= e.seg
      |    AND NOT a.del AND NOT b.del),
      |dc AS MATERIALIZED (SELECT i.range AS s, count(*) AS c
      |  FROM ar CROSS JOIN range(4) i WHERE g <= i.range GROUP BY i.range),
      |zq AS MATERIALIZED (SELECT vec_id, qe FROM lv WHERE s = 3),
      |${Similarity.twoLevelCtesQ("z", "zq")},
      |zn0 AS MATERIALIZED (SELECT zq.vec_id, zq.qe, o.cluster, $qNormSql AS nq
      |        FROM zq JOIN zfpdx o USING (vec_id)),
      |ze0icp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst,
      |    ${qCosSql("a", "b")} AS cos, ${GraphAnn.qdSql("a", "b")} AS qd,
      |    b.qe AS qe
      |  FROM zn0 a JOIN zn0 b ON a.cluster = b.cluster AND a.vec_id != b.vec_id),
      |ze0icp AS MATERIALIZED (SELECT * FROM
      |    (SELECT *, row_number() OVER (PARTITION BY src
      |       ORDER BY cos DESC, dst) rnk FROM ze0icp0) WHERE rnk <= $PI),
      |${GraphAnn.alphaPruneSql("ze0icp", "ze0ick", GraphAnn.DegreeIn)},
      |ze0fcl AS (SELECT vec_id, cluster AS fcell FROM
      |    (SELECT d.vec_id, d.cluster, row_number() OVER (PARTITION BY d.vec_id
      |       ORDER BY d.dist, d.cluster) rn
      |     FROM zfpd d JOIN zfpdx o ON o.vec_id = d.vec_id
      |                            AND d.cluster != o.cluster) WHERE rn <= $FC),
      |ze0fcp0 AS (SELECT a.vec_id AS src, b.vec_id AS dst,
      |    ${qCosSql("a", "b")} AS cos, ${GraphAnn.qdSql("a", "b")} AS qd,
      |    b.qe AS qe
      |  FROM zn0 a JOIN ze0fcl fc ON fc.vec_id = a.vec_id
      |             JOIN zn0 b ON b.cluster = fc.fcell),
      |ze0fcp AS MATERIALIZED (SELECT * FROM
      |    (SELECT *, row_number() OVER (PARTITION BY src
      |       ORDER BY cos DESC, dst) rnk FROM ze0fcp0) WHERE rnk <= $PO),
      |${GraphAnn.alphaPruneSql("ze0fcp", "ze0fck", GraphAnn.DegreeOut)},
      |zed AS (SELECT src, dst, cos FROM ze0ick
      |  UNION ALL SELECT src, dst, cos FROM ze0fck),
      |zes AS MATERIALIZED (SELECT DISTINCT src, dst, cos FROM
      |    (SELECT src, dst, cos FROM zed
      |     UNION ALL SELECT dst, src, cos FROM zed))""".stripMargin
  }

  val graphLifecycleSql: String = {
    val pct = Similarity.LsmDeltaPct
    s"""$lifecycleCtes,
      |states AS (SELECT 'g' || s::VARCHAR AS state,
      |    (SELECT count(*) FROM lv l WHERE l.s = e.s) AS n_nodes,
      |    count(*) AS n_edges,
      |    (SELECT coalesce(max(c), 0) FROM dc WHERE dc.s = e.s) AS n_delta,
      |    CAST(0 AS BIGINT) AS compacted,
      |    CAST(sum(src * 100000 + dst +
      |      CAST(round(cos * 10000) AS BIGINT)) AS BIGINT) AS checksum
      |  FROM lve e GROUP BY s),
      |g3c AS (SELECT 'g3c' AS state,
      |    (SELECT count(*) FROM zn0) AS n_nodes,
      |    count(*) AS n_edges, CAST(0 AS BIGINT) AS n_delta,
      |    CAST(1 AS BIGINT) AS compacted,
      |    CAST(sum(src * 100000 + dst +
      |      CAST(round(cos * 10000) AS BIGINT)) AS BIGINT) AS checksum
      |  FROM zes
      |  HAVING (SELECT max(c) FROM dc WHERE s = 3) * 100 >
      |         (SELECT count(*) FROM n0) * $pct
      |      OR (SELECT max(c) FROM dc WHERE s = 3) >
      |         ${Similarity.LsmDeltaAbsMax})
      |SELECT state, n_nodes, n_edges, n_delta, compacted, checksum
      |FROM (SELECT * FROM states UNION ALL SELECT * FROM g3c)
      |ORDER BY state""".stripMargin
  }

  /** One unrolled hop of the quantized-domain serve (q211): expand
    * `prev` through `edges`, dedup, rescore against the live corpus
    * (identical re-rounding), keep the beam. */
  private def qHopCte(prev: String, name: String, edges: String,
                      corpus: String, probes: String): String =
    s"""${name}c AS (SELECT DISTINCT probe_id, node FROM
      |    (SELECT probe_id, node FROM $prev
      |     UNION ALL
      |     SELECT b.probe_id, e.dst AS node
      |     FROM $prev b JOIN $edges e ON e.src = b.node)
      |  WHERE node != probe_id),
      |${name}s AS (SELECT c.probe_id, c.node,
      |    round(list_sum(list_transform(list_zip(p.pe, n.qe),
      |      z -> z[1] * z[2]))::DOUBLE / (p.pn * n.nq), 4) AS cos
      |  FROM ${name}c c JOIN $probes p USING (probe_id)
      |                  JOIN $corpus n ON n.vec_id = c.node),
      |$name AS MATERIALIZED (SELECT probe_id, node, cos FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY cos DESC, node) rn FROM ${name}s)
      |  WHERE rn <= ${GraphAnn.Beam})""".stripMargin

  /** One state's full serve chain (q211), all CTEs prefixed `pfx`:
    * probes = live vec_id < 10 with their CURRENT vectors, the
    * two-level seed rank against the store's frozen centroids (`fc`
    * fine with parent via `kk`, `gc` coarse), medoid entries `md`, then
    * the [[GraphAnn.Hops]] unrolled expansions over the live edges `ed`
    * scored against the live corpus `lv`, top-5 — the exact
    * [[GraphAnn.beamFrom]] DAG in the quantized domain. */
  private def serveLegSql(pfx: String, lv: String, ed: String, md: String,
                          fc: String, gc: String, kk: String,
                          state: String): String = {
    def n(s: String) = s"$pfx$s"
    val hops = (1 to GraphAnn.Hops)
      .map(i => qHopCte(n(s"b${i - 1}"), n(s"b$i"), ed, lv, n("p")))
      .mkString(",\n")
    s"""${n("p")} AS MATERIALIZED (SELECT vec_id AS probe_id, qe AS pe, nq AS pn
      |  FROM $lv WHERE vec_id < 10),
      |${n("gcl")} AS (SELECT cluster AS ccell,
      |    list_transform(ce, x -> x::DOUBLE) AS gcent FROM $gc),
      |${n("fcl")} AS (SELECT cluster // (SELECT k FROM $kk) AS parent, cluster,
      |    list_transform(ce, x -> x::DOUBLE) AS centroid FROM $fc),
      |${n("sb")} AS (SELECT
      |    (SELECT greatest(${GraphAnn.SeedCells}, CAST(ceil(${Similarity.IvfProbeFrac} * count(*)) AS BIGINT)) FROM $fc) AS scells,
      |    (SELECT greatest(${GraphAnn.SeedCoarse}, CAST(ceil(0.4 * count(*)) AS BIGINT)) FROM $gc) AS gcells),
      |${n("pgc")} AS (SELECT p.probe_id, p.pe, p.pn, g.ccell,
      |    list_sum(list_transform(list_zip(p.pe, g.gcent), z -> z[1]::DOUBLE * z[2]))
      |      / (p.pn * sqrt(list_sum(list_transform(g.gcent, x -> x * x)))) AS gcos
      |  FROM ${n("p")} p CROSS JOIN ${n("gcl")} g),
      |${n("pgs")} AS (SELECT probe_id, pe, pn, ccell FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY gcos DESC, ccell) grnk FROM ${n("pgc")})
      |  WHERE grnk <= (SELECT gcells FROM ${n("sb")})),
      |${n("pcc")} AS (SELECT s.probe_id, f.cluster,
      |    list_sum(list_transform(list_zip(s.pe, f.centroid), z -> z[1]::DOUBLE * z[2]))
      |      / (s.pn * sqrt(list_sum(list_transform(f.centroid, x -> x * x)))) AS ccos
      |  FROM ${n("pgs")} s JOIN ${n("fcl")} f ON f.parent = s.ccell),
      |${n("selc")} AS (SELECT probe_id, cluster FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY ccos DESC, cluster) crnk FROM ${n("pcc")})
      |  WHERE crnk <= (SELECT scells FROM ${n("sb")})),
      |${n("b0c")} AS (SELECT probe_id, node
      |  FROM ${n("selc")} JOIN $md USING (cluster)
      |  WHERE node != probe_id),
      |${n("b0s")} AS (SELECT c.probe_id, c.node,
      |    round(list_sum(list_transform(list_zip(p.pe, n.qe),
      |      z -> z[1] * z[2]))::DOUBLE / (p.pn * n.nq), 4) AS cos
      |  FROM ${n("b0c")} c JOIN ${n("p")} p USING (probe_id)
      |                     JOIN $lv n ON n.vec_id = c.node),
      |${n("b0")} AS MATERIALIZED (SELECT probe_id, node, cos FROM
      |    (SELECT *, row_number() OVER (PARTITION BY probe_id
      |       ORDER BY cos DESC, node) rn FROM ${n("b0s")})
      |  WHERE rn <= ${GraphAnn.Beam}),
      |$hops,
      |${n("res")} AS (SELECT '$state' AS state, probe_id,
      |    node AS neighbor_id, cos, CAST(rn AS BIGINT) AS rnk
      |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
      |          ORDER BY cos DESC, node) rn FROM ${n(s"b${GraphAnn.Hops}")})
      |  WHERE rn <= 5)""".stripMargin
  }

  /** Oracle for [[graphLifecycleServed]]: the shared lifecycle prefix,
    * then the g2 state's live views + gen-0 medoids live-filtered and
    * the post-compaction z tables, each pushed through the identical
    * unrolled beam chain. */
  val graphLifecycleServedSql: String =
    s"""$lifecycleCtes,
      |lv2 AS MATERIALIZED (SELECT vec_id, qe, cluster, nq
      |  FROM lvn WHERE s = 2 AND NOT del),
      |e2 AS MATERIALIZED (SELECT src, dst, cos FROM lve WHERE s = 2),
      |m0 AS (SELECT cluster, vec_id AS node FROM
      |    (SELECT d.cluster, d.vec_id, row_number() OVER (PARTITION BY d.cluster
      |       ORDER BY d.dist, d.vec_id) rn
      |     FROM fpd d JOIN fpdx o ON o.vec_id = d.vec_id
      |                           AND o.cluster = d.cluster) WHERE rn = 1),
      |m2 AS (SELECT m0.cluster, m0.node FROM m0
      |       JOIN lv2 b ON b.vec_id = m0.node),
      |${serveLegSql("s2", "lv2", "e2", "m2", "fc2", "gc2", "kk", "g2")},
      |zm0 AS (SELECT cluster, vec_id AS node FROM
      |    (SELECT d.cluster, d.vec_id, row_number() OVER (PARTITION BY d.cluster
      |       ORDER BY d.dist, d.vec_id) rn
      |     FROM zfpd d JOIN zfpdx o ON o.vec_id = d.vec_id
      |                            AND o.cluster = d.cluster) WHERE rn = 1),
      |${serveLegSql("zz", "zn0", "zes", "zm0", "zfc2", "zgc2", "zkk", "g3c")}
      |SELECT state, probe_id, neighbor_id, cos, rnk FROM
      |  (SELECT * FROM s2res UNION ALL SELECT * FROM zzres)
      |ORDER BY state, probe_id, rnk""".stripMargin

  /** Per-state brute-force truth over the live corpus (the q35 shape in
    * the quantized domain), reusing the serve leg's probe CTE. */
  private def bruteLegSql(name: String, probes: String,
                          lv: String): String =
    s"""$name AS (SELECT probe_id, neighbor_id FROM
      |    (SELECT p.probe_id, n.vec_id AS neighbor_id,
      |       row_number() OVER (PARTITION BY p.probe_id ORDER BY
      |         round(list_sum(list_transform(list_zip(p.pe, n.qe),
      |           z -> z[1] * z[2]))::DOUBLE / (p.pn * n.nq), 4) DESC,
      |         n.vec_id) rn
      |     FROM $probes p JOIN $lv n ON n.vec_id != p.probe_id)
      |  WHERE rn <= 5)""".stripMargin

  /** Oracle for [[graphLifecycleRecall]]: both serve legs verbatim
    * (the q211 chains), a brute-truth leg per state, q39's left-join +
    * floor scoring. */
  val graphLifecycleRecallSql: String =
    s"""$lifecycleCtes,
      |lv2 AS MATERIALIZED (SELECT vec_id, qe, cluster, nq
      |  FROM lvn WHERE s = 2 AND NOT del),
      |e2 AS MATERIALIZED (SELECT src, dst, cos FROM lve WHERE s = 2),
      |m0 AS (SELECT cluster, vec_id AS node FROM
      |    (SELECT d.cluster, d.vec_id, row_number() OVER (PARTITION BY d.cluster
      |       ORDER BY d.dist, d.vec_id) rn
      |     FROM fpd d JOIN fpdx o ON o.vec_id = d.vec_id
      |                           AND o.cluster = d.cluster) WHERE rn = 1),
      |m2 AS (SELECT m0.cluster, m0.node FROM m0
      |       JOIN lv2 b ON b.vec_id = m0.node),
      |${serveLegSql("s2", "lv2", "e2", "m2", "fc2", "gc2", "kk", "g2")},
      |zm0 AS (SELECT cluster, vec_id AS node FROM
      |    (SELECT d.cluster, d.vec_id, row_number() OVER (PARTITION BY d.cluster
      |       ORDER BY d.dist, d.vec_id) rn
      |     FROM zfpd d JOIN zfpdx o ON o.vec_id = d.vec_id
      |                            AND o.cluster = d.cluster) WHERE rn = 1),
      |${serveLegSql("zz", "zn0", "zes", "zm0", "zfc2", "zgc2", "zkk", "g3c")},
      |${bruteLegSql("t2", "s2p", "lv2")},
      |${bruteLegSql("t3", "zzp", "zn0")},
      |m AS (
      |  SELECT 'g2' AS state, count(*) AS n_truth,
      |    CAST(sum(CASE WHEN g.probe_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      |  FROM t2 t LEFT JOIN s2res g
      |    ON g.probe_id = t.probe_id AND g.neighbor_id = t.neighbor_id
      |  UNION ALL
      |  SELECT 'g3c' AS state, count(*) AS n_truth,
      |    CAST(sum(CASE WHEN g.probe_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      |  FROM t3 t LEFT JOIN zzres g
      |    ON g.probe_id = t.probe_id AND g.neighbor_id = t.neighbor_id)
      |SELECT state, n_truth, n_hits,
      |  CAST(floor(10000.0 * n_hits / n_truth) AS BIGINT) AS recall_bp
      |FROM m ORDER BY state""".stripMargin
}
