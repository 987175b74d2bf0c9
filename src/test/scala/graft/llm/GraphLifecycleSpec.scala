package graft.llm

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GraphLifecycleSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)

  test("lifecycle audit: five states, compaction only at g3, " +
    "delta counter resets, base segments never touched by ingest") {
    val root = Files.createTempDirectory("graft-gannlc").toString
    // mtime pin: capture the base segments' file stamps per state
    // (nodes0 is partitionBy(cluster) since r14 — walk recursively)
    def stamps(): Map[String, Long] = {
      val b0 = new java.io.File(s"$root/b0")
      def walk(f: java.io.File): Array[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).flatMap(walk)
        else Array(f)
      def files(d: String) =
        walk(new java.io.File(b0, d)).filter(_.getName.endsWith(".parquet"))
      (files("nodes0") ++ files("edges0"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    var pinned: Map[String, Long] = Map.empty
    try {
      val out = GraphLifecycle.graphLifecycleTo(emb, root, {
        case "g0" => pinned = stamps()
        case "g1" | "g2" | "g3" =>
          assert(stamps() === pinned,
            "ingest modified a base segment file")
        case _ => ()
      }).collect()
      val states = out.map(_.getString(0)).toSeq
      assert(states === Seq("g0", "g1", "g2", "g3", "g3c"))
      val byState = out.map(r => r.getString(0) -> r).toMap
      // compacted flag only on g3c; delta counter accumulates then resets
      assert(byState("g3c").getLong(4) === 1L)
      assert(Seq("g0", "g1", "g2", "g3").forall(byState(_).getLong(4) === 0L))
      assert(byState("g0").getLong(3) === 0L)
      assert(byState("g1").getLong(3) > 0L)
      assert(byState("g3").getLong(3) > byState("g2").getLong(3))
      assert(byState("g3c").getLong(3) === 0L)
      // compaction preserves the LIVE NODE set (it rebuilds edges, not
      // membership)
      assert(byState("g3c").getLong(1) === byState("g3").getLong(1))
      // every state serves a non-empty graph
      assert(out.forall(_.getLong(2) > 0L))
      // r17 compaction parity (VERDICT r16 next #7): the compaction
      // rebuild writes the EDGE base in the bounded bucketed layout
      // too — file count ≤ the bucket count, like the node base's pin
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val b1 = GraphLifecycle.currentBaseOf(root)
      assert(b1.endsWith("b1"), s"expected compacted base, got $b1")
      val nb = CellStore.bucketCount(
        spark.read.parquet(s"$b1/centroids").count())
      val nEdgeFiles = walk(new java.io.File(s"$b1/edges0"))
        .count(_.getName.endsWith(".parquet"))
      assert(nEdgeFiles <= nb,
        s"$nEdgeFiles compacted edges0 files > $nb buckets")
    } finally graft.FsUtil.deleteRecursively(new java.io.File(root))
  }

  test("liveness contract: no live edge touches a tombstoned or " +
    "stale-vector endpoint; the view is symmetric and self-loop-free") {
    val root = Files.createTempDirectory("graft-gannlv").toString
    try {
      GraphLifecycle.graphLifecycleTo(emb, root)
      val (nodes, edges0) = GraphLifecycle.liveViewAt(spark, root)
      val edges = edges0.localCheckpoint()
      val live = nodes.filter(!col("del")).select(col("vec_id"))
      assert(edges.filter(col("src") === col("dst")).isEmpty)
      assert(edges.select(col("src").as("vec_id")).except(live).isEmpty &&
        edges.select(col("dst").as("vec_id")).except(live).isEmpty,
        "live edge references a non-live node")
      val rev = edges.select(col("dst").as("src"), col("src").as("dst"),
        col("cos"))
      assert(edges.except(rev).isEmpty && rev.except(edges).isEmpty,
        "live view is not symmetric")
    } finally graft.FsUtil.deleteRecursively(new java.io.File(root))
  }

  test("mid-lifecycle liveness: a re-arrived node's pre-arrival edges " +
    "die; tombstoned nodes keep no edges") {
    val root = Files.createTempDirectory("graft-gannml").toString
    try {
      val q0 = Similarity.quantized(
        emb.select(col("vec_id"), col("embedding")), 1000)
      // run only through g1 by driving the pieces directly: seed + one
      // ingest — the mid-lifecycle state the audit rows summarize
      GraphLifecycle.graphIngestStreamBatch(emb, root)(
        GraphLifecycle.arrivalsOf(q0, 1), 0L)
      val (nodes, edges) = GraphLifecycle.liveViewAt(spark, root)
      val arr1 = GraphLifecycle.arrivalsOf(q0, 1).localCheckpoint()
      val dead = arr1.filter(col("del")).select(col("vec_id"))
      assert(edges.join(dead, edges("src") === dead("vec_id")).isEmpty &&
        edges.join(dead, edges("dst") === dead("vec_id")).isEmpty,
        "tombstoned node still has live edges")
      // re-arrived (live) node: every surviving edge touching it must
      // come from its OWN re-insert segment — all gen-0 edges died
      val re = arr1.filter(!col("del")).select(col("vec_id")).localCheckpoint()
      val base = GraphLifecycle.currentBaseOf(root)
      val gen0 = spark.read.parquet(s"$base/edges0")
      val gen0Touching = gen0.join(re,
        gen0("src") === re("vec_id") || gen0("dst") === re("vec_id"))
        .select(col("src"), col("dst"), col("cos"))
      assert(edges.intersect(gen0Touching.distinct()).isEmpty,
        "a stale gen-0 edge of a re-arrived node survived")
    } finally graft.FsUtil.deleteRecursively(new java.io.File(root))
  }

  test("per-batch live-member resolution: equals the corpus-sized view " +
    "filtered to the cells, and the base scan is partition-pruned") {
    val root = Files.createTempDirectory("graft-gannpp").toString
    try {
      val q0 = Similarity.quantized(
        emb.select(col("vec_id"), col("embedding")), 1000)
      // seed + one ingest so deltas exist (the anti-join leg is live)
      GraphLifecycle.graphIngestStreamBatch(emb, root)(
        GraphLifecycle.arrivalsOf(q0, 1), 0L)
      val (nodes, _) = GraphLifecycle.liveViewAt(spark, root)
      val all = nodes.filter(!col("del"))
        .select(col("cluster")).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
      val cells = all.take(math.max(1, all.size / 3))
      val pruned = GraphLifecycle.liveMembersAt(spark, root, cells)
      // (a) semantic pin: pruned view == corpus-sized view ∩ cells
      val expect = nodes.filter(!col("del") && col("cluster").isin(cells: _*))
        .select(col("vec_id"), col("cluster"))
      val got = pruned.select(col("vec_id"), col("cluster"))
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        "liveMembersIn != resolvedNodes filtered to the cells")
      // (b) plan pin (VERDICT r13 #1 acceptance, r16 bucketed layout):
      // the nodes0 scan under the pruned view carries non-empty
      // partition filters on the BUCKET dirs plus the pushed cluster
      // IN-filter (row-group skipping on the in-file sort). nodes0 is
      // the ONLY bucket-partitioned relation in this plan (delta
      // segments are unpartitioned, their scans print
      // `PartitionFilters: []`), so the filters can only sit on the
      // base scan.
      val p = pruned.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\]".r
        .findFirstIn(p).exists(f => f.contains("IN") || f.contains("=")),
        s"nodes0 scan is not partition-pruned on bucket:\n$p")
      assert("PushedFilters: \\[[^\\]]*(In|EqualTo)\\(cluster[^\\]]*\\]".r
        .findFirstIn(p).isDefined,
        s"cluster IN-filter not pushed to the nodes0 scan:\n$p")
      // (c) the pruned base scan must NOT read every cluster partition
      assert(cells.size < all.size,
        "fixture degenerate: pruning set covers every cell")
      // (d) layout pin (VERDICT r15 #1, the GraphAnnSpec pin's
      // lifecycle twin): base data files bounded by the bucket count
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val base = GraphLifecycle.currentBaseOf(root)
      val nFiles = walk(new java.io.File(s"$base/nodes0"))
        .count(_.getName.endsWith(".parquet"))
      val nb = CellStore.bucketCount(
        spark.read.parquet(s"$base/centroids").count())
      assert(nFiles <= nb, s"$nFiles nodes0 files > $nb buckets")
      // (e) r17 edge twins: the serve's pruned per-hop EXPANSION equals
      // the full live edge view joined against the same frontier, the
      // bucketed edge base scan rides DPP, and its file count is
      // bounded like the node base's
      val (nodesAll, edgesAll) = GraphLifecycle.liveViewAt(spark, root)
      // plan-backed frontier over the live nodes of `cells` (a local
      // relation would constant-fold instead of planting DPP); a
      // serve's real frontier is exactly this shape — (probe_id, node,
      // current cell)
      val frontier = nodesAll.filter(!col("del"))
        .filter(col("cluster").isin(cells: _*))
        .select(col("vec_id").as("probe_id"), col("vec_id").as("node"),
          col("cluster").as("cell"))
      val gotE = GraphLifecycle.liveExpandAt(spark, root, frontier)
      val expectE = edgesAll
        .join(frontier.select(col("probe_id"), col("node")),
          col("src") === col("node"))
        .select(col("probe_id"), col("dst").as("node"))
      assert(gotE.select(col("probe_id"), col("node"))
          .except(expectE).isEmpty &&
        expectE.except(gotE.select(col("probe_id"), col("node"))).isEmpty,
        "pruned expansion != full live view joined to the frontier")
      val pe = gotE.queryExecution.executedPlan.toString
      assert(pe.contains("dynamicpruning"),
        s"edges0 scan lost dynamic partition pruning on bucket:\n$pe")
      val nEFiles = walk(new java.io.File(s"$base/edges0"))
        .count(_.getName.endsWith(".parquet"))
      assert(nEFiles <= nb, s"$nEFiles edges0 files > $nb buckets")
    } finally graft.FsUtil.deleteRecursively(new java.io.File(root))
  }

  test("streamed ingest (q206 online) equals the batch lifecycle's " +
    "final store state bit-for-bit, through the compaction boundary") {
    import org.apache.spark.sql.types._
    val rootB = Files.createTempDirectory("graft-gannsb").toString
    val rootS = Files.createTempDirectory("graft-gannss").toString
    val dir = Files.createTempDirectory("graft-gannarr").toString + "/arr"
    try {
      GraphLifecycle.graphLifecycleTo(emb, rootB)
      val q0 = Similarity.quantized(
        emb.select(col("vec_id"), col("embedding")), 1000)
      GraphLifecycle.arrivalsOf(q0, 1).write.parquet(dir)
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("qe", ArrayType(LongType)),
        StructField("del", BooleanType)))
      val q = spark.readStream.schema(schema).parquet(dir)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          GraphLifecycle.graphIngestStreamBatch(emb, rootS)(b, id))
        .start()
      try {
        q.processAllAvailable()
        GraphLifecycle.arrivalsOf(q0, 2).write.mode("append").parquet(dir)
        q.processAllAvailable()
        GraphLifecycle.arrivalsOf(q0, 3).write.mode("append").parquet(dir)
        q.processAllAvailable()
      } finally q.stop()
      // both stores compacted into b1; their resolved views must match
      assert(GraphLifecycle.currentBaseOf(rootB).endsWith("b1"))
      assert(GraphLifecycle.currentBaseOf(rootS).endsWith("b1"))
      val (nb, eb) = GraphLifecycle.liveViewAt(spark, rootB)
      val (ns, es) = GraphLifecycle.liveViewAt(spark, rootS)
      val nbs = nb.select(col("vec_id"), col("cluster"), col("gen"),
        col("del"))
      val nss = ns.select(col("vec_id"), col("cluster"), col("gen"),
        col("del"))
      assert(nss.except(nbs).isEmpty && nbs.except(nss).isEmpty,
        "streamed node view != batch")
      assert(es.except(eb).isEmpty && eb.except(es).isEmpty,
        "streamed edge view != batch")
    } finally Seq(rootB, rootS).foreach(r =>
      graft.FsUtil.deleteRecursively(new java.io.File(r)))
  }
}
