package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GraphAnnSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)

  test("adjacency is symmetric, self-loop-free, and edge-count bounded") {
    val (_, edgesRaw, _, _, _) = GraphAnn.graphFrames(emb)
    val edges = edgesRaw.localCheckpoint()
    assert(edges.filter(col("src") === col("dst")).isEmpty,
      "self loop in adjacency")
    // symmetrization contract: the edge SET equals its own reverse
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"),
      col("cos"))
    assert(edges.except(rev).isEmpty && rev.except(edges).isEmpty,
      "adjacency is not symmetric")
    // ≤ 2·(DegreeIn + DegreeOut) directed rows per node: the α-pruned
    // in-cell + foreign budgets, doubled by symmetrization (the prune
    // and the dedup only shrink)
    val n = emb.count()
    assert(edges.count() <= 2 * n * GraphAnn.Degree)
    // every endpoint is a corpus vector
    val ids = emb.select(col("vec_id"))
    assert(edges.select(col("src").as("vec_id")).except(ids).isEmpty)
  }

  test("medoids: exactly one per populated cell, each a cell member") {
    val (v, _, medoidsRaw, _, _) = GraphAnn.graphFrames(emb)
    val medoids = medoidsRaw.localCheckpoint()
    val nCells = v.select(col("cluster")).distinct().count()
    assert(medoids.count() === nCells)
    assert(medoids.select(col("cluster")).distinct().count() === nCells)
    // membership: (cluster, node) must appear in the blocked corpus
    val miss = medoids.join(
      v.select(col("cluster"), col("vec_id").as("node")),
      Seq("cluster", "node"), "left_anti").count()
    assert(miss === 0, s"$miss medoids are not members of their cell")
  }

  test("beam top-k: shape, rank contract, and no self neighbors") {
    val r = GraphAnn.beamTopK(emb).localCheckpoint()
    assert(r.count() === 50)
    assert(r.filter(col("neighbor_id") === col("probe_id")).isEmpty)
    assert(r.groupBy(col("probe_id")).count()
      .filter(col("count") =!= 5).isEmpty)
    // cos is non-increasing in rnk within each probe
    val a = r.select(col("probe_id"), col("rnk"), col("cos"))
    val b = r.select(col("probe_id"), (col("rnk") - 1).as("rnk"),
      col("cos").as("cos_next"))
    val inversions = a.join(b, Seq("probe_id", "rnk"))
      .filter(col("cos") < col("cos_next")).count()
    assert(inversions === 0)
  }

  test("probe-seeded beam recall@5 clears the graph tier's floor " +
    "(degree-16/beam-96 operating point; PERF.md r13)") {
    val brute = Similarity.cosineTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = GraphAnn.beamTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.55, s"graph beam recall $recall below 5500 bp")
  }

  test("served graph search (q203) equals the recompute bit-for-bit") {
    val recompute = GraphAnn.beamTopK(emb)
    val served = GraphAnn.beamTopKServed(emb, s"gann-spec-$sf")
    assert(served.count() === recompute.count())
    assert(served.except(recompute).isEmpty &&
      recompute.except(served).isEmpty)
  }
}
