package graft.llm

import org.apache.spark.sql.SparkSession

/** Dev-only operating-point sweep for the trained IVF index (VERDICT r8
  * Next #1): measures recall@5 against the brute-force truth and the
  * actual scanned fraction for a (kCells, iters, nProbe) grid, so the
  * registered defaults are a MEASURED production point (target: ≥ 90%
  * recall at ≤ 15% scan), not a guess. Not part of the query surface.
  *
  * Usage: sbt "runMain graft.llm.AnnSweep [sfDir ...]"
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sfDir <- sfDirs) {
      val emb = graft.Tables.embeddings(spark, sfDir)
      val n = emb.count()
      val truth = Similarity.cosineTopK(emb).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"== $sfDir  n=$n  truth=${truth.size}")
      val sqrtN = math.ceil(math.sqrt(n.toDouble)).toInt
      val kGrid = Seq(16, sqrtN, 2 * sqrtN, 4 * sqrtN).distinct.sorted
      for (kCells <- kGrid; iters <- Seq(2, 4, 6)) {
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val (asg, cents) = Similarity.trainLloyd(emb, kCells, iters)
        val probeGrid = Seq(1, 2, 3, 4, 6, 8, 12, 16, 24, 32)
          .filter(p => p <= kCells && p.toDouble / kCells <= 0.30)
        for (nProbe <- probeGrid) {
          val cand = Similarity.ivfCandidates(emb, asg, cents, 10, nProbe).count()
          val frac = cand.toDouble / (10.0 * n)
          val got = Similarity.ivfTopKWith(emb, asg, cents, 10, 5, nProbe)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          val recall = (truth intersect got).size.toDouble / truth.size
          println(f"k=$kCells%4d iters=$iters probe=$nProbe%3d  " +
            f"recall=${recall * 10000}%5.0f bp  scan=${frac * 100}%5.1f%%")
        }
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => before(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}

/** Dev-only recall-vs-R sweep for the FIXED-depth PQ refine (q185,
  * VERDICT r9 Next #6): one shared trained codebook per fixture, then
  * recall@5 at a grid of absolute refine depths R, printed next to the
  * corpus fraction each R buys — the curve PERF.md r10 records so the
  * registered R is a measured point. Not part of the query surface.
  *
  * Usage: sbt "runMain graft.llm.PqSweep [sfDir ...]"
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sfDir <- sfDirs) {
      val emb = graft.Tables.embeddings(spark, sfDir)
      val n = emb.count()
      val truth = Similarity.cosineTopK(emb).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val cb = Similarity.trainPqCodebook(emb)
      println(s"== $sfDir  n=$n  (q178 dynamic depth = ${math.ceil(0.12 * n).toInt})")
      for (r <- Seq(15, 30, 60, 120, 240, 600)) {
        val got = Similarity.pqRefineWith(emb, cb, 10, 5, 16, fixedR = r)
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        val recall = (truth intersect got).size.toDouble / truth.size
        println(f"R=$r%4d  recall=${recall * 10000}%5.0f bp  " +
          f"frac=${100.0 * r / n}%6.2f%%")
      }
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => before(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
