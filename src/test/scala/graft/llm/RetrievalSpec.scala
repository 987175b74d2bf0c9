package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("BM25: scores are positive, k-bounded, and hits ≤ query terms") {
    val out = Retrieval.bm25TopK(docs).collect()
    assert(out.length <= 20 && out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("score_micro") > 0)
      assert(r.getAs[Long]("n_terms_hit") <= 5)
    }
    // descending by score with doc_id tiebreak
    val scores = out.map(r => (-r.getAs[Long]("score_micro"), r.getLong(0)))
    assert(scores.sameElements(scores.sorted))
  }

  test("BM25: a doc containing a rare term outranks one with none of it") {
    // a query of one term: every returned doc must actually contain it
    val out = Retrieval.bm25TopK(docs, terms = Seq("window"), k = 5).collect()
    val withTerm = docs.filter(col("text").contains("window"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(withTerm.contains(r.getLong(0))))
  }

  test("hash classifier: w_sum is the exact sum of per-token pseudo-weights") {
    val out = Retrieval.hashClassifier(docs)
    // recompute one doc by hand through the same SQL functions
    val one = docs.orderBy(col("doc_id")).limit(1)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"),
        (pmod(conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(1001)) - 500).as("w"))
      .groupBy(col("doc_id")).agg(sum(col("w")).as("expect"))
      .head()
    val got = out.filter(col("doc_id") === one.getLong(0)).head()
    assert(got.getAs[Long]("w_sum") === one.getLong(1))
    assert(got.getAs[Boolean]("keep") === (one.getLong(1) > 0))
  }

  test("domain cap: n_kept = min(cap, n_docs) per source") {
    val out = Retrieval.domainCap(docs, cap = 40).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept === math.min(40L, n))
      assert(r.getAs[Long]("kept_quality_bp") >= 0 || kept > 0)
    }
  }

  test("domain cap keeps the highest-quality members") {
    // cap=1: the kept quality mass per source equals that source's max
    val out = Retrieval.domainCap(docs, cap = 1).collect()
    val best = TextAnalysis.qualityScore(docs)
      .select(col("doc_id").as("qid"), col("quality_bp"))
      .join(docs.select(col("doc_id").as("qid"), col("source")), "qid")
      .groupBy(col("source")).agg(max(col("quality_bp")).as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("kept_quality_bp") === best(r.getString(0)))
    }
  }

  test("RRF fusion: union of arms, exact reciprocal-rank arithmetic") {
    val out = Retrieval.rrfFusion(docs, Tables.embeddings(spark, sf)).collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Long])
      val sem = Option(r.get(2)).map(_.asInstanceOf[Long])
      assert(lex.isDefined || sem.isDefined, "doc in neither arm survived")
      val expect = lex.map(v => 1000000L / (60 + v)).getOrElse(0L) +
        sem.map(v => 1000000L / (60 + v)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_micro") === expect)
    }
    // descending by fused score
    val scores = out.map(r => (-r.getAs[Long]("rrf_micro"), r.getLong(0)))
    assert(scores.sameElements(scores.sorted))
  }

  test("RRF fusion: an empty lexical arm degrades to the semantic ranking") {
    // a query term absent from the corpus empties the BM25 arm — every
    // fused row must then carry a null lex_rank and score exactly
    // 10^6 div (60 + sem_rank): proves arm independence, the full-outer
    // union, and the missing-arm-contributes-zero coalescing
    val out = Retrieval.rrfFusion(docs, Tables.embeddings(spark, sf),
      terms = Seq("zzz_not_a_token")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.isNullAt(1), "lex_rank should be null with an empty lex arm")
      val sem = r.getAs[Long]("sem_rank")
      assert(r.getAs[Long]("rrf_micro") === 1000000L / (60 + sem))
    }
  }

  test("rerank (q170): output is a reranked subset of the fused shortlist") {
    val emb = Tables.embeddings(spark, sf)
    val shortlist = Retrieval.rrfFusion(docs, emb, k = 20, depth = 20)
      .collect().map(_.getLong(0)).toSet
    val out = Retrieval.rerankFused(docs, emb).collect()
    assert(out.nonEmpty && out.length <= 10)
    // every reranked doc came from the fused candidate set
    out.foreach(r => assert(shortlist.contains(r.getLong(0))))
    // strictly ordered by the cross-encoder stand-in, ties on doc_id
    val keys = out.map(r => (-r.getAs[Long]("ce_score"), r.getLong(0)))
    assert(keys.sameElements(keys.sorted))
    // batch size must not change scores (the q167 layout-independence
    // contract: batching is an execution detail, not semantics)
    val out1 = Retrieval.rerankFused(docs, emb, batch = 1).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      out1.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }

  test("rerank (q170): the scorer touches only the shortlist, not the corpus") {
    val p = Retrieval.rerankFused(docs, Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    // the ≤shortlist fused frame must broadcast INTO the documents scan
    // (so only shortlist rows reach the batched scorer) and the final
    // top-k must be TakeOrderedAndProject over the scored rows
    assert(p.contains("BroadcastHashJoin"), s"shortlist join not broadcast:\n$p")
    assert(p.contains("MapPartitions"), s"batched scorer seam missing:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"final rank not top-k:\n$p")
    // the scorer must not sit below the join (a corpus-wide model pass):
    // MapPartitions appears exactly once, above the broadcast join
    assert(p.indexOf("MapPartitions") === p.lastIndexOf("MapPartitions"),
      s"more than one scorer pass:\n$p")
    assert(p.indexOf("MapPartitions") < p.indexOf("BroadcastHashJoin"),
      s"scorer planned below the shortlist join:\n$p")
  }
}
