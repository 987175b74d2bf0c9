package graft

import graft.functions.Hashing
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (SURVEY.md §5.3) via scalacheck run inside
  * scalatest. */
class PropertySpec extends SparkSpec {

  private def check(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("generator: for any (rows, slices) ids are exactly 0 until rows") {
    val gen = for {
      rows <- Gen.choose(1L, 2000L)
      slices <- Gen.choose(1, 8)
    } yield (rows, slices)
    check(Prop.forAllNoShrink(gen) { case (rows, slices) =>
      val ids = etl.Generator.generate(spark, rows, slices)
        .select("id").collect().map(_.getLong(0))
      ids.length == rows && ids.toSet == (0L until rows).toSet
    }, n = 10)
  }

  test("minhash: signature of a set equals itself; supersets only lower mins") {
    val tokens = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))
    check(Prop.forAllNoShrink(tokens, tokens) { (a, b) =>
      val seed = Hashing.seeds(16)
      val ha = a.map(Hashing.fnv1a64).toArray
      val hab = (a ++ b).map(Hashing.fnv1a64).toArray
      val sa = Hashing.minhashSignature(ha, seed)
      val sab = Hashing.minhashSignature(hab, seed)
      // determinism + monotonicity: adding elements can only lower mins
      sa.sameElements(Hashing.minhashSignature(ha, seed)) &&
        sab.zip(sa).forall { case (u, v) => u <= v }
    })
  }

  test("minhash: identical sets agree on every signature position") {
    val tokens = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))
    check(Prop.forAllNoShrink(tokens) { a =>
      val seed = Hashing.seeds(32)
      val h1 = a.map(Hashing.fnv1a64).toArray
      val h2 = scala.util.Random.shuffle(a).map(Hashing.fnv1a64).toArray
      Hashing.minhashSignature(h1, seed)
        .sameElements(Hashing.minhashSignature(h2, seed))
    })
  }

  test("simhash: order-independent and deterministic") {
    val tokens = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))
    check(Prop.forAllNoShrink(tokens) { a =>
      val h1 = a.distinct.map(Hashing.fnv1a64).toArray
      val h2 = scala.util.Random.shuffle(a.distinct).map(Hashing.fnv1a64).toArray
      Hashing.simhash64(h1) == Hashing.simhash64(h2)
    })
  }

  test("ngramJaccard equals the exhaustive reference at any threshold") {
    import spark.implicits._
    // The prefix / size-ratio / positional prunes must be LOSSLESS for
    // every threshold: the pruned+verified output has to equal a plain
    // all-pairs exact-Jaccard reference built from the same shingle
    // kernel. (The FP boundary bug this guards against: ceil of a
    // double-rounded bound dropping exact-boundary pairs.)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    val docGen = Gen.chooseNum(1, 12)
      .flatMap(k => Gen.listOfN(k, Gen.oneOf(vocab))).map(_.mkString(" "))
    val gen = for {
      n <- Gen.chooseNum(5, 15)
      docs <- Gen.listOfN(n, docGen)
      t <- Gen.oneOf(0.5, 0.7, 0.8, 0.9)
    } yield (docs, t)
    check(Prop.forAllNoShrink(gen) { case (docs, t) =>
      val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val got = llm.Dedup.ngramJaccard(df, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val sets = docs.zipWithIndex
        .map { case (s, i) => i.toLong -> Hashing.shingleHashes(s).toSet }
      val want = (for {
        (ia, sa) <- sets
        (ib, sb) <- sets
        if ia < ib
        inter = (sa & sb).size
        jac = inter.toDouble / (sa.size + sb.size - inter)
        r = math.floor(jac * 10000 + 0.5) / 10000
        if r >= t
      } yield (ia, ib, r)).toSet
      got == want
    }, n = 10)
  }

  test("dedup is idempotent: deduping the keepers changes nothing") {
    import spark.implicits._
    val gen = Gen.listOfN(60, Gen.oneOf("aa", "bb", "cc", "dd", "ee f", "gg hh"))
    check(Prop.forAllNoShrink(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = llm.Dedup.exact(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap // keeper -> n
      val keepers = docs.filter(col("doc_id")
        .isin(once.keys.toSeq.map(Long.box): _*))
      val twice = llm.Dedup.exact(keepers).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      // second pass keeps every keeper exactly once
      twice.keySet == once.keySet && twice.values.forall(_ == 1L)
    }, n = 5)
  }

  test("TopKAggregator matches sort-take on arbitrary inputs") {
    val agg = new functions.TopKAggregator(3)
    val gen = Gen.listOf(Gen.zip(Gen.choose(0.0, 100.0), Gen.choose(0L, 50L)))
    check(Prop.forAllNoShrink(gen) { xs =>
      val viaAgg = xs.foldLeft(agg.zero)(agg.reduce)
      val expected = xs.sortWith((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(3)
      agg.finish(viaAgg) == expected
    })
  }

  test("TopKAggregator merge is order-insensitive") {
    val agg = new functions.TopKAggregator(3)
    val gen = Gen.zip(
      Gen.listOf(Gen.zip(Gen.choose(0.0, 10.0), Gen.choose(0L, 20L))),
      Gen.listOf(Gen.zip(Gen.choose(0.0, 10.0), Gen.choose(0L, 20L))))
    check(Prop.forAllNoShrink(gen) { case (a, b) =>
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(ba, bb)) == agg.finish(agg.merge(bb, ba))
    })
  }

  test("fnv1a64/mix64 are injective-ish on small domains (no easy collisions)") {
    val strs = (0 until 10000).map(i => s"token_$i")
    assert(strs.map(Hashing.fnv1a64).distinct.length === strs.length)
    assert((0L until 10000L).map(Hashing.mix64).distinct.length === 10000)
  }

  test("hash split: any doc_id set partitions into the three splits") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 1000000L)).map(_.distinct)
    check(Prop.forAllNoShrink(gen) { ids =>
      val d = ids.map(i => (i, s"text $i", i * 7 % 100 + 1, "en"))
        .toDF("doc_id", "text", "n_chars", "lang")
      val split = llm.Corpus.hashSplit(d).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      split.values.sum == ids.length &&
        split.keySet.subsetOf(Set("train", "val", "test"))
    }, n = 10)
  }

  test("substring dedup reports exact chunk counts and bounded rep_bp") {
    import spark.implicits._
    // tiny alphabet so repeated 8-token chunks actually occur
    val gen = Gen.listOfN(20, Gen.oneOf("a", "b")).map(_.mkString(" "))
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(gen)) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = llm.TextAnalysis.substringDedup(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      out.length == texts.length &&                     // 20 toks → 2 chunks each
        out.forall { case (id, nc, nr, bp) =>
          nc == texts(id.toInt).split(" ", -1).length / 8 &&
            nr >= 0 && nr <= nc &&
            bp == math.floor(10000.0 * nr / nc).toLong
        }
    }, n = 10)
  }

  test("sequence packing conserves docs and tokens at any shard count") {
    import spark.implicits._
    val texts = Gen.nonEmptyListOf(
      Gen.chooseNum(1, 9).map(n => Seq.fill(n)("tok").mkString(" ")))
    check(Prop.forAllNoShrink(texts, Gen.chooseNum(1, 7)) { (ts, shards) =>
      val d = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = llm.Corpus.sequencePack(d, budget = 4, nShards = shards).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      val totalToks = ts.map(_.split(" ", -1).length.toLong).sum
      out.map(_._2).sum == ts.length.toLong &&       // every doc in one bin
        out.map(_._3).sum == totalToks &&            // tokens conserved
        out.forall(_._1 < shards)                    // shard ids in range
    }, n = 10)
  }

  test("repetition score is bounded in (0, 10000] and 10000 iff single bigram") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(gen)) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      llm.Corpus.repetitionScore(d).collect().forall { r =>
        val (top, n, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
        top >= 1 && top <= n && bp > 0 && bp <= 10000 &&
          ((bp == 10000) == (top == n))
      }
    }, n = 10)
  }
}
