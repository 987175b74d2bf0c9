package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("MinHash+LSH finds exactly the exact-Jaccard pairs (recall check)") {
    val docs = Tables.documents(spark, sf)
    val lsh = Dedup.minhashLsh(docs).collect()
    val exact = Dedup.ngramJaccard(docs).collect()
    assert(lsh.map(_.toSeq).toSet === exact.map(_.toSeq).toSet)
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
  }

  test("single-token duplicates pair at jaccard 1.0 via the whole-text fallback") {
    import spark.implicits._
    // docs with <2 tokens get the whole text as their one shingle (the
    // Hashing.shingleHashes fallback); the DuckDB oracles mirror this
    // with a CASE len(w)<2 branch, so both engines report this pair
    val d = Seq((1L, "solo"), (2L, "solo"), (3L, "other words here"))
      .toDF("doc_id", "text")
    for (pairs <- Seq(Dedup.minhashLsh(d), Dedup.ngramJaccard(d))) {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq === Seq((1L, 2L, 1.0)))
    }
  }

  test("exact-boundary J=0.8 pairs survive the prefix/positional prunes") {
    import spark.implicits._
    // A: 29 tokens -> 28 bigrams; B = A + 7 tokens -> 35 bigrams, a
    // superset of A's. J = 28/35 = 0.8 exactly. The unslacked FP overlap
    // bound (ceil(0.8/1.8 * 63) = 29 > 28) used to drop this pair before
    // the exact verify ever saw it.
    val a = (1 to 29).map(i => f"t$i%02d").mkString(" ")
    val b = a + " " + (1 to 7).map(i => s"u$i").mkString(" ")
    val d = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.ngramJaccard(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 0.8)))
  }

  test("containmentExact flags a short doc embedded in a longer one, direction-sensitively") {
    import spark.implicits._
    val base = (1 to 6).map(i => s"c$i").mkString(" ")
    val long = base + " " + (1 to 20).map(i => s"x$i").mkString(" ")
    val d = Seq(
      (1L, base),                      // 5 bigrams, all inside doc 2
      (2L, long),                      // 25 bigrams: C(2→1) = 0.2, below t
      (3L, "unrelated stuff entirely"),
      (4L, "p q r s"), (5L, "p q r s")) // identical: both directions at 1.0
      .toDF("doc_id", "text")
    // the prefix-filter harness catches the short-in-long direction that
    // symmetric banding structurally under-weights (J = 5/25 here)
    val got = Dedup.containmentExact(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0), (4L, 5L, 1.0), (5L, 4L, 1.0)))
    // the banded registered path still finds every symmetric near-dup
    val banded = Dedup.containment(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(banded.toSet.subsetOf(got.toSet), "banding may only drop, never invent")
    assert(banded.toSet.contains((4L, 5L, 1.0)) && banded.toSet.contains((5L, 4L, 1.0)))
  }

  test("containment: banded path ≡ exact prefix-filter path on the fixture corpus") {
    val docs = Tables.documents(spark, sf)
    val banded = Dedup.containment(docs).collect().map(_.toSeq).toSet
    val exact = Dedup.containmentExact(docs).collect().map(_.toSeq).toSet
    assert(banded === exact,
      "LSH-banded candidates must reach every planted containment pair")
    assert(exact.nonEmpty, "fixture should contain planted containment pairs")
  }

  test("containmentExact: df-cutoff is recall-free (cutoff ≡ no-cutoff ≡ hot-everything)") {
    val docs = Tables.documents(spark, sf)
    val none = Dedup.containmentExact(docs, dfCutoff = 0L).collect().map(_.toSeq).toSet
    // cutoff 2: on this dense fixture nearly every shingle is hot → the
    // hot-saturated fallback must carry the recall
    val tiny = Dedup.containmentExact(docs, dfCutoff = 2L).collect().map(_.toSeq).toSet
    // cutoff 25: mixes the non-hot main path and the fallback
    val mid = Dedup.containmentExact(docs, dfCutoff = 25L).collect().map(_.toSeq).toSet
    assert(tiny === none, "df-cutoff=2 changed the answer")
    assert(mid === none, "df-cutoff=25 changed the answer")
  }

  test("simhash: identical texts get identical fingerprints") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "a completely different sentence here"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L) !== sh(3L))
  }

  test("exact dedup groups by text") {
    import spark.implicits._
    val docs = Seq((1L, "aa"), (2L, "aa"), (3L, "bb")).toDF("doc_id", "text")
    val out = Dedup.exact(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L), (3L, 1L)))
  }

  test("normalized dedup collapses case/punctuation/whitespace variants") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello,   World!"), (2L, "hello world"), (3L, "unrelated text"))
      .toDF("doc_id", "text")
    val out = Dedup.normalized(docs)
    assert(out.count() === 2)
    assert(out.filter(col("keeper") === 1 && col("n_copies") === 2).count() === 1)
  }

  test("substring dedup flags repeated 8-token chunks, cross- and within-doc") {
    import spark.implicits._
    val t = (1 to 8).map(i => s"t$i").mkString(" ")   // shared chunk
    val u = (1 to 8).map(i => s"u$i").mkString(" ")   // unique to doc 1
    val w = (1 to 9).map(i => s"w$i").mkString(" ")   // unique, 9 toks → 1 chunk
    val docs = Seq(
      (1L, s"$t $u"),                      // 16 toks: [t-chunk][u-chunk]
      (2L, s"$t extra words here"),        // 11 toks: [t-chunk] only
      (3L, w),                             // 1 chunk, nowhere repeated
      (4L, s"$u $u"),                      // same chunk TWICE within one doc
      (5L, "too short"))                   // < 8 toks: no chunks, absent
      .toDF("doc_id", "text")
    val out = TextAnalysis.substringDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 4's duplicated u-chunk also makes doc 1's u-chunk repeated
    assert(out === Map(
      1L -> ((2L, 2L, 10000L)),
      2L -> ((1L, 1L, 10000L)),
      3L -> ((1L, 0L, 0L)),
      4L -> ((2L, 2L, 10000L))))
  }

  test("fuzzy join (q199): every corrupted key resolves to a clean key " +
      "IDENTICAL to its own — blocking recall is total by construction") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val out = Dedup.fuzzyJoin(docs)
    assert(out.count() === n, "a corrupted key found no match")
    // all clean keys are 40 chars and the corruption deletes exactly one
    // char, so the best achievable distance is exactly 1 — anything else
    // means the true block was missed
    assert(out.filter(col("lev") =!= 1).count() === 0)
    // the matched id may be a twin (duplicate prefix) but its KEY must
    // equal the corrupted row's own clean key
    val keys = docs.select(col("doc_id"),
      expr("substring(text, 1, 40)").as("k"))
    val wrong = out
      .join(keys.select(col("doc_id"), col("k").as("own")), "doc_id")
      .join(keys.select(col("doc_id").as("match_id"), col("k").as("got")),
        "match_id")
      .filter(col("own") =!= col("got"))
    assert(wrong.count() === 0, "matched a key different from the source")
  }

  test("fuzzy served (q200): the stored variant index serves q199's " +
      "answer bit-for-bit, twice (second call hits the session cache)") {
    val docs = Tables.documents(spark, sf)
    val self = Dedup.fuzzyJoin(docs).collect().toSeq
    val served = Dedup.fuzzyJoinServed(docs, s"fuzzy-spec-$sf").collect().toSeq
    assert(served === self)
    val again = Dedup.fuzzyJoinServed(docs, s"fuzzy-spec-$sf").collect().toSeq
    assert(again === self)
  }
}
