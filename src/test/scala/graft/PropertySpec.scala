package graft

import graft.functions.Hashing
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

  test("fnv1a64/mix64 are injective-ish on small domains (no easy collisions)") {
    val strs = (0 until 10000).map(i => s"token_$i")
    assert(strs.map(Hashing.fnv1a64).distinct.length === strs.length)
    assert((0L until 10000L).map(Hashing.mix64).distinct.length === 10000)
  }
}
