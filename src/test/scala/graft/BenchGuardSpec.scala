package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-contention drive of the build-single noise rule (VERDICT
  * r13 #3 acceptance): no SparkSession, no real history file — the
  * exact line format Bench appends, with bursts injected where the r13
  * driver run had them. */
class BenchGuardSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  private def line(qs: Map[String, Double], sfDir: String = sf,
                   only: String = "null"): String = {
    val q = qs.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    s"""{"ts":"2026-08-15T00:00:00Z","metric":"total","value":1.0,""" +
      s""""unit":"sec","iters":3,"only":$only,"queries":$q,""" +
      s""""spread":{},"failures":[],"sf":"$sfDir"}"""
  }

  test("history medians: per-query median over the last 3 comparable " +
    "lines; targeted and other-sf lines excluded") {
    val lines = Seq(
      line(Map("q83_x" -> 100.0)), // older than depth-3 for q83
      line(Map("q83_x" -> 10.0, "q144_y" -> 3.5)),
      line(Map("q83_x" -> 30.0), only = "\"q83\""), // targeted: ignored
      line(Map("q83_x" -> 50.0), sfDir = "target/sf1x"), // ramp: ignored
      line(Map("q83_x" -> 12.0, "q144_y" -> 3.7)),
      line(Map("q83_x" -> 11.0, "q144_y" -> 3.6)))
    val m = BenchGuard.historyMedians(lines, sf)
    assert(m("q83_x") === 11.0) // median of (10, 12, 11)
    assert(m("q144_y") === 3.6)
    assert(!m.contains("q_new")) // unseen query: no reference
  }

  test("a clean single needs no re-run; a burst-inflated one does; " +
    "a new query without history is never flagged") {
    val hist = Map("q83_x" -> 11.0)
    assert(!BenchGuard.needsRerun(14.7, hist.get("q83_x"))) // 1.3x: fine
    assert(BenchGuard.needsRerun(213.9, hist.get("q83_x"))) // the r13 burst
    assert(!BenchGuard.needsRerun(213.9, None)) // new query: no reference
  }

  test("verdict: min-keep clears a burst whose re-run lands clean; " +
    "a persistent elevation stays suspect") {
    // r13's q83: 213.9 s driver sample, 10.9 s targeted re-measure
    val (v1, s1) = BenchGuard.verdictFor(Seq(213.9, 10.9), Some(11.0))
    assert(v1 === 10.9 && !s1, "clean re-run must clear the suspect flag")
    // both samples inflated (a genuine regression or a wall of noise):
    // report the min but SAY it is suspect
    val (v2, s2) = BenchGuard.verdictFor(Seq(213.9, 190.0), Some(11.0))
    assert(v2 === 190.0 && s2, "persistent elevation must self-flag")
    // genuine-regression boundary: exactly 2x is not suspect (<= factor)
    val (_, s3) = BenchGuard.verdictFor(Seq(22.0), Some(11.0))
    assert(!s3)
    val (_, s4) = BenchGuard.verdictFor(Seq(22.1), Some(11.0))
    assert(s4)
  }

  test("total_with_prewarm = medians total + every successful prewarm " +
    "wall (VERDICT r15 #4: build costs can never silently drop out of " +
    "the cross-round number)") {
    assert(BenchGuard.totalWithPrewarm(470.6, Seq(57.6, 18.0, 11.9))
      === 470.6 + 87.5)
    // no prewarm phase (targeted runs): the number degrades to the total
    assert(BenchGuard.totalWithPrewarm(470.6, Nil) === 470.6)
  }

  test("line parser survives the real Bench format incl. new fields") {
    val real = """{"ts":"2026-08-15T01:02:03Z","metric":"total",""" +
      """"value":496.6,"unit":"sec","iters":3,"subsec_iters":5,""" +
      """"noisy_after_topup":1,"singles_suspect":0,"singles_rerun":[],""" +
      """"topped_up":["q98_z"],"only":null,"build_single":["q83_x"],""" +
      """"queries":{"q83_x":14.5,"q98_z":0.4},"spread":{"q83_x":1.0},""" +
      s""""failures":[],"sf":"$sf"}"""
    val m = BenchGuard.historyMedians(Seq(real), sf)
    assert(m === Map("q83_x" -> 14.5, "q98_z" -> 0.4))
  }
}
