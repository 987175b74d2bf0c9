package graft

/** In-run noise guard for the single-sampled build-class bench queries
  * (VERDICT r13 #3). Single-sampling fixed the driver's bench window
  * (r12's rc=124 timeout) but removed every statistical defense for the
  * ~42 build composites — 66% of the suite's median mass: a host
  * contention burst during pass 1 lands unflagged in the headline
  * total (r13: the driver artifact read 1012.5 s vs the 496.6 s clean
  * gate with `noisy_after_topup: 0`; ~516 s of the gap sat in 8
  * single-sampled builds that a hand re-measure put back at their
  * clean medians).
  *
  * The rule, applied by [[Bench]] after pass 1:
  *  - each single's one sample is cross-checked against the query's
  *    recent full-suite history in BENCH_HISTORY.jsonl (same sf,
  *    `only:null` lines — targeted runs are not comparable);
  *  - a sample > [[SuspectFactor]]× its history median re-runs ONCE,
  *    and the reported number is the MIN of the two samples (a
  *    contention burst only inflates; the smaller sample is always the
  *    closer estimate of the plan's cost);
  *  - if even the min stays above the factor, the query counts into
  *    `singles_suspect` in BENCH.json — the run-level self-report a
  *    gate ruling reads INSTEAD of hand-diffing BENCH_HISTORY.
  *
  * Pure decision logic, separated from the harness so the
  * synthetic-contention spec can drive it without a SparkSession or a
  * real history file. History parsing is hand-rolled to the harness's
  * own line format (flat JSON objects whose `queries` map holds plain
  * numbers) — the build has no JSON library on purpose.
  */
object BenchGuard {

  /** Re-run + suspect threshold vs the history median. 2× clears every
    * honest run-to-run swing observed across 13 rounds of
    * BENCH_HISTORY (clean medians move ≤1.5× between rounds even when
    * plans change deliberately) while catching the 3–14× bursts that
    * motivated the guard. */
  val SuspectFactor: Double = 2.0

  /** How many most-recent comparable history lines feed each query's
    * reference median — 3 so one contaminated archived run cannot own
    * the reference. */
  val HistoryDepth: Int = 3

  private val pair = "\"(q[^\"]+)\"\\s*:\\s*([0-9.Ee+-]+)".r

  /** The `queries` map of one BENCH_HISTORY line, or None when the
    * line is not a comparable full-suite run: `"only"` non-null
    * (targeted run) or a different sf dir. */
  private[graft] def queriesOf(line: String, sfDir: String)
      : Option[Map[String, Double]] = {
    if (!line.contains("\"only\":null")) return None
    if (!line.contains(s""""sf":"$sfDir"""")) return None
    val start = line.indexOf("\"queries\":{")
    if (start < 0) return None
    val open = start + "\"queries\":".length
    val close = line.indexOf('}', open)
    if (close < 0) return None
    val body = line.substring(open + 1, close)
    Some(pair.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Per-query reference medians over the last [[HistoryDepth]]
    * comparable lines (newest last in `lines`, as the file is
    * append-only). Queries absent from every comparable line — new
    * registrations — simply have no reference and are never flagged. */
  def historyMedians(lines: Seq[String], sfDir: String)
      : Map[String, Double] = {
    val runs = lines.flatMap(queriesOf(_, sfDir)).takeRight(HistoryDepth)
    runs.flatMap(_.keys).distinct
      .map(q => q -> median(runs.flatMap(_.get(q))))
      .toMap
  }

  /** Does a pass-1 single sample warrant the one re-run? */
  def needsRerun(sample: Double, hist: Option[Double],
                 factor: Double = SuspectFactor): Boolean =
    hist.exists(h => h > 0 && sample > factor * h)

  /** Final adjudication of a single-sampled query: reported value =
    * min over its (1 or 2) samples; suspect iff a reference exists and
    * even the min exceeds factor × reference. */
  def verdictFor(samples: Seq[Double], hist: Option[Double],
                 factor: Double = SuspectFactor): (Double, Boolean) = {
    val best = samples.min
    (best, hist.exists(h => h > 0 && best > factor * h))
  }

  /** The build-inclusive headline (VERDICT r15 #4): medians total plus
    * every successful prewarm wall, the number that stays comparable
    * across rounds whose prewarm set differs — a round that moves a
    * build in or out of prewarm moves seconds between the two terms,
    * never out of the sum. */
  def totalWithPrewarm(mediansTotal: Double,
                       prewarmWalls: Seq[Double]): Double =
    mediansTotal + prewarmWalls.sum
}
