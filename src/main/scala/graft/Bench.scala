package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Queries are forced
  * through the `noop` sink — `count()` would let Catalyst prune
  * projection-only plans down to a row count, benchmarking nothing.
  * A warmup query first pays the one-time codegen/session cost so
  * per-query numbers measure the plans, not JVM warmup.
  *
  * Noise handling (VERDICT r1 #5): the suite runs `SPARK_GRAFT_BENCH_ITERS`
  * times (default 3) and reports the per-query MEDIAN — host contention
  * swings single runs by ±2× (PERF.md). A failed query is excluded from
  * `total` and listed under `failures` instead of folding a sentinel into
  * the headline number. The JSON line goes to stdout AND to BENCH.json in
  * the cwd so the driver can parse it even when a build tool prefixes
  * stdout with log decorations.
  *
  * Burst guard (VERDICT r10 #2): sub-1.5 s queries get 5 samples
  * (spread trips mechanical diffs with noise); heavy queries whose 3
  * samples spread >1.5× max/min get topped up to 5 in two extra
  * shuffled passes. BENCH.json carries the per-query `spread` map and a
  * `noisy_after_topup` count — the run-level contamination verdict; the
  * round-gate rule (which artifact is THE number) is documented in
  * PERF.md §"Round gate".
  *
  * Build-class single-sampling (VERDICT r12 #1): at 206 queries ×
  * 3–5 samples the full suite outgrew the driver's bench window
  * (BENCH_r12.json rc=124, parsed null). The ~42 deterministic
  * build-composites (Lloyd trainers, CC loops, index builds, pipeline
  * compositions — each ≥3 s clean median, together 66% of the suite's
  * median mass) re-pay their full index build per sample, and a
  * deterministic build has no plan-level variance worth 3 samples —
  * so [[buildClass]] queries run EXACTLY ONCE (pass 1 only, excluded
  * from every top-up; spread 1.0 by construction). Targeted
  * SPARK_GRAFT_BENCH_ONLY runs ignore the rule (perf work on a build
  * query wants real samples).
  *
  * Build-single noise guard (VERDICT r13 #3): single-sampling created
  * a blind spot — a contention burst during pass 1 lands unflagged in
  * the headline total. Each single's sample is now cross-checked
  * against its recent full-suite BENCH_HISTORY median ([[BenchGuard]]);
  * >2× re-runs once and reports the min, and a min still >2× counts
  * into `singles_suspect` — the run-level self-report next to
  * `noisy_after_topup`, in both BENCH.json and the short stdout line.
  *
  * Store prewarm (r15): the ServedRoots-backed families pay their
  * one-time index builds in an untimed-but-REPORTED phase before pass
  * 1 (`prewarm` map in BENCH.json), so serve-leg medians measure
  * serving and build attribution no longer depends on the shuffled
  * pass order (r14: q211's median carried the shared ~45 s lifecycle
  * build; the first r15 run: q212 drew it and the singles guard's
  * min-keep discarded it — the build was invisible either way).
  * Skipped for targeted SPARK_GRAFT_BENCH_ONLY runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = PerfConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** One timed run; Left(error) on failure. After each run, release
      * every still-persisted RDD: iterative operators (CC loops, Lloyd
      * blocking) return localCheckpoint'd frames whose blocks no caller
      * can release once the result is consumed, and a fresh run builds
      * fresh RDD ids so cross-run reuse is impossible — without the
      * sweep ~450 runs of a 150-query suite pin thousands of blocks,
      * storage fills, and the LOOP frames of later iterative queries get
      * evicted mid-loop, re-deriving their whole upstream per round
      * (measured: q93 6 s standalone → 125 s late in the r6 driver
      * suite). Production jobs never see this — a job's JVM exits —
      * it is purely a shared-session harness hazard. */
    def once(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      } finally {
        // both layers: clearCache() drops CacheManager's canonical-plan →
        // InMemoryRelation entries (a query that died between persist()
        // and unpersist() would otherwise leave a dead entry that later
        // runs of the same plan silently substitute, timing a degraded
        // plan), and the RDD sweep drops localCheckpoint blocks that
        // clearCache() cannot see
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }

    once("q01_pricing_summary") // warmup: session + codegen paths

    // Store prewarm (r15): every ServedRoots-backed family pays its
    // one-time index build HERE, untimed-by-the-medians but REPORTED
    // (the prewarm map below), so serve-leg samples measure serving
    // deterministically. Before this, WHICH query carried a shared
    // build depended on the shuffled pass order (r14: q211 carried the
    // ~45 s lifecycle build; r15's first run: q212 drew it and the
    // singles guard's min-keep silently discarded it). One entry per
    // physical store: ivf, pq, ivfpq, lsm flat, lsm composed, fuzzy,
    // graph, graph-lifecycle, sq8, ivf-sq8.
    val prewarmNames =
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) Seq.empty[String]
      else Seq("q179_ivf_served", "q183_pq_refine_served",
        "q187_ivfpq_served", "q195_lsm_serve_split", "q198_lsm_composed_split",
        "q200_fuzzy_served", "q203_graph_beam_served", "q206_graph_lifecycle",
        "q215_sq8_served", "q217_ivf_sq8_served", "q226_sq8_lifecycle_served",
        "q233_sq8_lsm_served", "q238_bq_served")
        .filter(SparkEntry.queries.contains)
    // a prewarm Left is NOT dropped (ADVICE r15 #2): a failed store
    // build would otherwise surface nowhere — not in `failures` (the
    // query may pass later by rebuilding in-sample) — and the build
    // cost would silently fall back into whichever timed query rebuilds
    // the store, reintroducing the attribution noise prewarm exists to
    // fix. Failed prewarms are reported under `prewarm_failures`.
    val prewarmRuns: Seq[(String, Either[String, Double])] =
      prewarmNames.map(n => n -> once(n))
    val prewarm: Seq[(String, Double)] =
      prewarmRuns.collect { case (n, Right(t)) => n -> t }
    // name → error message (ADVICE r16 #4: a bare name list forced a
    // re-run just to see WHY a store build failed)
    val prewarmFailures: Seq[(String, String)] =
      prewarmRuns.collect { case (n, Left(e)) => n -> e }

    // Exact all-pairs VALIDATION harnesses (q33 AllPairs/PPJoin Jaccard,
    // q36 label-blocked all-pairs cosine): deliberately quadratic truth
    // paths that validate the production operators (q32 LSH, q38 SRP /
    // q37 IVF). They stay in the oracle-checked suite at oracle SFs, but
    // the bench skips them at sf ≥ 1 — a >10× measured ramp slope is
    // their DEFINITION, not a regression signal (r5 judge Next #5).
    val validationOnly = Set("q33_ngram_jaccard", "q36_embedding_neardup",
      "q144_containment_exact")
    // Deterministic build-composites: every sample re-pays a full index
    // build / training loop / pipeline, so one sample IS the number
    // (see the header). Sorted by r12 clean-gate median; the serve-leg
    // twins (q179/q187/q195/q198/q203...) stay multi-sampled — their
    // builders hit the in-JVM ServedRoots cache after the first call and
    // the serve cost is the tracked number.
    val buildClass = Set(
      "q196_lsm_composed", "q188_lifecycle_retrain", "q193_lsm_vector_index",
      "q182_daily_pipeline", "q197_lsm_composed_served", "q39_ann_recall",
      "q83_curation_pipeline", "q77_semantic_dedup", "q190_ivfpq_lifecycle",
      "q194_lsm_served", "q186_ivfpq_topk", "q191_pq_retrain",
      "q184_vector_lifecycle", "q202_graph_beam_topk", "q174_vector_index",
      "q175_ivf_indexed", "q37_ivf_topk", "q33_ngram_jaccard",
      "q143_etl_lineage", "q204_filtered_ann", "q173_incremental_ingest",
      "q168_leakage_safe_split", "q171_curation_index", "q192_bucketed_merge",
      "q201_knn_graph", "q68_neardup_components", "q93_cluster_keep_best",
      "q94_pagerank", "q172_keep_best_indexed", "q189_pq_lifecycle",
      "q144_containment_exact", "q177_hard_negatives", "q185_pq_refine_fixed",
      "q82_pq_adc", "q178_pq_refine", "q84_bucketed_join", "q147_knn_join",
      "q88_kmeans_lloyd", "q176_fp_index_update", "q181_index_lifecycle",
      "q206_graph_lifecycle", "q208_maxsim_rerank", "q210_graph_recall",
      "q211_graph_lifecycle_served", "q212_lifecycle_recall",
      "q216_ivf_sq8", "q219_filtered_graph", "q222_filtered_ivf_sq8",
      "q225_sq8_lifecycle", "q231_sq8_retrain", "q232_sq8_lsm")
    val sfValue = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble).getOrElse(0.0)
    // Optional regex restriction for targeted perf work (not set by the
    // driver): SPARK_GRAFT_BENCH_ONLY=q93|q77 times just those queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => sfValue >= 1.0 && validationOnly(n))
      .filter(n => only.forall(_.findFirstIn(n).isDefined))
    // iteration-major AND per-pass shuffled (VERDICT r8 #3): whole suite
    // per pass so a contention burst lands on different queries in
    // different passes — and each pass visits the queries in a different
    // deterministic order, so a burst at a fixed offset within every pass
    // (the q45–q55 closing-band failure: alphabetic order put the same
    // contiguous stretch at the same wall-clock point of each pass) still
    // cannot own all of one query's samples.
    def passOrder(pass: Int, ns: Seq[String]): Seq[String] =
      new scala.util.Random(pass.toLong * 0x9e3779b9L).shuffle(ns)
    // build-class queries run in pass 1 only (header rationale); a
    // targeted ONLY run keeps full sampling for them
    val singleSample: Set[String] =
      if (only.isDefined) Set.empty else buildClass
    def passNames(p: Int): Seq[String] =
      if (p == 1) names else names.filterNot(singleSample)
    val baseSamples: Seq[(String, Either[String, Double])] =
      (1 to iters).flatMap(p => passOrder(p, passNames(p)).map(n => n -> once(n)))

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    def mediansOf(samples: Seq[(String, Either[String, Double])]) = {
      val byName = samples.groupBy(_._1)
      names.flatMap { n =>
        val ok = byName.getOrElse(n, Nil).collect { case (_, Right(t)) => t }
        if (ok.nonEmpty) Some(n -> median(ok)) else None
      }
    }

    // Sub-second queries swing >1.7× run-to-run on a contended host, which
    // trips mechanical bench diffs with pure noise (r7 judge: q163/q98).
    // Queries whose 3-run median lands under 1.5 s AND whose 3 samples
    // already disagree (spread > 1.3 — a tight triple needs no more
    // evidence; r13, part of fitting the suite in the driver's window)
    // get topped up to 5 samples, so their reported median is
    // median-of-5; heavyweight queries keep the 3-run cost.
    def spreadOf3(n: String): Double = {
      val ok = baseSamples.collect { case (`n`, Right(t)) => t }
      if (ok.size < 2 || ok.min <= 0) 1.0 else ok.max / ok.min
    }
    val subSecond = mediansOf(baseSamples).collect {
      case (n, t) if t < 1.5 && !singleSample(n) && spreadOf3(n) > 1.3 => n
    }.toSet
    val extraSamples: Seq[(String, Either[String, Double])] =
      if (iters >= 5 || subSecond.isEmpty) Nil
      else (iters + 1 to 5).flatMap(p =>
        passOrder(p, names.filter(subSecond)).map(n => n -> once(n)))

    // Burst guard (VERDICT r10 #2: the r10 round-gate snapshot caught a
    // contention burst long enough to survive median-of-3 — q83 swung
    // 12.8→37.5 s between runs of identical code). Heavy queries whose
    // samples spread more than 1.5× max/min get topped up to 5 samples
    // in two extra shuffled passes, so a burst must own 3 of 5 spaced
    // samples — not 2 of 3 adjacent ones — to move the median. Cost is
    // bounded: only the noisy heavy queries re-run.
    def spreadOf(samples: Seq[(String, Either[String, Double])],
                 n: String): Double = {
      val ok = samples.collect { case (`n`, Right(t)) => t }
      if (ok.size < 2 || ok.min <= 0) 1.0 else ok.max / ok.min
    }
    val withSubsec = baseSamples ++ extraSamples
    val noisy = mediansOf(withSubsec).collect {
      case (n, t) if t >= 1.5 && !singleSample(n) &&
        spreadOf(withSubsec, n) > 1.5 => n
    }.toSet
    val burstSamples: Seq[(String, Either[String, Double])] =
      if (iters >= 5 || noisy.isEmpty) Nil
      else (iters + 11 to iters + 12).flatMap(p =>
        passOrder(p, names.filter(noisy)).map(n => n -> once(n)))

    // In-run noise guard for the single-sampled builds (VERDICT r13 #3;
    // decision logic + rationale in BenchGuard): each single's one
    // sample is cross-checked against its recent full-suite history —
    // >2x its reference median re-runs ONCE and reports the MIN; a min
    // still >2x counts into singles_suspect, so a contaminated run
    // names itself in BENCH.json instead of relying on a manual
    // BENCH_HISTORY diff (r13: 1012.5 s driver vs 496.6 s clean with
    // noisy_after_topup = 0 — adjudicable only by hand).
    val histRef: Map[String, Double] = {
      val p = java.nio.file.Paths.get("BENCH_HISTORY.jsonl")
      if (java.nio.file.Files.exists(p))
        BenchGuard.historyMedians(
          scala.jdk.CollectionConverters.ListHasAsScala(
            java.nio.file.Files.readAllLines(p)).asScala.toSeq, sfDir)
      else Map.empty
    }
    val singleVal: Map[String, Double] = baseSamples.collect {
      case (n, Right(t)) if singleSample(n) => n -> t }.toMap
    val rerunSingles = singleVal.keys.toSeq.sorted
      .filter(n => BenchGuard.needsRerun(singleVal(n), histRef.get(n)))
    val guardSamples: Seq[(String, Either[String, Double])] =
      rerunSingles.map(n => n -> once(n))

    val samplesRaw = withSubsec ++ burstSamples ++ guardSamples
    // min-keep for the guarded singles: a burst only inflates, so the
    // smaller of the two samples is always the closer estimate
    val samples = {
      val minOf = rerunSingles.flatMap { n =>
        val ok = samplesRaw.collect { case (`n`, Right(t)) => t }
        if (ok.isEmpty) None else Some(n -> ok.min)
      }.toMap
      samplesRaw.filterNot { case (n, _) => minOf.contains(n) } ++
        minOf.toSeq.sortBy(_._1).map { case (n, t) =>
          n -> (Right(t): Either[String, Double]) }
    }
    val singlesSuspect = rerunSingles.count { n =>
      val ok = samples.collect { case (`n`, Right(t)) => t }
      ok.nonEmpty && BenchGuard.verdictFor(ok, histRef.get(n))._2
    }
    val byName = samples.groupBy(_._1)
    val medians = mediansOf(samples)
    val failures = names.filter(n => byName(n).forall(_._2.isLeft))
    // per-query max/min spread across ALL samples — the contamination
    // telltale the r10 gate number lacked; a clean run's spreads sit
    // near 1, a burst-contaminated one shows exactly which queries ate it
    val spreads = names.filterNot(failures.contains)
      .map(n => n -> spreadOf(samples, n))
    // median/min — the burst-OWNED-THE-MEDIAN signal the run verdict
    // counts: max/min trips on one slow outlier among 5 (which the
    // median already rejected), median/min > 1.5 means at least half
    // the spaced samples were slow, i.e. the reported number itself is
    // suspect, not just one sample of it
    def medOverMin(n: String): Double = {
      val ok = samples.collect { case (`n`, Right(t)) => t }
      if (ok.isEmpty || ok.min <= 0) 1.0
      else medians.toMap.getOrElse(n, ok.min) / ok.min
    }

    val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) =>
      "\"" + k + "\":" + math.round(v * 100.0) / 100.0 }
      .mkString("{", ",", "}")
    val fs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = medians.map(_._2).sum
    // run-level contamination verdict: heavy queries whose MEDIAN is
    // still >1.5× their best spaced sample AFTER the burst top-up — a
    // burst that owned 3 of 5 spaced samples. A clean run reports ~0
    // even when individual outlier samples leave max/min spreads >1.5
    // (those the median already rejected; they stay visible in `spread`)
    val noisyLeft = medians.count { case (n, t) =>
      t >= 1.5 && medOverMin(n) > 1.5 }
    // "only" tags targeted SPARK_GRAFT_BENCH_ONLY runs explicitly (null on
    // a full run) so bench_diff filters on the flag, not a query-count
    // heuristic that a broad regex could fool (ADVICE r7). Full JSON
    // string escape incl. control chars (Verify.q's rationale: a tab/CR
    // in the env var would break json.loads over the whole history file).
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val onlyTag = only.map(r => jstr(r.regex)).getOrElse("null")
    // sample-count provenance: sub-1.5s queries report median-of-subsecIters
    // while heavy queries report median-of-iters (r8 bench change); the
    // build_single list names the 1-sample build-class queries (r13)
    val subsecIters = if (extraSamples.nonEmpty) 5 else iters
    val bs = names.filter(singleSample).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    // per-query sample provenance (ADVICE r13): the exact topped-up
    // sub-second set and the guard-re-run single set, so BENCH.json
    // readers never have to infer sample counts from the run-level
    // subsec_iters scalar (which only says a top-up happened SOMEWHERE)
    val tu = names.filter(subSecond).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val rr = rerunSingles.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the prewarm walls: first-call store-build + serve per family —
    // the one-time index costs, reported here so they stay visible
    // even though no per-query median carries them
    val pw = prewarm.map { case (k, v) =>
      "\"" + k + "\":" + math.round(v * 100.0) / 100.0 }
      .mkString("{", ",", "}")
    val pwf = prewarmFailures.map { case (n, e) =>
      "\"" + n + "\":" + jstr(e.take(300)) }.mkString("{", ",", "}")
    // cross-round totals stay comparable BY CONSTRUCTION (VERDICT r15
    // #4): the headline `value` holds medians only (prewarm moved the
    // one-time builds out of them in r15), so the build-inclusive
    // number is emitted as its own field instead of a hand-added
    // PERF.md sum that future rounds could silently drop
    val totalWithPrewarm =
      BenchGuard.totalWithPrewarm(total, prewarm.map(_._2))
    val json = s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,""" +
      s""""total_with_prewarm":$totalWithPrewarm,""" +
      s""""subsec_iters":$subsecIters,"noisy_after_topup":$noisyLeft,""" +
      s""""singles_suspect":$singlesSuspect,"singles_rerun":$rr,""" +
      s""""topped_up":$tu,"only":$onlyTag,"build_single":$bs,""" +
      s""""prewarm":$pw,"prewarm_failures":$pwf,""" +
      s""""queries":$qs,"spread":$sp,"failures":$fs,"sf":"$sfDir"}"""
    // a targeted run must not clobber the headline full-suite BENCH.json
    // the driver parses (ADVICE r7); it still lands in the history below
    if (only.isEmpty)
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), json + "\n")
    // Per-round regression grading (r5 judge Next #7): the driver's
    // BENCH_rNN.json keeps only a short stdout tail (the full per-query
    // line was tail-truncated three rounds running), so the per-query
    // map is archived HERE — appended with a wall timestamp so every
    // run of every round stays mechanically diffable in-repo.
    val stamp = java.time.Instant.now().toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
      s"""{"ts":"$stamp",${json.drop(1)}""" + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
    // Driver-parse contract (VERDICT r3 #2): the driver's tail capture
    // truncated the full ~3 KB per-query JSON line three rounds running
    // (BENCH_r0{1,2,3}.json "parsed": null, tail starting mid-object), so
    // the stdout lines must be SHORT — headline numbers only, well under
    // any plausible tail window. The full per-query map lives in
    // BENCH.json on disk. Emit AFTER spark.stop() so no logger writes
    // after it: once behind a grep-stable sentinel, once bare as the
    // absolute final stdout line.
    val short = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""total_with_prewarm":$totalWithPrewarm,""" +
      s""""iters":$iters,"n_queries":${medians.size},""" +
      s""""n_build_single":${names.count(singleSample)},""" +
      s""""noisy_after_topup":$noisyLeft,""" +
      s""""singles_suspect":$singlesSuspect,"failures":$fs,"sf":"$sfDir"}"""
    println(s"BENCH_JSON: $short")
    println(short)
    System.out.flush()
  }
}
