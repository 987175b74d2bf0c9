package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM data pipelines (SURVEY.md §2B):
  * token statistics, term frequency, tf-idf, heuristic language ID,
  * quality scoring, canonical fingerprinting. All built-ins — every one
  * is DuckDB-oracle-checkable and codegen'd.
  */
object TextAnalysis {

  private def words(text: Column): Column = split(text, " ")

  /** Language marker sets for the n-gram/stopword-count heuristic. The
    * synthetic corpus shares one vocabulary across langs, so these are
    * configurable markers demonstrating the mechanism (deterministic
    * scoring + argmax), not a trained model. */
  val markers: Map[String, Seq[String]] = Map(
    "de" -> Seq("hash", "batch"), "en" -> Seq("the", "a"),
    "es" -> Seq("data", "row"), "fr" -> Seq("query", "value"),
    "zh" -> Seq("window", "join"))

  /** Shared per-document token statistics, computed once in a JIT'd
    * kernel (interpreted higher-order lambdas cost ~1 ms/doc here —
    * split × aggregate × filter per document; the kernel is ~µs/doc).
    * Downstream queries (token stats, lang-ID, quality) select from
    * this. Marker counts are per-language, in sorted-lang order. */
  final case class DocStats(doc_id: Long, n_tokens: Long, n_distinct: Long,
                            sum_len: Long, has_the: Boolean, n_stop: Long,
                            s_de: Long, s_en: Long, s_es: Long, s_fr: Long,
                            s_zh: Long)

  def docStats(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val markerSets: Array[Set[String]] =
      markers.toSeq.sortBy(_._1).map(_._2.toSet).toArray
    val stopSet: Set[String] = markers.values.flatten.toSet
    graft.Tables.spread(documents.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // limit -1: trailing empties kept, same as the DuckDB oracle's
          // string_split (and Spark SQL split)
          val w = text.split(" ", -1)
          var sumLen = 0L
          var nStop = 0L
          var hasThe = false
          val scores = new Array[Long](markerSets.length)
          val seen = new java.util.HashSet[String](w.length * 2)
          var i = 0
          while (i < w.length) {
            val t = w(i)
            // code points, not UTF-16 units — DuckDB length() counts code
            // points, so astral-plane tokens would otherwise diverge
            sumLen += t.codePointCount(0, t.length)
            if (t == "the") hasThe = true
            if (stopSet.contains(t)) nStop += 1
            var m = 0
            while (m < markerSets.length) {
              if (markerSets(m).contains(t)) scores(m) += 1
              m += 1
            }
            seen.add(t)
            i += 1
          }
          DocStats(id, w.length.toLong, seen.size.toLong, sumLen, hasThe,
            nStop, scores(0), scores(1), scores(2), scores(3), scores(4))
        }
      }
      .toDF()
  }

  /** Per-document token statistics. */
  def tokenStats(documents: DataFrame): DataFrame =
    docStats(documents)
      .join(documents.select(col("doc_id"), col("n_chars")), "doc_id")
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_distinct"),
        round(col("sum_len").cast("double") / col("n_tokens"), 4).as("avg_token_len"),
        col("has_the"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  val tokenStatsSql: String =
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  round(list_sum(list_transform(string_split(text, ' '), t -> length(t)))::DOUBLE
      |        / len(string_split(text, ' ')), 4) AS avg_token_len,
      |  list_contains(string_split(text, ' '), 'the') AS has_the,
      |  n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Global top-20 terms. explode → partial-agg per partition → one small
    * shuffle; top-k via TakeOrderedAndProject. */
  def termFreq(documents: DataFrame, k: Int = 20): DataFrame =
    documents
      .select(explode(words(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)

  val termFreqSql: String =
    """SELECT term, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |GROUP BY term ORDER BY cnt DESC, term LIMIT 20""".stripMargin

  /** tf-idf: top term per document by round(tf * ln(N/df), 4), ties on
    * term. Rounding happens BEFORE ranking so cross-engine ordering is
    * stable. */
  def tfidfTop(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"))
  }

  val tfidfTopSql: String =
    """WITH tf AS (SELECT doc_id, term, count(*) tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) term FROM documents)
      |  GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) df FROM tf GROUP BY term),
      |n AS (SELECT count(*) n_docs FROM documents),
      |scored AS (SELECT doc_id, tf.term, round(tf * ln(n_docs::DOUBLE / df), 4) tfidf
      |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |        ORDER BY tfidf DESC, term) rnk FROM scored)
      |SELECT doc_id, term, tfidf FROM r WHERE rnk = 1 ORDER BY doc_id""".stripMargin

  /** DSIR-style importance weighting for data selection: score each
    * document by how much more its unigram profile resembles a TARGET
    * slice of the corpus (here `source = targetSource`) than the corpus
    * at large — the hashed-n-gram importance-resampling signal used to
    * pick pretraining data that "looks like" a trusted seed set. The
    * textbook score is Σ_w c_doc(w)·ln(p_tgt(w)/p_all(w)); registered
    * here with the sign-preserving exact-integer surrogate
    * weight(w) = cnt_tgt(w)·N_all − cnt_all(w)·N_tgt (the
    * cross-multiplied difference of relative frequencies, the q49
    * technique), so scores are pure int64 arithmetic and hash-identical
    * across engines — no ln() last-ulp coin flips in the keep decision.
    *
    * Scale shape: text is token-exploded twice (per-doc tf and the
    * corpus term table), both immediately map-side combined to at most
    * |vocab| distinct keys per partition; the term-weight table is
    * vocab-sized and BROADCAST into the per-doc scoring join, so no
    * token-level rows ever shuffle on term. At 100 TB swap the int64
    * weights for decimal(38,0) (counts×counts headroom) — the plan
    * shape is unchanged. */
  def importanceWeights(documents: DataFrame, targetSource: String = "src0"): DataFrame = {
    val toks = documents.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ", -1)).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val termStats = toks.groupBy(col("term")).agg(
      count(lit(1)).as("cnt_all"),
      sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("cnt_tgt"))
    val totals = termStats.agg(
      sum(col("cnt_all")).as("n_all"), sum(col("cnt_tgt")).as("n_tgt"))
    val weights = termStats.crossJoin(broadcast(totals))
      .select(col("term"),
        (col("cnt_tgt") * col("n_all") - col("cnt_all") * col("n_tgt")).as("w"))
    tf.join(broadcast(weights), "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("score"))
      .withColumn("keep", col("score") > 0)
      .orderBy(col("doc_id"))
  }

  val importanceWeightsSql: String =
    """WITH t AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
      |ts AS (SELECT term, count(*) AS cnt_all,
      |         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS cnt_tgt
      |       FROM t GROUP BY term),
      |n AS (SELECT CAST(sum(cnt_all) AS BIGINT) AS n_all,
      |             CAST(sum(cnt_tgt) AS BIGINT) AS n_tgt FROM ts),
      |wt AS (SELECT term, CAST(cnt_tgt * n_all - cnt_all * n_tgt AS BIGINT) AS w
      |       FROM ts CROSS JOIN n)
      |SELECT tf.doc_id, CAST(sum(tf.tf * wt.w) AS BIGINT) AS score,
      |       CAST(sum(tf.tf * wt.w) AS BIGINT) > 0 AS keep
      |FROM tf JOIN wt USING (term)
      |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin

  /** Heuristic language ID: per-language marker-token counts (from the
    * docStats kernel), argmax with ties broken by language code. */
  def langId(documents: DataFrame): DataFrame = {
    val langs = markers.keys.toSeq.sorted
    val scored = docStats(documents)
      .join(documents.select(col("doc_id"), col("lang").as("actual_lang")), "doc_id")
    val m = greatest(langs.map(l => col(s"s_$l")): _*)
    // first lang in asc order wins ties — mirrors the oracle's CASE order
    scored.withColumn("pred_lang",
        langs.foldRight(lit("??")) { (l, e) => when(col(s"s_$l") === m, lit(l)).otherwise(e) })
      .select((col("doc_id") +: col("actual_lang") +:
        langs.map(l => col(s"s_$l")) :+ col("pred_lang")): _*)
      .orderBy(col("doc_id"))
  }

  val langIdSql: String = {
    val langs = markers.keys.toSeq.sorted
    val scoreCols = langs.map { l =>
      val in = markers(l).map(m => s"'$m'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($in))) AS s_$l"
    }.mkString(",\n  ")
    val m = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val pred = "CASE " + langs.map(l => s"WHEN s_$l = $m THEN '$l'").mkString(" ") + " END"
    s"""WITH s AS (SELECT doc_id, lang AS actual_lang,
       |  $scoreCols
       |FROM documents)
       |SELECT doc_id, actual_lang, ${langs.map(l => s"s_$l").mkString(", ")},
       |  $pred AS pred_lang
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Quality score: distinct ratio, stopword ratio, mean token length →
    * weighted score in [0,1], keep-flag at 0.5. Ratios come from the
    * docStats kernel; the arithmetic below stays identical to the
    * oracle's (same operation order ⇒ bit-identical doubles). */
  def qualityScore(documents: DataFrame): DataFrame = {
    val s = docStats(documents)
    val nTok = col("n_tokens").cast("double")
    val distinctRatio = col("n_distinct") / nTok
    val stopRatio = col("n_stop") / nTok
    val meanLen = col("sum_len").cast("double") / nTok
    // floor-quantize to basis points: floor() of a bit-identical double is
    // engine-independent, unlike decimal round at .xxxx5 boundaries
    // (Spark rounds the shortest decimal repr HALF_UP; DuckDB rounds the
    // binary value).
    val score = floor((lit(0.3) * distinctRatio + lit(0.4) * (lit(1.0) - stopRatio) +
      lit(0.3) * least(meanLen / 10.0, lit(1.0))) * 10000).cast("long")
    s.select(col("doc_id"),
        col("n_tokens"),
        round(distinctRatio, 4).as("distinct_ratio"),
        round(stopRatio, 4).as("stop_ratio"),
        round(meanLen, 4).as("mean_token_len"),
        score.as("quality_bp"),
        (score >= 5000).as("keep"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreSql: String = {
    val stop = markers.values.flatten.toSeq.sorted.map(m => s"'$m'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |m AS (SELECT doc_id, len(w) AS n_tokens,
       |  len(list_distinct(w))::DOUBLE / len(w) AS dr,
       |  len(list_filter(w, t -> t IN ($stop)))::DOUBLE / len(w) AS sr,
       |  list_sum(list_transform(w, t -> length(t)))::DOUBLE / len(w) AS ml
       |FROM t)
       |SELECT doc_id, n_tokens, round(dr, 4) AS distinct_ratio,
       |  round(sr, 4) AS stop_ratio, round(ml, 4) AS mean_token_len,
       |  CAST(floor((0.3 * dr + 0.4 * (1.0 - sr) + 0.3 * least(ml / 10.0, 1.0)) * 10000) AS BIGINT) AS quality_bp,
       |  CAST(floor((0.3 * dr + 0.4 * (1.0 - sr) + 0.3 * least(ml / 10.0, 1.0)) * 10000) AS BIGINT) >= 5000 AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** BPE-ish tokenizer: regex token classes (letter runs, digit runs,
    * single punctuation) instead of whitespace splitting — the shape a
    * subword tokenizer's pre-tokenization pass has.
    *
    * Runs as a JIT'd kernel: the declarative form evaluated
    * `regexp_extract_all` once per referencing expression (two full regex
    * passes per document — 13 s at sf0.1); the kernel makes ONE matcher
    * pass and counts total + distinct in the same loop. Same
    * `java.util.regex` semantics Spark's regexp functions use. */
  def bpeTokens(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    graft.Tables.spread(documents.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions { it =>
        val p = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
        it.map { case (id, text) =>
          val m = p.matcher(text)
          var n = 0L
          val seen = new java.util.HashSet[String]()
          while (m.find()) { n += 1; seen.add(m.group()) }
          (id, n, seen.size.toLong)
        }
      }
      .toDF("doc_id", "n_bpe_tokens", "n_bpe_distinct")
      .orderBy(col("doc_id"))
  }

  val bpeTokensSql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
      |  len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS n_bpe_distinct
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Rolling (polynomial) document hash over the token stream —
    * order-SENSITIVE, unlike the canonical fingerprint below. Pure
    * modular arithmetic so the DuckDB oracle computes bit-identical
    * values: h = fold(h*31 + tokval) mod 1e9+7, tokval from the token's
    * first char + length.
    *
    * Runs as a JIT'd kernel (the interpreted `aggregate` HOF fold cost
    * ~16 s at sf0.1); integer arithmetic is exact, so the kernel is
    * bit-identical to the declarative form it replaces: split keeps
    * trailing empties (Spark split limit -1), first-char value is the
    * leading code point (Spark `ascii`, 0 for empty), length counts code
    * points (Spark `length` on UTF8String). */
  def rollingHash(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    graft.Tables.spread(documents.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        var h = 0L
        text.split(" ", -1).foreach { t =>
          val first = if (t.isEmpty) 0L else t.codePointAt(0).toLong
          val x = first * 131 + t.codePointCount(0, t.length)
          h = (h * 31 + x) % 1000000007L
        }
        (id, h)
      })
      .toDF("doc_id", "rhash")
      .orderBy(col("doc_id"))
  }

  val rollingHashSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(0::BIGINT,
      |      list_transform(string_split(text, ' '),
      |        t -> (ord(substring(t, 1, 1)) * 131 + length(t))::BIGINT)),
      |    (h, x) -> (h * 31 + x) % 1000000007) AS rhash
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Gopher/C4-style rule-based quality filter: the standard
    * pre-training document gate as hard pass/fail rules rather than the
    * q44 weighted score. Every rule is EXACT INTEGER arithmetic
    * (cross-multiplied ratios, never a float compare), so engine parity
    * holds with no quantization caveats:
    *   r_len    20 <= n_tokens <= 1000
    *   r_word   3 <= mean token length <= 12   (3n <= sum_len <= 12n)
    *   r_stop   at least 2 stopword-marker hits
    *   r_digit  digit-only tokens are <= half of all tokens
    *   r_rep    top bigram takes <= 20% of bigrams (5·top <= n_bigrams;
    *            vacuously true for docs with < 2 tokens)
    *   keep     all of the above
    *
    * One mapPartitions kernel computes every signal in a single pass
    * over the tokens — per-row, shuffle-free; the scan is the cost at
    * 100 TB. */
  def qualityRules(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val stopSet: Set[String] = markers.values.flatten.toSet
    graft.Tables.spread(documents.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = text.split(" ", -1)
          var sumLen = 0L
          var nStop = 0L
          var nDigit = 0L
          var i = 0
          while (i < w.length) {
            val t = w(i)
            sumLen += t.codePointCount(0, t.length)
            if (stopSet.contains(t)) nStop += 1
            var allDigit = t.nonEmpty
            var j = 0
            while (allDigit && j < t.length) {
              if (t.charAt(j) < '0' || t.charAt(j) > '9') allDigit = false
              j += 1
            }
            if (allDigit) nDigit += 1
            i += 1
          }
          val bigrams = new java.util.HashMap[String, Integer]()
          var top = 0
          i = 0
          while (i < w.length - 1) {
            val c = bigrams.merge(w(i) + " " + w(i + 1), 1, (a, b) => a + b)
            if (c > top) top = c
            i += 1
          }
          val n = w.length.toLong
          val nb = math.max(w.length - 1, 0).toLong
          val rLen = n >= 20 && n <= 1000
          val rWord = 3 * n <= sumLen && sumLen <= 12 * n
          val rStop = nStop >= 2
          val rDigit = 2 * nDigit <= n
          val rRep = nb == 0 || 5L * top <= nb
          (id, n, rLen, rWord, rStop, rDigit, rRep,
            rLen && rWord && rStop && rDigit && rRep)
        }
      }
      .toDF("doc_id", "n_tokens", "r_len", "r_word", "r_stop", "r_digit",
        "r_rep", "keep")
      .orderBy(col("doc_id"))
  }

  val qualityRulesSql: String = {
    val stop = markers.values.flatten.toSeq.sorted.map(m => s"'$m'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |m AS (SELECT doc_id, len(w) AS n,
       |  CAST(coalesce(list_sum(list_transform(w, t -> length(t))), 0) AS BIGINT) AS sum_len,
       |  len(list_filter(w, t -> t IN ($stop))) AS n_stop,
       |  len(list_filter(w, t -> regexp_full_match(t, '[0-9]+'))) AS n_digit
       |FROM t),
       |g AS (SELECT doc_id, max(c) AS top, CAST(sum(c) AS BIGINT) AS nb FROM (
       |    SELECT doc_id, bigram, count(*) AS c FROM (
       |      SELECT doc_id, unnest(list_transform(range(len(w) - 1),
       |        j -> w[j+1] || ' ' || w[j+2])) AS bigram FROM t)
       |    GROUP BY doc_id, bigram)
       |  GROUP BY doc_id),
       |f AS (SELECT m.doc_id, m.n AS n_tokens,
       |  (m.n >= 20 AND m.n <= 1000) AS r_len,
       |  (3 * m.n <= m.sum_len AND m.sum_len <= 12 * m.n) AS r_word,
       |  (m.n_stop >= 2) AS r_stop,
       |  (2 * m.n_digit <= m.n) AS r_digit,
       |  (g.doc_id IS NULL OR 5 * g.top <= g.nb) AS r_rep
       |FROM m LEFT JOIN g ON m.doc_id = g.doc_id)
       |SELECT doc_id, n_tokens, r_len, r_word, r_stop, r_digit, r_rep,
       |  (r_len AND r_word AND r_stop AND r_digit AND r_rep) AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Substring-level exact dedup (the suffix-array /
    * "deduplicate-text-datasets" operator family, chunk-granular): cut
    * each document's token stream into non-overlapping `chunk`-token
    * windows, fingerprint each window with the q47 rolling hash, and
    * report per document how many of its chunks repeat ANYWHERE in the
    * corpus (including elsewhere in the same document) — the signal a
    * boilerplate/repeated-span removal pass acts on right after
    * doc-level dedup.
    *
    * 100 TB shape: documents never pair with each other — each doc emits
    * O(tokens/chunk) 16-byte (doc_id, hash) rows and the corpus-wide
    * repetition count is a window count over the 8-byte hash key, so the
    * text is scanned and chunk-hashed exactly ONCE (a self-join
    * formulation would run the kernel per join side) and only the id/hash
    * pairs shuffle — twice (by hash, then by doc). Nothing is all-pairs
    * and no text leaves the executor. The hash arithmetic is the q47
    * kernel's exact modular fold (first-char·131 + codepoint-length,
    * h·31+x mod 1e9+7), so the DuckDB oracle replicates it bit-for-bit. */
  def substringDedup(documents: DataFrame, chunk: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val chunks = graft.Tables.spread(
        documents.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val w = text.split(" ", -1)
        (0 until w.length / chunk).iterator.map { ci =>
          var h = 0L
          var j = ci * chunk
          while (j < (ci + 1) * chunk) {
            val t = w(j)
            val first = if (t.isEmpty) 0L else t.codePointAt(0).toLong
            h = (h * 31 + (first * 131 + t.codePointCount(0, t.length))) % 1000000007L
            j += 1
          }
          (id, h)
        }
      })
      .toDF("doc_id", "chash")
    chunks
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("chash"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("c") > 1, lit(1L)).otherwise(lit(0L))).as("n_rep_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_rep_chunks"),
        floor(lit(10000.0) * col("n_rep_chunks") / col("n_chunks")).cast("long")
          .as("rep_bp"))
      .orderBy(col("doc_id"))
  }

  val substringDedupSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
      |ch AS (
      |  SELECT doc_id, unnest(list_transform(range(len(w) // 8), ci ->
      |    list_reduce(
      |      list_prepend(0::BIGINT,
      |        list_transform(list_slice(w, ci * 8 + 1, ci * 8 + 8),
      |          t -> (ord(substring(t, 1, 1)) * 131 + length(t))::BIGINT)),
      |      (h, x) -> (h * 31 + x) % 1000000007))) AS chash
      |  FROM t),
      |g AS (SELECT chash, count(*) AS c FROM ch GROUP BY chash)
      |SELECT doc_id, count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_chunks,
      |  CAST(floor(10000.0 * sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS rep_bp
      |FROM ch JOIN g USING (chash)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Stopword filter: drop marker stopwords from each document's token
    * stream, reporting the removal count and a content hash of the
    * cleaned text (piiRedact's pattern — the text itself never leaves
    * the executor). Declarative codegen'd higher-order filter; pure
    * per-row work, shuffle-free, the scan is the cost at 100 TB. */
  def stopwordFilter(documents: DataFrame): DataFrame = {
    val stop = markers.values.flatten.toSeq.sorted
    val w = words(col("text"))
    val cleaned = filter(w, t => !t.isInCollection(stop))
    documents.select(
      col("doc_id"),
      (size(w) - size(cleaned)).cast("long").as("n_removed"),
      md5(array_join(cleaned, " ").cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val stopwordFilterSql: String = {
    val stop = markers.values.flatten.toSeq.sorted.map(m => s"'$m'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
       |f AS (SELECT doc_id, w, list_filter(w, t -> t NOT IN ($stop)) AS c FROM t)
       |SELECT doc_id, CAST(len(w) - len(c) AS BIGINT) AS n_removed,
       |  md5(array_to_string(c, ' ')) AS clean_md5
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** q91: RAG/training-window document chunker — overlapping token
    * windows of `size` tokens advancing by `stride` (the standard
    * context-window chunking shape: every token is covered, consecutive
    * chunks overlap by size - stride for boundary continuity). Emits one
    * row per chunk with its token offsets and a content hash in the q47
    * exact modular arithmetic, so the DuckDB oracle replicates the hash
    * bit-for-bit.
    *
    * 100 TB shape: pure flatMap — each document is scanned once in a
    * JIT kernel and emits O(n_tokens/stride) fixed-width rows (id,
    * chunk_id, offsets, 8-byte hash); no shuffle at all before the
    * output sort, no text in the output, nothing pairs. This is the
    * shape that feeds embedding/indexing stages downstream (each chunk
    * row is later joined back by (doc_id, start_tok) to slice the
    * text), so keeping it shuffle-free keeps the whole ingest path
    * scan-bound. */
  def docChunks(documents: DataFrame, size: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val spark = documents.sparkSession
    import spark.implicits._
    graft.Tables.spread(documents.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val w = text.split(" ", -1)
        val n = w.length
        val nChunks = 1 + (if (n > size) (n - size + stride - 1) / stride else 0)
        (0 until nChunks).iterator.map { ci =>
          val start = ci * stride
          val end = math.min(start + size, n)
          var h = 0L
          var j = start
          while (j < end) {
            val t = w(j)
            val first = if (t.isEmpty) 0L else t.codePointAt(0).toLong
            h = (h * 31 + (first * 131 + t.codePointCount(0, t.length))) % 1000000007L
            j += 1
          }
          (id, ci.toLong, start.toLong, (end - start).toLong, h)
        }
      })
      .toDF("doc_id", "chunk_id", "start_tok", "n_toks", "chash")
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val docChunksSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
      |n AS (SELECT doc_id, w, len(w) AS n FROM t),
      |c AS (SELECT doc_id, w, n, unnest(range(
      |        1 + CASE WHEN n > 32 THEN (n - 32 + 23) // 24 ELSE 0 END)) AS chunk_id
      |      FROM n)
      |SELECT doc_id, chunk_id, chunk_id * 24 AS start_tok,
      |  least(32::BIGINT, n - chunk_id * 24) AS n_toks,
      |  list_reduce(list_prepend(0::BIGINT, list_transform(
      |    list_slice(w, chunk_id * 24 + 1, chunk_id * 24 + least(32::BIGINT, n - chunk_id * 24)),
      |    t -> CASE WHEN t = '' THEN 0::BIGINT
      |              ELSE (ord(substring(t, 1, 1)) * 131 + length(t))::BIGINT END)),
      |    (h, x) -> (h * 31 + x) % 1000000007) AS chash
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** q108: tokenizer vocabulary coverage — per document, the fraction of
    * token OCCURRENCES whose term appears in at least `minDf` documents
    * corpus-wide (the in-vocab rate a tokenizer/embedding table would
    * achieve with a df-thresholded vocabulary; 10000 − coverage_bp is
    * the OOV rate). The q42 tf×df machinery pointed at the coverage
    * question.
    *
    * 100 TB shape: doc-term counts are one partial+final aggregate; the
    * df table is vocabulary-sized and BROADCAST into the scoring join;
    * the final per-doc roll-up is a second ordinary aggregate. Nothing
    * pairs, nothing sorts globally. */
  def vocabCoverage(documents: DataFrame, minDf: Long = 5): DataFrame = {
    val dt = documents
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("n"))
    val dfreq = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
    dt.join(broadcast(dfreq), "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(when(col("df") >= minDf, col("n")).otherwise(lit(0L))).as("n_covered"))
      .select(col("doc_id"), col("n_tokens"), col("n_covered"),
        floor(lit(10000.0) * col("n_covered") / col("n_tokens"))
          .cast("long").as("coverage_bp"))
      .orderBy(col("doc_id"))
  }

  val vocabCoverageSql: String =
    """WITH dt AS (SELECT doc_id, t AS term, count(*) AS n
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY doc_id, t),
      |d AS (SELECT term, count(*) AS df FROM dt GROUP BY term)
      |SELECT dt.doc_id, CAST(sum(dt.n) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN d.df >= 5 THEN dt.n ELSE 0 END) AS BIGINT) AS n_covered,
      |  CAST(floor(10000.0 * sum(CASE WHEN d.df >= 5 THEN dt.n ELSE 0 END)
      |    / sum(dt.n)) AS BIGINT) AS coverage_bp
      |FROM dt JOIN d USING (term) GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin

  /** q114: per-document unigram Shannon entropy (nats) — the
    * vocabulary-diversity quality gate: near-zero entropy means the doc
    * is a handful of tokens repeated (boilerplate, keyword stuffing).
    * Complements q71's repetition score, which only sees ADJACENT
    * repeats — entropy catches global degeneracy regardless of order.
    *
    * Entropy is computed as ln(n) − (Σ c·ln c)/n from exact integer
    * token counts, so both engines sum the same ~vocab-sized series;
    * rounding to 6 absorbs summation-order ulps.
    *
    * 100 TB shape: a single mapPartitions kernel — each document's
    * distribution lives in one per-row hashmap, text never leaves the
    * executor, and NOTHING shuffles but the 3-column result (the final
    * orderBy is the presentation sort of a #docs-row frame). The
    * explode-and-groupBy formulation the oracle uses would shuffle
    * one row per token. */
  def tokenEntropy(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    graft.Tables.spread(documents.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val w = text.split(" ", -1)
        val counts = new java.util.HashMap[String, Long](w.length * 2)
        var n = 0L
        var i = 0
        while (i < w.length) {
          val t = w(i)
          if (t.nonEmpty) { n += 1; counts.merge(t, 1L, _ + _) }
          i += 1
        }
        var clnc = 0.0
        val vals = counts.values().iterator()
        while (vals.hasNext) { val c = vals.next().toDouble; clnc += c * math.log(c) }
        val h = if (n == 0L) 0.0 else math.log(n.toDouble) - clnc / n
        (id, n, h)
      })
      .toDF("doc_id", "n_tokens", "entropy")
      .select(col("doc_id"), col("n_tokens"), round(col("entropy"), 6).as("entropy"))
      .orderBy(col("doc_id"))
  }

  val tokenEntropySql: String =
    """WITH tok AS (SELECT doc_id, t AS term FROM
      |    (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE t <> ''),
      |cnt AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
      |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    sum(c * ln(c)) AS clnc FROM cnt GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
      |  round(CASE WHEN a.n_tokens IS NULL THEN 0.0
      |             ELSE ln(a.n_tokens) - a.clnc / a.n_tokens END, 6) AS entropy
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q122: bigram-LM perplexity scoring — the CCNet-style quality
    * filter with a REAL n-gram language model: train add-1-smoothed
    * bigram conditionals over the corpus itself, then score every
    * document by its mean negative log-likelihood. High mean_nll =
    * improbable token sequences (noise, shuffled text); low = fluent
    * under the corpus distribution. This is the principled upgrade of
    * q44's heuristic quality score.
    *
    * P(cur|prev) = (c(prev,cur) + 1) / (c_prefix(prev) + V); every
    * count is an exact int64 and each doc's NLL sums ~distinct-bigram
    * terms, so round(·, 6) absorbs summation-order ulps.
    *
    * 100 TB shape: the LM is built with the q67 pre-combine kernel
    * (per-partition hashmaps emit (bigram, partial) — vocab²-bounded
    * rows per partition, never one row per token); per-doc bigram
    * multisets come out of the same kernel shape compressed to
    * (doc_id, bigram, n); scoring joins BROADCAST the vocab²-bounded
    * LM and context tables, so document rows never shuffle to score.
    * Docs with < 2 tokens surface with n_bigrams = 0 via the left
    * join, not silently dropped. */
  def bigramPerplexity(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val base = documents.select(col("doc_id"), col("text"))
    def bigramMap(w: Array[String]): java.util.HashMap[String, Long] = {
      val m = new java.util.HashMap[String, Long]()
      var i = 0
      while (i < w.length - 1) { m.merge(w(i) + " " + w(i + 1), 1L, _ + _); i += 1 }
      m
    }
    val lm = graft.Tables.spread(base.select(col("text"))).as[String]
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Long]()
        it.foreach { text =>
          bigramMap(text.split(" ", -1)).forEach((k, v) => counts.merge(k, v, _ + _))
        }
        import scala.jdk.CollectionConverters._
        counts.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.toLong))
      }
      .toDF("bigram", "pc").groupBy(col("bigram")).agg(sum(col("pc")).as("c_bg"))
    val ctx = lm.groupBy(substring_index(col("bigram"), " ", 1).as("prev"))
      .agg(sum(col("c_bg")).as("c_prev"))
    val vocabV = broadcast(
      graft.Tables.spread(base.select(col("text"))).as[String]
        .mapPartitions { it =>
          val s = new java.util.HashSet[String]()
          it.foreach(t => t.split(" ", -1).foreach(s.add(_)))
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
        }.toDF("tok").distinct().agg(count(lit(1)).as("vocab")))
    val docBg = graft.Tables.spread(base).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        import scala.jdk.CollectionConverters._
        bigramMap(text.split(" ", -1)).entrySet().iterator().asScala
          .map(e => (id, e.getKey, e.getValue.toLong))
      })
      .toDF("doc_id", "bigram", "n")
    val scored = docBg
      .join(broadcast(lm), "bigram")
      .join(broadcast(ctx),
        substring_index(col("bigram"), " ", 1) === col("prev"))
      .crossJoin(vocabV)
      .select(col("doc_id"), col("n"),
        (col("n") * -log((col("c_bg") + 1).cast("double") /
          (col("c_prev") + col("vocab")))).as("wnll"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"), sum(col("wnll")).as("s"))
    base.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("s") / col("n_bigrams"), lit(0.0)), 6).as("mean_nll"))
      .orderBy(col("doc_id"))
  }

  val bigramPerplexitySql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT doc_id, unnest(list_transform(range(len(w) - 1),
      |    j -> w[j+1] || ' ' || w[j+2])) AS bigram FROM w),
      |lm AS (SELECT bigram, count(*) AS c_bg FROM bg GROUP BY bigram),
      |ctx AS (SELECT string_split(bigram, ' ')[1] AS prev,
      |    CAST(sum(c_bg) AS BIGINT) AS c_prev FROM lm GROUP BY 1),
      |v AS (SELECT count(DISTINCT t) AS vocab FROM
      |    (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
      |db AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY doc_id, bigram),
      |sc AS (SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS n_bigrams,
      |    sum(d.n * -ln((lm.c_bg + 1)::DOUBLE /
      |      (ctx.c_prev + (SELECT vocab FROM v)))) AS s
      |  FROM db d JOIN lm USING (bigram)
      |  JOIN ctx ON ctx.prev = string_split(d.bigram, ' ')[1]
      |  GROUP BY d.doc_id)
      |SELECT doc.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
      |  round(COALESCE(sc.s / sc.n_bigrams, 0.0), 6) AS mean_nll
      |FROM documents doc LEFT JOIN sc ON doc.doc_id = sc.doc_id
      |ORDER BY doc.doc_id""".stripMargin

  /** q126: PMI phrase-merge scoring — the statistic behind BPE/wordpiece
    * merge selection and word2vec phrase detection: for adjacent token
    * pairs with support ≥ minCount, PMI = ln(N·c(a,b) / (c(a)·c(b)))
    * where N is the total bigram count and c(a)/c(b) are the tokens'
    * occurrence counts AS bigram members (left resp. right position).
    * Top pairs by PMI are the candidates a tokenizer build merges next.
    *
    * All counts are exact int64; the single ln per pair is evaluated on
    * an integer-derived ratio — round 6 is presentation only.
    *
    * 100 TB shape: bigram counts come from the q67 pre-combine kernel
    * (vocab²-bounded rows per partition); the unigram margins are
    * GROUP-BYs OF THE BIGRAM TABLE (no second corpus pass); margins
    * broadcast back into the vocab²-bounded pair table; top-k is
    * TakeOrderedAndProject. */
  def pmiPhrases(documents: DataFrame, minCount: Int = 5, k: Int = 30): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val bg = graft.Tables.spread(documents.select(col("text"))).as[String]
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Long]()
        it.foreach { text =>
          val w = text.split(" ", -1)
          var i = 0
          while (i < w.length - 1) { counts.merge(w(i) + " " + w(i + 1), 1L, _ + _); i += 1 }
        }
        import scala.jdk.CollectionConverters._
        counts.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.toLong))
      }
      .toDF("bigram", "pc").groupBy(col("bigram")).agg(sum(col("pc")).as("c_ab"))
      .select(substring_index(col("bigram"), " ", 1).as("a"),
        substring_index(col("bigram"), " ", -1).as("b"), col("c_ab"))
    val left = bg.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    val right = bg.groupBy(col("b")).agg(sum(col("c_ab")).as("c_b"))
    val total = broadcast(bg.agg(sum(col("c_ab")).as("n_total")))
    bg.filter(col("c_ab") >= minCount)
      .join(broadcast(left), "a")
      .join(broadcast(right), "b")
      .crossJoin(total)
      .select(col("a"), col("b"), col("c_ab"),
        round(log((col("n_total") * col("c_ab")).cast("double") /
          (col("c_a") * col("c_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }

  val pmiPhrasesSql: String =
    """WITH bg AS (SELECT string_split(bigram, ' ')[1] AS a,
      |    string_split(bigram, ' ')[2] AS b, CAST(count(*) AS BIGINT) AS c_ab
      |  FROM (SELECT unnest(list_transform(range(len(w) - 1),
      |      j -> w[j+1] || ' ' || w[j+2])) AS bigram
      |    FROM (SELECT string_split(text, ' ') AS w FROM documents))
      |  GROUP BY 1, 2),
      |l AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM bg GROUP BY a),
      |r AS (SELECT b, CAST(sum(c_ab) AS BIGINT) AS c_b FROM bg GROUP BY b),
      |t AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_total FROM bg)
      |SELECT bg.a, bg.b, bg.c_ab,
      |  round(ln(((SELECT n_total FROM t) * bg.c_ab)::DOUBLE / (l.c_a * r.c_b)), 6) AS pmi
      |FROM bg JOIN l USING (a) JOIN r USING (b)
      |WHERE bg.c_ab >= 5
      |ORDER BY pmi DESC, a, b LIMIT 30""".stripMargin

  /** q133: Gopher rep-n family — per document, the fraction of
    * duplicate n-grams for n = 2 and 3 in basis points (exact integer
    * flooring). Complements q49 (which gates on scalar token stats) and
    * q71 (adjacent-repeat score): rep-n catches looping generation /
    * boilerplate that repeats whole phrases non-adjacently — the
    * actual Gopher §A1 repetition table.
    *
    * 100 TB shape: one mapPartitions kernel, both n computed in a
    * single token pass with per-doc hash sets; only four longs per doc
    * leave the executor. */
  def repNgramStats(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    graft.Tables.spread(documents.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val w = text.split(" ", -1)
        def repBp(n: Int): (Long, Long) = {
          val total = math.max(w.length - n + 1, 0)
          if (total == 0) (0L, 0L)
          else {
            val seen = new java.util.HashSet[String](total * 2)
            var i = 0
            while (i <= w.length - n) {
              val sb = new StringBuilder(w(i))
              var j = 1
              while (j < n) { sb.append(' ').append(w(i + j)); j += 1 }
              seen.add(sb.toString)
              i += 1
            }
            (total.toLong, 10000L * (total - seen.size) / total)
          }
        }
        val (t2, r2bp) = repBp(2)
        val (t3, r3bp) = repBp(3)
        (id, t2, r2bp, t3, r3bp)
      })
      .toDF("doc_id", "n_2grams", "rep2_bp", "n_3grams", "rep3_bp")
      .orderBy(col("doc_id"))
  }

  val repNgramStatsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |    greatest(len(w) - 1, 0) AS t2,
      |    len(list_distinct(list_transform(range(greatest(len(w) - 1, 0)),
      |      j -> w[j+1] || ' ' || w[j+2]))) AS d2,
      |    greatest(len(w) - 2, 0) AS t3,
      |    len(list_distinct(list_transform(range(greatest(len(w) - 2, 0)),
      |      j -> w[j+1] || ' ' || w[j+2] || ' ' || w[j+3]))) AS d3
      |  FROM t)
      |SELECT doc_id, CAST(t2 AS BIGINT) AS n_2grams,
      |  CASE WHEN t2 = 0 THEN 0 ELSE (10000 * (t2 - d2)) // t2 END AS rep2_bp,
      |  CAST(t3 AS BIGINT) AS n_3grams,
      |  CASE WHEN t3 = 0 THEN 0 ELSE (10000 * (t3 - d3)) // t3 END AS rep3_bp
      |FROM g ORDER BY doc_id""".stripMargin

  /** q134: language-ID confusion matrix — q43's n-gram-marker
    * classifier evaluated against the declared language label: counts
    * per (actual, predicted) pair. The eval summary a pipeline tracks
    * to decide whether the cheap classifier is good enough to gate on.
    *
    * 100 TB shape: the q43 kernel (one scan pass) followed by a
    * partial+final count to a #langs² frame. */
  def langConfusion(documents: DataFrame): DataFrame =
    langId(documents)
      .groupBy(col("actual_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("actual_lang"), col("pred_lang"))

  val langConfusionSql: String = {
    val langs = markers.keys.toSeq.sorted
    val scoreCols = langs.map { l =>
      val in = markers(l).map(m => s"'$m'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($in))) AS s_$l"
    }.mkString(",\n  ")
    val m = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val pred = "CASE " + langs.map(l => s"WHEN s_$l = $m THEN '$l'").mkString(" ") + " END"
    s"""WITH s AS (SELECT doc_id, lang AS actual_lang,
       |  $scoreCols
       |FROM documents),
       |p AS (SELECT actual_lang, $pred AS pred_lang FROM s)
       |SELECT actual_lang, pred_lang, count(*) AS n
       |FROM p GROUP BY 1, 2 ORDER BY actual_lang, pred_lang""".stripMargin
  }

  /** Canonical document fingerprint: md5 of the sorted distinct token
    * set — groups bag-of-words duplicates regardless of word order. */
  def fingerprint(documents: DataFrame): DataFrame =
    documents
      .withColumn("fp",
        md5(array_join(array_sort(array_distinct(words(col("text")))), " ").cast("binary")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
      .select(col("fp"), col("keeper"), col("n_docs"))
      .orderBy(col("keeper"))

  val fingerprintSql: String =
    """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
      |  min(doc_id) AS keeper, count(*) AS n_docs
      |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin
}
