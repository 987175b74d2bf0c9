package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TokenizerOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("BPE merge round: pair counts match a hand computation on a tiny frame") {
    import spark.implicits._
    val tiny = Seq((1L, "abab cd"), (2L, "ab")).toDF("doc_id", "text")
    val got = TokenizerOps.bpeMergeRound(tiny, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abab": ab, ba, ab; "cd": cd; "ab": ab  →  ab:3, ba:1, cd:1
    assert(got === Map("ab" -> 3L, "ba" -> 1L, "cd" -> 1L))
  }

  test("BPE merge round on the corpus: descending, k-bounded, 2-char pairs") {
    val out = TokenizerOps.bpeMergeRound(docs).collect()
    assert(out.length === 20)
    out.foreach(r => assert(r.getString(0).length === 2))
    val counts = out.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("length buckets: ntile parity with the window form, and fill_bp sane") {
    import org.apache.spark.sql.expressions.Window
    val expect = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("t"))
      .withColumn("bucket",
        ntile(10).over(Window.orderBy(col("t"), col("doc_id"))).cast("long"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = TokenizerOps.lengthBucketBatching(docs).collect()
    assert(out.map(r => r.getLong(0) -> r.getAs[Long]("n_docs")).toMap === expect)
    out.foreach { r =>
      val bp = r.getAs[Long]("fill_bp")
      assert(bp > 0 && bp <= 10000)
    }
  }

  test("length buckets: no single-partition window in the plan") {
    val p = TokenizerOps.lengthBucketBatching(docs).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), s"global window crept back in:\n$p")
  }

  test("batch embed: energy equals the md5-byte recomputation") {
    val out = TokenizerOps.batchEmbed(docs).head()
    val expect = docs.select(
        expr("""aggregate(transform(sequence(0, 7), i ->
          |  CASE WHEN conv(substring(md5(cast(text AS BINARY)), 2*i + 1, 2), 16, 10) > 127
          |    THEN cast(conv(substring(md5(cast(text AS BINARY)), 2*i + 1, 2), 16, 10) AS BIGINT) - 256
          |    ELSE cast(conv(substring(md5(cast(text AS BINARY)), 2*i + 1, 2), 16, 10) AS BIGINT) END),
          |  0L, (s, x) -> s + x * x)""".stripMargin).as("e"))
      .agg(sum(col("e"))).head().getLong(0)
    assert(out.getAs[Long]("emb_energy") === expect)
    assert(out.getAs[Long]("n_docs") === docs.count())
  }

  test("batch embed: output is layout-independent (1 vs 8 partitions)") {
    val a = TokenizerOps.batchEmbed(docs.coalesce(1)).head()
    val b = TokenizerOps.batchEmbed(docs.repartition(8), batch = 7).head()
    assert(a.getAs[Long]("emb_energy") === b.getAs[Long]("emb_energy"))
    assert(a.getAs[Long]("dim0_mass") === b.getAs[Long]("dim0_mass"))
    assert(a.getAs[Long]("n_docs") === b.getAs[Long]("n_docs"))
  }
}
