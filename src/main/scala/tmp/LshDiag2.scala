import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup
object LshDiag2 extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","32")
    .config("spark.sql.session.timeZone","UTC").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  val toks = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
  var t0 = System.nanoTime()
  val sig = toks.withColumn("sig",
    transform(sequence(lit(0), lit(63)),
      i => array_min(transform(col("sh"), t => xxhash64(t, i))))).select("doc_id","sig").persist()
  println("SIG_N=" + sig.count() + " SIG_TIME=" + (System.nanoTime()-t0)/1e9)
  t0 = System.nanoTime()
  val bands = sig.select(col("doc_id"),
    explode(transform(sequence(lit(0), lit(15)),
      b => struct(b.as("band_id"),
        xxhash64(slice(col("sig"), b * 4 + 1, lit(4))).as("band_hash")))).as("band"))
    .select(col("doc_id"), col("band.band_id"), col("band.band_hash")).persist()
  println("BANDS_N=" + bands.count() + " BANDS_TIME=" + (System.nanoTime()-t0)/1e9)
  t0 = System.nanoTime()
  val cand = bands.as("x").join(bands.as("y"),
    col("x.band_id") === col("y.band_id") && col("x.band_hash") === col("y.band_hash") &&
      col("x.doc_id") < col("y.doc_id"))
    .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct().persist()
  println("CAND_N=" + cand.count() + " CAND_TIME=" + (System.nanoTime()-t0)/1e9)
  t0 = System.nanoTime()
  val a = toks.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
  val b = toks.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
  val out = cand.join(a, "doc_a").join(b, "doc_b")
    .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
    .withColumn("jaccard", round(col("inter") /
      (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 4))
    .filter(col("jaccard") >= 0.8)
  println("OUT_N=" + out.count() + " VERIFY_TIME=" + (System.nanoTime()-t0)/1e9)
  spark.stop()
}
