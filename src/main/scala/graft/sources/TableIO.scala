package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}

/** Source/sink seam mirroring the reference's reader/writer factories
  * (reference `SparkUtils.scala:56-65`): the engine addresses tables
  * through a `format` string plus an option bag, so a different DSv2
  * connector (e.g. a Cassandra bulk reader — an external jar in the
  * reference too, `pom.xml:56-61`) slots in without touching call sites.
  *
  * Built-in formats: parquet (columnar, the at-rest default), csv, json,
  * orc. Reads are schema-on-read (parquet/orc footers; csv/json optional
  * inference) exactly like the reference's server-side schema inference
  * (`SparkUtils.scala:62-65` passes only options, never a schema).
  */
object TableIO {

  /** Reader factory (reference `getReader`, `SparkUtils.scala:62-65`). */
  def reader(spark: SparkSession, format: String,
             options: Map[String, String] = Map.empty): DataFrameReader =
    spark.read.format(format).options(options)

  def load(spark: SparkSession, format: String, path: String,
           options: Map[String, String] = Map.empty): DataFrame =
    reader(spark, format, options).load(path)

  /** Writer factory (reference `getWriter`, `SparkUtils.scala:56-60`) —
    * append mode by default, matching the reference's `mode("append")`. */
  def writer(df: DataFrame, format: String,
             options: Map[String, String] = Map.empty,
             mode: String = "append"): DataFrameWriter[Row] =
    df.write.format(format).mode(mode).options(options)

  def save(df: DataFrame, format: String, path: String,
           options: Map[String, String] = Map.empty,
           mode: String = "append"): Unit =
    writer(df, format, options, mode).save(path)

  /** Round-trip a table between formats (scan → write, no shuffle). */
  def convert(spark: SparkSession, srcFormat: String, srcPath: String,
              dstFormat: String, dstPath: String,
              writeOptions: Map[String, String] = Map.empty): Unit =
    save(load(spark, srcFormat, srcPath), dstFormat, dstPath, writeOptions,
      mode = "overwrite")
}
