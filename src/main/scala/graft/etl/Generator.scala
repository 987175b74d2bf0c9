package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic parallel synthetic row generator — the reference's
  * operator #1 (reference `SparkUtils.scala:102-117`): `records` rows in
  * `slices` contiguous id ranges, schema (id BIGINT, course BINARY,
  * marks BIGINT).
  *
  * Two deliberate deviations from the reference, both documented in
  * SURVEY.md:
  *  - `spark.range(0, records, 1, slices)` reproduces the reference's
  *    partition layout (contiguous ranges, remainder in the last
  *    partition) without a driver-side loop;
  *  - `course` is derived deterministically from the id (md5 bytes)
  *    instead of `UUID.randomUUID()` (reference `SparkUtils.scala:113`) —
  *    the reference's write-then-count re-executes the generator lineage
  *    (`App.scala:244`), silently counting DIFFERENT rows than it wrote.
  *    Determinism makes re-execution safe; callers who need the
  *    write-once semantics additionally get `.cache()` via `generate`.
  */
object Generator {

  def generate(spark: SparkSession, records: Long, slices: Int): DataFrame =
    spark.range(0, records, 1, slices)
      .select(col("id"),
        unhex(md5(col("id").cast("string").cast("binary"))).as("course"),
        col("id").as("marks"))

  /** Oracle over DuckDB's range() — same rows, same order. The binary
    * `course` column is compared as uppercase hex: the driver's pandas
    * comparator cannot sort raw binary (bytearray is unhashable), so the
    * registered query projects `hex(course)` and the oracle mirrors it. */
  def oracleSql(records: Long): String =
    s"""SELECT range AS id, upper(md5(range::VARCHAR)) AS course_hex, range AS marks
       |FROM range($records) ORDER BY id""".stripMargin
}
