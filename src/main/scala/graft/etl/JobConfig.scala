package graft.etl

/** Config model mirroring the reference's `JobConfiguration`
  * (reference `SparkUtils.scala:120-144`): two string option bags with
  * derived accessors and the same defaults/skip semantics.
  *
  * @param writeOptions sink options; empty map ⇒ the write leg is skipped
  * @param readOptions  source options; empty map ⇒ the read leg is skipped
  */
final case class JobConfig(
    writeOptions: Map[String, String] = Map.empty,
    readOptions: Map[String, String] = Map.empty,
    defaultParallelism: Int = 1) {

  /** Rows to generate; default 10 000 (reference `SparkUtils.scala:121`). */
  def rowCount: Long = writeOptions.get("rows").map(_.toLong).getOrElse(10000L)

  /** Generator slices; default = cluster parallelism
    * (reference `SparkUtils.scala:127`). */
  def splits: Int = writeOptions.get("splits").map(_.toInt).getOrElse(defaultParallelism)

  /** Skip semantics (reference `SparkUtils.scala:68-69`, `:77`, `:95`). */
  def shouldWrite: Boolean = writeOptions.nonEmpty
  def shouldRead: Boolean = readOptions.nonEmpty

  /** Cap on rows per output file; reference #9's `maxRowsPerFile(100000)`
    * (reference `App.scala:68`). */
  def maxRecordsPerFile: Int =
    writeOptions.get("maxRecordsPerFile").map(_.toInt).getOrElse(100000)

  def writePath: Option[String] = writeOptions.get("path")
  def readPath: Option[String] = readOptions.get("path")
}
