package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{decode, encode}

/** String ⇄ bytes codec — the reference's operator #2
  * (`convertStringToBytes`, reference `SparkUtils.scala:49-54`, a UTF-8
  * ByteBuffer round-trip). Two forms: driver-side helpers with the
  * reference's exact semantics, and columnar equivalents (codegen'd
  * built-ins) for use inside plans.
  */
object Codec {

  /** Reference-shape driver-side conversion. */
  def stringToBytes(s: String): Array[Byte] = {
    val bb = ByteBuffer.wrap(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Byte](bb.remaining())
    bb.get(out)
    out
  }

  def bytesToString(b: Array[Byte]): String =
    new String(b, StandardCharsets.UTF_8)

  /** Columnar forms — stay in whole-stage codegen. */
  def stringToBytesCol(c: Column): Column = encode(c, "UTF-8")
  def bytesToStringCol(c: Column): Column = decode(c, "UTF-8")
}
