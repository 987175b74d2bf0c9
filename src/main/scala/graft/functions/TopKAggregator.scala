package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregate (custom-operator ladder tier (b):
  * `Aggregator` + `udaf`, all public API).
  *
  * Keeps the k largest (value, id) pairs, ordered by (value DESC,
  * id ASC) — the deterministic tie-break the oracle uses. State is
  * O(k) per group and combines associatively, so Spark runs it as a
  * partial+final aggregate: each map task ships at most k rows per
  * group instead of the window formulation's full per-group sort of
  * every row. That difference is the entire scale story of "top-k per
  * group" at 100 TB.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) trim(buf :+ in)
    else if (better(in, buf.last)) trim(buf :+ in)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
