package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Order-sensitive exponential moving average over (sortKey1, sortKey2,
  * value) triples: e_1 = x_1, e_n = (1-alpha)*e_{n-1} + alpha*x_n after
  * sorting by the keys.
  *
  * Spark aggregation sees rows in arbitrary order, so the buffer collects
  * and `finish` sorts — the idiomatic Spark shape for the reference's
  * sequential integer EMAs (reference: src/TickHotLoopF32.jl:361-375).
  * For inputs too large to buffer per group, use the two-pass
  * [[graft.operators.Scan]] instead.
  */
class EmaAggregator(alpha: Double)
    extends Aggregator[(Long, Long, Double), Seq[(Long, Long, Double)], Double]
    with Serializable {

  def zero: Seq[(Long, Long, Double)] = Vector.empty

  def reduce(b: Seq[(Long, Long, Double)], a: (Long, Long, Double)): Seq[(Long, Long, Double)] =
    b :+ a

  def merge(b1: Seq[(Long, Long, Double)], b2: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    b1 ++ b2

  def finish(b: Seq[(Long, Long, Double)]): Double = {
    val sorted = b.sortBy(t => (t._1, t._2))
    if (sorted.isEmpty) 0.0
    else sorted.tail.foldLeft(sorted.head._3)((e, x) => (1 - alpha) * e + alpha * x._3)
  }

  // Kryo buffer: product encoders can't encode a bare Seq.
  def bufferEncoder: Encoder[Seq[(Long, Long, Double)]] =
    Encoders.kryo[Seq[(Long, Long, Double)]]

  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
