package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable vector-centroid aggregator: the typed `Aggregator[IN, BUF, OUT]`
  * surface (SURVEY.md §2.3 "UDF/UDAF") for corpus statistics over embedding
  * columns. Buffer = (per-dimension double sums, count) — associative and
  * commutative, so Catalyst runs it as partial aggregates map-side and
  * merges buffers across partitions (one shuffle of D doubles per group,
  * regardless of row count — the sketch property that matters at 100 TB).
  *
  * Usable both typed (`ds.groupByKey(...).agg(CentroidAggregator.toColumn)`)
  * and untyped via `functions.udaf` (see spec).
  */
class CentroidAggregator(dim: Int)
  extends Aggregator[Array[Float], CentroidAggregator.Buf, Array[Float]] {
  import CentroidAggregator.Buf

  override def zero: Buf = Buf(new Array[Double](dim), 0L)

  override def reduce(b: Buf, a: Array[Float]): Buf = {
    val n = math.min(b.sums.length, a.length)
    var i = 0
    while (i < n) { b.sums(i) += a(i); i += 1 }
    Buf(b.sums, b.count + 1)
  }

  override def merge(x: Buf, y: Buf): Buf = {
    var i = 0
    while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
    Buf(x.sums, x.count + y.count)
  }

  override def finish(b: Buf): Array[Float] =
    if (b.count == 0L) new Array[Float](dim)
    else b.sums.map(s => (s / b.count).toFloat)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}

object CentroidAggregator {
  final case class Buf(sums: Array[Double], count: Long)
}
