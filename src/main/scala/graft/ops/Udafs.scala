package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregators (SURVEY §2.8 UDAF surface). A Spark
  * `Aggregator` is the distributed-correct custom-aggregation shape: the
  * buffer is explicitly MERGEABLE, so partial aggregates combine
  * map-side first and the merge order never changes the result —
  * the two properties a 1000-executor aggregation needs and an
  * accumulate-only fold does not give.
  */
object Udafs {

  /** Bounded-state k-smallest-values-per-group: the buffer holds at most
    * k elements regardless of group size (a group of 10⁹ rows costs the
    * same state as a group of 10) — the same bounded-sketch discipline
    * as approx_distinct, but exact for its query. Commutative and
    * associative by construction: any merge tree over any partitioning
    * yields the k smallest.
    */
  final class MinK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0, s"k must be positive, got $k")
    def zero: Seq[Long] = Vector.empty
    def reduce(buf: Seq[Long], x: Long): Seq[Long] =
      if (buf.length < k) (buf :+ x).sorted
      else if (x < buf.last) (buf.init :+ x).sorted
      else buf
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).sorted.take(k)
    def finish(buf: Seq[Long]): Seq[Long] = buf
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  /** Column form of [[MinK]] for untyped `groupBy(...).agg(...)`. */
  def minK(c: Column, k: Int): Column =
    udaf(new MinK(k), Encoders.scalaLong).apply(c)
}
