package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed UDAFs over embedding columns (SURVEY.md §2 Part B row
  * "UDF/UDAF/UDTF" — the reference has no expression layer at all).
  *
  * [[CentroidAgg]] computes a per-group mean vector in ONE pass over the
  * rows: buffer = (elementwise running sum, count). The composable
  * alternative (posexplode → groupBy(cell, dim) → avg, used by the
  * oracle-checked q41) multiplies the shuffled row count by the vector
  * dimensionality — 64 dims ⇒ 64× the shuffle. At 100 TB the Aggregator
  * shuffles one buffer per (group × partition) instead: partial
  * aggregation happens map-side exactly like a built-in agg, because
  * `Aggregator` IS the built-in agg contract (merge is associative).
  */
object VectorAggregates {

  /** (sum[dim], count) buffer; merge is elementwise — associative and
    * commutative, so Spark can combine partials in any order. */
  final case class VecBuf(sums: Array[Double], n: Long)

  class CentroidAgg extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: VecBuf, v: Seq[Float]): VecBuf = {
      if (v == null) return b
      val s = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
      var i = 0
      while (i < v.length && i < s.length) { s(i) += v(i); i += 1 }
      VecBuf(s, b.n + 1)
    }

    override def merge(a: VecBuf, b: VecBuf): VecBuf = {
      if (a.sums.isEmpty) return b
      if (b.sums.isEmpty) return a
      val s = a.sums.clone()
      var i = 0
      while (i < s.length && i < b.sums.length) { s(i) += b.sums(i); i += 1 }
      VecBuf(s, a.n + b.n)
    }

    override def finish(r: VecBuf): Seq[Double] =
      if (r.n == 0) Seq.empty else r.sums.map(_ / r.n).toSeq

    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** The centroid aggregation as a `Column`, usable in any `agg(...)`. */
  def centroidOf(vec: Column): Column = udaf(new CentroidAgg).apply(vec)

  /** One-pass per-cell centroids — the scale path for
    * [[graft.llm.Similarity.centroids]] (same values, un-exploded layout;
    * equality asserted in DedupSpec). */
  def centroidsOnePass(vectors: DataFrame, cellCol: String): DataFrame =
    vectors.groupBy(col(cellCol).as("cell"))
      .agg(centroidOf(col("embedding")).as("centroid"), count(lit(1)).as("n_vecs"))
}
