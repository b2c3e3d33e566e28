package graft.lambda

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** One doc-term entry feeding the λ aggregation: the doc's weight (tf
  * mass) on term-node `termIdx` of the co-occurrence graph.
  */
case class DocTermEntry(docId: Long, termIdx: Int, weight: Double)

class LambdaBuf extends Serializable {
  val idx = new ArrayBuffer[Int]()
  val w = new ArrayBuffer[Double]()
}

/** The north rule's "typed Catalyst aggregation": per-document synthetic
  * λτ over a broadcast term-graph Laplacian
  * (Aggregator[DocTermEntry, LambdaBuf, Double] ≙ the reference's
  * per-item `compute_taumode_lambdas_parallel`,
  * /root/reference/src/taumode.rs:174-312, with rayon-parallelism
  * replaced by Spark partition parallelism).
  *
  * τ is selected from the document's own full F-dimensional vector
  * (zeros included — taumode.rs:234 semantics); the λ formula runs
  * sparsely in O(support × degree) via
  * [[TauMode.syntheticLambdaSparse]].
  */
class LambdaAgg(graph: Broadcast[Csr], nNodes: Int, mode: TauMode)
    extends Aggregator[DocTermEntry, LambdaBuf, Double] {

  def zero: LambdaBuf = new LambdaBuf

  def reduce(b: LambdaBuf, e: DocTermEntry): LambdaBuf = {
    b.idx += e.termIdx; b.w += e.weight
    b
  }

  def merge(a: LambdaBuf, b: LambdaBuf): LambdaBuf = {
    a.idx ++= b.idx; a.w ++= b.w
    a
  }

  def finish(buf: LambdaBuf): Double = {
    // deterministic order + duplicate-safe (sum duplicate term entries)
    val pairs = buf.idx.zip(buf.w).groupBy(_._1).map { case (i, xs) => (i, xs.map(_._2).sum) }
      .toArray.sortBy(_._1)
    val support = pairs.map(_._1)
    val xs = pairs.map(_._2)
    val tau = LambdaAgg.tauOverSparse(xs, nNodes, mode)
    TauMode.syntheticLambdaSparse(support, xs, graph.value, tau)
  }

  def bufferEncoder: Encoder[LambdaBuf] = Encoders.kryo[LambdaBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object LambdaAgg {

  /** τ of a sparse non-negative vector of dimension `n` (support values
    * `xs`, everything else 0) without densifying: equivalent to
    * TauMode.selectTau on the dense vector.
    */
  def tauOverSparse(xs: Array[Double], n: Int, mode: TauMode): Double = {
    val zeros = n - xs.length
    require(zeros >= 0, s"support ${xs.length} > dimension $n")
    mode match {
      case TauMode.Fixed(t) => TauMode.selectTau(Array.empty, TauMode.Fixed(t))
      case TauMode.Mean =>
        val finite = xs.filter(java.lang.Double.isFinite)
        val cnt = zeros + finite.length
        math.max(if (cnt > 0) finite.sum / cnt else 0.0, TauMode.TauFloor)
      case TauMode.Median | TauMode.Percentile(_) =>
        if (xs.exists(x => java.lang.Double.isFinite(x) && x < 0.0)) {
          // negatives present: fall back to dense semantics
          val dense = new Array[Double](n)
          xs.copyToArray(dense) // support positions irrelevant for order stats
          return TauMode.selectTau(dense, mode)
        }
        val sortedSupport = xs.filter(java.lang.Double.isFinite).sorted
        val len = zeros + sortedSupport.length
        if (len == 0) return TauMode.TauFloor
        @inline def at(i: Int): Double =
          if (i < zeros) 0.0 else sortedSupport(i - zeros)
        val v = mode match {
          case TauMode.Percentile(p) =>
            val pp = math.max(0.0, math.min(1.0, p))
            at(math.round((len - 1).toDouble * pp).toInt)
          case _ =>
            if (len % 2 == 1) at(len / 2)
            else 0.5 * (at(len / 2 - 1) + at(len / 2))
        }
        math.max(v, TauMode.TauFloor)
    }
  }
}
