package graft.lambda

import org.apache.spark.sql.Dataset
import graft.util.Hashing
import graft.util.Hashing.Rng

/** Johnson-Lindenstrauss random projection with the reference's
  * store-only-the-seed trick (/root/reference/src/reduction.rs:126-202):
  * the Gaussian projection matrix is NEVER materialized in artifacts —
  * it regenerates deterministically from (originalDim, reducedDim, seed),
  * so queries project identically at search time at zero storage cost.
  *
  * Scale 1/√r preserves expected norms (reduction.rs:185-202).
  */
case class ImplicitProjection(originalDim: Int, reducedDim: Int, seed: Long)
    extends Serializable {

  /** Row r of the projection matrix, regenerated on demand. */
  private def matrixRow(r: Int): Array[Double] = {
    val rng = new Rng(Hashing.hash64(seed, "jl", r.toString))
    Array.fill(originalDim)(rng.nextGaussian())
  }

  @transient private lazy val matrix: Array[Array[Double]] =
    Array.tabulate(reducedDim)(matrixRow)

  def project(x: Array[Double]): Array[Double] = {
    require(x.length == originalDim, s"dim ${x.length} != $originalDim")
    val scale = 1.0 / math.sqrt(reducedDim.toDouble)
    val out = new Array[Double](reducedDim)
    var r = 0
    while (r < reducedDim) {
      val row = matrix(r)
      var s = 0.0
      var i = 0
      while (i < originalDim) { s += row(i) * x(i); i += 1 }
      out(r) = s * scale
      r += 1
    }
    out
  }
}

object Projection {

  /** r = max(32, ⌈8·ln n / ε²⌉) (reduction.rs:126-139). */
  def jlDimension(n: Long, eps: Double): Int =
    math.max(32, math.ceil(8.0 * math.log(n.toDouble) / (eps * eps)).toInt)

  /** Distributed projection of all rows (project_matrix,
    * reduction.rs:142-166) — broadcastless: the projection regenerates
    * from its 16-byte spec inside each task.
    */
  def projectAll(items: Dataset[(Long, Array[Double])],
      proj: ImplicitProjection): Dataset[(Long, Array[Double])] = {
    import items.sparkSession.implicits._
    items.map { case (id, v) => (id, proj.project(v)) }
  }
}
