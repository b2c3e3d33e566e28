package graft.lambda

import scala.collection.mutable.ArrayBuffer

/** Compact CSR sparse matrix (the broadcastable Laplacian holder —
  * fills the role of the reference's `sprs::CsMat<f64>` in
  * `GraphLaplacian`, /root/reference/src/graph.rs:126-135).
  *
  * Immutable after construction; safe to broadcast to executors.
  */
final class Csr(
    val n: Int, // square n×n
    val indptr: Array[Int], // length n+1
    val indices: Array[Int], // column ids, sorted within each row
    val values: Array[Double]
) extends Serializable {

  def nnz: Int = values.length

  def rowIter(i: Int): Iterator[(Int, Double)] =
    (indptr(i) until indptr(i + 1)).iterator.map(k => (indices(k), values(k)))

  def get(i: Int, j: Int): Double = {
    var k = indptr(i)
    while (k < indptr(i + 1)) { if (indices(k) == j) return values(k); k += 1 }
    0.0
  }

  /** y = A·x (dense). Mirrors GraphLaplacian::multiply_vector
    * (/root/reference/src/graph.rs:436-473).
    */
  def matvec(x: Array[Double]): Array[Double] = {
    require(x.length == n)
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0.0
      var k = indptr(i)
      while (k < indptr(i + 1)) { acc += values(k) * x(indices(k)); k += 1 }
      y(i) = acc
      i += 1
    }
    y
  }

  /** R = xᵀAx / xᵀx, 0 when xᵀx ≤ 1e-12 — GraphLaplacian::rayleigh_quotient
    * (/root/reference/src/graph.rs:394-433).
    */
  def rayleighQuotient(x: Array[Double]): Double = {
    val denom = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * x(i); i += 1 }
      s
    }
    if (denom <= 1e-12) return 0.0
    val ax = matvec(x)
    var num = 0.0
    var i = 0
    while (i < x.length) { num += x(i) * ax(i); i += 1 }
    num / denom
  }

  def degrees: Array[Double] = {
    val d = new Array[Double](n)
    var i = 0
    while (i < n) { d(i) = get(i, i); i += 1 }
    d
  }

  /** Validation mirroring GraphLaplacian::verify_properties
    * (/root/reference/src/graph.rs:476-564): symmetry, row sums ≈ 0,
    * diag ≥ 0, off-diag ≤ 0.
    */
  def laplacianViolations(tol: Double = 1e-9): Seq[String] = {
    val out = ArrayBuffer[String]()
    var i = 0
    while (i < n) {
      var rowSum = 0.0
      var k = indptr(i)
      while (k < indptr(i + 1)) {
        val j = indices(k); val v = values(k)
        rowSum += v
        if (i == j && v < -tol) out += s"diag($i) < 0: $v"
        if (i != j && v > tol) out += s"offdiag($i,$j) > 0: $v"
        if (math.abs(get(j, i) - v) > tol) out += s"asymmetric ($i,$j): $v vs ${get(j, i)}"
        k += 1
      }
      if (math.abs(rowSum) > tol) out += s"row $i sum != 0: $rowSum"
      i += 1
    }
    out.toSeq
  }

  def sparsity: Double = 1.0 - nnz.toDouble / (n.toDouble * n.toDouble)
}

object Csr {

  /** Build from COO triplets (duplicates summed), rows sorted. */
  def fromCoo(n: Int, coo: Iterable[(Int, Int, Double)]): Csr = {
    val byRow = Array.fill(n)(new ArrayBuffer[(Int, Double)]())
    coo.foreach { case (i, j, v) => byRow(i) += ((j, v)) }
    val indptr = new Array[Int](n + 1)
    val idx = new ArrayBuffer[Int]()
    val vals = new ArrayBuffer[Double]()
    var i = 0
    while (i < n) {
      val merged = byRow(i).groupBy(_._1).map { case (j, xs) => (j, xs.map(_._2).sum) }
        .toArray.sortBy(_._1)
      merged.foreach { case (j, v) => idx += j; vals += v }
      indptr(i + 1) = idx.length
      i += 1
    }
    new Csr(n, indptr, idx.toArray, vals.toArray)
  }
}
