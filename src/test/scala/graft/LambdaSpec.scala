package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lambda.{Csr, LambdaAgg, TauMode}
import scala.util.Random

/** Local λτ semantics tests mirroring the reference's invariant suites
  * (/root/reference/src/tests/test_taumode.rs, test_laplacian.rs).
  */
class LambdaSpec extends AnyFunSuite {
  val rnd = new Random(11)

  def randomLaplacian(n: Int): Csr = {
    // random undirected weighted graph -> L = D - W
    val edges = scala.collection.mutable.ArrayBuffer[(Int, Int, Double)]()
    for (i <- 0 until n; j <- i + 1 until n if rnd.nextDouble() < 0.3) {
      val w = 0.1 + rnd.nextDouble()
      edges += ((i, j, w)); edges += ((j, i, w))
    }
    val deg = new Array[Double](n)
    edges.foreach { case (i, _, w) => deg(i) += w }
    Csr.fromCoo(n, edges.map { case (i, j, w) => (i, j, -w) }.toSeq ++
      (0 until n).map(i => (i, i, deg(i))))
  }

  test("selectTau: Fixed guards non-finite and non-positive") {
    assert(TauMode.selectTau(Array(1.0), TauMode.Fixed(0.7)) == 0.7)
    assert(TauMode.selectTau(Array(1.0), TauMode.Fixed(-1.0)) == TauMode.TauFloor)
    assert(TauMode.selectTau(Array(1.0), TauMode.Fixed(Double.NaN)) == TauMode.TauFloor)
    assert(TauMode.selectTau(Array(1.0), TauMode.Fixed(0.0)) == TauMode.TauFloor)
  }

  test("selectTau: Mean ignores non-finite values") {
    assert(TauMode.selectTau(Array(1.0, 2.0, 3.0), TauMode.Mean) == 2.0)
    assert(TauMode.selectTau(Array(1.0, Double.NaN, 3.0), TauMode.Mean) == 2.0)
    assert(TauMode.selectTau(Array.empty[Double], TauMode.Mean) == TauMode.TauFloor)
  }

  test("selectTau: Median odd takes center, even takes midpoint") {
    assert(TauMode.selectTau(Array(3.0, 1.0, 2.0), TauMode.Median) == 2.0)
    assert(TauMode.selectTau(Array(4.0, 1.0, 2.0, 3.0), TauMode.Median) == 2.5)
  }

  test("selectTau: Percentile nearest-rank round((len-1)*p)") {
    val v = Array(10.0, 20.0, 30.0, 40.0, 50.0)
    assert(TauMode.selectTau(v, TauMode.Percentile(0.0)) == 10.0)
    assert(TauMode.selectTau(v, TauMode.Percentile(0.5)) == 30.0)
    assert(TauMode.selectTau(v, TauMode.Percentile(1.0)) == 50.0)
    // (5-1)*0.6 = 2.4 -> round = 2 -> 30.0
    assert(TauMode.selectTau(v, TauMode.Percentile(0.6)) == 30.0)
    // (5-1)*0.7 = 2.8 -> round = 3 -> 40.0
    assert(TauMode.selectTau(v, TauMode.Percentile(0.7)) == 40.0)
    // clamp out-of-range p
    assert(TauMode.selectTau(v, TauMode.Percentile(2.0)) == 50.0)
  }

  test("selectTau floors tiny medians at TAU_FLOOR") {
    assert(TauMode.selectTau(Array(0.0, 0.0, 0.0), TauMode.Median) == TauMode.TauFloor)
  }

  test("random Laplacians verify: symmetric, row sums 0, diag >= 0") {
    for (_ <- 1 to 10) {
      val g = randomLaplacian(5 + rnd.nextInt(30))
      assert(g.laplacianViolations().isEmpty)
    }
  }

  test("Rayleigh quotient: scale invariance and PSD non-negativity") {
    for (_ <- 1 to 10) {
      val n = 5 + rnd.nextInt(20)
      val g = randomLaplacian(n)
      val x = Array.fill(n)(rnd.nextDouble() * 4 - 2)
      val r = g.rayleighQuotient(x)
      assert(r >= -1e-12, s"Laplacian must be PSD, got $r")
      val r2 = g.rayleighQuotient(x.map(_ * 3.7))
      assert(math.abs(r - r2) < 1e-9, "R(cx) == R(x)")
      assert(g.rayleighQuotient(new Array[Double](n)) == 0.0, "zero vector -> 0")
    }
  }

  test("synthetic lambda in [0,1] whenever tau <= 1 (the reference's implicit domain)") {
    // The reference asserts λ ∈ [0,1] (tests/test_taumode.rs:284-292) but
    // never clamps τ; the bound only holds because its data regimes keep
    // the per-item τ ≤ 1. We replicate the formula verbatim, so the
    // invariant test draws values in [0,1].
    for (_ <- 1 to 20) {
      val n = 5 + rnd.nextInt(40)
      val g = randomLaplacian(n)
      val x = Array.fill(n)(rnd.nextDouble())
      for (mode <- Seq(TauMode.Median, TauMode.Mean, TauMode.Fixed(0.3), TauMode.Percentile(0.75))) {
        val tau = TauMode.selectTau(x, mode)
        assert(tau <= 1.0)
        val l = TauMode.syntheticLambdaDense(x, g, tau)
        assert(l >= 0.0 && l <= 1.0, s"lambda $l out of [0,1], mode=$mode")
      }
    }
  }

  test("quirk (replicated verbatim): tau > 1 can push lambda out of [0,1]") {
    // blend weight IS τ (taumode.rs:641-647); with τ > 1 the (1−τ)·G term
    // goes negative — faithful to the reference, documented here.
    val g = randomLaplacian(12)
    val x = Array.fill(12)(2.0 + rnd.nextDouble() * 5)
    val tau = TauMode.selectTau(x, TauMode.Median)
    assert(tau > 1.0)
    val l = TauMode.syntheticLambdaDense(x, g, tau)
    assert(!l.isNaN) // well-defined, just not clamped
  }

  test("sparse lambda == dense lambda on sparse vectors") {
    for (_ <- 1 to 30) {
      val n = 10 + rnd.nextInt(60)
      val g = randomLaplacian(n)
      val supportSize = 1 + rnd.nextInt(math.max(1, n / 3))
      val support = rnd.shuffle((0 until n).toList).take(supportSize).sorted.toArray
      val xs = support.map(_ => 0.5 + rnd.nextDouble() * 3)
      val dense = new Array[Double](n)
      support.zip(xs).foreach { case (i, v) => dense(i) = v }
      val tau = 0.4
      val a = TauMode.syntheticLambdaDense(dense, g, tau)
      val b = TauMode.syntheticLambdaSparse(support, xs, g, tau)
      assert(math.abs(a - b) < 1e-12, s"dense=$a sparse=$b")
    }
  }

  test("sparse lambda == dense lambda with NEGATIVE support values") {
    for (_ <- 1 to 20) {
      val n = 10 + rnd.nextInt(40)
      val g = randomLaplacian(n)
      val supportSize = 1 + rnd.nextInt(math.max(1, n / 2))
      val support = rnd.shuffle((0 until n).toList).take(supportSize).sorted.toArray
      val xs = support.map(_ => rnd.nextDouble() * 6 - 3) // mixed signs
      val dense = new Array[Double](n)
      support.zip(xs).foreach { case (i, v) => dense(i) = v }
      val tau = 0.7
      val a = TauMode.syntheticLambdaDense(dense, g, tau)
      val b = TauMode.syntheticLambdaSparse(support, xs, g, tau)
      assert(math.abs(a - b) < 1e-12, s"dense=$a sparse=$b")
    }
  }

  test("tauOverSparse == selectTau on the densified vector") {
    for (_ <- 1 to 50) {
      val n = 5 + rnd.nextInt(50)
      val supportSize = rnd.nextInt(n + 1)
      val xs = Array.fill(supportSize)(rnd.nextDouble() * 10)
      val dense = new Array[Double](n)
      xs.copyToArray(dense)
      for (mode <- Seq(TauMode.Median, TauMode.Mean, TauMode.Percentile(0.3), TauMode.Percentile(0.9))) {
        val a = LambdaAgg.tauOverSparse(xs, n, mode)
        val b = TauMode.selectTau(dense, mode)
        assert(math.abs(a - b) < 1e-12, s"mode=$mode support=$supportSize n=$n: $a vs $b")
      }
    }
  }

  test("define_result_k quirk: k<=5 -> topk 3, k<10 -> topk 4, else user value") {
    import graft.lambda.GraphBuilder.GraphParams
    assert(GraphParams(k = 2, topk = 8).withDefinedResultK.topk == 3)
    assert(GraphParams(k = 5, topk = 8).withDefinedResultK.topk == 3)
    assert(GraphParams(k = 6, topk = 8).withDefinedResultK.topk == 4)
    assert(GraphParams(k = 9, topk = 8).withDefinedResultK.topk == 4)
    assert(GraphParams(k = 10, topk = 8).withDefinedResultK.topk == 8)
  }

  test("lambda similarity component: 1 - min(|dl|, 1)") {
    assert(TauMode.lambdaSimilarity(0.5, 0.5) == 1.0)
    assert(TauMode.lambdaSimilarity(0.2, 0.7) == 0.5)
    assert(TauMode.lambdaSimilarity(0.0, 5.0) == 0.0)
  }
}
