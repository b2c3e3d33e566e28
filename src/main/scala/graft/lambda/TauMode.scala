package graft.lambda

/** τ selection and the synthetic λτ score — semantics transcribed from
  * the reference's normative code paths (SURVEY.md §7.1; docs-vs-code
  * divergences resolved in favor of code, SURVEY.md Appendix A):
  *
  *  - τ is selected from the ITEM'S OWN vector values (not from the
  *    corpus energy distribution) — /root/reference/src/taumode.rs:234;
  *  - Percentile uses nearest-rank round(((len−1)·p)) and Median of an
  *    even-length vector is the midpoint of the two central values —
  *    taumode.rs:114-125;
  *  - TAU_FLOOR = 1e-10 — taumode.rs:84;
  *  - λ = τ·E/(E+τ) + (1−τ)·clamp(G, 0, 1) where E = xᵀLx/xᵀx (0 when
  *    xᵀx ≤ 1e-12) and G = Σ((w·d²)/Σw·d²)² over directed off-diagonal
  *    entries with w = max(−L_ij, 0), d = x_i − x_j — taumode.rs:552-660.
  *    The blend weight IS τ (Appendix A D5).
  */
sealed trait TauMode extends Serializable
object TauMode {
  case class Fixed(t: Double) extends TauMode
  case object Mean extends TauMode
  case object Median extends TauMode
  case class Percentile(p: Double) extends TauMode

  val TauFloor = 1e-10

  def selectTau(values: Array[Double], mode: TauMode): Double = mode match {
    case Fixed(t) => if (t.isFinite && t > 0.0) t else TauFloor
    case Mean =>
      var sum = 0.0; var cnt = 0
      var i = 0
      while (i < values.length) {
        val e = values(i)
        if (java.lang.Double.isFinite(e)) { sum += e; cnt += 1 }
        i += 1
      }
      math.max(if (cnt > 0) sum / cnt else 0.0, TauFloor)
    case Median | Percentile(_) =>
      val v = values.filter(java.lang.Double.isFinite).sorted
      if (v.isEmpty) return TauFloor
      mode match {
        case Percentile(p) =>
          val pp = math.max(0.0, math.min(1.0, p))
          val idx = math.round((v.length - 1).toDouble * pp).toInt
          math.max(v(idx), TauFloor)
        case _ =>
          val m =
            if (v.length % 2 == 1) v(v.length / 2)
            else 0.5 * (v(v.length / 2 - 1) + v(v.length / 2))
          math.max(m, TauFloor)
      }
  }

  /** Dense synthetic λ (reference regime: x has one value per graph node).
    * Two passes: (numerator, edge energy) then dispersion G.
    */
  def syntheticLambdaDense(x: Array[Double], g: Csr, tau: Double): Double = {
    require(x.length == g.n, s"vector ${x.length} vs graph ${g.n}")
    var numerator = 0.0
    var edgeEnergy = 0.0
    var i = 0
    while (i < g.n) {
      val xi = x(i)
      var k = g.indptr(i)
      while (k < g.indptr(i + 1)) {
        val j = g.indices(k); val lij = g.values(k)
        numerator += xi * lij * x(j)
        if (i != j) {
          val w = math.max(-lij, 0.0)
          if (w > 0.0) { val d = xi - x(j); edgeEnergy += w * d * d }
        }
        k += 1
      }
      i += 1
    }
    var denom = 0.0
    i = 0
    while (i < x.length) { denom += x(i) * x(i); i += 1 }
    val eRaw = if (denom > 1e-12) numerator / denom else 0.0
    var gSq = 0.0
    if (edgeEnergy > 0.0) {
      i = 0
      while (i < g.n) {
        val xi = x(i)
        var k = g.indptr(i)
        while (k < g.indptr(i + 1)) {
          val j = g.indices(k); val lij = g.values(k)
          if (i != j) {
            val w = math.max(-lij, 0.0)
            if (w > 0.0) {
              val d = xi - x(j)
              val share = (w * d * d) / edgeEnergy
              gSq += share * share
            }
          }
          k += 1
        }
        i += 1
      }
    }
    blend(eRaw, gSq, tau)
  }

  /** Sparse synthetic λ: x given as (nodeIdx → value) over a graph of
    * `g.n` nodes, all other coordinates 0. Exactly equals
    * [[syntheticLambdaDense]] on the densified vector but costs
    * O(support × degree): rows outside the support contribute nothing to
    * the numerator (x_i = 0) and their edge-energy terms mirror the
    * support rows' by symmetry (w and d² are symmetric), so each
    * support-row edge (i→j) with j outside the support is counted twice.
    */
  /** Per-thread dense scratch for [[syntheticLambdaSparse]]: one
    * (values, in-support) pair sized to the graph, written and cleared
    * at exactly the support positions per call — replaces a per-call
    * boxed HashMap whose Integer-keyed lookups (2-3 per edge, two
    * passes) were the measured cost of the 100k-doc λ stage. Same
    * reads, same arithmetic, zero allocation after warm-up.
    */
  private val sparseScratch = new ThreadLocal[(Array[Double], Array[Boolean])]()

  def syntheticLambdaSparse(support: Array[Int], xs: Array[Double], g: Csr,
      tau: Double): Double = {
    var sc = sparseScratch.get()
    if (sc == null || sc._1.length < g.n) {
      sc = (new Array[Double](g.n), new Array[Boolean](g.n))
      sparseScratch.set(sc)
    }
    val xv = sc._1
    val inS = sc._2
    var s = 0
    while (s < support.length) { xv(support(s)) = xs(s); inS(support(s)) = true; s += 1 }
    @inline def xAt(j: Int): Double = xv(j)
    try {
    var numerator = 0.0
    var edgeEnergy = 0.0
    // pass 1 over support rows
    s = 0
    while (s < support.length) {
      val i = support(s); val xi = xs(s)
      var k = g.indptr(i)
      while (k < g.indptr(i + 1)) {
        val j = g.indices(k); val lij = g.values(k)
        val xj = xAt(j)
        numerator += xi * lij * xj
        if (i != j) {
          val w = math.max(-lij, 0.0)
          if (w > 0.0) {
            val d = xi - xj
            val e = w * d * d
            // if j is outside the support, row j's mirrored entry (j,i)
            // contributes the same energy; count it here
            edgeEnergy += (if (inS(j)) e else 2.0 * e)
          }
        }
        k += 1
      }
      s += 1
    }
    var denom = 0.0
    s = 0
    while (s < xs.length) { denom += xs(s) * xs(s); s += 1 }
    val eRaw = if (denom > 1e-12) numerator / denom else 0.0
    var gSq = 0.0
    if (edgeEnergy > 0.0) {
      s = 0
      while (s < support.length) {
        val i = support(s); val xi = xs(s)
        var k = g.indptr(i)
        while (k < g.indptr(i + 1)) {
          val j = g.indices(k); val lij = g.values(k)
          if (i != j) {
            val w = math.max(-lij, 0.0)
            if (w > 0.0) {
              val d = xi - xAt(j)
              val share = (w * d * d) / edgeEnergy
              gSq += (if (inS(j)) share * share else 2.0 * share * share)
            }
          }
          k += 1
        }
        s += 1
      }
    }
    blend(eRaw, gSq, tau)
    } finally {
      // reset exactly the touched positions (O(support), not O(n))
      var t = 0
      while (t < support.length) { xv(support(t)) = 0.0; inS(support(t)) = false; t += 1 }
    }
  }

  @inline private def blend(eRaw: Double, gSq: Double, tau: Double): Double = {
    val gRaw = math.max(0.0, math.min(1.0, gSq))
    val eBounded = eRaw / (eRaw + tau)
    tau * eBounded + (1.0 - tau) * gRaw
  }

  /** λ-proximity component: 1 − min(|λa − λb|, 1)
    * (/root/reference/src/core.rs:135-138; code-normative form, not the
    * documented 1/(1+|Δλ|) — Appendix A D1).
    */
  @inline def lambdaSimilarity(a: Double, b: Double): Double =
    1.0 - math.min(math.abs(a - b), 1.0)
}
