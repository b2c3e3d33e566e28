package graft.lambda

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The energy-only pipeline (SURVEY.md §2.5, E1–E10) — the reference's
  * alternate build that drops cosine entirely: clustering → optional
  * "optical" compression → bootstrap Laplacian L₀ over centroid nodes →
  * heat diffusion + dispersion-driven splitting → an energy-distance kNN
  * Laplacian → per-item λτ → energy search.
  *
  * Centroid-space math (X ≤ a few hundred rows) runs driver-local and
  * deterministic; the per-item λ pass and the search scan are the
  * distributed parts (item counts scale, centroid counts don't).
  *
  * Faithfulness notes:
  *  - the reference's 2-D projection for spatial binning uses an
  *    UNSEEDED ImplicitProjection (energymaps.rs:166) — ours is seeded
  *    (determinism policy, SURVEY.md §7.4 item 6);
  *  - compute_taumode over the energy Laplacian indexes item vectors by
  *    centroid-node id (taumode.rs:565-588 with an X'×X' graph), i.e. it
  *    uses the first X' item coordinates in the graph terms and the FULL
  *    vector in the denominator — replicated verbatim in
  *    [[syntheticLambdaPrefix]]; it requires dim ≥ X' like the reference.
  */
object EnergyMaps {

  /** EnergyParams defaults mirror energymaps.rs:53-70. */
  case class EnergyParams(
      opticalTokens: Option[Int] = None,
      trimQuantile: Double = 0.1,
      eta: Double = 0.1,
      steps: Int = 4,
      splitQuantile: Double = 0.9,
      neighborK: Int = 8,
      splitTau: Double = 0.15,
      wLambda: Double = 1.0,
      wDisp: Double = 0.5,
      wDirichlet: Double = 0.25,
      candidateM: Int = 32)

  case class Config(
      maxClusters: Int = 16,
      sampleSize: Int = 1000,
      seed: Long = 42L,
      lambdaK: Int = 6,
      tau: TauMode = TauMode.Median,
      energy: EnergyParams = EnergyParams())

  case class Built(glEnergy: Csr, centroidLambda: Array[Double],
      centroidGini: Array[Double], lambdas: DataFrame, tau: TauMode) {
    /** Release the cached λ table (builds cache it because every search
      * joins it; the owner of the Built controls the lifetime).
      */
    def unpersist(): Unit = { lambdas.unpersist(); () }
  }

  // ---- E10 helpers ------------------------------------------------------

  def l2(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)

  /** bounded_l2_energy (energymaps.rs:844-849). */
  def boundedL2(diff: Array[Double]): Double = {
    val n = l2(diff)
    math.min(n / (1.0 + n), 1.0)
  }

  def meanRows(m: Array[Array[Double]], idx: Seq[Int]): Array[Double] = {
    val f = m(0).length
    val acc = new Array[Double](f)
    if (idx.isEmpty) return acc
    idx.foreach(i => (0 until f).foreach(c => acc(c) += m(i)(c)))
    acc.map(_ / idx.size)
  }

  def topkByL2(m: Array[Array[Double]], i: Int, k: Int): Seq[Int] =
    m.indices.filter(_ != i)
      .map(j => (j, SeededKMeans.sqDist(m(i), m(j))))
      .sortBy { case (j, d) => (d, j) }
      .take(k).map(_._1)

  /** robust_scale: max(1.4826·MAD, 1e-9) (energymaps.rs:525-539). */
  def robustScale(x: Array[Double]): Double = {
    if (x.isEmpty) return 1.0
    val v = x.sorted
    val median = v(v.length / 2)
    val devs = v.map(t => math.abs(t - median)).sorted
    math.max(1.4826 * devs(devs.length / 2), 1e-9)
  }

  // ---- E2: optical compression ------------------------------------------

  def opticalCompress(centroids: Array[Array[Double]], budget: Int,
      trimQ: Double, seed: Long): Array[Array[Double]] = {
    val x = centroids.length
    if (budget == 0 || budget >= x) return centroids
    val f = centroids(0).length
    val proj = ImplicitProjection(f, 2, seed)
    val xy = centroids.map(proj.project)
    val g = math.ceil(math.sqrt(budget.toDouble)).toInt
    val minx = xy.map(_(0)).min; val maxx = xy.map(_(0)).max
    val miny = xy.map(_(1)).min; val maxy = xy.map(_(1)).max
    val bins = Array.fill(g * g)(List.newBuilder[Int])
    for (i <- 0 until x) {
      val px = (xy(i)(0) - minx) / (maxx - minx + 1e-9)
      val py = (xy(i)(1) - miny) / (maxy - miny + 1e-9)
      val bx = math.min(math.max(math.floor(px * g), 0.0), (g - 1).toDouble).toInt
      val by = math.min(math.max(math.floor(py * g), 0.0), (g - 1).toDouble).toInt
      bins(by * g + bx) += i
    }
    val out = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    var done = false
    bins.foreach { b =>
      if (!done) {
        var members = b.result()
        if (members.nonEmpty) {
          if (members.length > 4) members = trimHighNorm(centroids, members, trimQ)
          out += meanRows(centroids, members)
          if (out.length >= budget) done = true
        }
      }
    }
    if (out.length < budget) {
      val norms = centroids.indices.map(i => (i, l2(centroids(i)))).sortBy { case (i, n) => (n, i) }
      norms.iterator.takeWhile(_ => out.length < budget).foreach { case (i, _) =>
        out += centroids(i)
      }
    }
    out.toArray
  }

  def trimHighNorm(m: Array[Array[Double]], idx: List[Int], q: Double): List[Int] = {
    val pairs = idx.map(i => (i, l2(m(i)))).sortBy { case (i, n) => (n, i) }
    val cut = math.max(1, math.min(pairs.length,
      math.round(pairs.length * (1.0 - q)).toInt))
    pairs.take(cut).map(_._1)
  }

  // ---- E3: bootstrap L₀ over centroid nodes -----------------------------

  def bootstrapCentroidLaplacian(spark: SparkSession, centroids: Array[Array[Double]],
      k: Int, normalise: Boolean): Csr = {
    val x = centroids.length
    val params = GraphBuilder.GraphParams(
      eps = 1e-3,
      k = math.min(k, x - 1),
      topk = math.min(math.min(k, 4), x - 1),
      p = 2.0, sigma = None, normalise = normalise)
    GraphBuilder.buildLaplacian(spark, centroids, params)
  }

  // ---- E5: node energy + dispersion -------------------------------------

  def nodeEnergyAndDispersion(x: Array[Array[Double]], l: Csr,
      k: Int): (Array[Double], Array[Double]) = {
    val n = x.length
    val f = x(0).length
    // L·X column-wise
    val lx = Array.ofDim[Double](n, f)
    for (c <- 0 until f) {
      val colVec = Array.tabulate(n)(i => x(i)(c))
      val lcol = l.matvec(colVec)
      for (i <- 0 until n) lx(i)(c) = lcol(i)
    }
    val lambda = new Array[Double](n)
    val gini = new Array[Double](n)
    for (i <- 0 until n) {
      val denom = math.max(x(i).map(v => v * v).sum, 1e-9)
      lambda(i) = x(i).zip(lx(i)).map { case (a, b) => a * b }.sum / denom
      val nbrs = topkByL2(x, i, k)
      val parts = nbrs.map { j =>
        val w = math.max(-l.get(i, j), 0.0)
        val d = SeededKMeans.sqDist(x(i), x(j))
        math.max(w * d, 0.0)
      }
      val sum = parts.sum
      gini(i) = if (sum > 0.0) parts.map(e => { val s = e / sum; s * s }).sum else 0.0
    }
    (lambda, gini)
  }

  // ---- E4: diffuse + split ----------------------------------------------

  def diffuseAndSplit(centroids: Array[Array[Double]], l0: Csr,
      p: EnergyParams): Array[Array[Double]] = {
    val x = centroids.length
    val f = centroids(0).length
    var work = centroids.map(_.clone())
    for (_ <- 0 until p.steps) {
      val next = Array.ofDim[Double](x, f)
      for (c <- 0 until f) {
        val colVec = Array.tabulate(x)(i => work(i)(c))
        val lcol = l0.matvec(colVec)
        for (i <- 0 until x) next(i)(c) = work(i)(c) - p.eta * lcol(i)
      }
      work = next
    }
    val (_, gini) = nodeEnergyAndDispersion(work, l0, p.neighborK)
    val gSorted = gini.sorted
    val qIdx = math.round((gSorted.length - 1).toDouble * p.splitQuantile).toInt
    val thresh = gSorted(qIdx)
    val out = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    out ++= work
    for (i <- 0 until x if gini(i) >= thresh) {
      val nbrs = topkByL2(work, i, p.neighborK)
      val mean = meanRows(work, nbrs)
      val diff = work(i).zip(mean).map { case (a, b) => a - b }
      val norm = math.max(l2(diff), 1e-9)
      val dir = diff.map(_ / norm)
      val dm = diff.sum / math.max(diff.length, 1)
      val variance = diff.map(d => (d - dm) * (d - dm)).sum / math.max(diff.length, 1)
      val tau = p.splitTau * math.max(math.sqrt(variance), 1e-6)
      out += work(i).zip(dir).map { case (a, d) => a + tau * d }
      out += work(i).zip(dir).map { case (a, d) => a - tau * d }
    }
    out.toArray
  }

  // ---- E6: energy-distance Laplacian ------------------------------------

  def buildEnergyLaplacian(spark: SparkSession, sub: Array[Array[Double]],
      p: EnergyParams, lambdaK: Int, normalise: Boolean): (Csr, Array[Double], Array[Double]) = {
    val x = sub.length
    val lBoot = bootstrapCentroidLaplacian(spark, sub, math.max(p.neighborK, lambdaK), normalise)
    val (lambda, gini) = nodeEnergyAndDispersion(sub, lBoot, math.max(p.neighborK, lambdaK))
    val sL = math.max(robustScale(lambda), 1e-9)
    val sG = math.max(robustScale(gini), 1e-9)
    val directed = scala.collection.mutable.HashMap[(Int, Int), Double]()
    for (i <- 0 until x) {
      val cand = topkByL2(sub, i, math.max(p.candidateM, lambdaK))
      val scored = cand.filter(_ != i).map { j =>
        val dLambda = math.abs(lambda(i) - lambda(j)) / sL
        val dGini = math.abs(gini(i) - gini(j)) / sG
        val diff = sub(i).zip(sub(j)).map { case (a, b) => a - b }
        val dist = p.wLambda * dLambda + p.wDisp * dGini + p.wDirichlet * boundedL2(diff)
        (j, dist)
      }.sortBy { case (j, d) => (d, j) }.take(lambdaK)
      scored.foreach { case (j, d) => directed((i, j)) = math.exp(-d) }
    }
    // symmetrize by max (energymaps.rs:781-783)
    val sym = scala.collection.mutable.HashMap[(Int, Int), Double]()
    directed.foreach { case ((i, j), wij) =>
      val wji = directed.getOrElse((j, i), 0.0)
      val w = math.max(wij, wji)
      sym((i, j)) = w
      sym((j, i)) = w
    }
    val edges = sym.iterator.map { case ((i, j), w) => (i, j, w) }
      .filter { case (i, j, _) => i != j }.toArray
    (GraphBuilder.toLaplacian(x, edges), lambda, gini)
  }

  // ---- λ with the prefix-index quirk ------------------------------------

  /** compute_synthetic_lambda_csr against a graph smaller than the item
    * vector: graph terms use coordinates [0, g.n); the denominator is the
    * FULL vector (taumode.rs:595 sums all of item_vector). Requires
    * x.length >= g.n, like the reference.
    */
  def syntheticLambdaPrefix(x: Array[Double], g: Csr, tau: Double): Double = {
    require(x.length >= g.n, s"item dim ${x.length} < graph ${g.n} (reference would panic)")
    if (x.length == g.n) return TauMode.syntheticLambdaDense(x, g, tau)
    val prefix = java.util.Arrays.copyOfRange(x, 0, g.n)
    // reconstruct with full-vector denominator: recompute E from parts
    var numerator = 0.0
    var edgeEnergy = 0.0
    var i = 0
    while (i < g.n) {
      var k = g.indptr(i)
      while (k < g.indptr(i + 1)) {
        val j = g.indices(k); val lij = g.values(k)
        numerator += prefix(i) * lij * prefix(j)
        if (i != j) {
          val w = math.max(-lij, 0.0)
          if (w > 0.0) { val d = prefix(i) - prefix(j); edgeEnergy += w * d * d }
        }
        k += 1
      }
      i += 1
    }
    val denom = x.map(v => v * v).sum
    val eRaw = if (denom > 1e-12) numerator / denom else 0.0
    var gSq = 0.0
    if (edgeEnergy > 0.0) {
      i = 0
      while (i < g.n) {
        var k = g.indptr(i)
        while (k < g.indptr(i + 1)) {
          val j = g.indices(k); val lij = g.values(k)
          if (i != j) {
            val w = math.max(-lij, 0.0)
            if (w > 0.0) {
              val d = prefix(i) - prefix(j)
              val share = (w * d * d) / edgeEnergy
              gSq += share * share
            }
          }
          k += 1
        }
        i += 1
      }
    }
    val gRaw = math.max(0.0, math.min(1.0, gSq))
    val eBounded = eRaw / (eRaw + tau)
    tau * eBounded + (1.0 - tau) * gRaw
  }

  // ---- E1: build --------------------------------------------------------

  def build(spark: SparkSession, items: Dataset[(Long, Array[Double])],
      cfg: Config = Config()): Built = {
    import spark.implicits._
    val sample = SeededKMeans.sampleRows(items, cfg.sampleSize, cfg.seed)
    val x0 = math.min(cfg.maxClusters, SeededKMeans.optimalK(sample, cfg.seed, cfg.maxClusters))
    val model = SeededKMeans.fitLocal(sample, x0, cfg.seed)
    var centroids: Array[Array[Double]] = model.centroids
    cfg.energy.opticalTokens.foreach { budget =>
      centroids = opticalCompress(centroids, budget, cfg.energy.trimQuantile, cfg.seed)
    }
    val l0 = bootstrapCentroidLaplacian(spark, centroids, cfg.lambdaK, normalise = false)
    var sub = diffuseAndSplit(centroids, l0, cfg.energy)
    cfg.energy.opticalTokens.foreach { budget =>
      sub = opticalCompress(sub, budget, cfg.energy.trimQuantile, cfg.seed + 1)
    }
    val (glE, cl, cg) = buildEnergyLaplacian(spark, sub, cfg.energy, cfg.lambdaK, normalise = false)
    val bCsr = spark.sparkContext.broadcast(glE)
    val mode = cfg.tau
    // cached: searchEnergy JOINS this table per query — the λ pass over
    // every vector runs once per build, not once per query (at cluster
    // scale this is a persisted table, as in LambdaPipeline)
    val lambdas = items.map { case (id, v) =>
      (id, syntheticLambdaPrefix(v, bCsr.value, TauMode.selectTau(v, mode)))
    }.toDF("id", "lambda").cache()
    Built(glE, cl, cg, lambdas, mode)
  }

  // ---- E8/E9: energy search ---------------------------------------------

  def queryLambda(q: Array[Double], built: Built): Double =
    syntheticLambdaPrefix(q, built.glEnergy, TauMode.selectTau(q, built.tau))

  /** projected_dirichlet (energymaps.rs:861-876): when a spectral
    * `signals` matrix exists AND its width matches the diff vector,
    * energy = bounded L2 of signals·diff; otherwise the bounded-L2
    * fallback — dimension-mismatch fallback replicated exactly.
    */
  def projectedDirichlet(diff: Array[Double], signals: Option[Csr]): Double =
    signals match {
      case Some(s) if s.n == diff.length =>
        val y = s.matvec(diff)
        val n = l2(y)
        math.min(n / (1.0 + n), 1.0)
      case _ => boundedL2(diff)
    }

  /** search_energy: rank by −(wλ·|λq−λᵢ| + wD·projectedDirichlet(q−xᵢ)),
    * truncate k (energymaps.rs:368-407).
    */
  def searchEnergy(items: Dataset[(Long, Array[Double])], built: Built,
      q: Array[Double], k: Int, wLambda: Double = 1.0,
      wDirichlet: Double = 0.5, signals: Option[Csr] = None): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val lq = queryLambda(q, built)
    val bq = spark.sparkContext.broadcast(q)
    val bSig = spark.sparkContext.broadcast(signals)
    val bCsr = spark.sparkContext.broadcast(built.glEnergy)
    val mode = built.tau
    // per-item λ comes from the BUILT λ table (a LEFT join on id — one
    // scan of the cached λ table per query instead of re-running the
    // synthetic-λ pass over every vector). Only ids ABSENT from the
    // build set fall back to the on-the-fly computation (so extra rows
    // are still scored and the result set never silently shrinks); a
    // row whose id exists in the build but whose VECTOR was mutated
    // keeps the build-time λ — index-owned-items semantics, matching
    // the reference where mutation triggers recompute_lambdas
    // (core.rs:614-705): callers mutating vectors must rebuild
    val scored = items.toDF("id", "vec")
      .join(built.lambdas, Seq("id"), "left")
      .as[(Long, Array[Double], Option[Double])]
      .map { case (id, v, lamOpt) =>
        val li = lamOpt.getOrElse(
          syntheticLambdaPrefix(v, bCsr.value, TauMode.selectTau(v, mode)))
        val diff = bq.value.zip(v).map { case (a, b) => a - b }
        val dist = wLambda * math.abs(lq - li) + wDirichlet * projectedDirichlet(diff, bSig.value)
        (id, -dist)
      }.toDF("id", "score")
    scored.orderBy(col("score").desc, col("id").asc).limit(k)
  }
}
