package graft.lambda

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.util.Hashing
import graft.util.Hashing.Rng

/** Deterministic clustering for the signature stage: a seeded local
  * Lloyd's k-means fitted on a deterministic sample, then a distributed
  * nearest-centroid assignment.
  *
  * This mirrors the reference's structure — `compute_optimal_k` works on
  * a ≤1000-row seeded sample (/root/reference/src/clustering.rs:36-72)
  * and smartcore's seeded KMeans does the fitting
  * (clustering.rs:505-531) — while avoiding the order-dependent
  * incremental path (clustering.rs:547-910), whose OS-seeded sampler is
  * explicitly nondeterministic (sampling.rs:123); reference tests that
  * need determinism also bypass it (tests/test_energy_search.rs:417-421).
  * Everything here is a pure function of (data, seed).
  */
object SeededKMeans {

  case class Model(centroids: Array[Array[Double]]) extends Serializable {
    def k: Int = centroids.length
    /** argmin d², strict < so ties resolve to the lowest cluster index. */
    def assign(x: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val d = sqDist(x, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }

  @inline def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic ≤maxSample rows: order by a seeded hash of the row id
    * (a seeded shuffle, like clustering.rs:53-58).
    */
  def sampleRows(ds: Dataset[(Long, Array[Double])], maxSample: Int, seed: Long): Array[Array[Double]] = {
    import ds.sparkSession.implicits._
    ds.map { case (id, v) => (Hashing.hash64(seed, "sample", id.toString), v) }
      .toDF("h", "v").orderBy("h").limit(maxSample)
      .select("v").as[Array[Double]].collect()
  }

  /** Seeded k-means++ init + Lloyd iterations (local; sample-sized). */
  def fitLocal(points: Array[Array[Double]], k: Int, seed: Long, maxIter: Int = 20): Model = {
    require(points.nonEmpty)
    val rng = new Rng(Hashing.mix64(seed ^ 0x6b6d65616e73L))
    val kk = math.min(k, points.length)
    // k-means++ seeding
    val centroids = new Array[Array[Double]](kk)
    centroids(0) = points(rng.nextInt(points.length)).clone()
    val minD = Array.fill(points.length)(Double.MaxValue)
    for (c <- 1 until kk) {
      var total = 0.0
      for (i <- points.indices) {
        val d = sqDist(points(i), centroids(c - 1))
        if (d < minD(i)) minD(i) = d
        total += minD(i)
      }
      val target = rng.nextDouble() * total
      var acc = 0.0
      var chosen = points.length - 1
      var i = 0
      var done = false
      while (i < points.length && !done) {
        acc += minD(i)
        if (acc >= target) { chosen = i; done = true }
        i += 1
      }
      centroids(c) = points(chosen).clone()
    }
    // Lloyd
    val dim = points(0).length
    val assignments = new Array[Int](points.length)
    var iter = 0
    var changed = true
    while (iter < maxIter && changed) {
      changed = false
      val model = Model(centroids.toArray)
      for (i <- points.indices) {
        val a = model.assign(points(i))
        if (a != assignments(i)) { assignments(i) = a; changed = true }
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      for (i <- points.indices) {
        val c = assignments(i)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += points(i)(j); j += 1 }
      }
      for (c <- 0 until kk if counts(c) > 0) {
        centroids(c) = Array.tabulate(dim)(j => sums(c)(j) / counts(c))
      }
      iter += 1
    }
    Model(centroids)
  }

  /** Calinski-Harabasz score BGSS/(k−1) ÷ WGSS/(n−k)
    * (clustering.rs:313-381).
    */
  def calinskiHarabasz(points: Array[Array[Double]], model: Model): Double = {
    val n = points.length
    val k = model.k
    if (k <= 1 || n <= k) return 0.0
    val dim = points(0).length
    val global = new Array[Double](dim)
    points.foreach(p => (0 until dim).foreach(j => global(j) += p(j)))
    (0 until dim).foreach(j => global(j) /= n)
    var bgss = 0.0
    var wgss = 0.0
    val counts = new Array[Int](k)
    points.foreach { p =>
      val c = model.assign(p)
      counts(c) += 1
      wgss += sqDist(p, model.centroids(c))
    }
    for (c <- 0 until k) bgss += counts(c) * sqDist(model.centroids(c), global)
    (bgss / (k - 1)) / (wgss / (n - k))
  }

  /** K bounds heuristic (step1_bounds, clustering.rs:75-98):
    * k_min = max(2, ⌈√(n/10)⌉);
    * k_max = min(dims, n/10, 5·intrinsicDim, ⌊√n⌋), then raised to at
    * least k_min+1 and capped at n/2 — the reference's exact candidate
    * order, INCLUDING the 5·ID bound (restored; it was elided in
    * round 1).
    */
  def kBounds(n: Int, dims: Int, idEst: Int): (Int, Int) = {
    val kMin = math.max(2, math.ceil(math.sqrt(n / 10.0)).toInt)
    val kMax = Seq(dims, n / 10, 5 * idEst, math.sqrt(n.toDouble).toInt)
      .min.max(kMin + 1).min(n / 2)
    (kMin, kMax)
  }

  /** Integer Two-NN intrinsic-dimension estimate clamped to [1, dims]
    * (the reference's id_clamped, clustering.rs:155-157; n<10 → min(f,2),
    * clustering.rs:110-112).
    */
  def intrinsicDimensionInt(points: Array[Array[Double]]): Int = {
    val f = points(0).length
    if (points.length < 10) return math.min(f, 2)
    val id = estimateIntrinsicDimension(points)
    math.max(1, math.min(f, math.round(id).toInt))
  }

  /** Penalized Calinski-Harabasz sweep (step2_calinski_harabasz,
    * clustering.rs:167-310), reference-faithful:
    *  - step by range width: ≤5 → 1, ≤15 → 2, else 3;
    *  - per k: best CH over 3 seeded trials (seed = base + k·1000 +
    *    trial), penalized by 0.8·k·ln(n);
    *  - tie-break prefers LARGER k;
    *  - when step > 1, fine-tune around the winner over
    *    {k−step+1, k−1, k, k+1, k+step−1} \ tested (trial seeds
    *    base + k·10000 + trial), replacing only on strictly-better score.
    */
  def step2CalinskiHarabasz(points: Array[Array[Double]], kMin: Int, kMax: Int,
      seed: Long): Int = {
    val n = points.length
    if (n < 10) return kMin
    val kRange = kMax - kMin
    val kStep = if (kRange <= 5) 1 else if (kRange <= 15) 2 else 3
    val candidates = (kMin to kMax by kStep).filter(k => k < n && k >= 2)
    def penalized(k: Int, seedBase: Long): Double = {
      val bestCh = (0 until 3).map { trial =>
        val m = fitLocal(points, k, seedBase + trial)
        calinskiHarabasz(points, m)
      }.max
      bestCh - 0.8 * k * math.log(n.toDouble)
    }
    var bestK = kMin
    var bestScore = Double.NegativeInfinity
    for (k <- candidates) {
      val s = penalized(k, seed + k.toLong * 1000L)
      if (s > bestScore || (s == bestScore && k > bestK)) { bestScore = s; bestK = k }
    }
    if (kStep > 1) {
      val fine = Seq(bestK - (kStep - 1), bestK - 1, bestK, math.min(bestK + 1, kMax),
          math.min(bestK + kStep - 1, kMax))
        .filter(k => k >= kMin && k <= kMax && k < n && !candidates.contains(k))
        .distinct
      for (k <- fine) {
        val s = penalized(k, seed + k.toLong * 10000L)
        if (s > bestScore) { bestScore = s; bestK = k }
      }
    }
    math.min(bestK, kMax)
  }

  /** Optimal-k selection (compute_optimal_k, clustering.rs:36-72):
    * step1 bounds (with the 5·ID cap) → penalized CH sweep; the caller's
    * maxK (pipeline config) is an additional cap on the candidate range.
    */
  def optimalK(points: Array[Array[Double]], seed: Long, maxK: Int): Int = {
    val idEst = intrinsicDimensionInt(points)
    val (kMin0, kMax0) = kBounds(points.length, points(0).length, idEst)
    val kMax = math.max(2, math.min(math.min(kMax0, maxK), points.length))
    val kMin = math.min(kMin0, kMax)
    if (kMax <= kMin) return kMin
    step2CalinskiHarabasz(points, kMin, kMax, seed)
  }

  /** The reference's single-pass incremental clustering in its
    * deterministic (sequential) mode
    * (run_incremental_clustering_with_sampling,
    * /root/reference/src/clustering.rs:547-910 with
    * deterministic_clustering=true ⇒ sequential processing,
    * clustering.rs:842-846). Per row, in order:
    *  - optional seeded sampler gate (the reference's is OS-seeded);
    *  - first row (or empty centroid set) → create centroid;
    *  - create a new centroid when under the cap AND d² > radius·0.5
    *    ("avoid overfitting the radius");
    *  - else if d² ≤ radius → assign + running-mean update
    *    c += (x − c)/(k+1);
    *  - else soft-outlier policy: assign WITHOUT moving the centroid when
    *    d² ≤ 1.5·radius; otherwise drop (assignment None).
    *
    * Driver-local over a sample/collected rows — the order-dependence is
    * inherent to the algorithm; the scalable pipelines use the
    * sample→fit→assign path instead (COVERAGE.md C8).
    */
  def incrementalClustering(rows: Array[Array[Double]], maxClusters: Int,
      radius: Double, sampler: Option[Long => Boolean] = None):
      (Array[Array[Double]], Array[Option[Int]], Array[Int]) = {
    val centroids = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val counts = scala.collection.mutable.ArrayBuffer[Int]()
    val assignments = Array.fill[Option[Int]](rows.length)(None)
    def nearest(row: Array[Double]): (Int, Double) = {
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < centroids.length) {
        val d = sqDist(row, centroids(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (best, bestD)
    }
    for (i <- rows.indices) {
      val row = rows(i)
      val (_, snapDist) = if (centroids.isEmpty) (0, Double.PositiveInfinity) else nearest(row)
      val keep = sampler.forall(f => f(i.toLong))
      if (keep) {
        if (centroids.isEmpty || (centroids.length < maxClusters && snapDist > radius * 0.5)) {
          centroids += row.clone()
          counts += 1
          assignments(i) = Some(centroids.length - 1)
        } else if (snapDist <= radius) {
          val (best, _) = nearest(row)
          val kNew = counts(best) + 1.0
          var j = 0
          while (j < row.length) {
            centroids(best)(j) += (row(j) - centroids(best)(j)) / kNew
            j += 1
          }
          counts(best) += 1
          assignments(i) = Some(best)
        } else {
          val (best, d) = nearest(row)
          if (d <= radius * 1.5) { // soft outlier: count, don't move
            counts(best) += 1
            assignments(i) = Some(best)
          } // else dropped
        }
      }
    }
    (centroids.toArray, assignments, counts.toArray)
  }

  /** Pilot-based clustering radius (compute_threshold_from_pilot,
    * clustering.rs:384-492): fit k-means on the pilot, take the 90th
    * percentile (ceil-rank) of within-cluster squared distances; when
    * within-cluster variance is degenerate (p90 < 1e-8 or p90 / min
    * inter-centroid d² < 0.01), fall back to 0.15 × the minimum
    * inter-centroid squared distance; floor 1e-6; standard radius =
    * 1.5 × p90.
    */
  def thresholdFromPilot(rows: Array[Array[Double]], k: Int, seed: Long): Double = {
    val model = fitLocal(rows, k, seed + 100000L)
    val assign = rows.map(model.assign)
    val dists = rows.indices.map(i => sqDist(rows(i), model.centroids(assign(i)))).sorted
    if (dists.isEmpty) return 1.0
    val p90Idx = math.min(math.ceil(dists.length * 0.9).toInt, dists.length - 1)
    val p90 = dists(p90Idx)
    val counts = new Array[Int](model.k)
    assign.foreach(c => counts(c) += 1)
    val inter = for {
      i <- 0 until model.k
      j <- (i + 1) until model.k
      if counts(i) > 0 && counts(j) > 0
    } yield sqDist(model.centroids(i), model.centroids(j))
    val minInter = if (inter.nonEmpty) inter.min else Double.PositiveInfinity
    val ratio = if (minInter.isFinite && minInter > 0.0) p90 / minInter else 1.0
    if (p90 < 1e-8 || ratio < 0.01) {
      if (inter.nonEmpty) math.max(minInter * 0.15, 1e-6) else 1e-6
    } else math.max(p90 * 1.5, 1e-6)
  }

  /** Two-NN intrinsic-dimension estimate (clustering.rs:101-164): for
    * each sample point, μ = d2/d1 over its two nearest neighbors; MLE
    * ID = n / Σ ln μ. Sample-sized, driver-local, seeded like the
    * reference (≤500 samples).
    */
  def estimateIntrinsicDimension(points: Array[Array[Double]]): Double = {
    val n = points.length
    if (n < 3) return 1.0
    var sumLog = 0.0
    var used = 0
    for (i <- points.indices) {
      var d1 = Double.MaxValue
      var d2 = Double.MaxValue
      for (j <- points.indices if j != i) {
        val d = sqDist(points(i), points(j))
        if (d < d1) { d2 = d1; d1 = d } else if (d < d2) d2 = d
      }
      if (d1 > 1e-24 && d2.isFinite) {
        // μ on euclidean distances = sqrt of the squared ratio
        sumLog += 0.5 * math.log(d2 / d1)
        used += 1
      }
    }
    if (sumLog <= 0.0 || used == 0) 1.0 else used.toDouble / sumLog
  }

  /** Distributed assignment under a broadcast model. */
  def assignAll(ds: Dataset[(Long, Array[Double])], model: Model): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val b = spark.sparkContext.broadcast(model)
    ds.map { case (id, v) => (id, b.value.assign(v)) }.toDF("id", "cluster")
  }
}
