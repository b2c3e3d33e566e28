package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Storage
import graft.lambda.{Csr, DenseLambda, ImplicitProjection, Projection, SeededKMeans}
import java.nio.file.Files
import scala.util.Random

/** Storage round-trips (reference schemas), JL projection semantics,
  * hybrid search, item mutation with λ recompute, intrinsic dimension.
  */
class StorageProjSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._
  val rnd = new Random(5)

  test("dense matrix save/load round-trip with reference schema") {
    val tmp = Files.createTempDirectory("graft-st").toString
    val rows = Seq((0L, Array(1.0, 2.5, -3.0)), (1L, Array(1e-5, 0.0, 7.0)))
      .toDF("id", "vec")
    Storage.saveDenseMatrix(spark, rows, "id", "vec", s"$tmp/dense", "m")
    val loaded = spark.read.parquet(s"$tmp/dense")
    assert(loaded.columns.toSet == Set("name_id", "n_rows", "n_cols", "col_0", "col_1", "col_2"))
    assert(loaded.select("n_rows").first().getLong(0) == 2L)
    val back = Storage.loadDenseMatrix(spark, s"$tmp/dense")
    assert(Storage.denseMatricesEqual(
      rows.withColumnRenamed("id", "name_id").withColumnRenamed("vec", "vector"), back))
  }

  test("sparse matrix save/load round-trip (COO row/col/value)") {
    val tmp = Files.createTempDirectory("graft-st2").toString
    val m = Csr.fromCoo(4, Seq((0, 1, -0.5), (1, 0, -0.5), (0, 0, 0.5), (1, 1, 0.5), (3, 3, 2.0)))
    Storage.saveSparseMatrix(spark, m, s"$tmp/sparse")
    val cols = spark.read.parquet(s"$tmp/sparse").columns.toSet
    assert(cols == Set("row", "col", "value"))
    val back = Storage.loadSparseMatrix(spark, s"$tmp/sparse", 4)
    assert(back.n == m.n && back.nnz == m.nnz)
    for (i <- 0 until 4; j <- 0 until 4)
      assert(math.abs(back.get(i, j) - m.get(i, j)) < 1e-10)
  }

  test("lambda save/load round-trip (row_index/lambda)") {
    val tmp = Files.createTempDirectory("graft-st3").toString
    val l = Seq((0L, 0.25), (1L, 0.75)).toDF("id", "lambda")
    Storage.saveLambda(l, "id", "lambda", s"$tmp/lam")
    val back = Storage.loadLambda(spark, s"$tmp/lam")
    assert(back.columns.toSeq == Seq("row_index", "lambda"))
    assert(back.count() == 2)
  }

  test("metadata sidecar writes valid JSON") {
    val tmp = Files.createTempDirectory("graft-st4").toString
    Storage.saveMetadata(tmp, "idx", Map("k1" -> "1.2", "note" -> "line\nbreak\"q\""))
    val s = Storage.loadMetadata(tmp, "idx")
    assert(s.contains("\"name\": \"idx\"") && s.contains("\\n"))
  }

  test("penalized CH sweep finds the blob count (reference blob fixture band)") {
    // the reference's three-cluster fixture shape
    // (src/tests/test_clustering.rs:242-278): 3 well-separated 2-D blobs
    // of 50 points, sweep [2,10] — accepted band 2..5, expected 3
    val rnd2 = new Random(789)
    def blob(cx: Double, cy: Double) =
      Array.fill(50)(Array(cx + rnd2.nextDouble() - 0.5, cy + rnd2.nextDouble() - 0.5))
    val rows = blob(0, 0) ++ blob(5, 5) ++ blob(10, 10)
    val k = SeededKMeans.step2CalinskiHarabasz(rows, 2, 10, 42L)
    assert(k >= 2 && k <= 5, s"expected k near 3, got $k")
    // determinism: same inputs + seed → same choice
    assert(SeededKMeans.step2CalinskiHarabasz(rows, 2, 10, 42L) == k)
  }

  test("k_max honors the 5·intrinsic-dimension bound (step1_bounds)") {
    // 2000 points on a noisy 1-D line embedded in 10-D: ID ≈ 1 →
    // k_max = min(10, 200, 5·1, 44) = 5, raised to ≥ k_min+1
    val rnd2 = new Random(3)
    val line = Array.fill(300)({
      val t = rnd2.nextDouble() * 100
      Array.tabulate(10)(j => if (j == 0) t else rnd2.nextGaussian() * 0.01)
    })
    val idEst = SeededKMeans.intrinsicDimensionInt(line)
    assert(idEst <= 2, s"line ID should be ~1, got $idEst")
    val (kMin, kMax) = SeededKMeans.kBounds(line.length, 10, idEst)
    assert(kMax == math.max(kMin + 1, 5 * idEst).min(10).min(150) ||
      kMax <= 5 * idEst + kMin + 1) // 5·ID is the binding cap here
    assert(kMax <= math.max(kMin + 1, 5 * idEst))
  }

  test("JL projection: deterministic, linear, dimension formula") {
    val proj = ImplicitProjection(50, 8, seed = 99L)
    val x = Array.fill(50)(rnd.nextDouble() * 2 - 1)
    val y = Array.fill(50)(rnd.nextDouble() * 2 - 1)
    // determinism: same spec => same result (tests/test_reduction.rs:31-43)
    assert(proj.project(x).toSeq == ImplicitProjection(50, 8, 99L).project(x).toSeq)
    // different seed => different projection
    assert(proj.project(x).toSeq != ImplicitProjection(50, 8, 100L).project(x).toSeq)
    // linearity: P(ax + by) == a P(x) + b P(y) (tests/test_reduction.rs:44-96)
    val ax_by = x.zip(y).map { case (a, b) => 2.0 * a + 3.0 * b }
    val lhs = proj.project(ax_by)
    val rhs = proj.project(x).zip(proj.project(y)).map { case (a, b) => 2.0 * a + 3.0 * b }
    lhs.zip(rhs).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // r = max(32, ceil(8 ln n / eps^2)) (reduction.rs:126-139)
    assert(Projection.jlDimension(10, 1.0) == 32)
    assert(Projection.jlDimension(100000, 0.25) ==
      math.ceil(8 * math.log(100000.0) / 0.0625).toInt)
  }

  test("distributed projectAll equals local project") {
    val proj = ImplicitProjection(16, 4, seed = 7L)
    val data = (0L until 20L).map(i => (i, Array.fill(16)(rnd.nextDouble()))).toSeq
    val ds = data.toDS()
    val got = Projection.projectAll(ds, proj).collect().toMap
    data.foreach { case (id, v) =>
      assert(got(id).toSeq == proj.project(v).toSeq)
    }
  }

  test("hybrid search: superset guarantees and k results") {
    val items = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].cache()
    val built = DenseLambda.build(spark, items, DenseLambda.Config(maxClusters = 8))
    val q = items.filter(_._1 == 3L).head()._2
    val lq = DenseLambda.queryLambda(q, built)
    val res = DenseLambda.searchHybrid(items, built, q, lq, 5, alpha = 0.7).collect()
    assert(res.length == 5)
    val scores = res.map(_.getDouble(1)).toSeq
    assert(scores == scores.sortBy(-(_: Double)))
    // the semantic top-1 (item 3 itself, cosine 1) must be present
    assert(res.map(_.getLong(0)).contains(3L))
  }

  test("mutateItem: only target changes; lambda recomputed and valid") {
    val items = Seq(
      (0L, Array(1.0, 0.0, 0.5, 0.2)),
      (1L, Array(0.0, 1.0, 0.5, 0.1)),
      (2L, Array(0.3, 0.3, 0.3, 0.3))).toDS()
    val built = DenseLambda.build(spark, items, DenseLambda.Config(maxClusters = 2))
    val (mutated, newL) = DenseLambda.mutateItem(items, built, 0L, "add", Some(1L))
    val m = mutated.collect().toMap
    m(0L).zip(Seq(1.0, 1.0, 1.0, 0.3)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    assert(m(1L).toSeq == Seq(0.0, 1.0, 0.5, 0.1))
    val l = newL.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(l.size == 3 && l.values.forall(v => v >= 0.0 && v <= 1.0))
    val (scaled, _) = DenseLambda.mutateItem(items, built, 2L, "scale", None, 2.0)
    assert(scaled.collect().toMap.apply(2L).toSeq == Seq(0.6, 0.6, 0.6, 0.6))
  }

  test("spectral Laplacian-of-Laplacian: valid graph over L's rows; lambdas finite") {
    val items = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
    val built = DenseLambda.build(spark, items,
      DenseLambda.Config(maxClusters = 8, spectral = true))
    assert(built.signals.isDefined)
    val sig = built.signals.get
    assert(sig.n == built.csr.n)
    assert(sig.laplacianViolations(1e-8).isEmpty) // it is itself a valid L = D − W
    val l = built.lambdas.collect().map(_.getDouble(1))
    assert(l.forall(v => !v.isNaN && !v.isInfinite)) // spectral λ may leave [0,1]
    // α=1 search unaffected by the λ graph choice
    val q = items.filter(_._1 == 0L).head()._2
    val lq = DenseLambda.queryLambda(q, built)
    val a = DenseLambda.searchLambdaAware(items, built, q, lq, 5, alpha = 1.0)
      .collect().map(_.getLong(0)).toSeq
    val b = DenseLambda.cosineTopK(items, q, 5).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("pilot radius threshold: 1.5×p90 standard path, inter-centroid fallback") {
    // moderate spread: p90/minInter ≥ 0.01 → standard 1.5×p90 path
    val blob = (c: Double) => Array.fill(60)(
      Array(c + rnd.nextGaussian(), c + rnd.nextGaussian()))
    val rows = blob(0.0) ++ blob(10.0)
    val r = SeededKMeans.thresholdFromPilot(rows, 2, seed = 42L)
    assert(r > 1.0 && r < 20.0, s"1.5×p90 of ~chi2(2) spread, got $r")
    // VERY tight clusters: p90/minInter < 0.01 → the reference's fallback
    // 0.15 × min inter-centroid d² fires (clustering.rs:472-487) — note it
    // yields a LARGER radius than the tight within-cluster spread
    val ident = Array.fill(30)(Array(0.0, 0.0)) ++ Array.fill(30)(Array(10.0, 0.0))
    val r2 = SeededKMeans.thresholdFromPilot(ident, 2, seed = 42L)
    assert(math.abs(r2 - 100.0 * 0.15) < 1e-6, s"fallback 15, got $r2")
  }

  test("samplers: deterministic, rate-respecting, density-adaptive formula") {
    import graft.lambda.Samplers
    val s = Samplers.Simple(0.5, seed = 7L)
    val kept = (0L until 10000L).count(s.shouldKeep)
    assert(math.abs(kept / 10000.0 - 0.5) < 0.03)
    assert((0L until 100L).map(s.shouldKeep) == (0L until 100L).map(s.shouldKeep))
    val da = Samplers.DensityAdaptive(0.5, seed = 7L)
    // far points (large d²) sampled MORE than near points
    val rFar = da.adaptiveRate(100.0, 10, 100)
    val rNear = da.adaptiveRate(0.0, 10, 100)
    assert(rFar > rNear)
    // saturation lowers the rate
    assert(da.adaptiveRate(1.0, 100, 100) < da.adaptiveRate(1.0, 0, 100))
    // clamped
    assert(da.adaptiveRate(1e30, 0, 100) == 1.0)
    assert(Samplers.DensityAdaptive(0.001, 7L).adaptiveRate(0.0, 100, 100) == 0.01)
  }

  test("incremental clustering (sequential deterministic mode): semantics") {
    import graft.lambda.SeededKMeans.incrementalClustering
    // two separated blobs, interleaved arrival order
    val rows = (0 until 60).map { i =>
      val c = if (i % 2 == 0) 0.0 else 10.0
      Array(c + rnd.nextGaussian() * 0.05, c)
    }.toArray
    val (cents, assign, counts) = incrementalClustering(rows, maxClusters = 8, radius = 1.0)
    assert(cents.length >= 2 && cents.length <= 8)
    assert(assign.forall(_.isDefined)) // nothing dropped: everything within radius
    assert(counts.sum == 60)
    // deterministic: same input, same output
    val (c2, a2, _) = incrementalClustering(rows, 8, 1.0)
    assert(c2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq && a2.toSeq == assign.toSeq)
    // far outlier beyond 1.5×radius gets dropped once saturated
    val withOutlier = rows ++ Array(Array(1000.0, 1000.0))
    val (cents3, assign3, _) = incrementalClustering(withOutlier, maxClusters = 2, radius = 1.0)
    assert(cents3.length == 2)
    assert(assign3.last.isEmpty, "far outlier must be dropped when saturated")
    // sampler gate: rejecting everything yields no centroids
    val (c4, a4, _) = incrementalClustering(rows, 8, 1.0, sampler = Some(_ => false))
    assert(c4.isEmpty && a4.forall(_.isEmpty))
  }

  test("intrinsic dimension: line ~1, plane ~2, full space higher") {
    def cloud(dim: Int, n: Int): Array[Array[Double]] =
      Array.fill(n)(Array.fill(dim)(rnd.nextDouble()))
    // random positions (a regular grid degenerates Two-NN: d1 == d2)
    val line = Array.fill(200)(Array(rnd.nextDouble() * 2, 0.0, 0.0, 0.0, 0.0))
    val idLine = SeededKMeans.estimateIntrinsicDimension(line)
    assert(idLine < 1.6, s"line ID $idLine")
    val plane = Array.fill(200)(Array(rnd.nextDouble(), rnd.nextDouble(), 0.0, 0.0, 0.0))
    val idPlane = SeededKMeans.estimateIntrinsicDimension(plane)
    assert(idPlane > 1.3 && idPlane < 3.0, s"plane ID $idPlane")
    val full = cloud(5, 300)
    val idFull = SeededKMeans.estimateIntrinsicDimension(full)
    assert(idFull > idPlane, s"full ID $idFull vs plane $idPlane")
  }
}
