package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lambda.{Csr, EnergyMaps, SeededKMeans, TauMode}
import scala.util.Random

/** Energy-only pipeline (E1–E10): compression, bootstrap L₀, diffusion +
  * splitting, energy Laplacian, λ, energy search — mirroring the
  * reference's energy-search tests (tests/test_energy_search.rs) in the
  * deterministic regime.
  */
class EnergySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._
  val rnd = new Random(13)

  lazy val items = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .as[(Long, Array[Double])].cache()
  lazy val built = EnergyMaps.build(spark, items, EnergyMaps.Config(maxClusters = 12))

  test("optical compression hits the token budget and preserves dimensionality") {
    val cents = Array.fill(40)(Array.fill(8)(rnd.nextDouble()))
    val out = EnergyMaps.opticalCompress(cents, 10, 0.1, seed = 42L)
    assert(out.length == 10)
    assert(out.forall(_.length == 8))
    // budget >= input: passthrough
    assert(EnergyMaps.opticalCompress(cents, 100, 0.1, 42L) eq cents)
  }

  test("bootstrap centroid Laplacian is a valid Laplacian in centroid space") {
    val cents = Array.fill(15)(Array.fill(6)(rnd.nextDouble()))
    val l0 = EnergyMaps.bootstrapCentroidLaplacian(spark, cents, 6, normalise = false)
    assert(l0.n == 15)
    assert(l0.laplacianViolations(1e-8).isEmpty)
  }

  test("heat diffusion lowers total Dirichlet energy") {
    val cents = Array.fill(20)(Array.fill(5)(rnd.nextDouble() * 4))
    val l0 = EnergyMaps.bootstrapCentroidLaplacian(spark, cents, 8, normalise = false)
    def dirichlet(m: Array[Array[Double]]): Double = {
      val f = m(0).length
      (0 until f).map { c =>
        val col = Array.tabulate(m.length)(i => m(i)(c))
        col.zip(l0.matvec(col)).map { case (a, b) => a * b }.sum
      }.sum
    }
    val before = dirichlet(cents)
    // diffuseAndSplit returns [diffused work ++ split rows]; the first
    // |cents| rows are exactly the diffused matrix
    val diffused = EnergyMaps.diffuseAndSplit(cents, l0, EnergyMaps.EnergyParams(steps = 4))
    val after = dirichlet(diffused.take(cents.length))
    assert(after <= before + 1e-9, s"diffusion must smooth: $before -> $after")
  }

  test("diffuse_and_split adds two sub-centroids per split node") {
    val cents = Array.fill(20)(Array.fill(5)(rnd.nextDouble()))
    val l0 = EnergyMaps.bootstrapCentroidLaplacian(spark, cents, 8, normalise = false)
    val out = EnergyMaps.diffuseAndSplit(cents, l0, EnergyMaps.EnergyParams())
    assert(out.length >= cents.length)
    assert((out.length - cents.length) % 2 == 0, "splits add pairs")
  }

  test("energy Laplacian: valid, symmetric, deterministic") {
    val sub = Array.fill(18)(Array.fill(6)(rnd.nextDouble()))
    val (gl, lam, gin) = EnergyMaps.buildEnergyLaplacian(spark, sub,
      EnergyMaps.EnergyParams(), lambdaK = 4, normalise = false)
    assert(gl.n == 18)
    assert(gl.laplacianViolations(1e-8).isEmpty)
    assert(lam.length == 18 && gin.length == 18)
    val (gl2, _, _) = EnergyMaps.buildEnergyLaplacian(spark, sub,
      EnergyMaps.EnergyParams(), lambdaK = 4, normalise = false)
    assert(gl.values.toSeq == gl2.values.toSeq && gl.indices.toSeq == gl2.indices.toSeq)
  }

  test("robust scale: MAD with floor") {
    assert(EnergyMaps.robustScale(Array(1.0, 1.0, 1.0)) == 1e-9 * 1.4826 ||
      EnergyMaps.robustScale(Array(1.0, 1.0, 1.0)) == 1e-9)
    val s = EnergyMaps.robustScale(Array(1.0, 2.0, 3.0, 4.0, 100.0))
    assert(s > 1.0 && s < 3.0) // MAD immune to the outlier
  }

  test("build over embeddings: finite lambdas for every item, deterministic") {
    val l = built.lambdas.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(l.length == items.count())
    assert(l.forall { case (_, v) => !v.isNaN && !v.isInfinite })
    val b2 = EnergyMaps.build(spark, items, EnergyMaps.Config(maxClusters = 12))
    val l2 = b2.lambdas.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(l.sortBy(_._1).toSeq == l2.sortBy(_._1).toSeq)
  }

  test("energy search: query item ranks itself first; k results descending") {
    val q = items.filter(_._1 == 5L).head()._2
    val res = EnergyMaps.searchEnergy(items, built, q, 8).collect()
    assert(res.length == 8)
    assert(res.head.getLong(0) == 5L, s"self-distance 0 must win: ${res.toSeq}")
    val scores = res.map(_.getDouble(1)).toSeq
    assert(scores == scores.sortBy(-(_: Double)))
  }

  test("energy search scores items OUTSIDE the build set (λ fallback, nothing dropped)") {
    import spark.implicits._
    val q = items.filter(_._1 == 5L).head()._2
    // an item id the build never saw, with the query's own vector — it
    // must appear (and win: self-distance 0 ties id 5, larger id loses
    // the tie-break but must still be PRESENT)
    val extra = items.union(spark.createDataset(Seq((99999L, q))))
    val res = EnergyMaps.searchEnergy(extra, built, q, 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(res.map(_._1).contains(99999L), s"unbuilt item dropped: $res")
    assert(res.head._1 == 5L && res(1)._1 == 99999L, s"$res")
    assert(math.abs(res.head._2 - res(1)._2) < 1e-12)
  }

  test("optical compression path end-to-end") {
    val b = EnergyMaps.build(spark, items,
      EnergyMaps.Config(maxClusters = 12,
        energy = EnergyMaps.EnergyParams(opticalTokens = Some(8))))
    assert(b.glEnergy.n <= 8)
    assert(b.lambdas.count() == items.count())
  }
}
