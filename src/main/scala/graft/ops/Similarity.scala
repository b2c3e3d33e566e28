package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.lambda.{GraphBuilder, SeededKMeans}
import graft.util.Hashing
import graft.util.Hashing.Rng

/** Approximate-nearest-neighbor search over an embedding column.
  * Brute-force cosine top-k (DenseLambda.cosineTopK) is the exact
  * baseline; the scale paths are IVF (cluster-pruned scan: only
  * `nprobe` of `nlist` partitions are touched per query) and
  * random-hyperplane LSH (bucket equality prunes candidates before
  * exact scoring).
  */
object Similarity {

  // ---- IVF -------------------------------------------------------------

  case class IvfIndex(model: SeededKMeans.Model, assigned: DataFrame /* id, cluster */)

  def buildIvf(items: Dataset[(Long, Array[Double])], nlist: Int, seed: Long = 42L,
      sampleSize: Int = 2000): IvfIndex = {
    val sample = SeededKMeans.sampleRows(items, sampleSize, seed)
    val model = SeededKMeans.fitLocal(sample, nlist, seed)
    IvfIndex(model, SeededKMeans.assignAll(items, model))
  }

  /** IVF query: score only items in the `nprobe` nearest clusters. The
    * cluster filter prunes the scan (at scale: cluster = partition key →
    * partition pruning at the source).
    */
  /** The `nprobe` clusters nearest to `q` (squared L2 to the centroid,
    * ties by cluster id) — the probe set both IVF query paths share and
    * the ann_ivf oracle gate exports.
    */
  def probeClusters(model: SeededKMeans.Model, q: Array[Double],
      nprobe: Int): Seq[Int] =
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, SeededKMeans.sqDist(q, c)) }
      .sortBy { case (i, d) => (d, i) }
      .take(nprobe).map(_._1).toSeq

  def ivfTopK(items: Dataset[(Long, Array[Double])], ivf: IvfIndex,
      q: Array[Double], k: Int, nprobe: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val byDist = probeClusters(ivf.model, q, nprobe).toSet
    val bq = spark.sparkContext.broadcast(q)
    items.toDF("id", "vec")
      .join(ivf.assigned, "id")
      .filter(col("cluster").isin(byDist.toSeq: _*))
      .as[(Long, Array[Double], Int)]
      .map { case (id, v, _) => (id, GraphBuilder.cosine(bq.value, v)) }
      .toDF("id", "cos")
      .orderBy(col("cos").desc, col("id").asc).limit(k)
  }

  /** Materialize the IVF index as a CLUSTER-PARTITIONED parquet layout:
    * one `cluster=<c>/` partition directory per centroid. This is the
    * 100 TB shape — nprobe selection becomes PARTITION PRUNING at the
    * source (the scan's PartitionFilters carry `cluster IN (…)`), so a
    * query reads only nprobe/nlist of the data from storage instead of
    * filtering a joined assignment table at runtime.
    */
  def materializeIvf(items: Dataset[(Long, Array[Double])], nlist: Int,
      dir: String, seed: Long = 42L, sampleSize: Int = 2000): IvfIndex = {
    val ivf = buildIvf(items, nlist, seed, sampleSize)
    items.toDF("id", "vec")
      .join(ivf.assigned, "id")
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)
    ivf
  }

  /** IVF query over the materialized layout: only the `nprobe` nearest
    * clusters' PARTITIONS are read (partition pruning, not a runtime
    * filter over the full table).
    */
  def ivfTopKPruned(spark: SparkSession, model: SeededKMeans.Model, dir: String,
      q: Array[Double], k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val byDist = probeClusters(model, q, nprobe)
    val bq = spark.sparkContext.broadcast(q)
    spark.read.parquet(dir)
      .filter(col("cluster").isin(byDist: _*))
      .select(col("id"), col("vec"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, GraphBuilder.cosine(bq.value, v)) }
      .toDF("id", "cos")
      .orderBy(col("cos").desc, col("id").asc).limit(k)
  }

  // ---- random-hyperplane LSH ------------------------------------------

  /** Seeded Gaussian hyperplanes: nPlanes × dim, regenerated from the
    * seed on demand (the reference's store-only-the-seed trick,
    * /root/reference/src/reduction.rs:168-202).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    Array.tabulate(nPlanes) { p =>
      val rng = new Rng(Hashing.hash64(seed, "plane", p.toString))
      Array.fill(dim)(rng.nextGaussian())
    }
  }

  def signBits(v: Array[Double], planes: Array[Array[Double]]): String = {
    val sb = new StringBuilder(planes.length)
    planes.foreach { p =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * p(i); i += 1 }
      sb.append(if (s >= 0) '1' else '0')
    }
    sb.toString
  }

  /** (id, bucket) sign-bucket table. */
  def lshBuckets(items: Dataset[(Long, Array[Double])], nPlanes: Int,
      seed: Long = 42L): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val dim = items.head()._2.length
    val bPlanes = spark.sparkContext.broadcast(hyperplanes(nPlanes, dim, seed))
    items.map { case (id, v) => (id, signBits(v, bPlanes.value)) }.toDF("id", "bucket")
  }

  /** Every bit-string within Hamming distance ≤ r of `s` — the
    * multi-probe enumeration (Σ_{d≤r} C(|s|,d) strings; 79 for |s|=12,
    * r=2). Exponential in r: callers keep r small and |s| moderate,
    * which is exactly the multi-probe LSH regime.
    */
  def hammingBall(s: String, r: Int): Seq[String] =
    (0 to math.min(r, s.length)).flatMap { d =>
      (0 until s.length).combinations(d).map { idxs =>
        val a = s.toCharArray
        idxs.foreach(i => a(i) = if (a(i) == '0') '1' else '0')
        new String(a)
      }
    }

  /** LSH query: exact cosine only over items whose bucket is within
    * `maxHamming` of the query's bucket (multi-probe by Hamming ball).
    *
    * The ball is ENUMERATED and probed with bucket equality (`isin`),
    * never with a per-row Hamming computation over the whole bucket
    * table: against a persisted bucket table the In-list reaches the
    * scan as a pushed filter (min/max + dictionary row-group pruning),
    * and at cluster scale the same list is a broadcastable key set —
    * the probe cost follows the ball size, not the corpus size.
    */
  def lshTopK(items: Dataset[(Long, Array[Double])], buckets: DataFrame,
      q: Array[Double], k: Int, nPlanes: Int, seed: Long = 42L,
      maxHamming: Int = 2): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val dim = q.length
    val planes = hyperplanes(nPlanes, dim, seed)
    val qb = signBits(q, planes)
    val bq = spark.sparkContext.broadcast(q)
    val cand = buckets.filter(col("bucket").isin(hammingBall(qb, maxHamming): _*))
    items.toDF("id", "vec").join(cand, "id")
      .as[(Long, Array[Double], String)]
      .map { case (id, v, _) => (id, GraphBuilder.cosine(bq.value, v)) }
      .toDF("id", "cos")
      .orderBy(col("cos").desc, col("id").asc).limit(k)
  }

  /** Recall@k of an approximate result against the exact one. */
  def recallAtK(approx: Seq[Long], exact: Seq[Long]): Double =
    if (exact.isEmpty) 1.0
    else approx.toSet.intersect(exact.toSet).size.toDouble / exact.size
}
