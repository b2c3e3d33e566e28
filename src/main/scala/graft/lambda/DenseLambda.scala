package graft.lambda

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's native dense-vector regime, Spark-side: items are
  * fixed-width f64 vectors; clustering reduces N items to X centroids;
  * the transposed X×F centroid matrix yields an F-node feature graph
  * (the canonical-path transpose, /root/reference/src/graph.rs:170-172 +
  * laplacian.rs:186 — SURVEY.md §0 "critical structural fact"); each
  * item's λ is its synthetic λτ over that feature graph; search blends
  * cosine and λ-proximity.
  *
  * Used for parity tests against reference invariants (λ ∈ [0,1],
  * Rayleigh scale-invariance, α=1 ≡ cosine ranking, k/descending/
  * tie-break semantics) on the embeddings table, and exposed as engine
  * operators (cosine / λ-aware / range search) in SparkEntry.
  */
object DenseLambda {

  /** NOTE graph.eps defaults to 1.0, diverging from the reference's
    * 1e-3 (builder.rs:70) — deliberate; see SURVEY.md Appendix A row
    * D10 (1e-3 on rectified cosine keeps only near-identical neighbors
    * and collapses λ on normalized signatures).
    */
  case class Config(
      maxClusters: Int = 32,
      sampleSize: Int = 1000,
      seed: Long = 42L,
      tau: TauMode = TauMode.Median,
      spectral: Boolean = false, // G6: λ over the Laplacian-of-Laplacian
      graph: GraphBuilder.GraphParams =
        GraphBuilder.GraphParams(eps = 1.0, topk = 6, sigma = None))

  /** Built artifact: the broadcastable feature-graph CSR + per-item λ.
    * `signals` is the optional spectral matrix; when present it is the
    * graph λ is computed against (reference taumode.rs:195-200).
    */
  case class Built(csr: Csr, tau: TauMode, nFeatures: Int, lambdas: DataFrame,
      signals: Option[Csr] = None) {
    def lambdaGraph: Csr = signals.getOrElse(csr)
    /** Release the cached λ table (builds cache it because every search
      * joins it; the owner of the Built controls the lifetime).
      */
    def unpersist(): Unit = { lambdas.unpersist(); () }
  }

  def build(spark: SparkSession, items: Dataset[(Long, Array[Double])],
      cfg: Config = Config()): Built = {
    import spark.implicits._
    // stage 1: clustering (N items → X centroids), seeded + deterministic
    val sample = SeededKMeans.sampleRows(items, cfg.sampleSize, cfg.seed)
    require(sample.nonEmpty, "empty item set")
    val x = math.min(cfg.maxClusters, SeededKMeans.optimalK(sample, cfg.seed, cfg.maxClusters))
    val model = SeededKMeans.fitLocal(sample, x, cfg.seed)
    // stage 2: transpose X×F → F feature nodes with X-dim signatures
    val f = sample(0).length
    val transposed = Array.tabulate(f)(j => Array.tabulate(model.k)(c => model.centroids(c)(j)))
    val csr = GraphBuilder.buildLaplacian(spark, transposed, cfg.graph)
    val signals =
      if (cfg.spectral) Some(GraphBuilder.buildSpectral(spark, csr, cfg.graph)) else None
    // stage 3: per-item λτ (dense formula; τ from the item's own values;
    // graph = signals when spectral is on)
    val bCsr = spark.sparkContext.broadcast(signals.getOrElse(csr))
    val mode = cfg.tau
    // cached: every search joins this table — λ computes once per
    // build, not once per query (the persisted-λ-table shape)
    val lambdas = items.map { case (id, v) =>
      val tau = TauMode.selectTau(v, mode)
      (id, TauMode.syntheticLambdaDense(v, bCsr.value, tau))
    }.toDF("id", "lambda").cache()
    Built(csr, mode, f, lambdas, signals)
  }

  /** prepare_query_item analog: λ of a query vector. */
  def queryLambda(q: Array[Double], built: Built): Double = {
    require(q.forall(x => java.lang.Double.isFinite(x)), "query must be finite")
    val tau = TauMode.selectTau(q, built.tau)
    TauMode.syntheticLambdaDense(q, built.lambdaGraph, tau)
  }

  /** Lambda-aware top-k (search_lambda_aware, core.rs:760-798): full scan
    * scoring α·cos + (1−α)·(1−min(|Δλ|,1)), order by score DESC, id ASC.
    */
  def searchLambdaAware(items: Dataset[(Long, Array[Double])], built: Built,
      q: Array[Double], lambdaQ: Double, k: Int, alpha: Double): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    require(lambdaQ != 0.0, "lambda of the query is 0.0, prepare the item before searching")
    val bq = spark.sparkContext.broadcast(q)
    val scored = items.map { case (id, v) =>
      val cos = GraphBuilder.cosine(bq.value, v)
      (id, v, cos)
    }.toDF("id", "vec", "cos")
      .join(built.lambdas, "id")
      .withColumn("score",
        lit(alpha) * col("cos") +
          lit(1.0 - alpha) * (lit(1.0) - least(abs(lit(lambdaQ) - col("lambda")), lit(1.0))))
      .select(col("id"), col("score"))
    scored.orderBy(col("score").desc, col("id").asc).limit(k)
  }

  /** Pure cosine top-k baseline (the reference benches' ground truth). */
  def cosineTopK(items: Dataset[(Long, Array[Double])], q: Array[Double], k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(q)
    items.map { case (id, v) => (id, GraphBuilder.cosine(bq.value, v)) }
      .toDF("id", "cos")
      .orderBy(col("cos").desc, col("id").asc).limit(k)
  }

  /** One-sided λ range search (core.rs:944-976 quirk: λq − λd ≤ eps). */
  def rangeSearch(built: Built, lambdaQ: Double, eps: Double): DataFrame =
    built.lambdas.filter(lit(lambdaQ) - col("lambda") <= eps)

  /** Hybrid search (search_lambda_aware_hybrid, core.rs:802-928): union of
    * the λ-blended top-k, the single best-cosine item, and every item with
    * cosine > 0.9999; dedup; rank by blended score. One divergence,
    * documented: the reference's final `sort_unstable` leaves ties
    * nondeterministic — we pin the usual (score DESC, id ASC).
    */
  def searchHybrid(items: Dataset[(Long, Array[Double])], built: Built,
      q: Array[Double], lambdaQ: Double, k: Int, alpha: Double): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(q)
    val scored = items.map { case (id, v) => (id, GraphBuilder.cosine(bq.value, v)) }
      .toDF("id", "cos")
      .join(built.lambdas, "id")
      .withColumn("score",
        lit(alpha) * col("cos") +
          lit(1.0 - alpha) * (lit(1.0) - least(abs(lit(lambdaQ) - col("lambda")), lit(1.0))))
      .cache()
    val lambdaTopK = scored.orderBy(col("score").desc, col("id").asc).limit(k).select("id")
    val semanticTop1 = scored.orderBy(col("cos").desc, col("id").asc).limit(1).select("id")
    val highSemantic = scored.filter(col("cos") > 0.9999).select("id")
    val candidates = lambdaTopK.union(semanticTop1).union(highSemantic).distinct()
    // the union reuses `scored` four times — cache for the duration of
    // the top-k, then UNPERSIST (repeated searches must not leak cached
    // partitions); the k-row result is materialized eagerly so the
    // cache can be dropped before returning
    val out = scored.join(candidates, "id")
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc).limit(k)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    scored.unpersist()
    out.toDF("id", "score")
  }

  /** Row-mutation ops with λ recompute (add_items / mul_items /
    * scale_item, core.rs:614-705): mutation yields a NEW immutable
    * Dataset; λ is recomputed for every item against the unchanged graph
    * (the reference recomputes all λs too).
    */
  def mutateItem(items: Dataset[(Long, Array[Double])], built: Built,
      targetId: Long, op: String, otherId: Option[Long] = None,
      scalar: Double = 1.0): (Dataset[(Long, Array[Double])], DataFrame) = {
    val spark = items.sparkSession
    import spark.implicits._
    val other: Array[Double] = otherId
      .map(oid => items.filter(_._1 == oid).head()._2)
      .getOrElse(Array.empty)
    val bOther = spark.sparkContext.broadcast(other)
    val mutated = items.map { case (id, v) =>
      if (id != targetId) (id, v)
      else op match {
        case "add" => (id, v.zip(bOther.value).map { case (a, b) => a + b })
        case "mul" => (id, v.zip(bOther.value).map { case (a, b) => a * b })
        case "scale" => (id, v.map(_ * scalar))
        case bad => throw new IllegalArgumentException(s"op $bad")
      }
    }
    val bCsr = spark.sparkContext.broadcast(built.lambdaGraph)
    val mode = built.tau
    val newLambdas = mutated.map { case (id, v) =>
      (id, TauMode.syntheticLambdaDense(v, bCsr.value, TauMode.selectTau(v, mode)))
    }.toDF("id", "lambda")
    (mutated, newLambdas)
  }
}
