package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.BM25

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry has a DuckDB-replayable `oracleSql` twin unless
  * the operator is not SQL-expressible (then the driver records a weaker
  * rows-only check). Column names and value rounding are pinned on BOTH
  * sides because the driver hash-compares values after sorting columns
  * by name.
  */
object SparkEntry {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Oracle-artifact export root. Formerly non-SQL-expressible gates
    * (λ/graph/blend searches) export the engine's OWN built artifacts —
    * λ tables, graph-Laplacian COO edges, query-λ/ubNorm scalars — here,
    * and their oracleSql reads them back as INPUT tables via
    * read_parquet, then independently recomputes the search/ranking
    * math in SQL (mirroring the reference's own persisted artifacts,
    * /root/reference/src/storage/parquet.rs:344-449, 637-746). The path
    * is FIXED because oracleSql is a static map: each Verify run
    * overwrites the exports for its sf dir before the driver replays
    * the SQL (the driver's flow runs them back-to-back; concurrent
    * Verify runs against different sf dirs would race these files and
    * are not a driver flow).
    */
  val OracleExportDir = "/tmp/graft_oracle"

  private def exportOracle(df: DataFrame, gate: String, name: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$OracleExportDir/$gate/$name")

  /** One-row parquet of named scalar doubles (query-λ, ubNorm, …). */
  private def exportParams(s: SparkSession, gate: String, kv: (String, Double)*): Unit = {
    val one = kv.foldLeft(s.range(1).toDF())((d, p) => d.withColumn(p._1, lit(p._2)))
    exportOracle(one.drop("id"), gate, "params")
  }

  /** (doc_id, term) token stream of the documents table, SQL-replayable
    * tokenizer mode (lower + split [^a-z0-9]+).
    */
  private def docTokens(spark: SparkSession, dir: String): DataFrame =
    BM25.tokensSimple(table(spark, dir, "documents"), "text")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    BM25.scoreExact(
      BM25.termFreq(docTokens(spark, dir)),
      BM25.docLengths(docTokens(spark, dir)),
      Seq("spark", "query", "vector"), k = 10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- relational warm-ups over the TPC-H-ish tables -------------------
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // multi-table join: broadcast dims (nation/region/customer) against
    // the fact tables, grouped revenue per nation+segment
    "q_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),
    // window top-k: per-supplier top-3 lineitems by revenue (the same
    // Window+row_number pattern the graph sparsifier uses)
    "q_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("rev").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      table(s, dir, "lineitem")
        .withColumn("rev", round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("l_suppkey"), col("rk"), col("l_orderkey"), col("l_linenumber"), col("rev"))
    }),
    // semi/anti joins: customers with vs without any order
    "q_semi_anti" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey")).withColumn("has_orders", lit(1))
      val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey")).withColumn("has_orders", lit(0))
      withO.union(withoutO)
    }),

    // -- tokenizer / doc-stats / vocabulary ------------------------------
    "doc_tokens_tf" -> ((s, dir) => BM25.termFreq(docTokens(s, dir))),
    "doc_stats" -> ((s, dir) => BM25.docLengths(docTokens(s, dir))),
    "vocab_df" -> ((s, dir) => BM25.termDf(BM25.termFreq(docTokens(s, dir)))),

    // -- exact BM25 top-k (phase-3 minimum slice) ------------------------
    "bm25_topk" -> ((s, dir) => {
      val toks = docTokens(s, dir)
      BM25.scoreExact(BM25.termFreq(toks), BM25.docLengths(toks),
        Seq("spark", "query", "vector"), k = 10)
    }),

    // -- compressed inverted index + block-max WAND ----------------------
    // (full engine path: docIds → sharded delta/FOR posting lists →
    // distributed WAND; the oracle is plain SQL BM25, proving the
    // compressed path is exact)
    "wand_topk" -> ((s, dir) => {
      documentsIndex(s, dir).wandTopK(Seq("stream", "merge", "window"), 10, roundTo = 4)
    }),
    // epoch-append ingest: index built over the FIRST half of the
    // corpus, second half APPENDED as an epoch (snapshot ingest) — the
    // oracle is plain SQL BM25 over the FULL corpus, proving base+epoch
    // queries (including cross-epoch avgdl bound lifting) are exact
    "wand_topk_appended" -> ((s, dir) => {
      documentsIndexAppended(s, dir).wandTopK(Seq("spark", "merge", "window"), 10, roundTo = 4)
    }),
    // batched WAND (decode-once lists + map-side TopKAgg rank): per-qid
    // ranks must equal the plain SQL BM25 ranking — the pure-BM25 batch
    // path's own oracle gate (blended_batch_alpha1 covers the blended
    // batch; this covers wandTopKBatch directly)
    "wand_topk_batch" -> ((s, dir) => {
      documentsIndex(s, dir).wandTopKBatch(Seq(
          0 -> Seq("stream", "merge", "window"),
          1 -> Seq("spark", "query", "vector")), 10)
        .select(col("qid"), col("rank"), col("doc_id"))
    }),

    // -- dense vector regime over the embeddings table -------------------
    "cosine_topk" -> ((s, dir) => {
      val items = embeddingItems(s, dir)
      val q = items.filter(_._1 == 0L).head()._2
      graft.lambda.DenseLambda.cosineTopK(items, q, 10)
        .withColumn("cos", round(col("cos"), 6))
        .withColumnRenamed("id", "vec_id")
    }),
    // λτ spectral index per item. ORACLE (since r5): the feature-graph
    // Laplacian COO is exported as an input table and DuckDB recomputes
    // the dense synthetic λ — τ = median of the item's own values
    // (floor 1e-10), E = xᵀLx/xᵀx, G = Σ((w·d²)/ΣE)², λ = τ·E/(E+τ) +
    // (1−τ)·clamp(G,0,1) — per item; both sides floored to 1e-6.
    "lambda_dense" -> ((s, dir) => {
      import s.implicits._
      val items = embeddingItems(s, dir)
      val built = graft.lambda.DenseLambda.build(s, items,
        graft.lambda.DenseLambda.Config(maxClusters = 16))
      val g = built.lambdaGraph
      val coo = for {
        i <- 0 until g.n
        k <- g.indptr(i) until g.indptr(i + 1)
      } yield (i.toLong, g.indices(k).toLong, g.values(k))
      exportOracle(coo.toDF("i", "j", "v"), "lambda_dense", "graph")
      built.lambdas.withColumnRenamed("id", "vec_id")
        .withColumn("lambda", floor(col("lambda") * 1e6) / 1e6)
    }),
    // λ-aware blended search (α=0.9), reference Q1 semantics. ORACLE:
    // exported λ table + λq; DuckDB recomputes cos and the blend rank.
    "lambda_search" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val items = embeddingItems(s, dir)
      val built = graft.lambda.DenseLambda.build(s, items,
        graft.lambda.DenseLambda.Config(maxClusters = 16))
      val q = items.filter(_._1 == 0L).head()._2
      val lq = graft.lambda.DenseLambda.queryLambda(q, built)
      exportOracle(built.lambdas.withColumnRenamed("id", "vec_id"),
        "lambda_search", "lambdas")
      exportParams(s, "lambda_search", "lq" -> lq)
      graft.lambda.DenseLambda.searchLambdaAware(items, built, q, lq, 10, alpha = 0.9)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("rank"), col("id").as("vec_id"))
    }),
    // per-doc λτ over the term-cooccurrence graph (north-star signal).
    // ORACLE: docterms + graph COO + vocab exported; DuckDB recomputes
    // the SPARSE synthetic λ per doc (τ = mean over the full F-dim
    // vector = Σw/F floored 1e-10; off-support edge terms counted twice
    // by symmetry); both sides floored to 1e-6.
    "doc_lambda" -> ((s, dir) => {
      val li = documentsLambda(s, dir)
      exportOracle(s.read.parquet(s"${li.dir}/graph"), "doc_lambda", "graph")
      exportOracle(s.read.parquet(s"${li.dir}/docterms"), "doc_lambda", "docterms")
      exportOracle(s.read.parquet(s"${li.dir}/vocab"), "doc_lambda", "vocab")
      li.lambdas.withColumn("lambda", floor(col("lambda") * 1e6) / 1e6)
    }),
    // BM25 + λ blended top-k (α=0.7) over the documents index. ORACLE:
    // exported λ table + (λq, ubNorm); DuckDB recomputes BM25 from the
    // documents table and the blend rank (rank-identity gate).
    "blended_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = documentsLambda(s, dir)
      val idx = documentsIndex(s, dir)
      val (lq, ubNorm) = li.blendInputs(idx, "stream merge window")
      exportOracle(li.lambdas, "blended_topk", "lambdas")
      exportParams(s, "blended_topk", "lq" -> lq, "ub_norm" -> ubNorm)
      li.blendedTopK(idx, "stream merge window", 10, alpha = 0.7)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("rank"), col("doc_id"))
    }),

    // -- deduplication suite ---------------------------------------------
    "dedup_exact" -> ((s, dir) =>
      graft.ops.Dedup.exactDedup(table(s, dir, "documents"), "text", "doc_id")),
    "shingle_jaccard" -> ((s, dir) =>
      graft.ops.Dedup.jaccardPairs(table(s, dir, "documents"), "text", "doc_id", 3, 0.5)),
    "minhash_lsh" -> ((s, dir) =>
      graft.ops.Dedup.lshCandidates(graft.ops.Dedup.lshBuckets(
        graft.ops.Dedup.minhashRows(table(s, dir, "documents"), "text", "doc_id", 3, 16), 4))),
    "simhash64" -> ((s, dir) =>
      graft.ops.Dedup.simhash64(table(s, dir, "documents"), "text", "doc_id")),
    "emb_neardup" -> ((s, dir) =>
      graft.ops.Dedup.embeddingNearDups(
        table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
        "vec_id", "embedding", 0.4)),

    // -- text analysis ----------------------------------------------------
    "lang_id" -> ((s, dir) =>
      graft.ops.TextStats.langId(table(s, dir, "documents"), "text", "doc_id")),
    "quality" -> ((s, dir) =>
      graft.ops.TextStats.qualityScore(table(s, dir, "documents"), "text", "doc_id")),
    "token_counts" -> ((s, dir) =>
      graft.ops.TextStats.tokenCounts(table(s, dir, "documents"), "text", "doc_id")),
    // ORACLE (since r5): the engine's Rabin–Karp gram-hash stream is the
    // exported input; DuckDB independently replays the winnowing
    // window-min (rightmost-tie) selection over it.
    "fingerprint" -> ((s, dir) => {
      exportOracle(graft.ops.TextStats.fingerprintGrams(
        table(s, dir, "documents"), "text", "doc_id"), "fingerprint", "grams")
      graft.ops.TextStats.fingerprint(table(s, dir, "documents"), "text", "doc_id")
    }),
    "pii_redact" -> ((s, dir) =>
      graft.ops.TextStats.redactPii(table(s, dir, "documents"), "text", "doc_id")),
    "rep_ratio" -> ((s, dir) =>
      graft.ops.TextStats.repetitionRatio(table(s, dir, "documents"), "text", "doc_id")),

    // -- similarity search over embeddings --------------------------------
    // IVF runs over the MATERIALIZED cluster-partitioned layout: nprobe
    // selection = partition pruning at the parquet source (OpsSpec
    // asserts PartitionFilters in the scan)
    // ORACLE (since r5): the engine's cluster-assignment table and its
    // probed-cluster list are exported; DuckDB reproduces "exact cosine
    // top-k restricted to the probed clusters" independently — the IVF
    // candidate-pruning semantics, not just a rows count.
    "ann_ivf" -> ((s, dir) => {
      import s.implicits._
      val items = embeddingItems(s, dir)
      val ivfDir = s"/tmp/graft_ivf_${ivfKey(s, dir)}_16"
      val ivf = graft.ops.Similarity.materializeIvf(items, nlist = 16, ivfDir)
      val q = items.filter(_._1 == 0L).head()._2
      exportOracle(ivf.assigned.withColumnRenamed("id", "vec_id"), "ann_ivf", "assigned")
      exportOracle(graft.ops.Similarity.probeClusters(ivf.model, q, nprobe = 4)
        .toDF("cluster"), "ann_ivf", "probed")
      graft.ops.Similarity.ivfTopKPruned(s, ivf.model, ivfDir, q, 10, nprobe = 4)
        .withColumn("cos", round(col("cos"), 6))
        .withColumnRenamed("id", "vec_id")
    }),
    // ORACLE (since r5): exported (id, bucket) table + the query's
    // Hamming-ball probe list; DuckDB reproduces "exact cosine top-k
    // over bucket-matching candidates".
    "ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val items = embeddingItems(s, dir)
      val buckets = graft.ops.Similarity.lshBuckets(items, nPlanes = 12)
      val q = items.filter(_._1 == 0L).head()._2
      val qb = graft.ops.Similarity.signBits(q,
        graft.ops.Similarity.hyperplanes(12, q.length, 42L))
      exportOracle(buckets.withColumnRenamed("id", "vec_id"), "ann_lsh", "buckets")
      exportOracle(graft.ops.Similarity.hammingBall(qb, 2).toDF("bucket"),
        "ann_lsh", "probed")
      graft.ops.Similarity.lshTopK(items, buckets, q, 10, nPlanes = 12)
        .withColumn("cos", round(col("cos"), 6))
        .withColumnRenamed("id", "vec_id")
    }),
    // LSH with the Hamming ball at full radius covers every bucket —
    // degenerates to exact brute force: SQL-oracle-checkable proof of
    // the multi-probe machinery (the ann_ivf_exact pattern)
    "ann_lsh_exact" -> ((s, dir) => {
      val items = embeddingItems(s, dir)
      val buckets = graft.ops.Similarity.lshBuckets(items, nPlanes = 8)
      val q = items.filter(_._1 == 0L).head()._2
      graft.ops.Similarity.lshTopK(items, buckets, q, 10, nPlanes = 8, maxHamming = 8)
        .withColumn("cos", round(col("cos"), 6))
        .withColumnRenamed("id", "vec_id")
    }),

    // -- event-stream analytics (batch form of the streaming ops) --------
    "events_window" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))),
    "events_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // -- multimodal: REAL PNG/WAV/AVI header decode, byte-level oracle —
    // synthesize embeds id-derived dims into real headers; decode parses
    // them back from bytes alone; the oracle recomputes the arithmetic
    "mm_decode" -> ((s, dir) =>
      graft.ops.Multimodal.decode(
        graft.ops.Multimodal.synthesize(table(s, dir, "documents"), "doc_id", "text"))),

    // energy-only pipeline search (E8) over embeddings. ORACLE: exported
    // energy-λ table + λq; score = −(wλ·|λq−λ| + wD·min(‖q−x‖/(1+‖q−x‖),1))
    // recomputed in SQL (rank-identity gate).
    "energy_search" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val items = embeddingItems(s, dir)
      val built = graft.lambda.EnergyMaps.build(s, items,
        graft.lambda.EnergyMaps.Config(maxClusters = 12))
      val q = items.filter(_._1 == 0L).head()._2
      exportOracle(built.lambdas.withColumnRenamed("id", "vec_id"),
        "energy_search", "lambdas")
      exportParams(s, "energy_search",
        "lq" -> graft.lambda.EnergyMaps.queryLambda(q, built))
      graft.lambda.EnergyMaps.searchEnergy(items, built, q, 10)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("rank"), col("id").as("vec_id"))
    }),
    // hybrid search (Q2): λ-top-k ∪ semantic-top-1 ∪ cos>0.9999. ORACLE:
    // exported λ table + λq; DuckDB rebuilds the candidate union and the
    // blended rank (rank-identity gate).
    "hybrid_search" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val items = embeddingItems(s, dir)
      val built = graft.lambda.DenseLambda.build(s, items,
        graft.lambda.DenseLambda.Config(maxClusters = 16))
      val q = items.filter(_._1 == 0L).head()._2
      val lq = graft.lambda.DenseLambda.queryLambda(q, built)
      exportOracle(built.lambdas.withColumnRenamed("id", "vec_id"),
        "hybrid_search", "lambdas")
      exportParams(s, "hybrid_search", "lq" -> lq)
      graft.lambda.DenseLambda.searchHybrid(items, built, q, lq, 10, alpha = 0.9)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("rank"), col("id").as("vec_id"))
    }),
    // ZSET-style ordered λ-band paging (Q5). ORACLE: the exported λ
    // table is the input; the band/order/offset/limit replays in SQL
    // with byte-identical doubles.
    "lambda_zrange" -> ((s, dir) => {
      val li = documentsLambda(s, dir)
      exportOracle(li.lambdas, "lambda_zrange", "lambdas")
      li.rangeByScore(0.0, 1.0, offset = 5, count = 10)
    }),

    // IVF with nprobe == nlist degenerates to exact brute force —
    // SQL-oracle-checkable proof of the ANN machinery (over the
    // materialized partition-pruned layout)
    "ann_ivf_exact" -> ((s, dir) => {
      val items = embeddingItems(s, dir)
      val ivfDir = s"/tmp/graft_ivf_${ivfKey(s, dir)}_8"
      val ivf = graft.ops.Similarity.materializeIvf(items, nlist = 8, ivfDir)
      val q = items.filter(_._1 == 0L).head()._2
      graft.ops.Similarity.ivfTopKPruned(s, ivf.model, ivfDir, q, 10, nprobe = 8)
        .withColumn("cos", round(col("cos"), 6))
        .withColumnRenamed("id", "vec_id")
    }),
    // α=1 blended ranking must equal the pure BM25 ranking (rank-identity
    // through the gate: emit ranks, not the rescaled scores)
    "blended_alpha1" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val top = documentsLambda(s, dir)
        .blendedTopK(documentsIndex(s, dir), "spark query vector", 10, alpha = 1.0)
      top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("rank"), col("doc_id"))
    }),
    // blended search over an APPENDED index (λ pipeline covers base +
    // epoch termfreq) at α=1: rank ≡ full-corpus BM25 — closes the
    // epoch/λ/blend loop at the gate level
    "blended_appended_alpha1" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val idx = documentsIndexAppended(s, dir)
      val li = graft.lambda.LambdaPipeline.build(s, idx,
        s"/tmp/graft_doclam_apnd_${new java.io.File(dir).getName}",
        graft.lambda.LambdaPipeline.Config(vocabSize = 256, maxClusters = 16, seed = 42L))
      li.blendedTopK(idx, "spark merge window", 10, alpha = 1.0)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("rank"), col("doc_id"))
    }),
    // INCREMENTAL λ ingest (frozen-graph appendEpochs) at α=1: the
    // union λ table (base pipeline + per-epoch incremental dirs) must
    // blend to the full-corpus BM25 ranking — exercises the
    // O(new docs) snapshot-ingest λ path end-to-end
    "blended_appended_inc_alpha1" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (idx, li) = documentsLambdaInc(s, dir)
      li.blendedTopK(idx, "spark merge window", 10, alpha = 1.0)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("rank"), col("doc_id"))
    }),
    // batched blended search at α=1: per-query ranks must equal the pure
    // BM25 ranking (the batch serving path's rank-identity oracle)
    "blended_batch_alpha1" -> ((s, dir) => {
      val li = documentsLambda(s, dir)
      li.blendedTopKBatch(documentsIndex(s, dir),
          Seq(0 -> "spark query vector", 1 -> "stream merge window"), 10, alpha = 1.0)
        .select(col("qid"), col("rank"), col("doc_id"))
    }),
    // full near-dedup pipeline: LSH candidates -> Jaccard verify -> keep set
    "near_dedup_keep" -> ((s, dir) =>
      graft.ops.Dedup.nearDedupKeep(table(s, dir, "documents"), "text", "doc_id",
        n = 3, numHashes = 16, rowsPerBand = 4, minJ = 0.5)),

    // α=1 λ-aware search ranks identically to pure cosine (rank-identity
    // oracle — positive α scaling plus a vanished λ term preserve order)
    "lambda_search_alpha1" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val items = embeddingItems(s, dir)
      val built = graft.lambda.DenseLambda.build(s, items,
        graft.lambda.DenseLambda.Config(maxClusters = 16))
      val q = items.filter(_._1 == 0L).head()._2
      val lq = graft.lambda.DenseLambda.queryLambda(q, built)
      graft.lambda.DenseLambda.searchLambdaAware(items, built, q, lq, 10, alpha = 1.0)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("rank"), col("id").as("vec_id"))
    }),
    // α=1 hybrid search: the union candidates (λ-top-k ∪ semantic-top-1 ∪
    // cos>0.9999) re-ranked by score=cos must equal the cosine top-k
    "hybrid_alpha1" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val items = embeddingItems(s, dir)
      val built = graft.lambda.DenseLambda.build(s, items,
        graft.lambda.DenseLambda.Config(maxClusters = 16))
      val q = items.filter(_._1 == 0L).head()._2
      val lq = graft.lambda.DenseLambda.queryLambda(q, built)
      graft.lambda.DenseLambda.searchHybrid(items, built, q, lq, 10, alpha = 1.0)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("rank"), col("id").as("vec_id"))
    }),
    // energy search with wλ=0 and no spectral signals ranks by
    // boundedL2(q−x), monotone in plain L2 → SQL-expressible rank oracle
    "energy_search_dirichlet" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val items = embeddingItems(s, dir)
      val built = graft.lambda.EnergyMaps.build(s, items,
        graft.lambda.EnergyMaps.Config(maxClusters = 12))
      val q = items.filter(_._1 == 0L).head()._2
      graft.lambda.EnergyMaps.searchEnergy(items, built, q, 10,
          wLambda = 0.0, wDirichlet = 0.5, signals = None)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("rank"), col("id").as("vec_id"))
    })
  )

  def embeddingItems(s: SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
  }

  /** Key for the materialized /tmp IVF layouts: absolute-path hash +
    * embeddings content fingerprint. Basename-only keying let two sf
    * dirs with the same basename under different parents (or
    * regenerated data at the same path) resume each other's layout —
    * the documentsFp pattern applied to the ANN caches. One cheap scan,
    * memoized per session (same contract as documentsFp: regeneration
    * at the same path is caught across processes — the driver's runs
    * are fresh JVMs — not within one live session).
    */
  private val embFpCache = new scala.collection.concurrent.TrieMap[String, String]()
  private def ivfKey(s: SparkSession, dir: String): String =
    embFpCache.getOrElseUpdate(dir, {
      val r = table(s, dir, "embeddings")
        .agg(count(lit(1)).as("n"), sum(col("vec_id")).as("ids"),
          sum(crc32(element_at(col("embedding"), 1).cast("string"))).as("crc"))
        .collect()(0)
      java.lang.Long.toHexString(graft.util.Hashing.hash64(0x697666L,
        new java.io.File(dir).getAbsolutePath,
        s"${r.getLong(0)}:${r.getLong(1)}:${r.getLong(2)}"))
    })

  def documentsLambda(s: SparkSession, dir: String): graft.lambda.LambdaIndex = {
    val sfName = new java.io.File(dir).getName
    graft.lambda.LambdaPipeline.build(s, documentsIndex(s, dir),
      s"/tmp/graft_doclam_$sfName",
      graft.lambda.LambdaPipeline.Config(vocabSize = 256, maxClusters = 16, seed = 42L))
  }

  /** Content fingerprint of a testdata documents table: row count + sum
    * of crc32(text) + sum of ids. Folding content into the staged-index
    * key means regenerated data at the SAME path invalidates the /tmp
    * artifacts instead of silently resuming an index over the old corpus
    * (one cheap scan, memoized per session).
    */
  private val contentFpCache = new scala.collection.concurrent.TrieMap[String, String]()
  private def documentsFp(s: SparkSession, dir: String): String =
    contentFpCache.getOrElseUpdate(dir, {
      val r = table(s, dir, "documents")
        .agg(count(lit(1)).as("n"), sum(crc32(col("text"))).as("crc"),
          sum(col("doc_id")).as("ids")).collect()(0)
      s"${r.getLong(0)}:${r.getLong(1)}:${r.getLong(2)}"
    })

  /** Inverted index over the documents table (built once per sf dir into
    * /tmp and resumed on later calls via stage lineage).
    */
  def documentsIndex(s: SparkSession, dir: String): graft.index.InvertedIndex = {
    import s.implicits._
    def docs = table(s, dir, "documents")
      .select(col("doc_id").as("docId"), col("source").as("repo"),
        col("doc_id").cast("string").as("path"), lit("").as("commit"),
        col("lang"), col("text").as("content"))
      .as[graft.index.DocIds.Doc]
    val sfName = new java.io.File(dir).getName
    graft.index.IndexBuilder.buildFromDocs(s, docs, s"/tmp/graft_docidx_$sfName",
      corpusFp = s"documents:$dir:${documentsFp(s, dir)}",
      graft.index.IndexBuilder.Params(docsPerShard = 64L, numParts = 8, tokenizer = "simple"))
  }

  /** Shared recipe of the appended-index gates: base index over the
    * FIRST half of the documents table built into `idxDir`, second half
    * APPENDED as an epoch (the snapshot-ingest path). `afterBase` runs
    * between the base build and the append (the incremental-λ gate
    * builds its λ pipeline there). Stage lineage + the committed-epoch
    * fingerprint make repeated calls resume/no-op.
    */
  private def appendedDocsIndex(s: SparkSession, dir: String, idxDir: String,
      afterBase: graft.index.InvertedIndex => Unit = _ => ()): graft.index.InvertedIndex = {
    import s.implicits._
    val fp = documentsFp(s, dir)
    val half = fp.split(":")(0).toLong / 2
    def docsPart(low: Boolean) = table(s, dir, "documents")
      .filter(if (low) col("doc_id") < half else col("doc_id") >= half)
      .select(col("doc_id").as("docId"), col("source").as("repo"),
        col("doc_id").cast("string").as("path"), lit("").as("commit"),
        col("lang"), col("text").as("content"))
      .as[graft.index.DocIds.Doc]
    val p = graft.index.IndexBuilder.Params(docsPerShard = 64L, numParts = 8, tokenizer = "simple")
    val base = graft.index.IndexBuilder.buildFromDocs(s, docsPart(low = true), idxDir,
      corpusFp = s"documents-base:$dir:$fp", p)
    afterBase(base)
    graft.index.IndexBuilder.appendFromDocs(s, docsPart(low = false), idxDir,
      appendFp = s"documents-epoch1:$dir:$fp", p)
  }

  /** Backs the `wand_topk_appended` gate, whose oracle is SQL BM25 over
    * the FULL corpus.
    */
  def documentsIndexAppended(s: SparkSession, dir: String): graft.index.InvertedIndex =
    appendedDocsIndex(s, dir, s"/tmp/graft_docidx_apnd_${new java.io.File(dir).getName}")

  /** Dedicated base index + λ pipeline for the INCREMENTAL ingest gate:
    * base half indexed and λ-built first, the second half appended as an
    * epoch, then `LambdaPipeline.appendEpochs` computes λ for ONLY the
    * epoch's docs under the frozen base graph. On re-runs against the
    * same /tmp state the index already carries the epoch, so the λ build
    * takes the full-rebuild path and appendEpochs no-ops — both
    * generations produce the same α=1 ranks (the gate's oracle), and the
    * incremental path itself is pinned exactly in LambdaPipelineSpec.
    */
  private def documentsLambdaInc(
      s: SparkSession, dir: String): (graft.index.InvertedIndex, graft.lambda.LambdaIndex) = {
    val sfName = new java.io.File(dir).getName
    val lamDir = s"/tmp/graft_doclam_inc_$sfName"
    val appended = appendedDocsIndex(s, dir, s"/tmp/graft_docidx_inc_$sfName",
      afterBase = base => {
        graft.lambda.LambdaPipeline.build(s, base, lamDir,
          graft.lambda.LambdaPipeline.Config(vocabSize = 256, maxClusters = 16, seed = 42L))
        ()
      })
    (appended, graft.lambda.LambdaPipeline.appendEpochs(s, appended, lamDir))
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "doc_tokens_tf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents)
        |SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term""".stripMargin,
    "doc_stats" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents)
        |SELECT doc_id, count(*) AS dl FROM tok WHERE term <> '' GROUP BY doc_id""".stripMargin,
    "vocab_df" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term)
        |SELECT term, count(*) AS df FROM tf GROUP BY term""".stripMargin,
    "bm25_topk" -> bm25OracleSql(Seq("spark", "query", "vector"), 10),
    "wand_topk" -> bm25OracleSql(Seq("stream", "merge", "window"), 10),
    "wand_topk_appended" -> bm25OracleSql(Seq("spark", "merge", "window"), 10),
    "wand_topk_batch" ->
      s"""SELECT 0 AS qid, rank, doc_id
         |FROM (${bm25RankOracleSql(Seq("stream", "merge", "window"), 10)}) t0
         |UNION ALL
         |SELECT 1 AS qid, rank, doc_id
         |FROM (${bm25RankOracleSql(Seq("spark", "query", "vector"), 10)}) t1""".stripMargin,
    "blended_appended_alpha1" -> bm25RankOracleSql(Seq("spark", "merge", "window"), 10),
    "blended_appended_inc_alpha1" -> bm25RankOracleSql(Seq("spark", "merge", "window"), 10),
    "blended_alpha1" -> {
      // identical CTEs to the BM25 oracle, but emit (rank, doc_id):
      // α=1 blending rescales scores by a positive constant, so ranks
      // must match the pure BM25 ranking exactly
      bm25RankOracleSql(Seq("spark", "query", "vector"), 10)
    },
    "blended_batch_alpha1" ->
      s"""SELECT 0 AS qid, rank, doc_id
         |FROM (${bm25RankOracleSql(Seq("spark", "query", "vector"), 10)}) t0
         |UNION ALL
         |SELECT 1 AS qid, rank, doc_id
         |FROM (${bm25RankOracleSql(Seq("stream", "merge", "window"), 10)}) t1""".stripMargin,
    // NOTE: the shingle oracles below (near_dedup_keep, shingle_jaccard,
    // minhash_lsh) enumerate shingle indexes via CROSS JOIN
    // generate_series(1, 4096) because DuckDB's generate_series cannot
    // take a lateral bound — any document longer than 4094 tokens would
    // make the ORACLE silently drop shingles. OpsSpec asserts the
    // sf0.001/sf0.01 corpora stay far below that bound.
    "near_dedup_keep" ->
      """WITH arrs AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
        |  FROM arrs CROSS JOIN generate_series(1, 4096) g(i)
        |  WHERE i + 2 <= len(arr)),
        |mh AS (
        |  SELECT doc_id, h, min(md5(h || ':' || shingle)) AS minhash
        |  FROM sh CROSS JOIN generate_series(0, 15) g(h)
        |  GROUP BY 1, 2),
        |bands AS (
        |  SELECT doc_id, CAST(floor(h / 4) AS INT) AS band,
        |    md5(string_agg(h || '_' || minhash, '|' ORDER BY h || '_' || minhash)) AS bucket
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |ver AS (
        |  SELECT c.d1, c.d2
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.d1
        |  JOIN sh b ON b.doc_id = c.d2 AND a.shingle = b.shingle
        |  JOIN sizes za ON za.doc_id = c.d1
        |  JOIN sizes zb ON zb.doc_id = c.d2
        |  GROUP BY c.d1, c.d2, za.sz, zb.sz
        |  HAVING count(*) * 1.0 / (za.sz + zb.sz - count(*)) >= 0.5)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT d2 FROM ver)""".stripMargin,
    "q_join" ->
      """SELECT n_name, c_mktsegment,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment""".stripMargin,
    "q_window" ->
      """WITH r AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    round(l_extendedprice * (1.0 - l_discount), 4) AS rev,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY round(l_extendedprice * (1.0 - l_discount), 4) DESC,
        |               l_orderkey ASC, l_linenumber ASC) AS rk
        |  FROM lineitem)
        |SELECT l_suppkey, rk, l_orderkey, l_linenumber, rev FROM r WHERE rk <= 3""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey, 1 AS has_orders FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, 0 AS has_orders FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS doc_id, count(*) AS dups
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "shingle_jaccard" ->
      s"""WITH arrs AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
         |  FROM arrs CROSS JOIN generate_series(1, 4096) g(i)
         |  WHERE i + 2 <= len(arr)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |shared AS (
         |  SELECT a.doc_id d1, b.doc_id d2, count(*) AS shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, round(shared * 1.0 / (sa.sz + sb.sz - shared), 6) AS jacc
         |FROM shared JOIN sizes sa ON d1 = sa.doc_id JOIN sizes sb ON d2 = sb.doc_id
         |WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.5""".stripMargin,
    "minhash_lsh" ->
      s"""WITH arrs AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
         |  FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
         |  FROM arrs CROSS JOIN generate_series(1, 4096) g(i)
         |  WHERE i + 2 <= len(arr)),
         |mh AS (
         |  SELECT doc_id, h, min(md5(h || ':' || shingle)) AS minhash
         |  FROM sh CROSS JOIN generate_series(0, 15) g(h)
         |  GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, CAST(floor(h / 4) AS INT) AS band,
         |    md5(string_agg(h || '_' || minhash, '|' ORDER BY h || '_' || minhash)) AS bucket
         |  FROM mh GROUP BY 1, 2)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin,
    "simhash64" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |bits AS (
        |  SELECT doc_id, bp,
        |    CASE WHEN CAST(floor((strpos('0123456789abcdef',
        |             substr(md5(term), CAST(floor(bp / 4) AS INT) + 1, 1)) - 1)
        |           / pow(2.0, 3 - (bp % 4))) AS INT) % 2 = 1
        |         THEN tf ELSE -tf END AS v
        |  FROM tf CROSS JOIN generate_series(0, 63) g(bp)),
        |s AS (SELECT doc_id, bp, sum(v) AS s FROM bits GROUP BY 1, 2)
        |SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY bp) AS simhash
        |FROM s GROUP BY doc_id""".stripMargin,
    "emb_neardup" ->
      """WITH idx AS (SELECT i FROM generate_series(1, 64) g(i)),
        |d AS (SELECT a.vec_id v1, b.vec_id v2,
        |        sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot,
        |        sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) AS na,
        |        sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS nb
        |      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id CROSS JOIN idx
        |      GROUP BY 1, 2)
        |SELECT v1, v2, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM d
        |WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.4""".stripMargin,
    "lang_id" -> {
      val vals = graft.ops.TextStats.Markers.toSeq.sortBy(_._1)
        .flatMap { case (l, ws) => ws.map(w => s"('$l','$w')") }.mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
         |  FROM documents),
         |marker(lang, term) AS (VALUES $vals),
         |counts AS (SELECT doc_id, lang, count(*) AS hits FROM tok JOIN marker USING (term) GROUP BY 1, 2),
         |best AS (SELECT doc_id, max(hits) AS mh FROM counts GROUP BY 1),
         |pick AS (SELECT c.doc_id, min(c.lang) AS pred0
         |         FROM counts c JOIN best b ON c.doc_id = b.doc_id AND c.hits = b.mh GROUP BY 1)
         |SELECT d.doc_id, coalesce(p.pred0, 'und') AS pred_lang
         |FROM documents d LEFT JOIN pick p ON d.doc_id = p.doc_id""".stripMargin
    },
    "quality" -> {
      val stop = graft.ops.TextStats.Markers("en").map(w => s"'$w'").mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS DOUBLE) AS ntoks,
         |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) AS alnum,
         |    CAST(length(text) AS DOUBLE) AS chars,
         |    CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
         |         x -> list_contains([$stop], x))) AS DOUBLE) AS stop
         |  FROM documents)
         |SELECT doc_id,
         |  floor((CASE WHEN ntoks = 0 OR chars = 0 THEN 0.0 ELSE
         |    0.4 * (alnum / chars) + 0.3 * (stop / ntoks)
         |      + 0.3 * least((alnum / ntoks) / 8.0, 1.0) END) * 1e6) / 1e6 AS quality
         |FROM base""".stripMargin
    },
    "pii_redact" -> {
      import graft.ops.TextStats.{PiiEmail, PiiIpv4, PiiLongDigits}
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$PiiEmail')) AS n_emails,
         |  len(regexp_extract_all(text, '$PiiIpv4')) AS n_ips,
         |  len(regexp_extract_all(text, '$PiiLongDigits')) AS n_digit_runs,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$PiiEmail', '<EMAIL>', 'g'),
         |    '$PiiIpv4', '<IP>', 'g'),
         |    '$PiiLongDigits', '<NUM>', 'g') AS redacted
         |FROM documents""".stripMargin
    },
    "rep_ratio" ->
      """WITH arrs AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
        |  FROM arrs CROSS JOIN generate_series(1, 4096) g(i)
        |  WHERE i + 2 <= len(arr)),
        |agg AS (SELECT doc_id, count(*) AS total, count(DISTINCT shingle) AS uniq
        |        FROM sh GROUP BY 1)
        |SELECT d.doc_id,
        |  floor(CASE WHEN a.total IS NULL OR a.total = 0 THEN 0.0
        |             ELSE 1.0 - a.uniq * 1.0 / a.total END * 1e6) / 1e6 AS rep_ratio
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "token_counts" ->
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS ws_tokens,
        |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS word_tokens,
        |  length(regexp_replace(text, '\s', '', 'g')) AS non_space_chars
        |FROM documents""".stripMargin,
    "events_window" ->
      """SELECT date_trunc('hour', ts) AS wstart, event_type, count(*) AS n,
        |  round(sum(value), 4) AS sv
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events)
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM flagged GROUP BY user_id""".stripMargin,
    // embeddings are fixed 64-dim across all sf dirs
    "ann_ivf_exact" -> cosineTopKOracleSql,
    "ann_lsh_exact" -> cosineTopKOracleSql,
    "cosine_topk" -> cosineTopKOracleSql,
    // byte-level multimodal oracle: decode() parses real PNG/WAV/AVI
    // headers; the oracle recomputes the dims the encoder derived from
    // doc_id — equality proves the byte round-trip
    "mm_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CASE doc_id % 3 WHEN 0 THEN 45
        |       WHEN 1 THEN 44 + (100 + doc_id % 900) * 2 * (1 + doc_id % 2)
        |       ELSE 88 END AS n_bytes,
        |  CASE doc_id % 3 WHEN 1 THEN 0 ELSE 16 + doc_id % 1024 END AS width,
        |  CASE doc_id % 3 WHEN 1 THEN 0 ELSE 16 + (doc_id * 7) % 1024 END AS height,
        |  CASE doc_id % 3 WHEN 1 THEN 1 + doc_id % 2 ELSE 3 END AS channels,
        |  CASE doc_id % 3 WHEN 0 THEN 1
        |       WHEN 1 THEN 100 + doc_id % 900
        |       ELSE 1 + doc_id % 300 END AS n_frames
        |FROM documents""".stripMargin,
    // rank-identity oracles: both α=1 searches must reproduce the pure
    // cosine ranking; energy search at wλ=0 ranks by L2 ascending
    "lambda_search_alpha1" -> cosineRankOracleSql,
    "hybrid_alpha1" -> cosineRankOracleSql,
    "energy_search_dirichlet" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |idx AS (SELECT i FROM generate_series(1, 64) AS g(i)),
        |d AS (
        |  SELECT e.vec_id,
        |    sum((CAST(e.embedding[idx.i] AS DOUBLE) - CAST(q.qe[idx.i] AS DOUBLE))
        |      * (CAST(e.embedding[idx.i] AS DOUBLE) - CAST(q.qe[idx.i] AS DOUBLE))) AS sq
        |  FROM embeddings e CROSS JOIN q CROSS JOIN idx
        |  GROUP BY e.vec_id)
        |SELECT CAST(row_number() OVER (ORDER BY sq ASC, vec_id ASC) AS INT) AS rank, vec_id
        |FROM d ORDER BY rank LIMIT 10""".stripMargin,

    // ---- exported-artifact oracles (r5): the engine's own persisted
    // artifacts (λ tables, graph COO, query scalars) are INPUT tables;
    // DuckDB independently recomputes the search/ranking math ----------
    "lambda_zrange" ->
      s"""SELECT doc_id, lambda
         |FROM read_parquet('$OracleExportDir/lambda_zrange/lambdas/*.parquet')
         |WHERE lambda >= 0.0 AND lambda <= 1.0
         |ORDER BY lambda ASC, doc_id ASC LIMIT 10 OFFSET 5""".stripMargin,
    "blended_topk" -> {
      // same BM25 CTEs as the wand oracles; blend = α·bm25/ubNorm +
      // (1−α)·(1−min(|λq−λd|,1)) with the engine's exported λ/λq/ubNorm;
      // (1.0 - 0.7) spelled as the subtraction so DuckDB's double equals
      // Spark's lit(1.0 - alpha)
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok WHERE term <> '' GROUP BY doc_id),
         |stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
         |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
         |q(term) AS (VALUES ('stream'), ('merge'), ('window')),
         |bm AS (
         |  SELECT tf.doc_id,
         |    sum( ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
         |         * tf.tf * (1.2 + 1.0)
         |         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS bm25
         |  FROM tf JOIN q ON tf.term = q.term
         |  JOIN dl ON tf.doc_id = dl.doc_id
         |  JOIN df ON tf.term = df.term
         |  CROSS JOIN stats GROUP BY tf.doc_id),
         |lam AS (SELECT doc_id, lambda
         |        FROM read_parquet('$OracleExportDir/blended_topk/lambdas/*.parquet')),
         |p AS (SELECT lq, ub_norm
         |      FROM read_parquet('$OracleExportDir/blended_topk/params/*.parquet')),
         |scored AS (
         |  SELECT bm.doc_id,
         |    0.7 * (bm.bm25 / p.ub_norm) +
         |    (1.0 - 0.7) * (1.0 - least(abs(p.lq - coalesce(lam.lambda, 0.0)), 1.0)) AS score
         |  FROM bm LEFT JOIN lam ON bm.doc_id = lam.doc_id CROSS JOIN p)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank, doc_id
         |FROM scored ORDER BY rank LIMIT 10""".stripMargin
    },
    "lambda_search" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |idx AS (SELECT i FROM generate_series(1, 64) AS g(i)),
         |pairs AS (
         |  SELECT e.vec_id,
         |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS dot,
         |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(e.embedding[idx.i] AS DOUBLE)) AS na,
         |    sum(CAST(q.qe[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS nb
         |  FROM embeddings e CROSS JOIN q CROSS JOIN idx GROUP BY e.vec_id),
         |lam AS (SELECT vec_id, lambda
         |        FROM read_parquet('$OracleExportDir/lambda_search/lambdas/*.parquet')),
         |p AS (SELECT lq FROM read_parquet('$OracleExportDir/lambda_search/params/*.parquet')),
         |scored AS (
         |  SELECT pairs.vec_id,
         |    0.9 * (pairs.dot / (sqrt(pairs.na) * sqrt(pairs.nb))) +
         |    (1.0 - 0.9) * (1.0 - least(abs(p.lq - lam.lambda), 1.0)) AS score
         |  FROM pairs JOIN lam USING (vec_id) CROSS JOIN p)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank, vec_id
         |FROM scored ORDER BY rank LIMIT 10""".stripMargin,
    "hybrid_search" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |idx AS (SELECT i FROM generate_series(1, 64) AS g(i)),
         |pairs AS (
         |  SELECT e.vec_id,
         |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS dot,
         |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(e.embedding[idx.i] AS DOUBLE)) AS na,
         |    sum(CAST(q.qe[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS nb
         |  FROM embeddings e CROSS JOIN q CROSS JOIN idx GROUP BY e.vec_id),
         |cosv AS (SELECT vec_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM pairs),
         |lam AS (SELECT vec_id, lambda
         |        FROM read_parquet('$OracleExportDir/hybrid_search/lambdas/*.parquet')),
         |p AS (SELECT lq FROM read_parquet('$OracleExportDir/hybrid_search/params/*.parquet')),
         |scored AS (
         |  SELECT cosv.vec_id, cosv.cos,
         |    0.9 * cosv.cos + (1.0 - 0.9) * (1.0 - least(abs(p.lq - lam.lambda), 1.0)) AS score
         |  FROM cosv JOIN lam USING (vec_id) CROSS JOIN p),
         |cand AS (
         |  SELECT vec_id FROM (SELECT vec_id FROM scored ORDER BY score DESC, vec_id ASC LIMIT 10)
         |  UNION
         |  SELECT vec_id FROM (SELECT vec_id FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 1)
         |  UNION
         |  SELECT vec_id FROM scored WHERE cos > 0.9999)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT) AS rank, vec_id
         |FROM scored JOIN cand USING (vec_id)
         |ORDER BY rank LIMIT 10""".stripMargin,
    "energy_search" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |idx AS (SELECT i FROM generate_series(1, 64) AS g(i)),
         |d AS (
         |  SELECT e.vec_id,
         |    sum((CAST(e.embedding[idx.i] AS DOUBLE) - CAST(q.qe[idx.i] AS DOUBLE))
         |      * (CAST(e.embedding[idx.i] AS DOUBLE) - CAST(q.qe[idx.i] AS DOUBLE))) AS sq
         |  FROM embeddings e CROSS JOIN q CROSS JOIN idx GROUP BY e.vec_id),
         |lam AS (SELECT vec_id, lambda
         |        FROM read_parquet('$OracleExportDir/energy_search/lambdas/*.parquet')),
         |p AS (SELECT lq FROM read_parquet('$OracleExportDir/energy_search/params/*.parquet')),
         |dist AS (
         |  SELECT d.vec_id,
         |    1.0 * abs(p.lq - lam.lambda) +
         |    0.5 * least(sqrt(d.sq) / (1.0 + sqrt(d.sq)), 1.0) AS dist
         |  FROM d JOIN lam USING (vec_id) CROSS JOIN p)
         |SELECT CAST(row_number() OVER (ORDER BY dist ASC, vec_id ASC) AS INT) AS rank, vec_id
         |FROM dist ORDER BY rank LIMIT 10""".stripMargin,
    "doc_lambda" ->
      s"""WITH dt AS (SELECT docId AS doc_id, termIdx AS ti, weight AS w
         |           FROM read_parquet('$OracleExportDir/doc_lambda/docterms/*.parquet')),
         |coo AS (SELECT i, j, v FROM read_parquet('$OracleExportDir/doc_lambda/graph/*.parquet')),
         |nn AS (SELECT count(*)::DOUBLE AS n
         |       FROM read_parquet('$OracleExportDir/doc_lambda/vocab/*.parquet')),
         |tau AS (SELECT doc_id, greatest(sum(w) / nn.n, 1e-10) AS tau
         |        FROM dt CROSS JOIN nn GROUP BY doc_id, nn.n),
         |den AS (SELECT doc_id, sum(w * w) AS denom FROM dt GROUP BY doc_id),
         |edges AS (
         |  SELECT a.doc_id, coo.i, coo.j, coo.v, a.w AS xi, coalesce(b.w, 0.0) AS xj,
         |    CASE WHEN b.w IS NULL THEN 2.0 ELSE 1.0 END AS factor
         |  FROM dt a JOIN coo ON coo.i = a.ti
         |  LEFT JOIN dt b ON b.doc_id = a.doc_id AND b.ti = coo.j),
         |num AS (SELECT doc_id, sum(xi * v * xj) AS num FROM edges GROUP BY doc_id),
         |ee AS (SELECT doc_id,
         |         sum(CASE WHEN i <> j AND -v > 0.0
         |             THEN factor * (-v) * (xi - xj) * (xi - xj) ELSE 0.0 END) AS e
         |       FROM edges GROUP BY doc_id),
         |gsq AS (SELECT edges.doc_id,
         |          sum(CASE WHEN i <> j AND -v > 0.0
         |              THEN factor * pow(((-v) * (xi - xj) * (xi - xj)) / ee.e, 2)
         |              ELSE 0.0 END) AS g
         |        FROM edges JOIN ee ON edges.doc_id = ee.doc_id
         |        WHERE ee.e > 0.0 GROUP BY edges.doc_id),
         |fin AS (
         |  SELECT t.doc_id, t.tau,
         |    CASE WHEN den.denom > 1e-12 THEN coalesce(num.num, 0.0) / den.denom
         |         ELSE 0.0 END AS eraw,
         |    coalesce(g.g, 0.0) AS graw
         |  FROM tau t JOIN den USING (doc_id)
         |  LEFT JOIN num USING (doc_id) LEFT JOIN gsq g USING (doc_id))
         |SELECT doc_id,
         |  floor((tau * (eraw / (eraw + tau)) +
         |         (1.0 - tau) * least(greatest(graw, 0.0), 1.0)) * 1e6) / 1e6 AS lambda
         |FROM fin""".stripMargin,
    "lambda_dense" ->
      s"""WITH coo AS (SELECT i, j, v FROM read_parquet('$OracleExportDir/lambda_dense/graph/*.parquet')),
         |vals AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
         |tau AS (SELECT vec_id, greatest(median(x), 1e-10) AS tau FROM vals GROUP BY vec_id),
         |den AS (SELECT vec_id, sum(x * x) AS denom FROM vals GROUP BY vec_id),
         |edges AS (
         |  SELECT e.vec_id, coo.i, coo.j, coo.v,
         |    CAST(e.embedding[coo.i + 1] AS DOUBLE) AS xi,
         |    CAST(e.embedding[coo.j + 1] AS DOUBLE) AS xj
         |  FROM embeddings e CROSS JOIN coo),
         |num AS (SELECT vec_id, sum(xi * v * xj) AS num FROM edges GROUP BY vec_id),
         |ee AS (SELECT vec_id,
         |         sum(CASE WHEN i <> j AND -v > 0.0
         |             THEN (-v) * (xi - xj) * (xi - xj) ELSE 0.0 END) AS e
         |       FROM edges GROUP BY vec_id),
         |gsq AS (SELECT edges.vec_id,
         |          sum(CASE WHEN i <> j AND -v > 0.0
         |              THEN pow(((-v) * (xi - xj) * (xi - xj)) / ee.e, 2) ELSE 0.0 END) AS g
         |        FROM edges JOIN ee USING (vec_id)
         |        WHERE ee.e > 0.0 GROUP BY edges.vec_id),
         |fin AS (
         |  SELECT t.vec_id, t.tau,
         |    CASE WHEN den.denom > 1e-12 THEN coalesce(num.num, 0.0) / den.denom
         |         ELSE 0.0 END AS eraw,
         |    coalesce(g.g, 0.0) AS graw
         |  FROM tau t JOIN den USING (vec_id)
         |  LEFT JOIN num USING (vec_id) LEFT JOIN gsq g USING (vec_id))
         |SELECT vec_id,
         |  floor((tau * (eraw / (eraw + tau)) +
         |         (1.0 - tau) * least(greatest(graw, 0.0), 1.0)) * 1e6) / 1e6 AS lambda
         |FROM fin""".stripMargin,
    "ann_ivf" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |idx AS (SELECT i FROM generate_series(1, 64) AS g(i)),
         |pairs AS (
         |  SELECT e.vec_id,
         |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS dot,
         |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(e.embedding[idx.i] AS DOUBLE)) AS na,
         |    sum(CAST(q.qe[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS nb
         |  FROM embeddings e CROSS JOIN q CROSS JOIN idx GROUP BY e.vec_id),
         |asn AS (SELECT vec_id, cluster
         |        FROM read_parquet('$OracleExportDir/ann_ivf/assigned/*.parquet')),
         |probed AS (SELECT cluster FROM read_parquet('$OracleExportDir/ann_ivf/probed/*.parquet')),
         |cand AS (SELECT vec_id FROM asn JOIN probed USING (cluster))
         |SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
         |FROM pairs JOIN cand USING (vec_id)
         |ORDER BY pairs.dot / (sqrt(pairs.na) * sqrt(pairs.nb)) DESC, vec_id ASC LIMIT 10""".stripMargin,
    "fingerprint" ->
      // robust winnowing (k=4, w=4) replayed over the exported gram-hash
      // stream: per window of 4 consecutive gram positions pick the min
      // hash (rightmost on ties); docs with ≤ 4 grams are one window
      s"""WITH g AS (SELECT doc_id, pos, gram
         |           FROM read_parquet('$OracleExportDir/fingerprint/grams/*.parquet')),
         |cnt AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
         |small AS (
         |  SELECT g.doc_id, min(g.gram) AS fingerprint
         |  FROM g JOIN cnt USING (doc_id) WHERE cnt.n <= 4 GROUP BY g.doc_id),
         |win AS (
         |  SELECT a.doc_id, a.pos AS wstart, b.pos, b.gram
         |  FROM g a
         |  JOIN cnt ON cnt.doc_id = a.doc_id
         |  JOIN g b ON b.doc_id = a.doc_id AND b.pos BETWEEN a.pos AND a.pos + 3
         |  WHERE cnt.n > 4 AND a.pos + 4 <= cnt.n),
         |picked AS (
         |  SELECT doc_id, wstart, gram,
         |    row_number() OVER (PARTITION BY doc_id, wstart
         |                       ORDER BY gram ASC, pos DESC) AS rn
         |  FROM win)
         |SELECT DISTINCT doc_id, gram AS fingerprint FROM picked WHERE rn = 1
         |UNION ALL
         |SELECT doc_id, fingerprint FROM small""".stripMargin,
    "ann_lsh" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |idx AS (SELECT i FROM generate_series(1, 64) AS g(i)),
         |pairs AS (
         |  SELECT e.vec_id,
         |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS dot,
         |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(e.embedding[idx.i] AS DOUBLE)) AS na,
         |    sum(CAST(q.qe[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS nb
         |  FROM embeddings e CROSS JOIN q CROSS JOIN idx GROUP BY e.vec_id),
         |bk AS (SELECT vec_id, bucket
         |       FROM read_parquet('$OracleExportDir/ann_lsh/buckets/*.parquet')),
         |probed AS (SELECT bucket FROM read_parquet('$OracleExportDir/ann_lsh/probed/*.parquet')),
         |cand AS (SELECT vec_id FROM bk JOIN probed USING (bucket))
         |SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
         |FROM pairs JOIN cand USING (vec_id)
         |ORDER BY pairs.dot / (sqrt(pairs.na) * sqrt(pairs.nb)) DESC, vec_id ASC LIMIT 10""".stripMargin
  )

  /** Rank-emitting variant of the cosine oracle (α=1 rank-identity
    * gates: scores are rescaled/blended, ranks must match exactly).
    */
  def cosineRankOracleSql: String =
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |idx AS (SELECT i FROM generate_series(1, 64) AS g(i)),
        |pairs AS (
        |  SELECT e.vec_id,
        |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS dot,
        |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(e.embedding[idx.i] AS DOUBLE)) AS na,
        |    sum(CAST(q.qe[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS nb
        |  FROM embeddings e CROSS JOIN q CROSS JOIN idx
        |  GROUP BY e.vec_id)
        |SELECT CAST(row_number() OVER (
        |    ORDER BY pairs.dot / (sqrt(pairs.na) * sqrt(pairs.nb)) DESC, vec_id ASC) AS INT) AS rank,
        |  vec_id
        |FROM pairs ORDER BY rank LIMIT 10""".stripMargin

  /** DuckDB brute-force cosine top-10 oracle (shared by cosine_topk and
    * the exact-IVF equivalence query).
    */
  def cosineTopKOracleSql: String =
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |idx AS (SELECT i FROM generate_series(1, 64) AS g(i)),
        |pairs AS (
        |  SELECT e.vec_id,
        |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS dot,
        |    sum(CAST(e.embedding[idx.i] AS DOUBLE) * CAST(e.embedding[idx.i] AS DOUBLE)) AS na,
        |    sum(CAST(q.qe[idx.i] AS DOUBLE) * CAST(q.qe[idx.i] AS DOUBLE)) AS nb
        |  FROM embeddings e CROSS JOIN q CROSS JOIN idx
        |  GROUP BY e.vec_id)
        |SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM pairs
        |ORDER BY pairs.dot / (sqrt(pairs.na) * sqrt(pairs.nb)) DESC, vec_id ASC LIMIT 10""".stripMargin

  /** Rank-emitting BM25 oracle (rank-identity gates): same CTEs, output
    * (rank, doc_id).
    */
  def bm25RankOracleSql(qTerms: Seq[String], k: Int): String =
    bm25OracleSql(qTerms, k).replace(
      "SELECT doc_id, round(scored.score, 4) AS score FROM scored",
      "SELECT CAST(row_number() OVER (ORDER BY scored.score DESC, doc_id ASC) AS INT) AS rank, doc_id FROM scored")

  /** DuckDB BM25 oracle: same formula, same tokenizer, same tie-break. */
  def bm25OracleSql(qTerms: Seq[String], k: Int): String = {
    val qList = qTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok WHERE term <> '' GROUP BY doc_id),
       |stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
       |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
       |q(term) AS (VALUES $qList),
       |scored AS (
       |  SELECT tf.doc_id,
       |    sum( ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |         * tf.tf * (1.2 + 1.0)
       |         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS score
       |  FROM tf
       |  JOIN q ON tf.term = q.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN df ON tf.term = df.term
       |  CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(scored.score, 4) AS score FROM scored
       |ORDER BY scored.score DESC, doc_id ASC LIMIT $k""".stripMargin
  }
}
