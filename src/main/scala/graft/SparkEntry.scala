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

    // -- dense vector regime over the embeddings table -------------------
    "cosine_topk" -> ((s, dir) => {
      val items = embeddingItems(s, dir)
      val q = items.filter(_._1 == 0L).head()._2
      graft.lambda.DenseLambda.cosineTopK(items, q, 10)
        .withColumn("cos", round(col("cos"), 6))
        .withColumnRenamed("id", "vec_id")
    }),
    // λτ spectral index per item (not SQL-expressible: graph Laplacian +
    // synthetic λ; driver records rows-only check)
    "lambda_dense" -> ((s, dir) => {
      val items = embeddingItems(s, dir)
      graft.lambda.DenseLambda.build(s, items,
        graft.lambda.DenseLambda.Config(maxClusters = 16)).lambdas
    }),
    // λ-aware blended search (α=0.9), reference Q1 semantics
    "lambda_search" -> ((s, dir) => {
      val items = embeddingItems(s, dir)
      val built = graft.lambda.DenseLambda.build(s, items,
        graft.lambda.DenseLambda.Config(maxClusters = 16))
      val q = items.filter(_._1 == 0L).head()._2
      val lq = graft.lambda.DenseLambda.queryLambda(q, built)
      graft.lambda.DenseLambda.searchLambdaAware(items, built, q, lq, 10, alpha = 0.9)
    }),
    // per-doc λτ over the term-cooccurrence graph (north-star signal)
    "doc_lambda" -> ((s, dir) => documentsLambda(s, dir).lambdas),
    // BM25 + λ blended top-k (α=0.7) over the documents index
    "blended_topk" -> ((s, dir) => {
      documentsLambda(s, dir)
        .blendedTopK(documentsIndex(s, dir), "stream merge window", 10, alpha = 0.7)
    })
  )

  def embeddingItems(s: SparkSession, dir: String) = {
    import s.implicits._
    table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
  }

  def documentsLambda(s: SparkSession, dir: String): graft.lambda.LambdaIndex = {
    val sfName = new java.io.File(dir).getName
    graft.lambda.LambdaPipeline.build(s, documentsIndex(s, dir),
      s"/tmp/graft_doclam_$sfName",
      graft.lambda.LambdaPipeline.Config(vocabSize = 256, maxClusters = 16, seed = 42L))
  }

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
      corpusFp = s"documents:$dir",
      graft.index.IndexBuilder.Params(docsPerShard = 64L, numParts = 8, tokenizer = "simple"))
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
    // embeddings are fixed 64-dim across all sf dirs
    "cosine_topk" ->
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
  )

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
