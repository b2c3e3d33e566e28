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
    })
  )

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
    "wand_topk" -> bm25OracleSql(Seq("stream", "merge", "window"), 10)
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
