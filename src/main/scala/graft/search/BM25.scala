package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 scoring, expressed as declarative DataFrame transforms so
  * Catalyst keeps the whole pipeline inside WholeStageCodegen and can
  * push filters/pruning into the scan.
  *
  * Formula (Okapi BM25, Robertson/Sparck-Jones idf with Lucene's +1
  * inside the log so idf > 0 even for df > N/2):
  *
  *   idf(t)    = ln( (N - df + 0.5) / (df + 0.5) + 1 )
  *   score(d)  = Σ_{t ∈ q}  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * k1 = 1.2, b = 0.75 pinned (SURVEY.md §7.2 phase 3). Tie-break on equal
  * scores is ascending docId everywhere, matching the reference's stable
  * sort (/root/reference/src/core.rs:785 — Rust `sort_by` is stable, so
  * ties keep ascending index order).
  */
object BM25 {

  final case class Params(k1: Double = 1.2, b: Double = 0.75)

  def idf(n: Double, df: Double): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0)

  /** idf as a Column expression (codegen'd, no UDF). */
  def idfCol(n: Column, df: Column): Column =
    log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))

  /** tf-normalization term as a Column expression. */
  def tfNorm(tf: Column, dl: Column, avgdl: Column, p: Params): Column =
    tf * lit(p.k1 + 1.0) / (tf + lit(p.k1) * (lit(1.0 - p.b) + lit(p.b) * dl / avgdl))

  /** (docId, term) -> (docId, term, tf) */
  def termFreq(tokens: DataFrame, docCol: String = "doc_id"): DataFrame =
    tokens.groupBy(col(docCol), col("term")).agg(count(lit(1)).as("tf"))

  /** (docId, term) -> (docId, dl) — dl counts ALL token occurrences. */
  def docLengths(tokens: DataFrame, docCol: String = "doc_id"): DataFrame =
    tokens.groupBy(col(docCol)).agg(count(lit(1)).as("dl"))

  /** (docId, term, tf) -> (term, df) */
  def termDf(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Exact (non-WAND) BM25 top-k over token-level inputs. Entirely
    * declarative: corpus stats are a 1-row aggregate cross-joined in
    * (Catalyst broadcasts it), the query-term list is a broadcast join,
    * and top-k lowers to TakeOrderedAndProject (per-partition heaps +
    * driver merge — the distributed analog of the reference's per-thread
    * min-heap top-k, /root/reference/src/core.rs:818-888).
    *
    * Returns (docId, score) with score rounded to `roundTo` decimals when
    * roundTo >= 0 (oracle comparison needs a pinned precision).
    */
  def scoreExact(
      tf: DataFrame, // (docCol, term, tf)
      dl: DataFrame, // (docCol, dl)
      qTerms: Seq[String],
      k: Int,
      p: Params = Params(),
      docCol: String = "doc_id",
      roundTo: Int = 4): DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    val df = termDf(tf)
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val q = qTerms.toDF("term")
    val scored = tf
      .join(broadcast(q), "term")
      .join(dl, docCol)
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(docCol))
      .agg(sum(idfCol(col("n"), col("df")) * tfNorm(col("tf"), col("dl"), col("avgdl"), p)).as("score"))
    // top-k selection on the UNROUNDED score (ties → ascending docId);
    // rounding is display-only so both engines pick the same k docs
    val top = scored.orderBy(col("score").desc, col(docCol).asc).limit(k)
    if (roundTo >= 0) top.withColumn("score", round(col("score"), roundTo)) else top
  }

  /** SQL-replayable tokenization of a (docCol, textCol) frame into
    * (docCol, term) rows: lower + split on [^a-z0-9]+ (matches
    * CodeTokenizer.simpleTokens and the DuckDB oracle SQL).
    */
  def tokensSimple(docs: DataFrame, textCol: String, docCol: String = "doc_id"): DataFrame =
    docs
      .select(col(docCol), explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(length(col("term")) > 0)
}
