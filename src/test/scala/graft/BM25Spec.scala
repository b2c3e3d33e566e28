package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.BM25
import graft.tokenize.CodeTokenizer

/** Exact BM25 pipeline vs a local in-memory Scala oracle (SURVEY.md §5:
  * brute-force oracle with rank-identity assertions, score tol 1e-9
  * pre-rounding).
  */
class BM25Spec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  val corpus: Seq[(Long, String)] = Seq(
    1L -> "spark query engine builds a query plan for every query",
    2L -> "the vector index stores a vector per document",
    3L -> "query the spark vector index with a spark query",
    4L -> "unrelated text about nothing in particular",
    5L -> "spark spark spark",
    6L -> "a document about indexes and planning")

  def localOracle(q: Seq[String], k: Int, p: BM25.Params = BM25.Params()): Seq[(Long, Double)] = {
    val toks = corpus.map { case (id, t) => id -> CodeTokenizer.simpleTokens(t).toSeq }
    val n = toks.size.toDouble
    val dl = toks.map { case (id, ts) => id -> ts.size.toDouble }.toMap
    val avgdl = dl.values.sum / n
    val tf = toks.flatMap { case (id, ts) => ts.groupBy(identity).map { case (t, xs) => (id, t, xs.size.toDouble) } }
    val dfm = tf.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).distinct.size.toDouble }
    val scores = tf.filter(t => q.contains(t._2))
      .groupBy(_._1)
      .map { case (id, xs) =>
        id -> xs.map { case (_, t, f) =>
          BM25.idf(n, dfm(t)) * f * (p.k1 + 1.0) / (f + p.k1 * (1.0 - p.b + p.b * dl(id) / avgdl))
        }.sum
      }
    scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  def sparkTopK(q: Seq[String], k: Int): Seq[(Long, Double)] = {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val toks = BM25.tokensSimple(docs, "text")
    BM25.scoreExact(BM25.termFreq(toks), BM25.docLengths(toks), q, k, roundTo = -1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("rank-identical to local oracle, scores within 1e-9") {
    for (q <- Seq(Seq("spark"), Seq("query", "vector"), Seq("spark", "query", "index"))) {
      val want = localOracle(q, 4)
      val got = sparkTopK(q, 4)
      assert(got.map(_._1) == want.map(_._1), s"query $q ranking mismatch: $got vs $want")
      got.zip(want).foreach { case ((_, gs), (_, ws)) => assert(math.abs(gs - ws) < 1e-9) }
    }
  }

  test("ties break by ascending doc_id") {
    import spark.implicits._
    val docs = Seq(10L -> "alpha beta", 3L -> "alpha beta", 7L -> "alpha beta").toDF("doc_id", "text")
    val toks = BM25.tokensSimple(docs, "text")
    val got = BM25.scoreExact(BM25.termFreq(toks), BM25.docLengths(toks), Seq("alpha"), 3, roundTo = -1)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 7L, 10L))
  }

  test("absent query terms contribute nothing; unmatched docs absent") {
    val got = sparkTopK(Seq("zzz_not_a_term"), 5)
    assert(got.isEmpty)
  }
}
