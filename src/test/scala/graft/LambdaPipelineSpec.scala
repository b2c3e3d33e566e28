package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.CodeCorpus
import graft.index.IndexBuilder
import graft.lambda.{LambdaPipeline, TauMode}
import java.nio.file.Files

/** λτ pipeline over the code corpus: build, determinism, blend search. */
class LambdaPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  val nFiles = 400L
  lazy val tmp: String = Files.createTempDirectory("graft-lp").toString
  lazy val index = IndexBuilder.build(
    spark, CodeCorpus.generate(spark, nFiles, 42L, 6), s"$tmp/idx",
    corpusFp = s"synthetic:42:$nFiles",
    IndexBuilder.Params(docsPerShard = 128L, numParts = 6))
  lazy val cfg = LambdaPipeline.Config(vocabSize = 256, maxClusters = 16, seed = 42L)
  lazy val li = LambdaPipeline.build(spark, index, s"$tmp/lam", cfg)

  test("pipeline builds: one lambda per doc, all in [0,1]") {
    val l = li.lambdas
    assert(l.count() == nFiles)
    assert(l.filter(col("lambda") < 0.0 || col("lambda") > 1.0).count() == 0)
    // λ must discriminate: not all values identical
    assert(l.select(countDistinct(col("lambda"))).collect()(0).getLong(0) > 10)
  }

  test("term graph is a valid Laplacian") {
    assert(li.csr.n == 256)
    assert(li.csr.laplacianViolations(1e-8).isEmpty)
    assert(li.csr.nnz > li.csr.n) // has actual edges, not just the diagonal
  }

  test("rebuild into a fresh dir is bit-identical (determinism)") {
    val li2 = LambdaPipeline.build(spark, index,
      Files.createTempDirectory("graft-lp2").toString, cfg)
    val a = li.lambdas.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = li2.lambdas.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("queryLambda: deterministic, nonzero for in-vocab queries, 0 for OOV") {
    val l1 = li.queryLambda(Map("get" -> 1, "data" -> 2))
    val l2 = li.queryLambda(Map("get" -> 1, "data" -> 2))
    assert(l1 == l2)
    assert(l1 > 0.0 && l1 <= 1.0)
    assert(li.queryLambda(Map("zz_not_a_term_zz" -> 1)) == 0.0)
  }

  test("alpha=1 blended ranking == pure BM25 (WAND) ranking") {
    for (q <- Seq("get value data", "merge sort batch", "lambda energy")) {
      val blend = li.blendedTopK(index, q, 10, alpha = 1.0)
        .collect().map(_.getLong(0)).toSeq
      val wand = index.wandTopK(graft.tokenize.CodeTokenizer.codeTokens(q).distinct.toSeq, 10)
        .collect().map(_.getLong(0)).toSeq
      assert(blend == wand, s"q=$q: $blend vs $wand")
    }
  }

  test("alpha<1 changes the ranking (lambda signal is live) and stays bounded") {
    val q = "get value data index"
    val a1 = li.blendedTopK(index, q, 20, alpha = 1.0).collect().map(_.getLong(0)).toSeq
    val a07 = li.blendedTopK(index, q, 20, alpha = 0.7).collect()
    val ids07 = a07.map(_.getLong(0)).toSeq
    assert(a07.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0 + 1e-9))
    // scores descending with docId tie-break
    val scores = a07.map(_.getDouble(1)).toSeq
    assert(scores == scores.sortBy(-(_: Double)))
    // the λ component should reorder at least something on a 20-deep list
    assert(a1 != ids07, "expected λ re-ranking to differ from pure BM25")
  }

  test("range search is one-sided: everything with lambda >= lq - eps") {
    val lq = 0.5
    val eps = 0.1
    val got = li.rangeSearch(lq, eps)
    val expected = li.lambdas.filter(col("lambda") >= lq - eps)
    assert(got.count() == expected.count())
    // docs with λ far ABOVE lq are included (the quirk)
    val above = li.lambdas.filter(col("lambda") > lq + eps).count()
    if (above > 0) {
      val gotAbove = got.filter(col("lambda") > lq + eps).count()
      assert(gotAbove == above)
    }
  }

  test("SQL UDAF: lambda_tau over SQL == the typed pipeline's lambdas") {
    li.registerSqlUdaf(spark, "lambda_tau_test")
    spark.read.parquet(s"$tmp/lam/docterms").createOrReplaceTempView("docterms_v")
    val viaSql = spark.sql(
      """SELECT docId AS doc_id, lambda_tau_test(docId, termIdx, weight) AS lambda
        |FROM docterms_v GROUP BY docId""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val viaPipeline = li.lambdas.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaSql.size == viaPipeline.size)
    viaPipeline.foreach { case (id, l) =>
      assert(math.abs(viaSql(id) - l) < 1e-12, s"doc $id: ${viaSql(id)} vs $l")
    }
  }

  test("SQL tokenizer functions match the Scala tokenizer") {
    graft.tokenize.CodeTokenizer.registerSql(spark)
    import spark.implicits._
    val got = spark.sql(
      "SELECT code_tokens('def getValueIndex(data_key: Int)') AS t").collect()(0).getSeq[String](0)
    assert(got == graft.tokenize.CodeTokenizer.codeTokens("def getValueIndex(data_key: Int)").toSeq)
    val got2 = spark.sql("SELECT simple_tokens('Hello, World-42!') AS t").collect()(0).getSeq[String](0)
    assert(got2 == Seq("hello", "world", "42"))
  }

  test("rangeByScore: ordered (lambda, doc_id) paging within the band") {
    val all = li.lambdas.collect()
      .map(r => (r.getDouble(1), r.getLong(0))).sorted
    val page = li.rangeByScore(0.0, 1.0, offset = 3, count = 5).collect()
      .map(r => (r.getDouble(1), r.getLong(0))).toSeq
    assert(page == all.slice(3, 8).toSeq)
  }

  test("resume: λ stages skip on rebuild with same fingerprint") {
    li // force
    val t0 = System.nanoTime()
    val li3 = LambdaPipeline.build(spark, index, s"$tmp/lam", cfg)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 5000, s"resume should skip all stages, took $ms ms")
    assert(li3.lambdas.count() == nFiles)
  }
}
