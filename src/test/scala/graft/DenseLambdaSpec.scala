package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.lambda.{DenseLambda, TauMode}

/** Dense-regime parity with the reference's own search-semantics tests
  * (tests/test_querying_proj.rs, benches' α=1 ≡ cosine oracle) over the
  * driver-provided embeddings table.
  */
class DenseLambdaSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  lazy val items: Dataset[(Long, Array[Double])] = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .cache()
  }
  lazy val built = DenseLambda.build(spark, items, DenseLambda.Config(maxClusters = 16))
  lazy val q: Array[Double] = items.filter(_._1 == 0L).collect()(0)._2
  lazy val lq: Double = DenseLambda.queryLambda(q, built)

  test("build: one lambda per item, all in [0,1], valid Laplacian") {
    assert(built.lambdas.count() == items.count())
    assert(built.lambdas.filter(col("lambda") < 0 || col("lambda") > 1).count() == 0)
    assert(built.csr.laplacianViolations(1e-8).isEmpty)
  }

  test("alpha=1 ranking identical to brute-force cosine (the reference's own oracle)") {
    for (k <- Seq(3, 8, 10)) {
      val a = DenseLambda.searchLambdaAware(items, built, q, lq, k, alpha = 1.0)
        .collect().map(_.getLong(0)).toSeq
      val b = DenseLambda.cosineTopK(items, q, k).collect().map(_.getLong(0)).toSeq
      assert(a == b, s"k=$k: $a vs $b")
    }
  }

  test("search semantics: k results, descending, top hit is the query itself") {
    val res = DenseLambda.searchLambdaAware(items, built, q, lq, 5, alpha = 0.9).collect()
    assert(res.length == 5)
    val scores = res.map(_.getDouble(1)).toSeq
    assert(scores == scores.sortBy(-(_: Double)))
    assert(res.head.getLong(0) == 0L, "query vector is item 0; cosine=1 must win")
  }

  test("query preparation rejects non-finite vectors and zero lambda") {
    intercept[IllegalArgumentException] {
      DenseLambda.queryLambda(q.updated(0, Double.NaN), built)
    }
    intercept[IllegalArgumentException] {
      DenseLambda.searchLambdaAware(items, built, q, 0.0, 3, 0.9).collect()
    }
  }

  test("lambda of a prepared query is deterministic and within [0,1]") {
    assert(lq == DenseLambda.queryLambda(q, built))
    assert(lq > 0.0 && lq <= 1.0)
  }

  test("range search one-sided band") {
    val eps = 0.05
    val got = DenseLambda.rangeSearch(built, lq, eps).count()
    val want = built.lambdas.filter(col("lambda") >= lq - eps).count()
    assert(got == want)
  }

  test("build is deterministic across invocations") {
    val b2 = DenseLambda.build(spark, items, DenseLambda.Config(maxClusters = 16))
    val a = built.lambdas.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = b2.lambdas.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }
}
