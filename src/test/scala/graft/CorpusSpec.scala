package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.CodeCorpus
import graft.tokenize.CodeTokenizer

class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("generation is deterministic and partition-independent") {
    val a = CodeCorpus.generate(spark, 200, seed = 42L, parts = 2).collect().sortBy(_.path)
    val b = CodeCorpus.generate(spark, 200, seed = 42L, parts = 13).collect().sortBy(_.path)
    assert(a.toSeq == b.toSeq)
    val c = CodeCorpus.generate(spark, 200, seed = 43L, parts = 2).collect().sortBy(_.path)
    assert(a.map(_.content).toSeq != c.map(_.content).toSeq)
  }

  test("sha256 invariant: generator-side digest == Spark sha2(content, 256)") {
    import spark.implicits._
    val ds = CodeCorpus.generate(spark, 100, seed = 42L, parts = 4)
    val mismatches = ds
      .withColumn("spark_sha", sha2(col("content"), 256))
      .map(r => {
        val f = graft.corpus.SourceFile(r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))
        (CodeCorpus.sha256Of(f), r.getString(5))
      })
      .filter(t => t._1 != t._2)
      .count()
    assert(mismatches == 0)
  }

  test("each file contains its needle token exactly once") {
    val files = CodeCorpus.generate(spark, 50, seed = 42L, parts = 4).collect()
    files.zipWithIndex.foreach { case (f, _) =>
      val id = f.path.stripPrefix("src/").dropWhile(_ != '/').drop(1 + "File".length).takeWhile(_.isDigit).toLong
      val needle = CodeCorpus.needleToken(42L, id)
      val toks = CodeTokenizer.codeTokens(f.content)
      // needle_<hex> splits into "needle" + hex; assert raw containment once
      assert(f.content.split(java.util.regex.Pattern.quote(needle), -1).length == 2,
        s"needle $needle not exactly once in ${f.path}")
      assert(toks.nonEmpty)
    }
  }

  test("golden digest: seed-42 corpus bytes are pinned across generator rewrites") {
    // digest recorded from the interpolation-based generator BEFORE the
    // round-6 append-based rewrite — the corpus is the root of every
    // gate artifact and bench number, so its bytes must never drift
    val md = java.security.MessageDigest.getInstance("SHA-256")
    for (id <- Seq(0L, 1L, 7L, 999L, 54321L, 99999L)) {
      val f = CodeCorpus.file(42L, id)
      md.update(f.content.getBytes("UTF-8"))
      md.update(f.repo.getBytes("UTF-8")); md.update(f.path.getBytes("UTF-8"))
      md.update(f.commit.getBytes("UTF-8")); md.update(f.lang.getBytes("UTF-8"))
    }
    var i = 0L
    while (i < 5000L) { md.update(CodeCorpus.file(42L, i).content.getBytes("UTF-8")); i += 1 }
    val hex = md.digest().map("%02x".format(_)).mkString
    assert(hex == "904cca3152d891a3fd9930724e33dfb3ab55b574be96fab7f2e4ac94e74c44b3", hex)
  }

  test("term frequency is Zipf-skewed: top stem count >> median stem count") {
    import spark.implicits._
    val ds = CodeCorpus.generate(spark, 300, seed = 42L, parts = 4)
    val cnt = ds
      .flatMap(f => CodeTokenizer.codeTokens(f.content).map(t => (t, 1)))
      .toDF("term", "one")
      .groupBy("term").agg(sum("one").as("cnt"))
      .filter(col("term").isin(CodeCorpus.Stems: _*))
      .collect().map(r => r.getAs[Long]("cnt")).sorted.reverse
    assert(cnt.head > 4 * cnt(cnt.length / 2), s"head=${cnt.head} median=${cnt(cnt.length / 2)}")
  }
}
