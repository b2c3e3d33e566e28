package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, InvertedIndex}
import graft.lambda.{LambdaIndex, LambdaPipeline}

/** Phase-isolated measurement of the blended batch path (guide §1.4):
  * builds (or resumes) a bench-shaped index + λ pipeline in /tmp, then
  * times with a noop sink (1) the WAND candidate bands alone, (2) bands +
  * λ join + blend scoring, (3) the full blendedTopKBatch, and dumps
  * `.explain("formatted")` for the full plan. Not part of the driver
  * contract.
  *
  * Usage: runMain graft.tools.BlendProbe [cpus] [nFiles] [batchN] [planOut]
  */
object BlendProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val nFiles = if (args.length > 1) args(1).toLong else 100000L
    val batchN = if (args.length > 2) args(2).toInt else 4096
    val planOut = if (args.length > 3) Some(args(3)) else None
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName(s"blend-probe-$cpus")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val base = "/tmp/graft_blendprobe"
      val seed = graft.Bench.Seed
      val index = IndexBuilder.build(spark,
        graft.corpus.CodeCorpus.generate(spark, nFiles, seed, 128),
        s"$base/idx", corpusFp = s"bench:$seed:$nFiles",
        IndexBuilder.Params(docsPerShard = math.max(nFiles / 128, 256L), numParts = 32))
      val tl = System.nanoTime()
      val lam = LambdaPipeline.build(spark, index, s"$base/lam")
      println(f"LAMBDA_BUILD sec=${(System.nanoTime() - tl) / 1e9}%.3f")

      val queries = graft.Bench.queryBatch(nFiles, batchN)
        .map { case (qid, ts) => (qid, ts.mkString(" ")) }
      val alpha = 0.9
      // reproduce blendedTopKBatch's canonicalization to probe phases
      val fn: String => Array[String] = graft.tokenize.CodeTokenizer.codeTokens
      val prep = queries.map { case (qid, text) =>
        val ts = fn(text).toSeq
        val counts = ts.groupBy(identity).map { case (t, xs) => t -> xs.size }
        (qid, ts.distinct.sorted, lam.queryLambda(counts))
      }
      val info = index.termInfo(prep.flatMap(_._2).distinct)
      val k1p1 = index.bm25.k1 + 1.0
      val qNorm = prep.map { case (qid, ts, lqv) => (qid, ts.filter(info.contains), lqv) }
      val canonOf = qNorm.map { case (_, ts, lqv) => (ts, lqv) }.distinct.zipWithIndex.toMap
      def ubNormOf(ts: Seq[String]): Double = ts.map(info(_)._1 * k1p1).sum.max(1e-12)
      val sets = canonOf.toSeq.map { case ((ts, _), cid) =>
        val tightUb = ts.map(t => info(t)._1 * info(t)._2).sum
        val slack =
          if (alpha <= 0.0) tightUb
          else math.min((1.0 - alpha) / alpha * ubNormOf(ts), tightUb)
        (cid, ts, slack)
      }.sortBy(_._1)
      println(s"CANON sets=${sets.size} of $batchN queries")

      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def time(label: String)(f: => Unit): Unit = {
        spark.sparkContext.setJobDescription(label)
        val reps = (1 to 2).map { _ =>
          val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
        }
        println(f"PHASE $label min=${reps.min}%.3f reps=${reps.map(r => f"$r%.3f").mkString(",")}")
        spark.sparkContext.setJobDescription(null)
      }

      // warm
      lam.blendedTopKBatch(index, queries.take(512), 10, alpha).count()

      time("bands: candidatesBatch only") {
        noop(index.candidatesBatch(sets, 10))
      }
      time("bands+lambda join+score") {
        val canonMeta = {
          import spark.implicits._
          canonOf.toSeq.map { case ((ts, lqv), cid) => (cid, lqv, ubNormOf(ts)) }
            .toDF("set_id", "lq", "ub_norm")
        }
        noop(index.candidatesBatch(sets, 10)
          .join(lam.lambdas, Seq("doc_id"), "left")
          .na.fill(0.0, Seq("lambda"))
          .join(broadcast(canonMeta), "set_id")
          .withColumn("score",
            lit(alpha) * (col("bm25") / col("ub_norm")) +
              lit(1.0 - alpha) * (lit(1.0) - least(abs(col("lq") - col("lambda")), lit(1.0)))))
      }
      time("full blendedTopKBatch") {
        lam.blendedTopKBatch(index, queries, 10, alpha).count()
      }
      // band size accounting
      val bandRows = index.candidatesBatch(sets, 10).count()
      println(s"BAND rows=$bandRows (${bandRows / sets.size} per set avg)")
      planOut.foreach { p =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p).getParent)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
          lam.blendedTopKBatch(index, queries, 10, alpha).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        println(s"PLAN written to $p")
      }
    } finally spark.stop()
  }
}
