package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.CodeCorpus
import graft.index.{DocIds, IndexBuilder, InvertedIndex}

/** Phase isolation for the docs build stage (guide §1.4) and the
  * distributed single-query path: times (a) corpus generation alone,
  * (b) + the docId shuffle, (c) + sha256 + parquet write, and then the
  * q1-q5 singles with per-phase wall clocks. Not part of the driver
  * contract.
  *
  * Usage: runMain graft.tools.DocsProbe [cpus] [nFiles]
  */
object DocsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val nFiles = if (args.length > 1) args(1).toLong else 100000L
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = graft.Bench.newSession(cpus)
    try {
      def time(label: String)(f: => Unit): Unit = {
        spark.sparkContext.setJobDescription(label)
        val reps = (1 to 2).map { _ =>
          val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
        }
        println(f"DPROBE $label min=${reps.min}%.3f reps=${reps.map(r => f"$r%.3f").mkString(",")}")
        spark.sparkContext.setJobDescription(null)
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()

      val gen = CodeCorpus.generate(spark, nFiles, 42L, 128)
      noop(gen.toDF()) // warm JIT
      time("gen only")(noop(gen.toDF()))
      time("gen+assign")(noop(DocIds.assign(CodeCorpus.generate(spark, nFiles, 42L, 128), 32).toDF()))
      time("gen+assign+sha")(noop(
        DocIds.assign(CodeCorpus.generate(spark, nFiles, 42L, 128), 32)
          .withColumn("sha256", sha2(col("content"), 256))))
      val out = "/tmp/graft_docsprobe_out"
      time("full docs stage (write)") {
        graft.index.Stage.deleteRecursive(java.nio.file.Paths.get(out))
        DocIds.assign(CodeCorpus.generate(spark, nFiles, 42L, 128), 32)
          .withColumn("sha256", sha2(col("content"), 256))
          .write.mode("overwrite").parquet(out)
      }
      time("docs write, no dictionary") {
        graft.index.Stage.deleteRecursive(java.nio.file.Paths.get(out))
        DocIds.assign(CodeCorpus.generate(spark, nFiles, 42L, 128), 32)
          .withColumn("sha256", sha2(col("content"), 256))
          .write.mode("overwrite")
          .option("parquet.enable.dictionary", "false")
          .parquet(out)
      }
      time("docs write, lz4_raw") {
        graft.index.Stage.deleteRecursive(java.nio.file.Paths.get(out))
        DocIds.assign(CodeCorpus.generate(spark, nFiles, 42L, 128), 32)
          .withColumn("sha256", sha2(col("content"), 256))
          .write.mode("overwrite")
          .option("compression", "lz4_raw")
          .parquet(out)
      }

      // singles against the standing probe index if present
      val idxDir = "/tmp/graft_blendprobe/idx"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$idxDir/meta.props"))) {
        val index = new InvertedIndex(spark, idxDir)
        val cls = Seq(
          "q1_common" -> Seq("data"),
          "q2_needle" -> Seq(graft.tokenize.CodeTokenizer.codeTokens(
            CodeCorpus.needleToken(42L, 7L))(1)),
          "q3_multi" -> Seq("merge", "segment", "filter"),
          "q4_hot" -> Seq("get"),
          "q5_perturbed" -> graft.Bench.queryBatch(nFiles, 5).last._2)
        spark.conf.set("spark.sql.shuffle.partitions", "128")
        index.wandTopKBatch(graft.Bench.queryBatch(nFiles, 512), 10).count() // warm
        cls.foreach { case (name, q) =>
          time(s"single $name")(index.wandTopK(q, 10).count())
        }
        // phase split for one query: scan+decode only vs full
        val terms = Seq("get")
        time("single q4 scan-only")(
          noop(index.postingsFor(terms).toDF()))
        // the 2-stage local job floor: what an irreducible shuffle job
        // costs on this session, for comparison with the singles
        spark.range(100000L).repartition(2).count() // warm
        time("2-stage job floor")(spark.range(100000L).repartition(2).count())
      }
    } finally spark.stop()
  }
}
