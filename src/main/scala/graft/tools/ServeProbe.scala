package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.InvertedIndex

/** Serving-tier isolation probe: LocalSearcher/LocalBlended batch-512
  * throughput against a standing index, many reps, no Spark in the
  * timed region. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.ServeProbe [idxDir] [lamDir] [reps]
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val idxDir = args.headOption.getOrElse("/tmp/graft_blendprobe/idx")
    val lamDir = if (args.length > 1) args(1) else "/tmp/graft_blendprobe/lam"
    val reps = if (args.length > 2) args(2).toInt else 8
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = graft.Bench.newSession(32)
    try {
      val index = new InvertedIndex(spark, idxDir)
      val local = graft.search.LocalSearcher.fromIndex(index)
      val batch = graft.Bench.queryBatch(index.nDocs, 512)
      local.topKBatch(batch.take(64), 10) // warm
      for (r <- 1 to reps) {
        val t = System.nanoTime()
        local.topKBatch(batch, 10)
        val sec = (System.nanoTime() - t) / 1e9
        println(f"SPROBE bm25 rep=$r sec=$sec%.4f qps=${512 / sec}%.1f")
      }
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$lamDir/lambdas.props"))) {
        val lam = new graft.lambda.LambdaIndex(spark, lamDir)
        val lb = graft.search.LocalBlended.fromIndexes(index, lam)
        val texts = batch.map { case (qid, ts) => (qid, ts.mkString(" ")) }
        lb.topKBatch(texts.take(64), 10, 0.9) // warm
        for (r <- 1 to reps) {
          val t = System.nanoTime()
          lb.topKBatch(texts, 10, 0.9)
          val sec = (System.nanoTime() - t) / 1e9
          println(f"SPROBE blended rep=$r sec=$sec%.4f qps=${512 / sec}%.1f")
        }
      }
    } finally spark.stop()
  }
}
