package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.InvertedIndex
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for the bench-declared query paths
  * against a standing index/λ dir (plans/r06 deliverable). Not part of
  * the driver contract.
  *
  * Usage: runMain graft.tools.PlanDump <idxDir> <lamDir> <outDir> [suffix]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val idxDir = args(0)
    val lamDir = args(1)
    val outDir = args(2)
    val suffix = if (args.length > 3) args(3) else "after"
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = graft.Bench.newSession(32)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "128")
      val index = new InvertedIndex(spark, idxDir)
      val lam = new graft.lambda.LambdaIndex(spark, lamDir)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      dump("wand_topk_q4_hot", index.wandTopK(Seq("get"), 10))
      dump("wand_topk_q3_multi", index.wandTopK(Seq("merge", "segment", "filter"), 10))
      dump("batch32768_wand",
        index.wandTopKBatch(graft.Bench.queryBatch(index.nDocs, 512), 10))
      dump("blended_topk_single",
        lam.blendedTopK(index, "merge segment filter", 10, 0.7))
      println(s"PLANS written to $outDir (_$suffix)")
    } finally spark.stop()
  }
}
