package graft.tools

import graft.corpus.CodeCorpus
import graft.index.{IndexBuilder, Stage}

/** Ad-hoc scaling probe for the index-build path at arbitrary
  * parallelism levels (identical job definition at each). Not part of
  * the driver contract.
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq else Seq(1, 4)
    val nFiles = if (args.length > 1) args(1).toLong else 100000L
    for (cpus <- levels) {
      val spark = graft.Bench.newSession(cpus)
      try {
        val dir = s"/tmp/graft_bprobe/idx_cpu$cpus"
        Stage.deleteRecursive(java.nio.file.Paths.get(dir))
        val t0 = System.nanoTime()
        IndexBuilder.build(spark, CodeCorpus.generate(spark, nFiles, 42L, 128), dir,
          corpusFp = s"bprobe:42:$nFiles",
          IndexBuilder.Params(docsPerShard = math.max(nFiles / 128, 256L), numParts = 128))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"BPROBE cpus=$cpus buildSec=$sec%.2f filesPerSec=${nFiles / sec}%.1f")
      } finally spark.stop()
    }
  }
}
