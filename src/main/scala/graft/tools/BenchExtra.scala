package graft.tools

/** Phase-isolated bench measurements (guide §1.4): runs ONE level of the
  * frozen Bench protocol via graft.Bench.benchAt — identical job
  * definition, corpus, and timing methodology — and prints every metric
  * plus the per-stage lineage wall times as labelled lines. Used to take
  * before/after numbers per optimization without paying the full
  * three-pair + retry protocol. Not part of the driver contract
  * (Bench.scala stays the only official record).
  *
  * Usage: runMain graft.tools.BenchExtra [cpusCsv] [nFiles] [singles]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq else Seq(32)
    val nFiles = if (args.length > 1) args(1).toLong else 100000L
    val singles = if (args.length > 2) args(2).toBoolean else false
    for (cpus <- levels) {
      val r = graft.Bench.benchAt(cpus, nFiles, "/tmp/graft_bx", singlesToo = singles)
      def f(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
      println(s"BX cpus=$cpus buildSec=${f(r.buildSec)} filesPerSec=${f(r.filesPerSec)} " +
        s"batchSec=${f(r.batchSec)} qps=${f(r.qps)}")
      r.probe.toSeq.sortBy(_._1).filter(_._1.startsWith("stage_")).foreach { case (k, v) =>
        println(s"BX cpus=$cpus $k=${f(v)}")
      }
      r.singles.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(s"BX cpus=$cpus single $k=${f(v)}")
      }
    }
  }
}
