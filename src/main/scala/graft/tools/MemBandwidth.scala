package graft.tools

/** DRAM-bandwidth calibration for the scaling-efficiency account: streams
  * a working set far larger than LLC with T reader threads and reports
  * aggregate GB/s per thread count. No Spark, no allocation in the timed
  * loop — this measures the BOX's memory system, the resource the QPS
  * probe decomposition identified as the batch path's limiter (every
  * phase scales uniformly ~0.7, no serial stage). The ratio
  * bw(4)/ (4·bw(1)) is the machine's own memory-side scaling ceiling for
  * a 1→4-core pair; a query path that matches it is bandwidth-saturated,
  * not under-parallelized. Not part of the driver contract.
  */
object MemBandwidth {
  def main(args: Array[String]): Unit = {
    val gb = if (args.length > 0) args(0).toDouble else 2.0
    val levels = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(1, 4, 32)
    val reps = if (args.length > 2) args(2).toInt else 3
    for (t <- levels) {
      // FIXED total working set (gb split across the t threads): the
      // former gb-per-thread sizing allocated 64 GB of live long[] at
      // the default 32-thread level (instant OOM on any normal heap),
      // and (gb·1e9/8).toLong.toInt overflowed Int for gb ≥ ~17
      val longsPerThread = {
        val l = (gb * 1e9 / 8 / t).toLong
        require(l > 0 && l <= Int.MaxValue, s"bad per-thread size $l (gb=$gb, t=$t)")
        l.toInt
      }
      // one private array per thread: no false sharing, pure streaming reads
      val arrays = Array.fill(t)(new Array[Long](longsPerThread))
      arrays.foreach { a => var i = 0; while (i < a.length) { a(i) = i; i += 1 } }
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val sinks = new Array[Long](t)
        val threads = (0 until t).map { ti =>
          new Thread(() => {
            val a = arrays(ti)
            var s = 0L
            var i = 0
            while (i < a.length) { s += a(i); i += 1 }
            sinks(ti) = s
          })
        }
        val t0 = System.nanoTime()
        threads.foreach(_.start())
        threads.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        require(sinks.forall(_ != 0), "sink elided")
        if (sec < best) best = sec
      }
      val bytes = t.toLong * longsPerThread * 8L
      println(f"MEMBW threads=$t%d bytes=$bytes%d sec=$best%.4f gbps=${bytes / best / 1e9}%.3f")
    }
  }
}
