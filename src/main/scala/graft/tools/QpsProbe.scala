package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.InvertedIndex

/** Ad-hoc scaling probe for the batch query path: runs wandTopKBatch
  * repeatedly against an EXISTING index dir at several parallelism
  * levels (no build in the loop) and prints per-rep times — used to
  * separate query-path scaling from build noise when tuning the bench.
  * Not part of the driver contract.
  */
object QpsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bench_100/idx_cpu32_0")
    val levels = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(2, 8)
    val reps = if (args.length > 2) args(2).toInt else 3
    for (cpus <- levels) {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder()
        .master(s"local[$cpus]").appName(s"qps-probe-$cpus")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_PARTS", "64"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val index = new InvertedIndex(spark, dir)
        val nq = sys.env.getOrElse("PROBE_BATCH", "4096").toInt
        val batch = graft.Bench.queryBatch(index.nDocs, nq)
        // payload accounting for the v5 dl-sidecar change, over exactly
        // the lists this batch walks: bytes stored now (doc+tf streams)
        // vs the dl LEB128 stream the v4 layout would ALSO have carried
        // (reconstructed exactly from the lens sidecar — varint size of
        // each posting's dl)
        locally {
          import org.apache.spark.sql.functions.col
          val terms = batch.flatMap(_._2).distinct
          val lh = index.lensHandle
          val (nowB, dlB) = index.postings.filter(col("term").isin(terms: _*))
            .rdd.map { pl =>
              val lens = lh.forShard(pl.shard)
              val base = pl.shard.toLong * lh.docsPerShard
              val (ids, _) = graft.index.PostingFormat.decodeAll(pl)
              var dl = 0L
              var i = 0
              while (i < ids.length) {
                var v = lens((ids(i) - base).toInt).toLong
                var n = 1L
                while (v >= 0x80) { v >>>= 7; n += 1 }
                dl += n; i += 1
              }
              (pl.docBytes.length.toLong + pl.tfBytes.length.toLong, dl)
            }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
          println(f"PAYLOAD cpus=$cpus terms=${terms.length} docTfBytes=$nowB dlBytesV4=$dlB " +
            f"v5/v4=${nowB.toDouble / (nowB + dlB)}%.4f")
        }
        for (r <- 1 to reps) {
          System.gc()
          // stage decomposition: postings scan+filter only, then + decode,
          // then the full batch (adds WAND + window top-k)
          import org.apache.spark.sql.functions.col
          val terms = batch.flatMap(_._2).distinct
          val t0 = System.nanoTime()
          index.postings.filter(col("term").isin(terms: _*)).count()
          val scanSec = (System.nanoTime() - t0) / 1e9
          val p = index.bm25; val ad = index.avgdl
          val lh = index.lensHandle
          val t1 = System.nanoTime()
          index.postings.filter(col("term").isin(terms: _*))
            .rdd.map(pl => graft.index.DecodedList.from(pl, p, ad,
              lh.forShard(pl.shard), pl.shard.toLong * lh.docsPerShard)
              .docIds.length.toLong)
            .reduce(_ + _)
          val decodeSec = (System.nanoTime() - t1) / 1e9
          graft.index.PostingStats.reset()
          val t2 = System.nanoTime()
          index.wandTopKBatch(batch, 10).count()
          val sec = (System.nanoTime() - t2) / 1e9
          // decode-payload bytes walked by the whole batch (process-wide
          // counter — valid in local mode where tasks share the JVM)
          val bytesPerQ = graft.index.PostingStats.bytes().toDouble / nq
          println(f"PROBE cpus=$cpus rep=$r scan=$scanSec%.3f scan+decode=$decodeSec%.3f full=$sec%.3f qps=${nq / sec}%.1f bytesPerQuery=$bytesPerQ%.0f")
        }
      } finally spark.stop()
    }
  }
}
