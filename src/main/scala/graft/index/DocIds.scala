package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, Encoders}
import graft.corpus.SourceFile

/** Deterministic, dense, resume-stable docId assignment — Dataset-only
  * (no RDD zipWithIndex), per SURVEY.md §4 item 4 and §7.4 item 2.
  *
  * docId = offset(partition) + local rank, where
  *  - partition = hash-partition of the natural key (repo, path, commit)
  *    (deterministic for a fixed partition count — no RangePartitioner
  *    sampling, whose boundaries vary between runs),
  *  - local rank = position in the (repo, path, commit) sort within the
  *    partition,
  *  - offset = prefix sum of per-partition counts (a tiny driver-side
  *    collect of `numParts` longs — scale-safe at any corpus size).
  *
  * Two actions run over the same shuffle; Spark reuses the shuffle files
  * for the second pass, so the corpus is scanned once and shuffled once.
  */
object DocIds {

  case class Doc(docId: Long, repo: String, path: String, commit: String,
      lang: String, content: String)

  def assign(files: Dataset[SourceFile], numParts: Int): Dataset[Doc] = {
    val spark = files.sparkSession
    import spark.implicits._
    val parted = files
      .repartition(numParts, $"repo", $"path", $"commit")
      .sortWithinPartitions($"repo", $"path", $"commit")
      // persist across the two passes — separate actions do NOT share
      // shuffle output, so without this the source would be read and
      // shuffled twice (at petabyte scale this stage instead writes the
      // sorted run to storage once and counts per file from footers)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition counts
    val counts: Array[(Int, Long)] = parted
      .mapPartitions { it =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }
        Iterator.single((TaskContext.getPartitionId(), n))
      }(Encoders.product[(Int, Long)])
      .collect()
    val offsets = new Array[Long](numParts)
    var acc = 0L
    counts.sortBy(_._1).foreach { case (pid, n) => offsets(pid) = acc; acc += n }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: attach ids (consumer materializes; unpersist is left to GC /
    // session end since the downstream write runs lazily)
    parted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var next = bOffsets.value(pid)
      it.map { f =>
        val d = Doc(next, f.repo, f.path, f.commit, f.lang, f.content)
        next += 1
        d
      }
    }
  }
}
