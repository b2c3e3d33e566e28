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

  /** `base` offsets every id — an appended epoch's ids start at the
    * current corpus size (the Iceberg-snapshot analog: each snapshot's
    * new files get the next contiguous id range).
    */
  def assign(files: Dataset[SourceFile], numParts: Int, base: Long = 0L): Dataset[Doc] = {
    val spark = files.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{count => cnt, _}
    // Pass 1 — per-partition counts WITHOUT materializing the shuffle:
    // `pmod(hash(keys), P)` is exactly HashPartitioning's partition-id
    // expression (Murmur3 seed 42), so the counts of the future shuffle
    // partitions come from a narrow, column-pruned aggregation (only the
    // key columns are read; map-side partial combine; the tiny (P rows)
    // result is collected). No cache, no double shuffle.
    val counts: Array[(Int, Long)] = files
      .groupBy(pmod(hash($"repo", $"path", $"commit"), lit(numParts)).as("part"))
      .agg(cnt(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val offsets = new Array[Long](numParts)
    var acc = base
    counts.sortBy(_._1).foreach { case (pid, n) => offsets(pid) = acc; acc += n }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // Pass 2 — the actual shuffle + in-partition sort + id attach.
    files
      .repartition(numParts, $"repo", $"path", $"commit")
      .sortWithinPartitions($"repo", $"path", $"commit")
      .mapPartitions { it =>
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
