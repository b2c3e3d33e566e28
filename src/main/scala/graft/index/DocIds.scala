package graft.index

import org.apache.spark.sql.Dataset
import graft.corpus.SourceFile

/** Deterministic, dense, resume-stable docId assignment — Dataset-only
  * (no RDD zipWithIndex), per SURVEY.md §4 item 4 and §7.4 item 2.
  *
  * docId = offset(partition) + local rank, where
  *  - partition = hash-partition of the natural key (repo, path, commit)
  *    (deterministic for a fixed partition count — no RangePartitioner
  *    sampling, whose boundaries vary between runs),
  *  - local rank = position in the (repo, path, commit) sort within the
  *    partition (binary UTF-8 order — exactly Spark's string sort),
  *  - offset = prefix sum of per-partition counts (a tiny driver-side
  *    collect of `numParts` longs — scale-safe at any corpus size).
  *
  * The corpus is GENERATED/SCANNED ONCE and SHUFFLED ONCE (v6): both the
  * counting pass and the id-attach pass are jobs over the same
  * materialized shuffle RDD, so the second job reuses the first job's
  * shuffle files instead of recomputing the input (the former shape ran
  * a separate key-hash aggregation for the counts — one full extra pass
  * over the corpus, ~a third of the docs-stage wall time). The
  * in-partition sort runs inside the id-attach task over the partition's
  * rows (bounded by corpusSize / numParts) with a byte-wise UTF-8
  * comparator — identical ordering to `sortWithinPartitions` on string
  * columns (UTF8String compares binary UTF-8), nulls first.
  */
object DocIds {

  case class Doc(docId: Long, repo: String, path: String, commit: String,
      lang: String, content: String)

  /** Byte-wise UTF-8 comparison — Spark's UTF8String.compareTo order
    * (which is NOT java.lang.String order for non-ASCII), nulls first
    * like Spark's default NULLS FIRST ascending sort.
    */
  private def cmpUtf8(a: String, b: String): Int = {
    if (a eq b) return 0
    if (a == null) return -1
    if (b == null) return 1
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private val byKey: java.util.Comparator[SourceFile] = new java.util.Comparator[SourceFile] {
    def compare(a: SourceFile, b: SourceFile): Int = {
      var c = cmpUtf8(a.repo, b.repo)
      if (c != 0) return c
      c = cmpUtf8(a.path, b.path)
      if (c != 0) return c
      cmpUtf8(a.commit, b.commit)
    }
  }

  /** `base` offsets every id — an appended epoch's ids start at the
    * current corpus size (the Iceberg-snapshot analog: each snapshot's
    * new files get the next contiguous id range).
    */
  def assign(files: Dataset[SourceFile], numParts: Int, base: Long = 0L): Dataset[Doc] = {
    val spark = files.sparkSession
    import spark.implicits._
    // ONE exchange, materialized once: both jobs below hang off this RDD,
    // so the count pass generates + shuffles the corpus and the id pass
    // reads the same shuffle files back (skipped map stage).
    val shuffled = files
      .repartition(numParts, $"repo", $"path", $"commit")
      .as[SourceFile]
      .rdd
    // Pass 1 — per-partition counts straight from the shuffle output.
    val counts: Array[(Int, Long)] = shuffled
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator((pid, n))
      }
      .collect()
    val offsets = new Array[Long](numParts)
    var acc = base
    counts.sortBy(_._1).foreach { case (pid, n) => offsets(pid) = acc; acc += n }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // Pass 2 — in-task key sort (bounded by the partition) + id attach.
    spark.createDataset(shuffled.mapPartitionsWithIndex { (pid, it) =>
      val arr = it.toArray
      java.util.Arrays.sort(arr, byKey)
      var next = bOffsets.value(pid)
      arr.iterator.map { f =>
        val d = Doc(next, f.repo, f.path, f.commit, f.lang, f.content)
        next += 1
        d
      }
    })
  }
}
