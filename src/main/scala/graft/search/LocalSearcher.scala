package graft.search

import graft.index.{InvertedIndex, PostingList}

/** In-memory serving mode: the whole compressed index (or a hot shard
  * subset) collected once, then block-max WAND runs without any Spark
  * job — millisecond-latency single queries, directly comparable to the
  * reference's in-process criterion benches
  * (/root/reference/benches/base_index_bench.json: 8–19 ms per top-3
  * query). The distributed path (InvertedIndex.wandTopK/wandTopKBatch)
  * remains the scale path; this is the low-latency serving tier a search
  * cluster would run per replica over its shard range.
  */
final class LocalSearcher(
    val byTerm: Map[String, Array[graft.index.DecodedList]],
    val termDf: Map[String, Long],
    val nDocs: Long,
    val avgdl: Double,
    val params: BM25.Params) extends Serializable {

  def idf(term: String): Double =
    BM25.idf(nDocs.toDouble, termDf.getOrElse(term, 0L).toDouble)

  /** Exact top-k (score DESC, docId ASC) over pre-decoded lists: O(1)
    * cursor setup per (query, term, shard); WAND per shard, shard top-ks
    * merged.
    */
  def topK(qTerms: Seq[String], k: Int): Array[Wand.Hit] = {
    val terms = qTerms.distinct.filter(byTerm.contains).sorted
    if (terms.isEmpty) return Array.empty
    val idfMap = terms.map(t => t -> idf(t)).toMap
    val byShard = terms.flatMap(t => byTerm(t)).groupBy(_.shard)
    val all = byShard.toSeq.sortBy(_._1).iterator.flatMap { case (_, lists) =>
      val cursors = lists.sortBy(_.term)
        .map(dl => new graft.index.DecodedCursor(dl, idfMap(dl.term)))
      Wand.topK(cursors, k)
    }.toArray
    scala.util.Sorting.stableSort(all,
      (a: Wand.Hit, b: Wand.Hit) => a.score > b.score || (a.score == b.score && a.docId < b.docId))
    all.take(k)
  }
}

object LocalSearcher {

  /** Collect an index — or just the doc-shard slice [shardLo, shardHi]
    * a serving replica owns — into memory (one Spark job) and pre-decode
    * every list; queries never touch compressed bytes again.
    *
    * The shard predicate pushes to the postings parquet scan (shard is a
    * sorted column → row-group pruning), so a replica reads ONLY its
    * slice from storage. idf statistics (termstats, nDocs, avgdl) stay
    * GLOBAL regardless of the slice, so replica scores are identical to
    * the full searcher's and a fan-out tier can merge replica top-ks by
    * (score DESC, docId ASC) exactly.
    */
  def fromIndex(index: InvertedIndex, shardLo: Int = 0,
      shardHi: Int = Int.MaxValue): LocalSearcher = {
    import org.apache.spark.sql.functions.col
    val p = index.bm25
    val ad = index.avgdl
    val lists = index.postings
      .filter(col("shard") >= shardLo && col("shard") <= shardHi)
      .collect().map(pl => graft.index.DecodedList.from(pl, p, ad))
    val byTerm = lists.groupBy(_.term).map { case (t, ls) => t -> ls.sortBy(_.shard) }
    val df = index.termStats.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    new LocalSearcher(byTerm, df, index.nDocs, index.avgdl, index.bm25)
  }

  /** Merge per-replica top-ks (each already (score DESC, docId ASC)
    * sorted) into the global top-k — the serving fan-out's reduce step.
    */
  def mergeTopK(parts: Seq[Array[Wand.Hit]], k: Int): Array[Wand.Hit] = {
    val all = parts.flatten.toArray
    scala.util.Sorting.stableSort(all,
      (a: Wand.Hit, b: Wand.Hit) => a.score > b.score || (a.score == b.score && a.docId < b.docId))
    all.take(k)
  }
}
