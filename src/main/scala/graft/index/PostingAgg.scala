package graft.index

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer
import graft.search.BM25

/** One raw posting before compression. */
case class PostingEntry(term: String, shard: Int, docId: Long, tf: Long, dl: Long)

/** A docId-sorted run of postings for one (term, shard). Runs produced by
  * different map partitions are docId-disjoint (each (term, doc) pair
  * exists exactly once after tf aggregation) but interleave in docId
  * order, so combining them is a k-way sorted merge.
  */
case class PostingRun(docIds: Array[Long], tfs: Array[Long], dls: Array[Long])

/** Mutable aggregation buffer: unsorted tail + sealed sorted runs. */
class PostingBuf extends Serializable {
  var term: String = null
  var shard: Int = -1
  var runs: List[PostingRun] = Nil
  val pDoc = new ArrayBuffer[Long]()
  val pTf = new ArrayBuffer[Long]()
  val pDl = new ArrayBuffer[Long]()

  def seal(): Unit = if (pDoc.nonEmpty) {
    val idx = Array.range(0, pDoc.length)
    val docArr = pDoc.toArray
    val sorted = idx.sortBy(docArr(_))
    runs ::= PostingRun(
      sorted.map(docArr(_)),
      { val a = pTf.toArray; sorted.map(a(_)) },
      { val a = pDl.toArray; sorted.map(a(_)) })
    pDoc.clear(); pTf.clear(); pDl.clear()
  }
}

/** Typed Catalyst aggregation building a compressed posting list per
  * (term, shard): map-side partial buffers become sorted runs, shuffle
  * moves runs (not raw rows), and `merge`/`finish` sort-merge-combine the
  * runs into one delta+FOR/varint-compressed block-max list — the north
  * rule's "per-partition posting lists … sort-merge-combined into a
  * global inverted index" as an `Aggregator[IN, BUF, OUT]`.
  */
class PostingAgg(params: BM25.Params, avgdl: Double)
    extends Aggregator[PostingEntry, PostingBuf, PostingList] {

  def zero: PostingBuf = new PostingBuf

  def reduce(b: PostingBuf, e: PostingEntry): PostingBuf = {
    if (b.term == null) { b.term = e.term; b.shard = e.shard }
    b.pDoc += e.docId; b.pTf += e.tf; b.pDl += e.dl
    b
  }

  def merge(a: PostingBuf, b: PostingBuf): PostingBuf = {
    a.seal(); b.seal()
    if (a.term == null) { a.term = b.term; a.shard = b.shard }
    a.runs = b.runs ::: a.runs
    a
  }

  def finish(buf: PostingBuf): PostingList = {
    buf.seal()
    val runs = buf.runs.toArray
    val total = runs.map(_.docIds.length).sum
    val docIds = new Array[Long](total)
    val tfs = new Array[Long](total)
    val dls = new Array[Long](total)
    // k-way merge of sorted, docId-disjoint runs
    val pos = new Array[Int](runs.length)
    implicit val ord: Ordering[(Long, Int)] = Ordering.by[(Long, Int), Long](_._1).reverse
    val pq = new scala.collection.mutable.PriorityQueue[(Long, Int)]()
    runs.zipWithIndex.foreach { case (r, i) => if (r.docIds.nonEmpty) pq.enqueue((r.docIds(0), i)) }
    var out = 0
    while (pq.nonEmpty) {
      val (d, i) = pq.dequeue()
      val p = pos(i)
      docIds(out) = d; tfs(out) = runs(i).tfs(p); dls(out) = runs(i).dls(p)
      out += 1
      pos(i) = p + 1
      if (p + 1 < runs(i).docIds.length) pq.enqueue((runs(i).docIds(p + 1), i))
    }
    PostingFormat.encode(buf.term, buf.shard, docIds, tfs, dls, params, avgdl)
  }

  def bufferEncoder: Encoder[PostingBuf] = Encoders.kryo[PostingBuf]
  def outputEncoder: Encoder[PostingList] = Encoders.product[PostingList]
}
