package graft.search

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (docId, score) candidate row. */
case class ScoredDoc(docId: Long, score: Double)

/** Primitive-array top-k buffer: parallel Array[Long]/Array[Double]
  * instead of an ArrayBuffer[ScoredDoc] — the buffer crosses the
  * shuffle through a PRODUCT encoder (compact UnsafeArrayData of
  * primitives) instead of Kryo-serializing a boxed element per hit,
  * which was the measured per-row cost of the batch rank shuffle
  * (~10⁶ buffers × ~10 boxed hits per bench batch).
  */
case class TopKBuf(var ids: Array[Long], var scores: Array[Double], var n: Int)

/** Grouped top-k with MAP-SIDE partial heaps: each task's aggregation
  * buffer keeps at most 2k candidates per group (trimmed to the k best
  * by score DESC, docId ASC whenever it fills), so the shuffle
  * carries ≤ tasks × groups × k rows instead of every scored row.
  *
  * Why not Window + row_number: Spark plans a per-group rank as a FULL
  * sort-shuffle of the input — at a blended-batch band of 10⁷–10⁸ rows
  * that shuffle IS the job (measured 43 s vs 3 s of WAND at sf0.01).
  * TakeOrderedAndProject does partial heaps but only for GLOBAL top-k;
  * this Aggregator is the per-group analog.
  */
final class TopKAgg(k: Int)
    extends Aggregator[ScoredDoc, TopKBuf, Array[ScoredDoc]] {

  private def cap = 2 * k

  /** Keep the k best (score DESC, docId ASC) of buf[0, n) in place;
    * returns the new length. Exactness: every dropped hit is worse than
    * k kept hits of the same buffer, so it can never enter the final
    * top-k. Bounded insertion over the ≤ 2k-element buffer — the former
    * boxed-Integer comparator sort allocated and boxed on every cap
    * overflow, ~10⁵ times per bench batch.
    */
  private def trim(b: TopKBuf): TopKBuf = {
    val n = b.n
    val m = math.min(k, n)
    val ids = new Array[Long](cap)
    val scores = new Array[Double](cap)
    // insertion selection of the m best (score DESC, docId ASC): ≤ 2k
    // elements, primitive comparisons only; identical order to a full
    // sort-then-take (the key is a total order — docIds distinct)
    var kept = 0
    var i = 0
    while (i < n) {
      val s = b.scores(i); val d = b.ids(i)
      if (kept < m || s > scores(kept - 1) ||
        (s == scores(kept - 1) && d < ids(kept - 1))) {
        var pos = if (kept < m) kept else m - 1
        while (pos > 0 && (s > scores(pos - 1) ||
          (s == scores(pos - 1) && d < ids(pos - 1)))) {
          scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1)
          pos -= 1
        }
        scores(pos) = s; ids(pos) = d
        if (kept < m) kept += 1
      }
      i += 1
    }
    b.ids = ids; b.scores = scores; b.n = kept
    b
  }

  private def append(b: TopKBuf, id: Long, score: Double): TopKBuf = {
    if (b.n == b.ids.length) {
      if (b.ids.length < cap) { // grow toward the 2k cap
        val grow = math.min(math.max(b.ids.length * 2, 8), cap)
        b.ids = java.util.Arrays.copyOf(b.ids, grow)
        b.scores = java.util.Arrays.copyOf(b.scores, grow)
      } else trim(b) // at cap: keep the k best (n becomes k < cap)
    }
    b.ids(b.n) = id; b.scores(b.n) = score; b.n += 1
    b
  }

  def zero: TopKBuf = new TopKBuf(new Array[Long](8), new Array[Double](8), 0)

  def reduce(b: TopKBuf, a: ScoredDoc): TopKBuf = append(b, a.docId, a.score)

  def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.n) { append(a, b.ids(i), b.scores(i)); i += 1 }
    a
  }

  def finish(b: TopKBuf): Array[ScoredDoc] = {
    trim(b)
    val out = new Array[ScoredDoc](b.n)
    var i = 0
    while (i < b.n) { out(i) = ScoredDoc(b.ids(i), b.scores(i)); i += 1 }
    out
  }

  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[Array[ScoredDoc]] = Encoders.kryo[Array[ScoredDoc]]
}
