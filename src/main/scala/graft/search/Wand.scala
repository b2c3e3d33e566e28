package graft.search

import graft.index.{PostingCursor, PostingList}

/** Block-max WAND top-k over one shard's posting lists.
  *
  * Safe-pruning analog of the reference's two-stage candidate pruning
  * (cheap bound first, expensive score second —
  * /root/reference/src/energymaps.rs:738-767) applied to BM25: per-list
  * global upper bounds drive pivot selection (WAND), per-block upper
  * bounds drive shallow advances (BMW), and the result is provably the
  * same top-k as brute-force scoring.
  *
  * Tie-break contract (matches the reference's stable sort,
  * /root/reference/src/core.rs:785): order by score DESC, docId ASC.
  * Pruning with `ubSum <= θ` is safe for ties because docIds are
  * processed in increasing order — an equal-scored later doc loses the
  * tie-break against every doc already in the heap.
  */
object Wand {

  final case class Hit(docId: Long, score: Double)

  /** Cursor contract for block-max WAND (implemented by the
    * decode-on-the-fly PostingCursor and the batch-mode DecodedCursor).
    */
  trait Cursor {
    var ord: Int
    def exhausted: Boolean
    def docId: Long
    def score: Double
    def maxScore: Double
    def blockMaxScore: Double
    def blockLastDocId: Long
    def next(): Unit
    def advanceTo(target: Long): Unit
    /** Cross-block shallow-advance boundary (BMW): last docId of the
      * maximal run of consecutive blocks, starting at the current one,
      * whose blockMaxScore stays < limit — scanned over block METADATA
      * only, so the skipped blocks are never decoded. Callers must have
      * already established that the current block is prunable. Default:
      * no extension beyond the current block.
      */
    def boundaryWithMaxBelow(limit: Double): Long = blockLastDocId
  }

  /** Worst-first ordering for the k-heap: smaller score is worse; on equal
    * score, larger docId is worse.
    */
  private val worstFirst: Ordering[Hit] = (a: Hit, b: Hit) => {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) -c else java.lang.Long.compare(a.docId, b.docId)
  }

  def topK(cursors0: Seq[Cursor], k: Int): Array[Hit] = {
    val heap = new scala.collection.mutable.PriorityQueue[Hit]()(worstFirst)
    cursors0.zipWithIndex.foreach { case (c, i) => c.ord = i }
    val nOrd = cursors0.size
    var cursors = cursors0.filterNot(_.exhausted).toArray

    def theta: Double = if (heap.size < k) Double.NegativeInfinity else heap.head.score

    def offer(h: Hit): Unit = {
      if (heap.size < k) heap.enqueue(h)
      else {
        val w = heap.head
        if (h.score > w.score || (h.score == w.score && h.docId < w.docId)) {
          heap.dequeue(); heap.enqueue(h)
        }
      }
    }

    while (cursors.nonEmpty) {
      java.util.Arrays.sort(cursors, Ordering.by((c: Cursor) => c.docId))
      // pivot: smallest prefix whose Σ maxScore can beat θ
      var acc = 0.0
      var p = 0
      var found = -1
      while (p < cursors.length && found < 0) {
        acc += cursors(p).maxScore
        if (heap.size < k || acc > theta) found = p
        p += 1
      }
      if (found < 0) return drain(heap) // no doc can beat θ anymore
      val pivotDoc = cursors(found).docId
      // extend the prefix over every cursor already at pivotDoc, so the
      // block-max sum below upper-bounds pivotDoc's true score
      while (found + 1 < cursors.length && cursors(found + 1).docId == pivotDoc) found += 1

      if (cursors(0).docId == pivotDoc) {
        // block-max refinement: Σ per-block UBs at pivotDoc
        var bmSum = 0.0
        var i = 0
        while (i <= found) { cursors(i).advanceTo(pivotDoc); if (!cursors(i).exhausted && cursors(i).docId <= cursors(i).blockLastDocId) bmSum += cursors(i).blockMaxScore; i += 1 }
        // after advanceTo(pivotDoc), cursor is at >= pivotDoc; only lists
        // actually containing pivotDoc contribute
        if (heap.size == k && bmSum <= theta) {
          // shallow advance: skip to just past the nearest block boundary
          // among the pivot prefix — but never past the first non-prefix
          // cursor's docId, whose lists could still score the skipped docs
          var boundary = Long.MaxValue
          i = 0
          while (i <= found) {
            val c = cursors(i)
            if (!c.exhausted && c.docId == pivotDoc && c.blockLastDocId < boundary)
              boundary = c.blockLastDocId
            i += 1
          }
          // single-cursor prefix (the hot single-term case): extend across
          // ALL consecutive blocks whose max stays < θ — metadata-only
          // scan, the skipped blocks are never decoded
          if (found == 0 && !cursors(0).exhausted && cursors(0).docId == pivotDoc)
            boundary = math.max(boundary, cursors(0).boundaryWithMaxBelow(theta))
          if (found + 1 < cursors.length)
            boundary = math.min(boundary, cursors(found + 1).docId - 1)
          if (boundary == Long.MaxValue || boundary < pivotDoc) boundary = pivotDoc
          i = 0
          while (i <= found) {
            val c = cursors(i)
            if (!c.exhausted && c.docId <= boundary) c.advanceTo(boundary + 1)
            i += 1
          }
        } else {
          // full evaluation of pivotDoc: gather contributions, then sum
          // in cursor creation order (term order) so the score is
          // bit-deterministic independent of cursor sort history
          val contrib = new Array[Double](nOrd)
          val used = new Array[Boolean](nOrd)
          i = 0
          while (i < cursors.length && !cursors(i).exhausted && {
            cursors(i).advanceTo(pivotDoc)
            !cursors(i).exhausted && cursors(i).docId == pivotDoc
          }) {
            contrib(cursors(i).ord) = cursors(i).score
            used(cursors(i).ord) = true
            cursors(i).next()
            i += 1
          }
          var s = 0.0
          var j = 0
          while (j < contrib.length) { if (used(j)) s += contrib(j); j += 1 }
          offer(Hit(pivotDoc, s))
        }
      } else {
        // advance all pre-pivot cursors to pivotDoc
        var i = 0
        while (i < found) { cursors(i).advanceTo(pivotDoc); i += 1 }
      }
      cursors = cursors.filterNot(_.exhausted)
    }
    drain(heap)
  }

  private def drain(heap: scala.collection.mutable.PriorityQueue[Hit]): Array[Hit] =
    heap.dequeueAll.reverse.toArray // worst-first dequeue → reverse = best-first

  /** Candidate generation for additively-blended re-ranking: returns
    * EXACTLY the set { d : score(d) ≥ θ − slack } where θ is the k-th
    * best raw score over these cursors, with each doc's exact raw score —
    * pruned WAND-style with every threshold comparison deflated by
    * `slack`.
    *
    * Why this is the right primitive for a blend f(d) = g(score(d)) +
    * extra(d) with g monotone non-decreasing and 0 ≤ extra(d) ≤ E
    * (λ-proximity, freshness, any bounded secondary signal): the k
    * best-by-raw-score docs each have f ≥ g(θ), while any doc with
    * score < θ − slack (slack = E in raw-score units) has
    * f ≤ g(score) + E < g(θ) — so the true blended top-k is always
    * inside the returned set. Pruning safety: a doc skipped at time t
    * had upperBound + slack < θ_t ≤ θ_final, hence score < θ_final −
    * slack; contrapositive: every doc with score ≥ θ_final − slack is
    * fully evaluated and returned.
    *
    * slack = 0 degenerates to exact WAND top-k semantics (the returned
    * set is the docs scoring ≥ the k-th best). Scores are summed in
    * cursor creation order — bit-identical to [[topK]]'s.
    */
  def candidatesWithSlack(cursors0: Seq[Cursor], k: Int, slack: Double): Array[Hit] = {
    require(slack >= 0.0 && !slack.isNaN, s"bad slack $slack")
    val heap = new scala.collection.mutable.PriorityQueue[Hit]()(worstFirst)
    val buf = new scala.collection.mutable.ArrayBuffer[Hit]()
    cursors0.zipWithIndex.foreach { case (c, i) => c.ord = i }
    val nOrd = cursors0.size
    var cursors = cursors0.filterNot(_.exhausted).toArray

    def theta: Double = if (heap.size < k) Double.NegativeInfinity else heap.head.score

    def offer(h: Hit): Unit = {
      buf += h
      if (heap.size < k) heap.enqueue(h)
      else {
        val w = heap.head
        if (h.score > w.score || (h.score == w.score && h.docId < w.docId)) {
          heap.dequeue(); heap.enqueue(h)
        }
      }
    }

    // strict-< pruning ALWAYS: an equal-bound doc ties the band edge
    // θ − slack and belongs to the returned set by definition (and for
    // slack > 0 a tie could even win the blended docId tie-break), so it
    // must be evaluated — the returned set is exactly {score ≥ θ − slack}
    @inline def prunable(ubSum: Double): Boolean = ubSum + slack < theta

    while (cursors.nonEmpty) {
      java.util.Arrays.sort(cursors, Ordering.by((c: Cursor) => c.docId))
      var acc = 0.0
      var p = 0
      var found = -1
      while (p < cursors.length && found < 0) {
        acc += cursors(p).maxScore
        if (heap.size < k || !prunable(acc)) found = p
        p += 1
      }
      if (found < 0) { // nothing left can reach θ − slack
        val th = theta
        return buf.filter(h => h.score >= th - slack).toArray
      }
      val pivotDoc = cursors(found).docId
      while (found + 1 < cursors.length && cursors(found + 1).docId == pivotDoc) found += 1

      if (cursors(0).docId == pivotDoc) {
        var bmSum = 0.0
        var i = 0
        while (i <= found) { cursors(i).advanceTo(pivotDoc); if (!cursors(i).exhausted && cursors(i).docId <= cursors(i).blockLastDocId) bmSum += cursors(i).blockMaxScore; i += 1 }
        if (heap.size == k && prunable(bmSum)) {
          var boundary = Long.MaxValue
          i = 0
          while (i <= found) {
            val c = cursors(i)
            if (!c.exhausted && c.docId == pivotDoc && c.blockLastDocId < boundary)
              boundary = c.blockLastDocId
            i += 1
          }
          // single-cursor prefix: cross-block BMW skip while the block
          // max can't reach the deflated threshold θ − slack
          if (found == 0 && !cursors(0).exhausted && cursors(0).docId == pivotDoc)
            boundary = math.max(boundary, cursors(0).boundaryWithMaxBelow(theta - slack))
          if (found + 1 < cursors.length)
            boundary = math.min(boundary, cursors(found + 1).docId - 1)
          if (boundary == Long.MaxValue || boundary < pivotDoc) boundary = pivotDoc
          i = 0
          while (i <= found) {
            val c = cursors(i)
            if (!c.exhausted && c.docId <= boundary) c.advanceTo(boundary + 1)
            i += 1
          }
        } else {
          val contrib = new Array[Double](nOrd)
          val used = new Array[Boolean](nOrd)
          i = 0
          while (i < cursors.length && !cursors(i).exhausted && {
            cursors(i).advanceTo(pivotDoc)
            !cursors(i).exhausted && cursors(i).docId == pivotDoc
          }) {
            contrib(cursors(i).ord) = cursors(i).score
            used(cursors(i).ord) = true
            cursors(i).next()
            i += 1
          }
          var s = 0.0
          var j = 0
          while (j < contrib.length) { if (used(j)) s += contrib(j); j += 1 }
          offer(Hit(pivotDoc, s))
        }
      } else {
        var i = 0
        while (i < found) { cursors(i).advanceTo(pivotDoc); i += 1 }
      }
      cursors = cursors.filterNot(_.exhausted)
    }
    val th = theta
    buf.filter(h => h.score >= th - slack).toArray
  }

  /** Convenience: build cursors then run. `idfByTerm` must contain every
    * list's term.
    */
  def topKLists(lists: Seq[PostingList], idfByTerm: Map[String, Double],
      params: BM25.Params, avgdl: Double, k: Int): Array[Hit] = {
    val cursors = lists
      .sortBy(_.term) // deterministic evaluation order
      .map(pl => new PostingCursor(pl, params, avgdl, idfByTerm(pl.term)))
    topK(cursors, k)
  }
}
