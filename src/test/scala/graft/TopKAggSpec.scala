package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.{ScoredDoc, TopKAgg}

/** Focused spec for the primitive-array TopKAgg buffer (v6 rewrite):
  * exact per-group top-k under arbitrary reduce/merge splits, and the
  * bounded-capacity invariant that keeps the shuffle rows small.
  */
class TopKAggSpec extends AnyFunSuite {

  private def bruteTopK(xs: Seq[ScoredDoc], k: Int): Seq[(Long, Double)] =
    xs.sortWith((a, b) => a.score > b.score || (a.score == b.score && a.docId < b.docId))
      .take(k).map(h => (h.docId, h.score))

  test("reduce/merge/finish equals brute-force top-k under random splits") {
    val rng = new java.util.Random(7)
    for (trial <- 0 until 20) {
      val k = 1 + rng.nextInt(12)
      val agg = new TopKAgg(k)
      val n = 1 + rng.nextInt(500)
      // duplicate scores on purpose: the docId ASC tie-break must hold
      val xs = (0 until n).map(i => ScoredDoc(rng.nextInt(300).toLong, (rng.nextInt(40) / 7.0)))
      // random partitioning into 1..6 buffers, then a random merge order
      val parts = xs.groupBy(_ => rng.nextInt(1 + rng.nextInt(6)))
        .values.toSeq
      val bufs = parts.map(p => p.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      val merged = bufs.reduce((a, b) => agg.merge(a, b))
      val got = agg.finish(merged).map(h => (h.docId, h.score)).toSeq
      assert(got == bruteTopK(xs, k), s"trial $trial k=$k n=$n")
    }
  }

  test("buffer capacity stays bounded at 2k under long streams") {
    val k = 10
    val agg = new TopKAgg(k)
    var b = agg.zero
    val rng = new java.util.Random(42)
    for (i <- 0 until 100000) b = agg.reduce(b, ScoredDoc(i.toLong, rng.nextDouble()))
    assert(b.ids.length <= 2 * k, s"capacity ${b.ids.length} exceeded 2k")
    assert(b.n <= 2 * k)
    val other = (0 until 50000).foldLeft(agg.zero)((x, i) =>
      agg.reduce(x, ScoredDoc(i.toLong, rng.nextDouble())))
    b = agg.merge(b, other)
    assert(b.ids.length <= 2 * k, s"post-merge capacity ${b.ids.length}")
  }
}
