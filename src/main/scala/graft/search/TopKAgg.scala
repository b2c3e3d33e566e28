package graft.search

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** One (docId, score) candidate row. */
case class ScoredDoc(docId: Long, score: Double)

/** Grouped top-k with MAP-SIDE partial heaps: each task's aggregation
  * buffer keeps at most 2k candidates per group (trimmed to the k best
  * by score DESC, docId ASC whenever it doubles), so the shuffle
  * carries ≤ tasks × groups × k rows instead of every scored row.
  *
  * Why not Window + row_number: Spark plans a per-group rank as a FULL
  * sort-shuffle of the input — at a blended-batch band of 10⁷–10⁸ rows
  * that shuffle IS the job (measured 43 s vs 3 s of WAND at sf0.01).
  * TakeOrderedAndProject does partial heaps but only for GLOBAL top-k;
  * this Aggregator is the per-group analog.
  */
final class TopKAgg(k: Int)
    extends Aggregator[ScoredDoc, ArrayBuffer[ScoredDoc], Array[ScoredDoc]] {

  private def better(a: ScoredDoc, b: ScoredDoc): Boolean =
    a.score > b.score || (a.score == b.score && a.docId < b.docId)

  private def trim(b: ArrayBuffer[ScoredDoc]): ArrayBuffer[ScoredDoc] =
    if (b.length <= 2 * k) b
    else {
      val kept = b.sortWith(better).take(k)
      b.clear()
      b ++= kept
    }

  def zero: ArrayBuffer[ScoredDoc] = new ArrayBuffer[ScoredDoc](k)
  def reduce(b: ArrayBuffer[ScoredDoc], a: ScoredDoc): ArrayBuffer[ScoredDoc] =
    trim(b += a)
  def merge(a: ArrayBuffer[ScoredDoc], b: ArrayBuffer[ScoredDoc]): ArrayBuffer[ScoredDoc] =
    trim(a ++= b)
  def finish(b: ArrayBuffer[ScoredDoc]): Array[ScoredDoc] =
    b.sortWith(better).take(k).toArray

  def bufferEncoder: Encoder[ArrayBuffer[ScoredDoc]] = Encoders.kryo[ArrayBuffer[ScoredDoc]]
  def outputEncoder: Encoder[Array[ScoredDoc]] = Encoders.kryo[Array[ScoredDoc]]
}
