package graft.index

/** Growable primitive posting arrays for one (term, shard) under the v6
  * shard-grouped posting merge ([[IndexBuilder.buildPostingsFrom]]):
  * docIds arrive ascending (the input is sorted by (shard, doc_id)), so
  * append is the whole merge. Primitive Array[Long] growth — no boxing,
  * no Kryo, no priority queue (the former PostingAgg Aggregator shuffled
  * Kryo-serialized run buffers per (term, shard) and k-way-merged them in
  * finish; the sorted shard-grouped input makes all of that vanish).
  */
final class ShardPostings {
  private var id = new Array[Long](8)
  private var tf = new Array[Long](8)
  private var dl = new Array[Long](8)
  private var n = 0

  def add(docId: Long, tfv: Long, dlv: Long): Unit = {
    if (n == id.length) {
      val cap = n << 1
      id = java.util.Arrays.copyOf(id, cap)
      tf = java.util.Arrays.copyOf(tf, cap)
      dl = java.util.Arrays.copyOf(dl, cap)
    }
    id(n) = docId; tf(n) = tfv; dl(n) = dlv
    n += 1
  }

  def ids(): Array[Long] = java.util.Arrays.copyOf(id, n)
  def tfs(): Array[Long] = java.util.Arrays.copyOf(tf, n)
  def dls(): Array[Long] = java.util.Arrays.copyOf(dl, n)
}
