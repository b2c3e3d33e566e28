package graft.index

import scala.collection.mutable.ArrayBuffer

/** Posting-list compression primitives: LEB128 varints and
  * frame-of-reference (FOR) bit-packing over delta-encoded docIds.
  *
  * The north rule mandates "delta-encoded, varint/FOR-compressed" lists;
  * the reference itself has no compressed postings (it is a dense vector
  * library), so the format here follows the standard IR literature
  * (block-wise FOR with a per-block bit width, varint fallbacks).
  *
  * All methods are pure and allocation-conscious; they run inside
  * Aggregator.finish on executors.
  */
object Codec {

  // ---- LEB128 varint ----------------------------------------------------

  def writeVarLong(v0: Long, out: ArrayBuffer[Byte]): Unit = {
    var v = v0
    require(v >= 0, s"varint encodes non-negative values, got $v")
    while ((v & ~0x7fL) != 0L) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += v.toByte
  }

  /** Returns (value, nextOffset). */
  def readVarLong(bytes: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = off
    while (true) {
      val b = bytes(i)
      v |= (b & 0x7fL) << shift
      i += 1
      if ((b & 0x80) == 0) return (v, i)
      shift += 7
    }
    throw new IllegalStateException("unreachable")
  }

  def encodeVarInts(values: Array[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](values.length * 2)
    var i = 0
    while (i < values.length) { writeVarLong(values(i), out); i += 1 }
    out.toArray
  }

  def decodeVarInts(bytes: Array[Byte], n: Int, off: Int = 0): (Array[Long], Int) = {
    val out = new Array[Long](n)
    var o = off
    var i = 0
    while (i < n) {
      val (v, next) = readVarLong(bytes, o)
      out(i) = v; o = next; i += 1
    }
    (out, o)
  }

  // ---- delta coding -----------------------------------------------------

  /** Strictly-increasing ids -> first id as-is, then gaps-1 could bias;
    * we keep plain gaps (>=1) so a gap of 0 flags corruption.
    */
  def deltaEncode(sorted: Array[Long]): Array[Long] = {
    val out = new Array[Long](sorted.length)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val d = sorted(i) - prev
      require(i == 0 || d > 0, s"docIds must be strictly increasing at $i")
      out(i) = d
      prev = sorted(i)
      i += 1
    }
    out
  }

  def deltaDecode(deltas: Array[Long]): Array[Long] = {
    val out = new Array[Long](deltas.length)
    var acc = 0L
    var i = 0
    while (i < deltas.length) { acc += deltas(i); out(i) = acc; i += 1 }
    out
  }

  // ---- FOR bit-packing --------------------------------------------------

  @inline def bitsNeeded(v: Long): Int =
    if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Pack `values` (non-negative) at fixed `width` bits each, LSB-first
    * into a byte array. width == 0 → empty payload (all zeros).
    */
  def packBits(values: Array[Long], width: Int): Array[Byte] = {
    if (width == 0) return Array.emptyByteArray
    val nBits = values.length * width
    val out = new Array[Byte]((nBits + 7) / 8)
    var bitPos = 0
    var i = 0
    while (i < values.length) {
      val v = values(i)
      var b = 0
      while (b < width) {
        if (((v >>> b) & 1L) != 0L) out(bitPos >> 3) = (out(bitPos >> 3) | (1 << (bitPos & 7))).toByte
        bitPos += 1; b += 1
      }
      i += 1
    }
    out
  }

  def unpackBits(bytes: Array[Byte], n: Int, width: Int): Array[Long] = {
    val out = new Array[Long](n)
    if (width == 0) return out
    var bitPos = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var b = 0
      while (b < width) {
        if ((bytes(bitPos >> 3) & (1 << (bitPos & 7))) != 0) v |= 1L << b
        bitPos += 1; b += 1
      }
      out(i) = v; i += 1
    }
    out
  }

  /** FOR-encode one block: [width: 1 byte][packed payload]. */
  def forEncodeBlock(values: Array[Long], out: ArrayBuffer[Byte]): Unit = {
    var maxV = 0L
    var i = 0
    while (i < values.length) { if (values(i) > maxV) maxV = values(i); i += 1 }
    val width = bitsNeeded(maxV)
    out += width.toByte
    out ++= packBits(values, width)
  }

  /** Returns (values, nextOffset). */
  def forDecodeBlock(bytes: Array[Byte], off: Int, n: Int): (Array[Long], Int) = {
    val width = bytes(off) & 0xff
    val payloadBytes = (n * width + 7) / 8
    val payload = java.util.Arrays.copyOfRange(bytes, off + 1, off + 1 + payloadBytes)
    (unpackBits(payload, n, width), off + 1 + payloadBytes)
  }
}
