package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.Codec
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Property-style codec tests with a seeded generator (scalacheck-style
  * coverage without the scalatestplus bridge).
  */
class CodecSpec extends AnyFunSuite {
  val rnd = new Random(42)

  test("varint round-trip (100 random vectors incl. extremes)") {
    for (_ <- 1 to 100) {
      val n = rnd.nextInt(300)
      val arr = Array.fill(n)(rnd.nextLong().abs) ++ Array(0L, 1L, 127L, 128L, Long.MaxValue)
      val bytes = Codec.encodeVarInts(arr)
      val (back, off) = Codec.decodeVarInts(bytes, arr.length)
      assert(back.toSeq == arr.toSeq)
      assert(off == bytes.length)
    }
  }

  test("varint rejects negatives") {
    intercept[IllegalArgumentException] {
      Codec.writeVarLong(-1L, new ArrayBuffer[Byte]())
    }
  }

  test("delta encode/decode round-trip on strictly increasing ids") {
    for (_ <- 1 to 100) {
      val n = 1 + rnd.nextInt(500)
      val ids = Array.fill(n)(1L + rnd.nextInt(100000).toLong).scanLeft(0L)(_ + _).tail
      val deltas = Codec.deltaEncode(ids)
      assert(Codec.deltaDecode(deltas).toSeq == ids.toSeq)
      assert(deltas.drop(1).forall(_ > 0))
    }
  }

  test("delta encode rejects non-increasing input") {
    intercept[IllegalArgumentException] { Codec.deltaEncode(Array(5L, 5L)) }
    intercept[IllegalArgumentException] { Codec.deltaEncode(Array(5L, 3L)) }
  }

  test("FOR bit-packing round-trip at every width 0..63") {
    for (width <- 0 to 63; _ <- 1 to 3) {
      val n = rnd.nextInt(200)
      val max = if (width == 0) 0L else (1L << width) - 1
      val xs = Array.fill(n)(if (max == 0) 0L else (rnd.nextLong().abs % (max + 1)))
      val packed = Codec.packBits(xs, width)
      assert(Codec.unpackBits(packed, xs.length, width).toSeq == xs.toSeq, s"width=$width")
    }
  }

  test("FOR block picks minimal width and round-trips") {
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(200)
      val arr = Array.fill(n)(rnd.nextLong().abs % (1L << 40))
      val out = new ArrayBuffer[Byte]()
      Codec.forEncodeBlock(arr, out)
      val bytes = out.toArray
      assert((bytes(0) & 0xff) == Codec.bitsNeeded(arr.max))
      val (back, next) = Codec.forDecodeBlock(bytes, 0, arr.length)
      assert(back.toSeq == arr.toSeq)
      assert(next == bytes.length)
    }
  }

  test("concatenated FOR blocks decode sequentially") {
    val a = Array(3L, 1L, 7L)
    val b = Array(1000L, 2L)
    val out = new ArrayBuffer[Byte]()
    Codec.forEncodeBlock(a, out)
    Codec.forEncodeBlock(b, out)
    val bytes = out.toArray
    val (backA, offA) = Codec.forDecodeBlock(bytes, 0, a.length)
    val (backB, offB) = Codec.forDecodeBlock(bytes, offA, b.length)
    assert(backA.toSeq == a.toSeq && backB.toSeq == b.toSeq && offB == bytes.length)
  }
}
