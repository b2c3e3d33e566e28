package graft.util

/** Deterministic, partition-order-independent hashing / PRNG utilities.
  *
  * Everything in the engine that needs randomness derives it from a
  * 64-bit seed through SplitMix64 (public-domain algorithm, Steele et
  * al. 2014), so any row can be regenerated as a pure function of its
  * key — the property the reference gets from per-call seeds
  * (cf. /root/reference/src/reduction.rs:168-202 where a JL projection
  * is stored as an 8-byte seed and regenerated on demand).
  */
object Hashing {

  /** SplitMix64 mixing function: one 64-bit state step. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4a2bdf682faadL
    z ^ (z >>> 31)
  }

  /** Stable 64-bit hash of a string (FNV-1a 64 then mixed). */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Combine parts into one stable seed. */
  def hash64(seed: Long, parts: String*): Long =
    parts.foldLeft(mix64(seed))((acc, p) => mix64(acc ^ hashString(p)))

  /** Cheap deterministic PRNG (SplitMix64 stream). NOT for crypto. */
  final class Rng(seed: Long) {
    private var state: Long = seed
    def nextLong(): Long = { state += 0x9e3779b97f4a7c15L; mix64(state - 0x9e3779b97f4a7c15L) }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16 // 2^-53
    def nextInt(bound: Int): Int = {
      require(bound > 0)
      ((nextLong() >>> 1) % bound).toInt
    }
    /** Zipf-ish rank in [0, n): p(r) ~ 1/(r+1) via inverse-CDF of log. */
    def nextZipf(n: Int): Int = {
      val u = nextDouble()
      val r = (math.exp(u * math.log(n.toDouble)) - 1.0).toInt
      math.min(r, n - 1)
    }
    /** Deterministic Gaussian via Box-Muller (both values derived, one used). */
    def nextGaussian(): Double = {
      var u1 = nextDouble()
      if (u1 < 1e-300) u1 = 1e-300
      val u2 = nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }

  def hexString(h: Long, len: Int): String = {
    val sb = new StringBuilder
    var x = h
    while (sb.length < len) {
      sb.append(java.lang.Long.toHexString(mix64(x) & 0xfffffffffffffffL))
      x += 1
    }
    sb.substring(0, len)
  }

  def sha256Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
  }
}
