package graft.lambda

import graft.util.Hashing

/** Inline samplers (SURVEY.md §2.3 C10/C11) — deterministic versions of
  * the reference's samplers, whose `StdRng::from_os_rng()` makes them
  * explicitly nondeterministic (/root/reference/src/sampling.rs:123,184);
  * here the keep-decision derives from a seeded per-row hash so runs are
  * reproducible (the engine-wide determinism policy, SURVEY.md §7.4
  * item 6). The rate formulas are the reference's verbatim.
  */
object Samplers {

  @inline private def unit(seed: Long, id: Long): Double =
    (Hashing.hash64(seed, "sample", id.toString) >>> 11) * 1.1102230246251565e-16

  /** SimpleRandomSampler: Bernoulli(rate) keep (sampling.rs:115-159). */
  final case class Simple(rate: Double, seed: Long) {
    def shouldKeep(rowId: Long): Boolean = unit(seed, rowId) < rate
  }

  /** DensityAdaptiveSampler (sampling.rs:175-225):
    * rate' = clamp(base · (1 − saturation·0.1) · (1 + max(ln(d²+0.1),0)·0.3),
    *               0.01, 1.0)
    * — keeps more rows in sparse regions (large nearest-centroid d²) and
    * fewer as the centroid budget saturates.
    */
  final case class DensityAdaptive(baseRate: Double, seed: Long) {
    def adaptiveRate(nearestDistSq: Double, centroidsCount: Int, maxCentroids: Int): Double = {
      val saturation = centroidsCount.toDouble / maxCentroids
      val distFactor = math.max(math.log(nearestDistSq + 0.1), 0.0)
      val r = baseRate * (1.0 - saturation * 0.1) * (1.0 + distFactor * 0.3)
      math.min(1.0, math.max(0.01, r))
    }
    def shouldKeep(rowId: Long, nearestDistSq: Double, centroidsCount: Int,
        maxCentroids: Int): Boolean =
      unit(seed, rowId) < adaptiveRate(nearestDistSq, centroidsCount, maxCentroids)
  }
}
