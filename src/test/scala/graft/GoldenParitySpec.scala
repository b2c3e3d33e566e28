package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lambda.{DenseLambda, GraphBuilder, TauMode}
import java.nio.file.{Files, Paths}

/** Golden parity against the reference's own example fixture: the 64×24
  * "protein" vectors of /root/reference/examples/01_compare_cosine.rs,
  * whose documented golden is "Top k-3 results ids should be 3, 6, 0"
  * (examples/01:1, transcript in paper.md:123-143) for the query
  * `item[3] × 1.02` (the pick_query perturbation).
  *
  * The fixture is parsed from the read-only reference checkout at test
  * time (no data copied into this repo); the suite is skipped if the
  * reference isn't mounted.
  */
class GoldenParitySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  val fixturePath = "/root/reference/examples/01_compare_cosine.rs"

  def parseFixture(): (Array[String], Array[Array[Double]]) = {
    val lines = Files.readAllLines(Paths.get(fixturePath)).toArray(Array.empty[String])
    val rows = lines.iterator
      .map(_.trim)
      .filter(l => l.matches("^P\\d+;.*"))
      .map { l =>
        val Array(id, vals) = l.split(";", 2)
        (id.trim, vals.trim.split(",").map(_.trim.toDouble))
      }
      .toArray
    (rows.map(_._1), rows.map(_._2))
  }

  test("reference protein fixture: golden top-3 = (3, 6, 0) and α=1 ≡ cosine") {
    assume(Files.exists(Paths.get(fixturePath)), "reference checkout not mounted")
    import spark.implicits._
    val (ids, vecs) = parseFixture()
    assert(vecs.length == 64 && vecs.forall(_.length == 24), s"fixture shape ${vecs.length}")
    val items = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDS()
    // query = item 3 scaled by 1.02 (examples/01:86-90)
    val q = vecs(3).map(_ * 1.02)
    // published golden: cosine top-3 = indices 3, 6, 0
    val cosTop = DenseLambda.cosineTopK(items, q, 3).collect().map(_.getLong(0)).toSeq
    assert(cosTop == Seq(3L, 6L, 0L), s"golden (3,6,0) vs $cosTop")
    // α=1 λ-aware search must reproduce the cosine ranking exactly — the
    // reference's own rank-identity oracle (benches/index_compute_bench.rs:148-178)
    val built = DenseLambda.build(spark, items,
      DenseLambda.Config(maxClusters = 8, sampleSize = 64,
        graph = GraphBuilder.GraphParams(eps = 1.0, topk = 6)))
    val lq = DenseLambda.queryLambda(q, built)
    for (k <- Seq(3, 8)) {
      val a = DenseLambda.searchLambdaAware(items, built, q, lq, k, alpha = 1.0)
        .collect().map(_.getLong(0)).toSeq
      val b = DenseLambda.cosineTopK(items, q, k).collect().map(_.getLong(0)).toSeq
      assert(a == b, s"alpha=1 k=$k: $a vs $b")
    }
    // λ-aware (α=0.9) must still put the perturbed source item first
    // (cosine(q, item3) = 1 under scaling; λ is scale-sensitive only via τ)
    val top09 = DenseLambda.searchLambdaAware(items, built, q, lq, 3, alpha = 0.9)
      .collect().map(_.getLong(0)).toSeq
    assert(top09.head == 3L, s"alpha=0.9 top-1 must be item 3: $top09")
    // λ values bounded & discriminating on the fixture
    val l = built.lambdas.collect().map(_.getDouble(1))
    assert(l.forall(v => v >= 0.0 && v <= 1.0))
    assert(l.distinct.length > 5)

    // The paper's second golden (paper.md:123-143 transcript):
    // Jaccard(baseline cosine top-3, λ-aware α=0.9 take(k+1)=top-4) =
    // 0.750 — the example computes the λ-aware side over the FIRST k+1
    // of a k+5 search (examples/01_compare_cosine.rs:166-180), i.e. the
    // top-4 must contain all three cosine winners plus exactly one
    // λ-surfaced outsider (the paper's "index 30 being the outlier not
    // spotted by cosine similarity").
    val lamTop4 = DenseLambda.searchLambdaAware(items, built, q, lq, 8, alpha = 0.9)
      .collect().map(_.getLong(0)).take(4).toSet
    val baseSet = cosTop.toSet
    val jaccard = baseSet.intersect(lamTop4).size.toDouble /
      baseSet.union(lamTop4).size.toDouble
    assert(jaccard == 0.750, s"golden Jaccard 0.750 vs $jaccard " +
      s"(cosine $baseSet, lambda-aware top-4 $lamTop4)")
  }
}
