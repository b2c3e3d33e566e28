package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextStats}

/** Training-data pipeline operators: dedup family, text analysis, ANN,
  * multimodal plumbing.
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over a lazy dog"), // near dup
    (4L, "der hund ist nicht ein fuchs und das ist gut"), // german-ish
    (5L, "completely different content about spark engines"),
    (6L, "short text")).toDF("doc_id", "text")

  test("exactDedup keeps min id per hash with dup count") {
    val r = Dedup.exactDedup(docs, "text", "doc_id")
      .collect().map(x => (x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(r.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L)))
  }

  test("shingleArray produces word n-grams; short docs yield none") {
    val r = docs.filter($"doc_id" === 6L)
      .select(Dedup.shingleArray($"text", 3).as("sh")).collect()(0).getSeq[String](0)
    assert(r.isEmpty) // 2 tokens < 3
    val r2 = docs.filter($"doc_id" === 1L)
      .select(Dedup.shingleArray($"text", 3).as("sh")).collect()(0).getSeq[String](0)
    assert(r2.head == "the quick brown" && r2.last == "the lazy dog" && r2.length == 7)
  }

  test("jaccardPairs finds the exact dup at 1.0 and the near dup in between") {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("minhash LSH: exact dups collide in every band; unrelated docs do not") {
    val cand = Dedup.lshCandidates(Dedup.lshBuckets(
      Dedup.minhashRows(docs, "text", "doc_id", 3, 16), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("simhash64: 64-bit strings, identical docs identical, near dups close") {
    val sh = Dedup.simhash64(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(sh.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(sh(1L) == sh(2L))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(5L)),
      s"near-dup hamming ${ham(sh(1L), sh(3L))} !< unrelated ${ham(sh(1L), sh(5L))}")
  }

  test("simhash64 is one aggregate — no crossJoin/cartesian row expansion") {
    val plan = Dedup.simhash64(docs, "text", "doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"unexpected join in simhash plan:\n$plan")
  }

  test("nearDedupKeep: drops larger ids of verified dups, keeps everything else") {
    val kept = Dedup.nearDedupKeep(docs, "text", "doc_id", n = 3, numHashes = 16,
      rowsPerBand = 4, minJ = 0.5).collect().map(_.getLong(0)).toSet
    assert(!kept.contains(2L), "doc 2 is an exact dup of doc 1 and must be dropped")
    assert(kept.contains(1L), "the smaller id of the dup pair survives")
    assert(kept.contains(5L) && kept.contains(6L), "non-dups survive")
  }

  test("hammingBits column matches scala hamming") {
    val df = Seq(("10101", "10011")).toDF("a", "b")
    assert(df.select(Dedup.hammingBits($"a", $"b")).collect()(0).getInt(0) == 2)
  }

  test("embeddingNearDups on hand-built vectors") {
    val items = Seq(
      (1L, Array(1.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.01, 0.0)), // cos ~ 0.99995
      (3L, Array(0.0, 1.0, 0.0)), // orthogonal to 1
      (4L, Array(-1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val r = Dedup.embeddingNearDups(items, "vec_id", "embedding", 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((1L, 2L)))
  }

  test("langId: marker argmax with und fallback and tie determinism") {
    val r = TextStats.langId(docs, "text", "doc_id")
      .collect().map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r(1L) == "en")
    assert(r(4L) == "de")
    assert(r(6L) == "und")
  }

  test("tokenCounts hand-checked") {
    val r = TextStats.tokenCounts(docs, "text", "doc_id")
      .collect().map(x => (x.getLong(0), (x.getInt(1), x.getInt(2), x.getInt(3)))).toMap
    assert(r(6L) == ((2, 2, 9))) // "short text": 2 ws, 2 word, 9 non-space chars
    assert(r(1L)._1 == 9)
  }

  test("quality: bounded, zero for empty, higher for stopword-rich English") {
    val extra = docs.union(Seq((7L, ""), (8L, "..."), (9L, "x @@ ## !! y %%")).toDF("doc_id", "text"))
    val r = TextStats.qualityScore(extra, "text", "doc_id")
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r(7L) == 0.0 && r(8L) == 0.0)
    assert(r.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(r(1L) > r(9L), "clean English text scores above punctuation soup")
  }

  test("redactPii: emails/IPs/digit runs replaced, counts from original text") {
    val pii = Seq(
      (1L, "contact bob@example.com or alice@corp.io from 10.0.0.1 ref 12345678"),
      (2L, "no pii here, just words and 123 and 1.2 numbers"),
      (3L, "dial 5551234567 twice: 5551234567")).toDF("doc_id", "text")
    val r = TextStats.redactPii(pii, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getInt(3), x.getString(4)))).toMap
    assert(r(1L)._1 == 2 && r(1L)._2 == 1 && r(1L)._3 == 1)
    assert(r(1L)._4 == "contact <EMAIL> or <EMAIL> from <IP> ref <NUM>")
    assert(r(2L) == ((0, 0, 0, "no pii here, just words and 123 and 1.2 numbers")))
    assert(r(3L)._3 == 2 && r(3L)._4 == "dial <NUM> twice: <NUM>")
  }

  test("repetitionRatio: repeated 3-grams score high, unique text 0, short text 0") {
    val d = Seq(
      (1L, "a b c a b c a b c a b c"), // 12 toks → 10 grams, 3 distinct
      (2L, "one two three four five six seven"),
      (3L, "hi")).toDF("doc_id", "text")
    val r = TextStats.repetitionRatio(d, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.7) < 1e-6, s"got ${r(1L)}")
    assert(r(2L) == 0.0 && r(3L) == 0.0)
  }

  test("fingerprint: dup docs share fingerprint sets, deterministic") {
    def run() = TextStats.fingerprintSets(docs, "text", "doc_id")
      .collect().map(x => (x.getLong(0), x.getSeq[Long](1))).toMap
    val r = run()
    assert(r(1L) == r(2L)) // exact dups → identical sets
    assert(r(1L) != r(5L))
    assert(r == run())
  }

  test("fingerprint (exploded gate shape) ≡ fingerprintSets, scalar columns only") {
    val sets = TextStats.fingerprintSets(docs, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1).toSet).toMap
    val exploded = TextStats.fingerprint(docs, "text", "doc_id")
    // no array-typed column survives (the r2 harness crash: a pandas
    // comparator cannot hash numpy arrays)
    assert(exploded.schema.fields.forall(f =>
      !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
    val got = exploded.collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    assert(got == sets.filter(_._2.nonEmpty))
  }

  test("winnowing guarantee: shared run of ≥ w+k−1 tokens ⇒ shared fingerprint") {
    val k = 4; val w = 4
    val common = (1 to (w + k - 1)).map(i => s"shared$i").mkString(" ") // exactly w+k−1 tokens
    val rnd = new scala.util.Random(23)
    def noise(n: Int, tag: String) = (1 to n).map(_ => s"$tag${rnd.nextInt(1000)}").mkString(" ")
    val pairs = (0 until 10).map { i =>
      (2L * i, s"${noise(30, "a")} $common ${noise(25, "b")}",
        2L * i + 1, s"${noise(40, "c")} $common ${noise(15, "d")}")
    }
    val df = pairs.flatMap { case (i1, t1, i2, t2) => Seq((i1, t1), (i2, t2)) }
      .toDF("doc_id", "text")
    val fp = TextStats.fingerprintSets(df, "text", "doc_id", k, w)
      .collect().map(x => (x.getLong(0), x.getSeq[Long](1).toSet)).toMap
    pairs.foreach { case (i1, _, i2, _) =>
      assert(fp(i1).intersect(fp(i2)).nonEmpty, s"no shared fingerprint for pair ($i1,$i2)")
    }
  }

  // ---- ANN over the real embeddings table ------------------------------

  lazy val items = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .as[(Long, Array[Double])].cache()
  lazy val q0 = items.filter(_._1 == 0L).head()._2
  lazy val exact = graft.lambda.DenseLambda.cosineTopK(items, q0, 10)
    .collect().map(_.getLong(0)).toSeq

  test("IVF with nprobe == nlist degenerates to exact brute force") {
    val ivf = Similarity.buildIvf(items, nlist = 8)
    val r = Similarity.ivfTopK(items, ivf, q0, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(r == exact)
  }

  test("IVF with partial probes keeps useful recall and prunes the scan") {
    val ivf = Similarity.buildIvf(items, nlist = 16)
    val r = Similarity.ivfTopK(items, ivf, q0, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(Similarity.recallAtK(r, exact) >= 0.5, s"recall too low: $r vs $exact")
  }

  test("materialized IVF layout: nprobe = PARTITION pruning at the source; exact at full probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val ivf = Similarity.materializeIvf(items, nlist = 8, dir)
    // cluster=<c>/ partition dirs exist on disk
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cluster="))
    assert(parts.length == ivf.model.k, s"expected ${ivf.model.k} partition dirs")
    val pruned = Similarity.ivfTopKPruned(spark, ivf.model, dir, q0, 10, nprobe = 2)
    // the nprobe selection must reach the scan as PartitionFilters over
    // the cluster partition column (reads 2 of nlist directories), not a
    // post-scan runtime filter
    val scan = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cluster".r
    assert(pf.findFirstIn(scan).isDefined, s"no cluster PartitionFilters in:\n$scan")
    // full probe over the layout ≡ brute-force exact
    val full = Similarity.ivfTopKPruned(spark, ivf.model, dir, q0, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact)
    // pruned probes still rank correctly within what they scanned
    val r = pruned.collect().map(_.getLong(0)).toSeq
    assert(r.nonEmpty && Similarity.recallAtK(r, exact) >= 0.2)
  }

  test("LSH buckets: query's own bucket contains it; recall reasonable") {
    // top-10 neighbors here have cosine ≈ 0.3 (weak similarity), so sign
    // agreement per plane is only ~0.6 — a Hamming-5 ball on 12 planes is
    // the right probe radius for recall without a full scan
    val buckets = Similarity.lshBuckets(items, nPlanes = 12)
    val r = Similarity.lshTopK(items, buckets, q0, 10, nPlanes = 12, maxHamming = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(r.head == 0L, "item 0 is the query itself, cosine 1")
    assert(Similarity.recallAtK(r, exact) >= 0.2)
  }

  test("shingle-oracle bound: corpus token counts stay under generate_series(1,4096)") {
    // guards SparkEntry's DuckDB shingle oracles, which hardcode the
    // 4096 index bound (DuckDB generate_series takes no lateral bound)
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val maxToks = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(size(Dedup.tokenArray(col("text"))).as("n"))
        .agg(max(col("n"))).collect()(0).getInt(0)
      assert(maxToks + 2 <= 4096, s"$sf: $maxToks tokens breaks the oracle's 4096 bound")
    }
  }

  test("minhash is one aggregate — no crossJoin/cartesian row expansion") {
    val mh = Dedup.minhashRows(docs, "text", "doc_id", 3, 16)
    val plan = mh.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"unexpected join in minhash plan:\n$plan")
    // signature shape: H rows per doc with ≥1 shingle, h = 0..H-1
    val byDoc = mh.collect().groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length == 16))
    assert(byDoc.values.forall(_.map(_.getInt(1)).sorted.toSeq == (0 until 16)))
  }

  test("hammingBall enumerates exactly the distance-≤r strings") {
    val ball = Similarity.hammingBall("0000", 2)
    assert(ball.length == 1 + 4 + 6)
    assert(ball.distinct.length == ball.length)
    assert(ball.forall(b => b.zip("0000").count { case (x, y) => x != y } <= 2))
    assert(Similarity.hammingBall("01", 0) == Seq("01"))
  }

  test("LSH probe: recall@10 ≥ 0.9 on high-similarity clusters, pushed In(bucket) scan") {
    // planted clusters: 40 seeds, 25 jittered copies each (cosine ≈ 0.99
    // within a cluster — the near-dup regime LSH is built for); query =
    // member 0 of cluster 0
    val rnd = new scala.util.Random(11)
    val seeds = Array.fill(40)(Array.fill(32)(rnd.nextGaussian()))
    val rows = for (c <- 0 until 40; m <- 0 until 25) yield {
      val v = seeds(c).map(_ + rnd.nextGaussian() * 0.05)
      (c * 25L + m, v)
    }
    val clustered = rows.toDF("id", "vec").as[(Long, Array[Double])].cache()
    val q = rows.head._2
    val exactTop = graft.lambda.DenseLambda.cosineTopK(clustered, q, 10)
      .collect().map(_.getLong(0)).toSeq
    // persist buckets so the In-list provably reaches the parquet scan
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    Similarity.lshBuckets(clustered, nPlanes = 12).write.mode("overwrite").parquet(tmp)
    val bucketsOnDisk = spark.read.parquet(tmp)
    val top = Similarity.lshTopK(clustered, bucketsOnDisk, q, 10, nPlanes = 12, maxHamming = 2)
    val got = top.collect().map(_.getLong(0)).toSeq
    assert(Similarity.recallAtK(got, exactTop) >= 0.9, s"recall: $got vs $exactTop")
    // the probe is bucket-equality pushed into the scan, not a per-row
    // Hamming filter over the whole table
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(bucket"),
      s"expected pushed In(bucket,...) filter in:\n$plan")
  }

  // ---- multimodal plumbing --------------------------------------------

  test("multimodal: real PNG/WAV/AVI headers round-trip through byte-level decode") {
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    assert(media.columns.toSeq == Seq("media_id", "modality", "payload", "meta"))
    val decoded = Multimodal.decode(media)
    val rows = decoded.collect()
    assert(rows.length == 6)
    assert(decoded.columns.toSeq ==
      Seq("media_id", "modality", "n_bytes", "width", "height", "channels", "n_frames"))
    // decode derives modality from MAGIC BYTES and must agree with the
    // synthesized id % 3 assignment, and dims must match the arithmetic
    // the encoder embedded into the headers
    rows.foreach { r =>
      val id = r.getLong(0)
      val expMod = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      assert(r.getString(1) == expMod)
      if (expMod == "image") {
        assert(r.getLong(2) == 45L)
        assert(r.getInt(3) == 16 + (id % 1024).toInt && r.getInt(4) == 16 + ((id * 7) % 1024).toInt)
        assert(r.getInt(5) == 3 && r.getInt(6) == 1)
      }
      if (expMod == "audio") {
        val samples = (100 + id % 900).toInt
        val ch = (1 + id % 2).toInt
        assert(r.getInt(5) == ch && r.getInt(6) == samples)
        assert(r.getLong(2) == 44L + samples * 2 * ch)
      }
      if (expMod == "video") {
        assert(r.getLong(2) == 88L && r.getInt(6) == (1 + id % 300).toInt)
      }
    }
    // determinism
    val again = Multimodal.decode(media).collect().map(_.toSeq).sortBy(_.toString)
    assert(again.toSeq == rows.map(_.toSeq).sortBy(_.toString).toSeq)
    // a corrupted CRC must be rejected, not mis-parsed
    val png = Multimodal.encodePng(100, 50)
    png(30) = (png(30) ^ 0x7f).toByte
    assertThrows[IllegalArgumentException](Multimodal.parsePng(png))
    val resized = Multimodal.resizePlan(decoded.filter(col("modality") =!= "audio"), 64).collect()
    resized.foreach { r =>
      assert(r.getAs[Int]("out_width") <= 65 && r.getAs[Int]("out_height") <= 65)
    }
    val frames = Multimodal.sampleFrames(decoded, 10).collect()
    frames.foreach { r =>
      val idx = r.getSeq[Int](3) // sequence() over int frames yields array<int>
      assert(idx.nonEmpty && idx.head == 0)
    }
  }

  test("multimodal features: histogram normalized, batch shape per partition") {
    val media = Multimodal.synthesize(docs, "doc_id", "text").repartition(3)
    val f = Multimodal.features(media).collect()
    assert(f.length == 6)
    f.foreach { r =>
      val h = r.getSeq[Double](1)
      assert(h.length == 16)
      assert(math.abs(h.sum - 1.0) < 1e-9)
    }
  }
}
