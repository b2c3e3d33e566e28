package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structured Streaming surface: the events_window batch query run as a
  * streaming query (file source → tumbling window agg → memory sink)
  * must produce the same aggregates as the batch plan.
  *
  * (The reference has no streaming surface — SURVEY.md §2.9 — so this is
  * engine-added capability: the same declarative window aggregation
  * serves both batch and streams.)
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** The streaming file source needs a DIRECTORY; the driver testdata is
    * one parquet file per table, so stage it into a temp dir.
    */
  lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming tumbling-window agg equals batch result (complete mode)") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("ev_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_stream").collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).sortBy(_.toString)
      val batch = spark.read.parquet(s"$dir/events.parquet")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).sortBy(_.toString)
      assert(streamed.toSeq == batch.toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming index ingest: micro-batch epochs ≡ full rebuild") {
    import spark.implicits._
    import graft.corpus.CodeCorpus
    import graft.index.IndexBuilder
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val p = IndexBuilder.Params(docsPerShard = 64L, numParts = 4)
    // base snapshot: files 0..199
    IndexBuilder.build(spark, CodeCorpus.generate(spark, 200L, 42L, 4),
      s"$tmp/idx", corpusFp = "stream-base:200", p)
    // two later snapshots arrive as micro-batches through a file stream
    val srcDir = s"$tmp/incoming"
    def dropBatch(lo: Long, hi: Long): Unit =
      spark.createDataset((lo until hi).map(id => CodeCorpus.file(42L, id)))
        .write.mode("append").parquet(srcDir)
    val schema = org.apache.spark.sql.Encoders.product[graft.corpus.SourceFile].schema
    def ingestAvailable(): Unit = {
      val files = spark.readStream.schema(schema).parquet(srcDir)
        .as[graft.corpus.SourceFile]
      val q = graft.streaming.IndexStream.start(spark, files, s"$tmp/idx", p,
        checkpoint = s"$tmp/ckpt")
      q.awaitTermination()
    }
    dropBatch(200L, 300L)
    ingestAvailable()
    dropBatch(300L, 400L)
    ingestAvailable()
    val ingested = graft.streaming.IndexStream.index(spark, s"$tmp/idx")
    assert(ingested.nDocs == 400L, s"nDocs ${ingested.nDocs}")
    assert(ingested.epochs >= 3) // base + ≥1 epoch per availability run
    // ranking must equal a from-scratch build over the same 400 files
    val full = IndexBuilder.build(spark, CodeCorpus.generate(spark, 400L, 42L, 4),
      s"$tmp/full", corpusFp = "stream-full:400", p)
    def tops(ix: graft.index.InvertedIndex, q: Seq[String]): Seq[(String, Double)] = {
      val hits = ix.wandTopK(q, 10).withColumnRenamed("doc_id", "docId")
      hits.join(ix.docs.select(col("docId"), col("path")), "docId")
        .orderBy(col("score").desc, col("path").asc)
        .select("path", "score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
    for (q <- Seq(Seq("get"), Seq("data", "index", "merge"))) {
      val a = tops(full, q)
      val b = tops(ingested, q)
      assert(a.map(_._1) == b.map(_._1), s"q=$q: $a vs $b")
      a.zip(b).foreach { case ((_, x), (_, y)) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("streaming ingest extends the λ table incrementally (frozen-graph per micro-batch)") {
    import spark.implicits._
    import graft.corpus.CodeCorpus
    import graft.index.IndexBuilder
    import graft.lambda.LambdaPipeline
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest-lam").toString
    val p = IndexBuilder.Params(docsPerShard = 64L, numParts = 4)
    val base = IndexBuilder.build(spark, CodeCorpus.generate(spark, 200L, 42L, 4),
      s"$tmp/idx", corpusFp = "stream-lam-base:200", p)
    val cfg = LambdaPipeline.Config(vocabSize = 128, maxClusters = 8, seed = 42L)
    val li0 = LambdaPipeline.build(spark, base, s"$tmp/lam", cfg)
    val baseRows = li0.lambdas.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val srcDir = s"$tmp/incoming"
    def dropBatch(lo: Long, hi: Long): Unit =
      spark.createDataset((lo until hi).map(id => CodeCorpus.file(42L, id)))
        .write.mode("append").parquet(srcDir)
    val schema = org.apache.spark.sql.Encoders.product[graft.corpus.SourceFile].schema
    def ingestAvailable(): Unit = {
      val files = spark.readStream.schema(schema).parquet(srcDir)
        .as[graft.corpus.SourceFile]
      val q = graft.streaming.IndexStream.start(spark, files, s"$tmp/idx", p,
        checkpoint = s"$tmp/ckpt", lambdaDir = Some(s"$tmp/lam"))
      q.awaitTermination()
    }
    dropBatch(200L, 300L); ingestAvailable()
    dropBatch(300L, 400L); ingestAvailable()
    val ingested = graft.streaming.IndexStream.index(spark, s"$tmp/idx")
    assert(ingested.nDocs == 400L)
    val li = new graft.lambda.LambdaIndex(spark, s"$tmp/lam")
    val after = li.lambdas.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // every streamed doc carries a λ, and the base rows are untouched
    assert(after.size == 400, s"λ covers ${after.size} of 400 docs")
    baseRows.foreach { case (id, l) => assert(after(id) == l, s"doc $id λ changed") }
    assert((200L until 400L).forall(id => after.contains(id)))
    // the continuously-ingested (index, λ) pair stays blended-searchable:
    // α=1 ranks ≡ pure BM25 over base + streamed epochs
    val qText = "get value data"
    val blend = li.blendedTopK(ingested, qText, 10, alpha = 1.0)
      .collect().map(_.getLong(0)).toSeq
    val wand = ingested.wandTopK(
      graft.tokenize.CodeTokenizer.codeTokens(qText).distinct.toSeq, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(blend == wand)
  }

  test("stateful stream: running count per event_type with update mode") {
    val dir = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val counts = stream.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = counts.writeStream
      .outputMode("complete").format("memory").queryName("ev_counts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_counts").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      val batch = spark.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
