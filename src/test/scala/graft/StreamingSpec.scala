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
