package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All SQL-replayable variants use only built-in (codegen'd) functions —
  * md5, higher-order array functions, windowless groupBys — so the
  * DuckDB oracle can replay them bit-for-bit and Catalyst keeps the
  * whole plan in WholeStageCodegen.
  *
  * Scale notes (100 TB): exact dedup is one hash-shuffle; the shingle
  * self-join is quadratic in hot shingles and exists as the *verifier*
  * for MinHash-LSH candidates, which is the scale path (band buckets
  * shuffle ≈ H×docs rows; candidate verification touches only
  * bucket-colliding pairs).
  */
object Dedup {

  /** SQL-parity tokenization: lower + split [^a-z0-9]+, empties dropped,
    * as an array column.
    */
  def tokenArray(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => length(t) > 0)

  /** Word n-gram shingle array (space-joined), via higher-order
    * functions only.
    */
  def shingleArray(textCol: Column, n: Int): Column = {
    val toks = tokenArray(textCol)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: canonical survivor (min id) per md5(text). */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dups"))

  /** Distinct (doc, shingle) pairs. */
  def docShingles(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(shingleArray(col(textCol), n)).as("shingle"))
      .distinct()

  /** All-pairs n-gram Jaccard ≥ minJ via shingle equi-join (exact;
    * verifier-scale). Output (d1, d2, jacc).
    */
  def jaccardPairs(docs: DataFrame, textCol: String, idCol: String, n: Int,
      minJ: Double, roundTo: Int = 6): DataFrame = {
    val ds = docShingles(docs, textCol, idCol, n)
    val sizes = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val shared = ds.as("a").join(ds.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "s1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "s2"), "d2")
      .withColumn("jacc", col("shared") / (col("s1") + col("s2") - col("shared")))
      .filter(col("jacc") >= minJ)
      .select(col("d1"), col("d2"), round(col("jacc"), roundTo).as("jacc"))
  }


  /** MinHash signature rows (doc_id, h, minhash): H portable hash
    * functions h_i(s) = md5(i || ':' || s), minimized as strings —
    * identical in any engine with md5, no platform hash dependence.
    *
    * All H minima come from ONE aggregate over the shingle table (H min
    * columns, re-exploded after): map-side partial aggregation collapses
    * each task's shingles to a single H-wide signature before the
    * shuffle. The former crossJoin(range(H)) expanded the shingle table
    * H× through a BroadcastNestedLoopJoin ahead of the aggregation —
    * at 100 TB that is H× the scan materialization for the same result.
    */
  def minhashRows(docs: DataFrame, textCol: String, idCol: String, n: Int,
      numHashes: Int): DataFrame = {
    val ds = docShingles(docs, textCol, idCol, n)
    ds.groupBy(col("doc_id"))
      .agg(array((0 until numHashes).map(h =>
        min(md5(concat(lit(h.toString), lit(":"), col("shingle"))))): _*).as("mh"))
      .select(col("doc_id"), posexplode(col("mh")).as(Seq("h", "minhash")))
  }

  /** LSH band buckets: bucket = md5(concatenated minhashes of the band).
    * Docs sharing (band, bucket) are near-dup candidates.
    */
  def lshBuckets(minhash: DataFrame, rowsPerBand: Int): DataFrame =
    minhash
      .withColumn("band", floor(col("h") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(array_join(array_sort(collect_list(concat(col("h").cast("string"), lit("_"), col("minhash")))), "|")).as("bucket"))

  /** Candidate pairs from band-bucket collisions (d1 < d2, distinct). */
  def lshCandidates(buckets: DataFrame): DataFrame =
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()

  /** 64-bit SimHash as a '0'/'1' bit-string (portable: bits come from
    * md5(term) hex, weights are integer tf — exact in any engine).
    *
    * All 64 bit sums come from ONE aggregate over the tf table (64 sum
    * columns, the bit selector folded to per-bp constants at plan time):
    * map-side partial aggregation collapses each task's rows to a single
    * 64-wide signature before the shuffle. The former
    * crossJoin(range(64)) expanded the tf table 64× through a
    * BroadcastNestedLoopJoin ahead of the aggregation — at 100 TB that
    * is 64× the materialization for the same result.
    */
  def simhash64(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokenArray(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("h", md5(col("term")))
    val hexmap = "0123456789abcdef"
    // bit bp of the 64-bit prefix of md5: hex char bp/4, bit 3 − bp%4
    def bitSum(bp: Int): Column = {
      val hexval = instr(lit(hexmap), substring(col("h"), bp / 4 + 1, 1)) - 1
      val bit = pmod(floor(hexval / math.pow(2.0, 3 - bp % 4)).cast("int"), lit(2))
      sum(when(bit === 1, col("tf")).otherwise(-col("tf"))).as(s"s$bp")
    }
    tf.groupBy(col("doc_id"))
      .agg(bitSum(0), (1 until 64).map(bitSum): _*)
      .select(col("doc_id"),
        concat((0 until 64).map(bp =>
          when(col(s"s$bp") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** Full near-dedup pipeline: MinHash-LSH candidates → exact Jaccard
    * verification at `minJ` → survivor set (drop the larger id of every
    * verified duplicate pair). Returns the KEPT doc ids. This is the
    * scale path end-to-end: the quadratic Jaccard join runs only on
    * bucket-colliding candidate pairs.
    */
  def nearDedupKeep(docs: DataFrame, textCol: String, idCol: String, n: Int,
      numHashes: Int, rowsPerBand: Int, minJ: Double): DataFrame = {
    val cand = lshCandidates(lshBuckets(minhashRows(docs, textCol, idCol, n, numHashes), rowsPerBand))
    val ds = docShingles(docs, textCol, idCol, n)
    val sizes = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val verified = cand
      .join(ds.withColumnRenamed("doc_id", "d1").withColumnRenamed("shingle", "s1"), "d1")
      .join(ds.withColumnRenamed("doc_id", "d2").withColumnRenamed("shingle", "s2"), "d2")
      .filter(col("s1") === col("s2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "z1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "z2"), "d2")
      .filter(col("shared") / (col("z1") + col("z2") - col("shared")) >= minJ)
    docs.select(col(idCol).as("doc_id"))
      .join(verified.select(col("d2").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
  }

  /** Hamming distance between two equal-length bit-strings (candidate
    * verification for SimHash buckets).
    */
  def hammingBits(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), x => x))

  /** Embedding near-duplicate pairs: all-pairs cosine ≥ minCos with the
    * dot product as a higher-order `aggregate(zip_with(...))` — no UDF,
    * fully codegen'd. Exact verifier; the scale path buckets by
    * random-hyperplane LSH first (see Similarity.cosineLsh*).
    */
  def embeddingNearDups(items: DataFrame, idCol: String, vecCol: String,
      minCos: Double, roundTo: Int = 6): DataFrame = {
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val a = items.select(col(idCol).as("v1"), col(vecCol).as("e1"))
    val b = items.select(col(idCol).as("v2"), col(vecCol).as("e2"))
    a.join(b, col("v1") < col("v2"))
      .withColumn("cos", dot(col("e1"), col("e2")) / (sqrt(dot(col("e1"), col("e1"))) * sqrt(dot(col("e2"), col("e2")))))
      .filter(col("cos") >= minCos)
      .select(col("v1"), col("v2"), round(col("cos"), roundTo).as("cos"))
  }
}
