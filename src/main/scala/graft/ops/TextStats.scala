package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. The
  * SQL-replayable ones use only built-in functions with pinned,
  * engine-portable semantics.
  */
object TextStats {

  /** Marker stopwords per language (tiny n-gram-free heuristic — the
    * deterministic scorer itself is the operator under test; wider lists
    * slot in without structural change).
    */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una"))

  /** Language ID: argmax over marker-token counts, ties broken by
    * language code ascending; 'und' when no marker hits.
    */
  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.tokenArray(col(textCol))).as("term"))
    val marker = Markers.toSeq
      .flatMap { case (l, ws) => ws.map(w => (l, w)) }
      .toDF("lang", "term")
    val counts = tok.join(broadcast(marker), "term")
      .groupBy(col("doc_id"), col("lang")).agg(count(lit(1)).as("hits"))
    // argmax hits, ties → lexicographically smallest lang (portable SQL shape)
    val best = counts.groupBy(col("doc_id")).agg(max(col("hits")).as("mh"))
    val pick = counts.join(best, "doc_id")
      .filter(col("hits") === col("mh"))
      .groupBy(col("doc_id")).agg(min(col("lang")).as("pred0"))
    docs.select(col(idCol).as("doc_id"))
      .join(pick, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("pred0"), lit("und")).as("pred_lang"))
  }

  /** Quality score components + a pinned blend, all integer/char-count
    * based for engine portability:
    *   alpha_ratio   = alnum chars / chars
    *   stop_ratio    = english-marker tokens / tokens
    *   mean_tok_len  = alnum chars in tokens / tokens
    *   score = round(0.4·alpha_ratio + 0.3·stop_ratio
    *                 + 0.3·min(mean_tok_len/8, 1), 6)
    */
  def qualityScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = Dedup.tokenArray(col(textCol))
    val nToks = size(toks).cast("double")
    val alnum = length(regexp_replace(lower(col(textCol)), "[^a-z0-9]", "")).cast("double")
    val chars = length(col(textCol)).cast("double")
    val stopHits = size(filter(toks, t => t.isin(Markers("en"): _*))).cast("double")
    val meanTokLen = alnum / nToks
    // floor-truncate to 6 decimals instead of rounding: the raw value is
    // a deterministic scalar expression (bit-identical in any IEEE
    // engine), and truncation has no round-half tie cases
    docs.select(
      col(idCol).as("doc_id"),
      (floor(
        when(nToks === 0 || chars === 0, 0.0).otherwise(
          lit(0.4) * (alnum / chars) +
            lit(0.3) * (stopHits / nToks) +
            lit(0.3) * least(meanTokLen / lit(8.0), lit(1.0))) * 1e6) / 1e6).as("quality"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs, digit runs, single non-space symbols).
    */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(filter(split(col(textCol), "\\s+"), t => length(t) > 0)).as("ws_tokens"),
      size(filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => length(t) > 0)).as("word_tokens"),
      length(regexp_replace(col(textCol), "\\s", "")).as("non_space_chars"))

  /** PII patterns shared by the op and its SQL oracle. RE2-safe (no
    * lookaround/backrefs) so DuckDB's regex engine agrees with Java's.
    */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PiiLongDigits = "[0-9]{7,}"

  /** PII scrubbing for training corpora: redact emails, IPv4 addresses,
    * and long digit runs (phone/account-shaped) with typed placeholders;
    * per-category match counts emitted for audit. Counts are taken on
    * the ORIGINAL text (so categories don't shadow each other), then
    * replacements chain email → ip → digits. Pure codegen'd regexp
    * expressions — SQL-replayable.
    */
  def redactPii(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol).as("doc_id"),
      regexp_count(t, lit(PiiEmail)).as("n_emails"),
      regexp_count(t, lit(PiiIpv4)).as("n_ips"),
      regexp_count(t, lit(PiiLongDigits)).as("n_digit_runs"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, PiiEmail, "<EMAIL>"),
          PiiIpv4, "<IP>"),
        PiiLongDigits, "<NUM>").as("redacted"))
  }

  /** n-gram repetition ratio (the Gopher-style duplicate-content
    * signal): 1 − distinct n-grams / total n-grams, 0 for docs shorter
    * than n tokens. Floor-truncated to 6 decimals for engine
    * portability.
    */
  def repetitionRatio(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val grams = Dedup.shingleArray(col(textCol), n)
    docs.select(
      col(idCol).as("doc_id"),
      (floor(
        when(size(grams) <= 0, 0.0).otherwise(
          lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"))
          * 1e6) / 1e6).as("rep_ratio"))
  }

  /** Winnowed document fingerprints (true winnowing per
    * Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
    * Document Fingerprinting"): Rabin–Karp hashes (base 257 mod 2⁶¹−1)
    * of `k`-token grams; over every window of `w` consecutive gram
    * hashes select the minimum, rightmost on ties (robust winnowing);
    * emit the DISTINCT selected hashes, sorted.
    *
    * Guarantee (the property the spec asserts): two documents sharing a
    * token run of length ≥ w + k − 1 share at least one fingerprint.
    * ORACLE (since r5): the gram-hash stream ([[fingerprintGrams]]) is
    * exported as the oracle's input table and the window-min selection
    * (rightmost-tie winnowing) replays independently in SQL.
    *
    * [[fingerprint]] emits the harness-friendly EXPLODED shape
    * (doc_id, fingerprint) — one row per selected hash (an array column
    * crashes column-hash comparators); [[fingerprintSets]] keeps the
    * per-doc sorted array for set-algebra callers.
    */
  def fingerprint(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 4, w: Int = 4): DataFrame =
    fingerprintSets(docs, textCol, idCol, k, w)
      .select(col("doc_id"), explode(col("fingerprints")).as("fingerprint"))

  /** Rabin–Karp `k`-gram hash stream of one text (base 257 mod 2⁶¹−1)
    * — shared by [[fingerprintSets]] and the oracle-export path
    * ([[fingerprintGrams]]): one definition, no drift between the gate
    * and its exported oracle input.
    */
  def gramsOf(text: String, k: Int): Array[Long] = {
    val MOD = (1L << 61) - 1
    val B = 257L
    val toks = graft.tokenize.CodeTokenizer.simpleTokens(text)
    def hashTok(s: String): Long = {
      var h = 0L
      s.foreach { c => h = (h * B + c.toLong) % MOD }
      h
    }
    val hs = toks.map(hashTok)
    if (hs.isEmpty) Array.empty[Long]
    else if (hs.length < k) Array(hs.foldLeft(0L)((a, x) => (a * B + x) % MOD))
    else hs.sliding(k).map(_.foldLeft(0L)((a, x) => (a * B + x) % MOD)).toArray
  }

  /** The exploded gram-hash stream (doc_id, pos, gram) — the winnowing
    * oracle's INPUT table: the hashes are the engine's (SQL cannot
    * reproduce the modular rolling hash), the window-min selection is
    * then independently replayed in SQL.
    */
  def fingerprintGrams(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        gramsOf(text, k).iterator.zipWithIndex.map { case (g, p) => (id, p, g) }
      }
      .toDF("doc_id", "pos", "gram")
  }

  def fingerprintSets(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)].map { case (id, text) =>
      val grams = gramsOf(text, k)
      val selected =
        if (grams.isEmpty) Array.empty[Long]
        else if (grams.length <= w) Array(grams.min) // whole doc is one window
        else {
          val out = scala.collection.mutable.LinkedHashSet.empty[Long]
          var start = 0
          while (start + w <= grams.length) {
            var minIdx = start
            var i = start + 1
            while (i < start + w) {
              if (grams(i) <= grams(minIdx)) minIdx = i // rightmost min (robust)
              i += 1
            }
            out += grams(minIdx)
            start += 1
          }
          out.toArray.sorted
        }
      (id, selected, grams.length)
    }.toDF("doc_id", "fingerprints", "n_grams")
  }
}
