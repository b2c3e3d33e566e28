package graft.tokenize

import scala.collection.mutable.ArrayBuffer

/** Code-aware tokenizer (new surface mandated by the north rule; the
  * reference only parses `id; f0,f1,...` id lines —
  * /root/reference/examples/common/lib.rs:29-51 — so tokenization
  * semantics are defined here, not inherited).
  *
  * Two modes:
  *  - [[codeTokens]]: split on non-alphanumerics, then split camelCase and
  *    snake_case identifier boundaries, lowercase everything. Used for the
  *    source-code corpus.
  *  - [[simpleTokens]]: lowercase then split on `[^a-z0-9]+`. Deliberately
  *    expressible in ANSI SQL (`regexp_split_to_array(lower(text), ...)`)
  *    so the driver's DuckDB oracle can replay it exactly.
  *
  * Pure functions — usable in typed `flatMap` (Dataset) and in local
  * oracles; no Spark dependency in this file.
  */
object CodeTokenizer {

  /** Register both tokenizer modes as SQL functions so the pure-SQL
    * surface can tokenize: `SELECT explode(code_tokens(content)) ...`.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("code_tokens", (s: String) => if (s == null) Array.empty[String] else codeTokens(s))
    spark.udf.register("simple_tokens", (s: String) => if (s == null) Array.empty[String] else simpleTokens(s))
  }

  /** Lowercase + split on runs of anything outside [a-z0-9]. */
  def simpleTokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** camelCase / PascalCase / SCREAMING_SNAKE aware splitting.
    * "parseHTTPRequest2" -> [parse, http, request2]
    * "foo_barBaz"        -> [foo, bar, baz]
    */
  def codeTokens(text: String): Array[String] = {
    val out = new ArrayBuffer[String](64)
    val n = text.length
    var i = 0
    while (i < n) {
      if (!isWordChar(text.charAt(i))) { i += 1 }
      else {
        // found a word [i, j): alnum or underscore run
        var j = i
        while (j < n && isWordChar(text.charAt(j))) j += 1
        splitIdentifier(text, i, j, out)
        i = j
      }
    }
    out.toArray
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  @inline private def isUpper(c: Char): Boolean = c >= 'A' && c <= 'Z'
  @inline private def isLower(c: Char): Boolean = c >= 'a' && c <= 'z'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Split text[start,end) (a [A-Za-z0-9_]+ word) into subtokens. */
  private def splitIdentifier(s: String, start: Int, end: Int,
      out: ArrayBuffer[String]): Unit = {
    var tokStart = start
    var i = start
    while (i < end) {
      val c = s.charAt(i)
      if (c == '_') {
        emit(s, tokStart, i, out); tokStart = i + 1
      } else if (i > tokStart) {
        val p = s.charAt(i - 1)
        // boundary: lower|digit -> Upper  (fooBar -> foo|Bar)
        val lowerToUpper = isUpper(c) && (isLower(p) || isDigit(p))
        // boundary: Upper Upper lower -> split before last Upper (HTTPServer -> HTTP|Server)
        val acronymEnd = i + 1 < end && isUpper(c) && isUpper(p) && isLower(s.charAt(i + 1))
        if (lowerToUpper || acronymEnd) { emit(s, tokStart, i, out); tokStart = i }
      }
      i += 1
    }
    emit(s, tokStart, end, out)
  }

  @inline private def emit(s: String, a: Int, b: Int, out: ArrayBuffer[String]): Unit =
    if (b > a) out += s.substring(a, b).toLowerCase
}
