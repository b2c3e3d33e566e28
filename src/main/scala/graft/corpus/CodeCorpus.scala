package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.util.Hashing
import graft.util.Hashing.Rng

/** One row of the canonical Iceberg-shaped input table
  * (BASELINE.json input_hint): a source-code file.
  */
case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** Deterministic synthetic source-code corpus.
  *
  * Every row is a pure function of `(seed, fileId)` — generation is
  * partition-count- and partition-order-independent, so the same corpus
  * can be regenerated at any parallelism (needed for the two-cluster-size
  * scaling runs and for resume), mirroring how the reference ties all
  * nondeterminism to explicit seeds in its determinism tests
  * (/root/reference/src/tests/test_eigenmaps.rs:17-21).
  *
  * Content properties (FIXTURES.md §B):
  *  - Zipfian identifier-stem vocabulary → realistically skewed term df
  *    (exercises hot-term handling in the inverted index);
  *  - camelCase + snake_case identifiers (exercises the code tokenizer);
  *  - one rare needle token `needle_<hex12>` per file (exercises exact
  *    retrieval / rank-identity assertions);
  *  - language-appropriate keywords for the 6 supported languages.
  */
object CodeCorpus {

  val Langs: Vector[String] = Vector("scala", "java", "python", "rust", "go", "c")

  private val Ext = Map(
    "scala" -> "scala", "java" -> "java", "python" -> "py",
    "rust" -> "rs", "go" -> "go", "c" -> "c")

  private val Keywords: Map[String, Vector[String]] = Map(
    "scala" -> Vector("def", "val", "object", "class", "import", "match", "case"),
    "java" -> Vector("public", "class", "static", "void", "import", "return", "final"),
    "python" -> Vector("def", "class", "import", "return", "lambda", "yield", "with"),
    "rust" -> Vector("fn", "let", "pub", "struct", "impl", "use", "match"),
    "go" -> Vector("func", "var", "package", "type", "struct", "import", "return"),
    "c" -> Vector("int", "void", "static", "struct", "return", "include", "char"))

  /** Identifier stems, most-common-first; a Zipf draw over ranks makes
    * df(stem) heavy-tailed like real code identifiers.
    */
  val Stems: Vector[String] = Vector(
    "get", "set", "data", "value", "index", "node", "list", "map", "key",
    "item", "result", "count", "name", "file", "read", "write", "parse",
    "build", "query", "table", "row", "column", "buffer", "stream", "batch",
    "merge", "sort", "hash", "filter", "scan", "join", "group", "order",
    "token", "term", "doc", "score", "rank", "search", "match", "fetch",
    "cache", "store", "load", "save", "update", "delete", "insert", "create",
    "config", "context", "handler", "manager", "service", "client", "server",
    "request", "response", "session", "record", "field", "schema", "format",
    "encode", "decode", "compress", "block", "segment", "partition", "shard",
    "offset", "length", "size", "byte", "char", "string", "number", "float",
    "vector", "matrix", "graph", "edge", "weight", "lambda", "energy",
    "spectral", "cluster", "centroid", "sample", "project", "reduce")

  def nStems: Int = Stems.length

  /** Pure row generator: (seed, id) → SourceFile. */
  def file(seed: Long, id: Long): SourceFile = {
    val repoId = (Hashing.mix64(seed ^ id) >>> 40) % 211 // ~211 repos
    val repo = s"org${repoId % 37}/repo$repoId"
    val rng = new Rng(Hashing.hash64(seed, "file", id.toString))
    val lang = Langs((id % Langs.length).toInt)
    val dir = rng.nextInt(8)
    val path = s"src/m$dir/File${id}.${Ext(lang)}"
    val commit = Hashing.hexString(Hashing.hash64(seed, repo, "snapshot", (id % 5).toString), 40)
    val content = genContent(rng, repo, path, lang, seed, id)
    SourceFile(repo, path, commit, lang, content)
  }

  /** Capitalized stems, precomputed once — camelCase tails draw from
    * here instead of re-capitalizing per occurrence.
    */
  private val CapStems: Vector[String] = Stems.map(_.capitalize)

  /** Append a camelCase identifier of n stems — identical bytes AND
    * identical rng draw order to the former
    * `parts.head + parts.tail.map(_.capitalize).mkString`.
    */
  private def appendCamel(rng: Rng, n: Int, sb: java.lang.StringBuilder): Unit = {
    sb.append(Stems(rng.nextZipf(nStems)))
    var i = 1
    while (i < n) { sb.append(CapStems(rng.nextZipf(nStems))); i += 1 }
  }

  /** Append a snake_case identifier of n stems (≡ mkString("_")). */
  private def appendSnake(rng: Rng, n: Int, sb: java.lang.StringBuilder): Unit = {
    sb.append(Stems(rng.nextZipf(nStems)))
    var i = 1
    while (i < n) { sb.append('_').append(Stems(rng.nextZipf(nStems))); i += 1 }
  }

  def needleToken(seed: Long, id: Long): String =
    "needle_" + Hashing.hexString(Hashing.hash64(seed, "needle", id.toString), 12)

  /** Byte-identical to the original interpolation-based generator (the
    * golden-digest test in CorpusSpec pins 5006 files of seed-42 output)
    * but appends straight into one builder — the per-line interpolation
    * strings and per-token capitalize calls were ~25% of the docs build
    * stage at the 1-core level. Every rng draw happens at exactly the
    * same point in the stream.
    */
  private def genContent(rng: Rng, repo: String, path: String, lang: String,
      seed: Long, id: Long): String = {
    val kw = Keywords(lang)
    val sb = new java.lang.StringBuilder(1600)
    sb.append("// ").append(repo).append(' ').append(path).append('\n')
    val nImports = 1 + rng.nextInt(3)
    var im = 0
    while (im < nImports) {
      sb.append(kw(4 % kw.length)).append(" lib.")
      appendSnake(rng, 2, sb)
      sb.append('\n')
      im += 1
    }
    val nFuncs = 6 + rng.nextInt(10)
    var f = 0
    while (f < nFuncs) {
      sb.append(kw(0)).append(' ')
      appendCamel(rng, 2 + rng.nextInt(2), sb)
      sb.append('(')
      appendSnake(rng, 1, sb)
      sb.append(": ").append(CapStems(rng.nextZipf(nStems))).append(") {\n")
      val nLines = 4 + rng.nextInt(8)
      var l = 0
      while (l < nLines) {
        sb.append("  ").append(kw(1 % kw.length)).append(' ')
        if (rng.nextInt(2) == 0) appendCamel(rng, 2, sb) else appendSnake(rng, 2, sb)
        sb.append(" = ")
        appendCamel(rng, 1, sb)
        sb.append('(')
        appendSnake(rng, 1, sb)
        sb.append(", ").append(rng.nextInt(100)).append(")\n")
        l += 1
      }
      sb.append("}\n")
      f += 1
    }
    // rare needle token — exactly one per file
    sb.append("// ").append(needleToken(seed, id)).append('\n')
    sb.toString
  }

  /** Distributed generation: `spark.range` + typed map; `parts` controls
    * initial parallelism but NOT row content.
    */
  def generate(spark: SparkSession, nFiles: Long, seed: Long = 42L,
      parts: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0L, nFiles, 1L, parts).map(id => file(seed, id))
  }

  /** sha256 invariant recomputed generator-side (per-row invariant from
    * BASELINE.json input_hint; tests assert equality with Spark's
    * `sha2(content, 256)`).
    */
  def sha256Of(f: SourceFile): String = Hashing.sha256Hex(f.content)
}
