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

  private def camel(rng: Rng, n: Int): String = {
    val parts = (0 until n).map(_ => Stems(rng.nextZipf(nStems)))
    parts.head + parts.tail.map(_.capitalize).mkString
  }

  private def snake(rng: Rng, n: Int): String =
    (0 until n).map(_ => Stems(rng.nextZipf(nStems))).mkString("_")

  def needleToken(seed: Long, id: Long): String =
    "needle_" + Hashing.hexString(Hashing.hash64(seed, "needle", id.toString), 12)

  private def genContent(rng: Rng, repo: String, path: String, lang: String,
      seed: Long, id: Long): String = {
    val kw = Keywords(lang)
    val sb = new StringBuilder
    sb.append(s"// $repo $path\n")
    val nImports = 1 + rng.nextInt(3)
    (0 until nImports).foreach { _ =>
      sb.append(s"${kw(4 % kw.length)} lib.${snake(rng, 2)}\n")
    }
    val nFuncs = 6 + rng.nextInt(10)
    (0 until nFuncs).foreach { f =>
      val fname = camel(rng, 2 + rng.nextInt(2))
      sb.append(s"${kw(0)} $fname(${snake(rng, 1)}: ${Stems(rng.nextZipf(nStems)).capitalize}) {\n")
      val nLines = 4 + rng.nextInt(8)
      (0 until nLines).foreach { _ =>
        val v = if (rng.nextInt(2) == 0) camel(rng, 2) else snake(rng, 2)
        sb.append(s"  ${kw(1 % kw.length)} $v = ${camel(rng, 1)}(${snake(rng, 1)}, ${rng.nextInt(100)})\n")
      }
      sb.append("}\n")
    }
    // rare needle token — exactly one per file
    sb.append(s"// ${needleToken(seed, id)}\n")
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
