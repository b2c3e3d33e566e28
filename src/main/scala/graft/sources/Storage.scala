package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lambda.Csr

/** Storage parity layer — the reference's Parquet persistence surface
  * (SURVEY.md §2.1 S1–S7) re-expressed through Spark's Parquet writer,
  * with the SAME logical schemas so artifacts are interchangeable:
  *
  *  - dense matrix: `name_id, n_rows, n_cols, col_0..col_{F-1}`
  *    (/root/reference/src/storage/parquet.rs:203-217);
  *  - sparse matrix: COO `row, col, value` (parquet.rs:377-385);
  *  - λ vector: `row_index, lambda` (parquet.rs:679-684);
  *  - JSON metadata sidecar `{name}_metadata.json` (parquet.rs:129-159).
  *
  * Snappy compression matches the reference's writer properties.
  */
object Storage {

  // ---- dense N×F matrix -------------------------------------------------

  def saveDenseMatrix(spark: SparkSession, rows: DataFrame, idCol: String,
      vecCol: String, path: String, name: String): Unit = {
    import spark.implicits._
    val f = rows.select(size(col(vecCol))).first().getInt(0)
    val nRows = rows.count()
    val cols = (0 until f).map(i => col(vecCol).getItem(i).as(s"col_$i"))
    rows.select(
      (col(idCol).cast("long").as("name_id") +: lit(nRows).as("n_rows") +:
        lit(f.toLong).as("n_cols") +: cols): _*)
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
  }

  def loadDenseMatrix(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val f = df.schema.fieldNames.count(_.startsWith("col_"))
    val vec = array((0 until f).map(i => col(s"col_$i")): _*)
    df.select(col("name_id"), vec.as("vector"))
  }

  // ---- sparse CSR matrix as COO ----------------------------------------

  def saveSparseMatrix(spark: SparkSession, m: Csr, path: String): Unit = {
    import spark.implicits._
    val coo = for {
      i <- 0 until m.n
      k <- m.indptr(i) until m.indptr(i + 1)
    } yield (i.toLong, m.indices(k).toLong, m.values(k))
    coo.toDF("row", "col", "value")
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
  }

  def loadSparseMatrix(spark: SparkSession, path: String, n: Int): Csr = {
    val coo = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    Csr.fromCoo(n, coo)
  }

  // ---- λ vector ---------------------------------------------------------

  def saveLambda(lambdas: DataFrame, idCol: String, lambdaCol: String, path: String): Unit =
    lambdas.select(col(idCol).cast("long").as("row_index"), col(lambdaCol).as("lambda"))
      .write.mode("overwrite").option("compression", "snappy").parquet(path)

  def loadLambda(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ---- JSON metadata sidecar -------------------------------------------

  def saveMetadata(path: String, name: String, kv: Map[String, String]): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val body = kv.toSeq.sorted
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }.mkString(",\n  ")
    Files.createDirectories(Paths.get(path))
    Files.writeString(Paths.get(path, s"${name}_metadata.json"),
      s"""{\n  "name": "${esc(name)}",\n  "timestamp": "1970-01-01T00:00:00Z",\n  $body\n}\n""")
  }

  def loadMetadata(path: String, name: String): String =
    Files.readString(Paths.get(path, s"${name}_metadata.json"))

  /** Round-trip equality check used by storage tests (1e-10 like the
    * reference round-trip assertions, parquet.rs:811-905).
    */
  def denseMatricesEqual(a: DataFrame, b: DataFrame, tol: Double = 1e-10): Boolean = {
    val rows = a.join(b.withColumnRenamed("vector", "v2"), "name_id")
      .select(col("vector"), col("v2")).collect()
    rows.nonEmpty && rows.forall { r =>
      val x = r.getSeq[Double](0); val y = r.getSeq[Double](1)
      x.length == y.length && x.zip(y).forall { case (p, q) => math.abs(p - q) <= tol }
    }
  }
}
