package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args = query-name subset (local iteration; the
    // driver passes none). Unknown names are an error, as in Bench.
    val subset = args.drop(2).toSet
    val unknown = subset -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    val selected = if (subset.isEmpty) SparkEntry.queries
                   else SparkEntry.queries.view.filterKeys(subset).toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Output-convention guard (round-8 lesson): the external
        // comparator reads engine parquet with pyarrow (decimal128 →
        // Decimal objects) but oracles through DuckDB's .df() (→
        // float64), so a DECIMAL output column can never hash-match
        // even when values are bit-identical. Exact results must leave
        // as STRING (or DOUBLE when <16 significant digits). The check
        // recurses: a decimal nested in an array/struct/map column hits
        // the same comparator asymmetry as a top-level one.
        import org.apache.spark.sql.types._
        def hasDecimal(dt: DataType): Boolean = dt match {
          case _: DecimalType => true
          case a: ArrayType => hasDecimal(a.elementType)
          case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
          case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
          case _ => false
        }
        val decCols = df.schema.fields.collect {
          case f if hasDecimal(f.dataType) => f.name
        }
        require(decCols.isEmpty,
          s"decimal output columns [${decCols.mkString(", ")}] — cast to STRING " +
            "(TpchQueries.outStr) or DOUBLE; raw decimals fail the driver hash gate")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A failed query must not leave a PREVIOUS run's output behind:
        // when iterating into a reused outDir, a stale parquet would
        // make check.py compare old (possibly green) results and mask
        // the failure — delete so the comparator sees "no output".
        def rm(p: java.nio.file.Path): Unit = {
          if (java.nio.file.Files.isDirectory(p)) {
            val st = java.nio.file.Files.list(p)
            try st.forEach(rm(_)) finally st.close()
          }
          java.nio.file.Files.deleteIfExists(p)
        }
        rm(Paths.get(s"$outDir/$name"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
