package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.Schemas

/** File-drop sources for the daily run (SURVEY §2.1 S4-S7). */
object FileSources {

  /** S4 — transactions CSV: `;`-separated, header row, decimal COMMA
    * amounts (`transactions_01032021.txt`, parsed with `decimal=','` at
    * main.py:116). Spark's CSV reader has no locale option, so the amount
    * is read as string and normalized (`,` → `.`) before the
    * DECIMAL(18,5) cast. Fully distributed (`spark.read.csv`) — at scale
    * this is a plain splittable scan.
    *
    * Column order in the file (transaction_id, transaction_date, amount,
    * card_num, oper_type, oper_result, terminal) is force-fit to the
    * staging schema by position (main.py:61-62).
    */
  def transactionsCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("encoding", "UTF-8")
      .schema(StructType(Seq(
        StructField("transaction_id", StringType),
        StructField("transaction_date", StringType),
        StructField("amount", StringType),
        StructField("card_num", StringType),
        StructField("oper_type", StringType),
        StructField("oper_result", StringType),
        StructField("terminal", StringType))))
      .csv(path)
    raw.select(
      col("transaction_id").as("trans_id"),
      // TIMESTAMP(0): truncate to whole seconds like PG (SURVEY §1)
      date_trunc("second", to_timestamp(col("transaction_date"))).as("trans_date"),
      regexp_replace(col("amount"), ",", ".").cast(DecimalType(18, 5)).as("amt"),
      col("card_num"),
      col("oper_type"),
      col("oper_result"),
      col("terminal"))
  }

  /** S5 — terminals XLSX snapshot: 4 string columns; `create_dt` is the
    * FILENAME date, `update_dt` null, `processed_dt` the run timestamp
    * (main.py:119-125).
    */
  def terminalsXlsx(spark: SparkSession, path: String,
                    fileDate: Timestamp, runTs: Timestamp): DataFrame = {
    val sheet = Xlsx.readSheet(path)
    require(sheet.header == Vector("terminal_id", "terminal_type", "terminal_city", "terminal_address"),
      s"$path: unexpected header ${sheet.header}")
    val rows = sheet.rows.map { r =>
      Row(r(0).map(_.toString).orNull, r(1).map(_.toString).orNull,
        r(2).map(_.toString).orNull, r(3).map(_.toString).orNull,
        fileDate, null, runTs)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Schemas.terminals)
  }

  /** S6 — passport blacklist XLSX: `date` is an Excel serial
    * (44256 = 2021-03-01 via the 1899-12-30 epoch), `passport` a string.
    * Trailing styled-but-empty rows surface as all-null rows, exactly as
    * `pandas.read_excel` hands them to staging (FIXTURES.md §1.3) — the
    * reference inserts them, so faithfully keeping them is part of the
    * semantics (Pipeline can drop them in corrected mode).
    */
  def blacklistXlsx(spark: SparkSession, path: String): DataFrame = {
    val sheet = Xlsx.readSheet(path)
    require(sheet.header == Vector("date", "passport"),
      s"$path: unexpected header ${sheet.header}")
    val rows = sheet.rows.map { r =>
      val dt = r(0) match {
        case Some(d: Double) => Xlsx.serialToTimestamp(d)
        case Some(s: String) => Timestamp.valueOf(s)
        case _ => null
      }
      Row(dt, r(1).map(_.toString).orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Schemas.blacklist)
  }
}

/** S7 — drop-folder discovery and routing.
  *
  * The reference walks a drop dir, allow-lists extensions
  * {csv, txt, xlsx}, routes by substring, parses the file date from the
  * last `_` segment as `ddMMyyyy`, and archives each file as
  * `archive/<name>.backup` after staging (main.py:101-133, 68-70).
  *
  * The reference's routing conditions are Python-truthiness bugs
  * (`'transactions' and ('.txt' or '.csv') in file` ≡ `'.txt' in file`,
  * main.py:115; likewise main.py:128 ≡ `'.xlsx' in file`) that only work
  * because branches are ordered. This router implements the documented
  * INTENT — prefix match — and keeps the reference's branch order.
  *
  * Archival runs only after the warehouse commit (the reference renames at
  * main.py:70 even when the later DB transaction rolls back — a
  * consistency gap SURVEY §3 flags; here archive-after-commit fixes it).
  */
object DropFolder {
  sealed trait Kind
  case object Transactions extends Kind
  case object Terminals extends Kind
  case object Blacklist extends Kind

  final case class DropFile(path: java.nio.file.Path, kind: Kind, fileDate: java.time.LocalDate)

  private val allowed = Set("csv", "txt", "xlsx")
  private val dateFmt = java.time.format.DateTimeFormatter.ofPattern("ddMMyyyy")

  def route(name: String): Option[Kind] = {
    val ext = name.split('.').drop(1).lastOption.getOrElse("")
    if (!allowed.contains(ext)) None
    else if (name.contains("transactions") && (ext == "txt" || ext == "csv")) Some(Transactions)
    else if (name.contains("terminals") && ext == "xlsx") Some(Terminals)
    else if (name.contains("passport_blacklist") && ext == "xlsx") Some(Blacklist)
    else None
  }

  def fileDate(name: String): java.time.LocalDate = {
    val seg = name.split('_').last.split('.').head
    java.time.LocalDate.parse(seg, dateFmt)
  }

  def discover(dir: String): Seq[DropFile] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return Nil
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.list(p)
    val files = try st.iterator().asScala.toSeq finally st.close()
    files.filter(java.nio.file.Files.isRegularFile(_))
      .flatMap { f =>
        val name = f.getFileName.toString
        route(name).map(k => DropFile(f, k, fileDate(name)))
      }
      .sortBy(_.path.getFileName.toString)
  }

  /** `archive/<name-without-ext>.backup`, created on demand. */
  def archive(f: DropFile): java.nio.file.Path = {
    val dir = f.path.getParent.resolve("archive")
    java.nio.file.Files.createDirectories(dir)
    val base = f.path.getFileName.toString.split('.').head
    java.nio.file.Files.move(f.path, dir.resolve(s"$base.backup"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}

/** S1 — the `bank` Postgres dimension sources (`SELECT * FROM
  * info.{clients,accounts,cards}`, main.py:76-85). Pluggable: production
  * would be `spark.read.format("jdbc")`; the sandbox has no live PG, so
  * parquet fixtures (or in-memory frames in tests) stand in behind the
  * same trait.
  */
trait BankSource {
  def clients(spark: SparkSession): DataFrame
  def accounts(spark: SparkSession): DataFrame
  def cards(spark: SparkSession): DataFrame
}

final class ParquetBankSource(dir: String) extends BankSource {
  def clients(spark: SparkSession): DataFrame = spark.read.parquet(s"$dir/clients.parquet")
  def accounts(spark: SparkSession): DataFrame = spark.read.parquet(s"$dir/accounts.parquet")
  def cards(spark: SparkSession): DataFrame = spark.read.parquet(s"$dir/cards.parquet")
}

/** The production S1 path: `SELECT * FROM info.{table}` over JDBC
  * (main.py:76-85 reads the `bank` Postgres with a separate connection).
  * Not exercisable in the sandbox (no live PG / no driver jar), but the
  * mapping is exactly this. `fetchsize` batches the wire protocol where
  * the reference pulled whole tables through pandas; `partitionColumn`
  * options can be layered on for large dims.
  */
final class JdbcBankSource(url: String, user: String, password: String,
                           schema: String = "info") extends BankSource {
  private def read(spark: SparkSession, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"$schema.$table")
      .option("user", user)
      .option("password", password)
      .option("fetchsize", "10000")
      .load()
  def clients(spark: SparkSession): DataFrame = read(spark, "clients")
  def accounts(spark: SparkSession): DataFrame = read(spark, "accounts")
  def cards(spark: SparkSession): DataFrame = read(spark, "cards")
}
