package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, to_date}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Parquet-backed warehouse with snapshot-manifest semantics.
  *
  * The reference wraps its whole nightly run in ONE Postgres transaction
  * (`main.py:18`, single commit at `main.py:472`) — every table mutates or
  * none does. Vanilla Spark has no cross-table transaction, so the
  * warehouse uses the standard lakehouse trick: immutable data directories
  * plus a single atomically-swapped catalog file.
  *
  * Layout under `root/`:
  * {{{
  *   _catalog.json                      // table -> list of data dirs (the
  *                                      // ONLY mutable file; swapped via
  *                                      // ATOMIC_MOVE => all-or-nothing runs)
  *   data/<table>/<uuid>/part-*.parquet // immutable, write-once
  * }}}
  *
  * Scale notes (100 TB): commits are O(1) metadata, appends never rewrite
  * existing data (a new data dir is referenced alongside the old ones —
  * daily fact batches land as their own directories, giving date-aligned
  * pruning for free), and overwrites retire directories logically
  * (`vacuum()` reclaims them). Readers always see the catalog as of their
  * `begin()`, i.e. snapshot isolation for the duration of a run.
  */
class Warehouse(val spark: SparkSession, val root: String,
                val schemas: Map[String, StructType] = Schemas.tables,
                val partitionSpec: Map[String, (String, Column)] = Warehouse.defaultPartitions,
                val autoCompactThreshold: Int = 64) {

  private val catalogPath: Path = Paths.get(root, "_catalog.json")
  Files.createDirectories(Paths.get(root, "data"))

  def emptyDf(table: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schemas(table))

  /** Committed catalog: table → data dirs, in append order. */
  def catalog(): Map[String, Seq[String]] =
    if (!Files.exists(catalogPath)) Map.empty
    else CatalogJson.parse(Files.readString(catalogPath))

  /** Read the committed image of a table (partition columns dropped —
    * the declared schema is the contract; also robust to all-empty data
    * dirs, where inference would fail).
    */
  def read(table: String): DataFrame =
    readDirs(table, catalog().getOrElse(table, Nil))

  private[etl] def readDirs(table: String, dirs: Seq[String]): DataFrame = {
    val schema = schemas(table)
    if (dirs.isEmpty) emptyDf(table)
    else if (!partitionSpec.contains(table))
      spark.read.schema(schema).parquet(dirs: _*)
    else
      // partitioned roots must be discovered one by one — a multi-path
      // scan would try to unify partition structure across roots and
      // fail with CONFLICTING_DIRECTORY_STRUCTURES
      dirs.map(d => spark.read.schema(schema).parquet(d)
          .select(schema.fieldNames.toIndexedSeq.map(col): _*))
        .reduce(_ unionByName _)
  }

  /** Read keeping the physical partition column (when the table has one)
    * so date filters prune at the directory level —
    * `PartitionFilters: [trans_dt = ...]` in explain.
    */
  def readRaw(table: String, dirsIn: Seq[String] = Nil): DataFrame = {
    val dirs = if (dirsIn.nonEmpty) dirsIn else catalog().getOrElse(table, Nil)
    if (dirs.isEmpty) emptyDf(table)
    else dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  def begin(): Txn = new Txn(this)

  /** Compact a table's many append dirs into one freshly-written dir
    * (single catalog swap). At scale this is the periodic maintenance
    * job that bounds read amplification from daily appends; readers are
    * unaffected (snapshot isolation), and the retired dirs are
    * reclaimed by the next `vacuum()`.
    */
  def compact(table: String): Unit = {
    val dirs = catalog().getOrElse(table, Nil)
    if (dirs.length > 1) {
      val txn = begin()
      txn.overwrite(table, txn.read(table))
      txn.commit()
    }
  }

  /** Incremental compaction: merge the OLDEST data dirs of `table` into
    * one, leaving the most recent `keep` dirs untouched. Bounds the
    * read-side plan growth from daily appends (the unionByName chain in
    * [[readDirs]] is linear in dir count) without a full-table rewrite
    * each time — recent hot dirs never move; the cold prefix is
    * re-merged only when the dir count crosses the threshold again
    * (tiered-merge write amplification, the usual LSM trade).
    * [[Txn.commit]] invokes this automatically for any written table
    * past `autoCompactThreshold` dirs.
    *
    * Concurrency: the catalog swap is a compare-and-swap on the catalog
    * file's content — the read-modify-write is retried when a commit
    * lands between the post-merge re-read and the swap, and the
    * compaction ABORTS (a safe no-op: the merged dir is simply never
    * referenced and the next `vacuum()` reclaims it) if the catalog
    * keeps moving. The CAS closes the lost-update window down to the
    * compare-vs-move race inside [[commitCatalogIf]]; full mutual
    * exclusion (e.g. two compactions of the SAME table each committing a
    * merged copy of the same rows) still assumes one maintenance writer
    * per warehouse, same as every file-based table format without a
    * lock service.
    */
  def compactOldest(table: String, keep: Int = 16): Unit = {
    val dirs = catalog().getOrElse(table, Nil)
    if (dirs.length > keep + 1) {
      val (old, _) = dirs.splitAt(dirs.length - keep)
      val merged = writeDataDir(table, readDirs(table, old))
      // re-read the catalog AFTER the (long) merge write and replace only
      // the `old` prefix — any dir another writer appended meanwhile
      // stays referenced instead of being silently dropped
      var attempts = 0
      var done = false
      while (!done && attempts < 5) {
        val expected = if (Files.exists(catalogPath)) Files.readString(catalogPath) else ""
        val cat = if (expected.isEmpty) Map.empty[String, Seq[String]]
                  else CatalogJson.parse(expected)
        val kept = cat.getOrElse(table, Nil).filterNot(old.toSet)
        done = commitCatalogIf(expected, cat + (table -> (merged +: kept)))
        attempts += 1
      }
      // on persistent contention the merge is abandoned, never half-applied
    }
  }

  /** Delete data directories no longer referenced by the catalog. */
  def vacuum(): Int = {
    val live = catalog().values.flatten.map(Paths.get(_).toAbsolutePath.toString).toSet
    val dataRoot = Paths.get(root, "data")
    var removed = 0
    if (Files.exists(dataRoot)) {
      Files.list(dataRoot).iterator().asScala.foreach { tableDir =>
        if (Files.isDirectory(tableDir))
          Files.list(tableDir).iterator().asScala.foreach { d =>
            if (Files.isDirectory(d) && !live.contains(d.toAbsolutePath.toString)) {
              deleteRecursively(d); removed += 1
            }
          }
      }
    }
    removed
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  private[etl] def newDataDir(table: String): String =
    Paths.get(root, "data", table, UUID.randomUUID().toString).toString

  /** Write one immutable data dir, applying the table's partition spec.
    * Facts partition by event date: daily appends become one (or a few)
    * `dt=`-style directories each, so date-filtered scans prune whole
    * days and a 100 TB fact table never rewrites history.
    */
  private[etl] def writeDataDir(table: String, df: DataFrame): String = {
    val dir = newDataDir(table)
    partitionSpec.get(table) match {
      case Some((name, derive)) =>
        df.withColumn(name, derive).write.partitionBy(name).parquet(dir)
      case None =>
        df.write.parquet(dir)
    }
    dir
  }

  private[etl] def commitCatalog(entries: Map[String, Seq[String]]): Unit = {
    val tmp = Paths.get(root, s"_catalog.${UUID.randomUUID()}.tmp")
    Files.write(tmp, CatalogJson.render(entries).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, catalogPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Conditional catalog swap: only commit if the file still holds
    * `expected` (empty string = file absent). Returns false — without
    * writing — on mismatch, so callers can re-derive their update from
    * the fresh content and retry. The compare and the move are not one
    * atomic step (no OS-level file CAS exists); the residual window is
    * microseconds vs the seconds-long merge writes it guards against.
    */
  private[etl] def commitCatalogIf(expected: String,
                                   entries: Map[String, Seq[String]]): Boolean = {
    val current = if (Files.exists(catalogPath)) Files.readString(catalogPath) else ""
    if (current != expected) false
    else { commitCatalog(entries); true }
  }
}

/** One run's transaction: reads see committed state plus this txn's own
  * writes; nothing becomes visible to other readers until `commit()`
  * swaps the catalog (K11).
  */
class Txn private[etl] (wh: Warehouse) {
  private val snapshot: Map[String, Seq[String]] = wh.catalog()
  private val pending = mutable.LinkedHashMap[String, Seq[String]]()
  private var committed = false

  def read(table: String): DataFrame =
    wh.readDirs(table, pending.getOrElse(table, snapshot.getOrElse(table, Nil)))

  /** Replace the table image (staging truncate-and-load K1/K2, dim merge
    * result K4+K6+K7). Data lands in a fresh immutable dir; old dirs are
    * retired at commit.
    */
  def overwrite(table: String, df: DataFrame): Unit =
    pending(table) = Seq(wh.writeDataDir(table, align(table, df)))

  /** Append a batch (facts K8, report rows K10). No existing file is
    * touched — the new dir is referenced alongside the old ones.
    */
  def append(table: String, df: DataFrame): Unit = {
    val dir = wh.writeDataDir(table, align(table, df))
    pending(table) = pending.getOrElse(table, snapshot.getOrElse(table, Nil)) :+ dir
  }

  /** Schema-fit before write. When the incoming frame already carries the
    * declared column names (in any order — Spark's using-column joins move
    * keys to the front), align BY NAME. Otherwise apply the reference's
    * staging contract (main.py:61-62): rename BY POSITION. Both paths
    * then cast to the declared types.
    */
  private def align(table: String, df: DataFrame): DataFrame = {
    val schema = wh.schemas(table)
    require(df.columns.length == schema.length,
      s"$table expects ${schema.length} columns, got ${df.columns.length}")
    val renamed =
      if (df.columns.toSet == schema.fieldNames.toSet) df
      else df.toDF(schema.fieldNames.toIndexedSeq: _*)
    renamed.select(schema.fields.toIndexedSeq.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Atomic all-tables commit — the Spark counterpart of the single
    * `conn_edu.commit()` at main.py:472. After the O(1) catalog swap,
    * any written table whose dir count crossed the warehouse's
    * auto-compact threshold gets its oldest dirs merged (amortized
    * maintenance — runs of ordinary length never pay it).
    */
  def commit(): Unit = {
    require(!committed, "transaction already committed")
    wh.commitCatalog(snapshot ++ pending.toMap)
    committed = true
    // the commit above is durable at this point: a compaction failure is a
    // maintenance problem (stale dir layout), never a commit failure
    pending.keys.foreach { t =>
      if (wh.catalog().getOrElse(t, Nil).length > wh.autoCompactThreshold)
        try wh.compactOldest(t, keep = math.max(1, wh.autoCompactThreshold / 4))
        catch {
          case e: Exception => System.err.println(
            s"[graft] post-commit compaction of '$t' failed (commit is durable): $e")
        }
    }
  }
}

object Warehouse {
  /** Default physical partitioning: fact tables by event date. Dims and
    * staging stay unpartitioned (full-snapshot semantics).
    */
  val defaultPartitions: Map[String, (String, Column)] = Map(
    "fact_transactions" -> ("trans_dt", to_date(col("trans_date"))),
    "rep_fraud" -> ("rep_dt", to_date(col("report_dt"))))
}

/** Minimal JSON for `Map[String, Seq[String]]` — no external deps in the
  * offline build; keys and paths are engine-generated (no exotic chars
  * beyond what's escaped here).
  */
private[etl] object CatalogJson {
  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def render(m: Map[String, Seq[String]]): String =
    m.toSeq.sortBy(_._1).map { case (k, vs) =>
      s""""${esc(k)}": [${vs.map(v => s""""${esc(v)}"""").mkString(", ")}]"""
    }.mkString("{\n  ", ",\n  ", "\n}")

  // Tolerant hand-rolled parser for exactly the shape `render` emits.
  def parse(s: String): Map[String, Seq[String]] = {
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*\[([^\]]*)\]""".r
    val str = """"((?:[^"\\]|\\.)*)"""".r
    entry.findAllMatchIn(s).map { m =>
      val key = unesc(m.group(1))
      val vals = str.findAllMatchIn(m.group(2)).map(v => unesc(v.group(1))).toSeq
      key -> vals
    }.toMap
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
