package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** QUERY RESULT CACHE with commit-based invalidation — the serving-side
  * complement of the MV family: an MV answers a DECLARED aggregate
  * shape; the result cache answers the exact query it saw before, for
  * the dashboard/report workload that re-issues identical queries many
  * times between warehouse loads.
  *
  * Soundness comes from the warehouse's own storage contract: data dirs
  * are immutable and every commit rolls the numbered catalog version —
  * so the result of a plan over committed tables is a pure function of
  * (canonical plan, catalog version), and that pair is the cache key.
  * A hit can never be stale: any commit, to any table, moves the
  * version and orphans every old entry (conservative cross-table
  * invalidation — table-granular tracking is the documented refinement;
  * [[prune]] reclaims orphans). Within one version, hash collisions are
  * closed by comparing the stored canonical plan text — a mismatch
  * recomputes and takes over the slot.
  *
  * Entries live under `root/_cache/<hash>_v<version>/` as parquet, so a
  * cached result streams back distributed (no driver materialization,
  * results of any size). The first run pays one extra write of its own
  * result — the usual cache admission trade.
  */
object ResultCache {

  /** Run `df` through the cache of `wh`: return the stored result when
    * the same canonical plan was already evaluated at the current
    * catalog version, else evaluate, store, and read back. Build the
    * frame from CURRENT reads (`wh.read(...)`) right before calling —
    * a frame captured before a commit reads the old dirs, which is
    * exactly what its key says it reads.
    */
  def through(wh: Warehouse, df: DataFrame): DataFrame = {
    val version = wh.versions().lastOption.getOrElse(0L)
    val plan = df.queryExecution.analyzed.canonicalized
    val text = plan.toString
    val dir = Paths.get(wh.root, "_cache",
      f"${plan.semanticHash()}%08x_v$version")
    val dataDir = dir.resolve("data")
    val planFile = dir.resolve("plan.txt")
    val hit = Files.exists(planFile) &&
      new String(Files.readAllBytes(planFile), StandardCharsets.UTF_8) == text &&
      Files.exists(dataDir.resolve("_SUCCESS"))
    if (!hit) {
      df.write.mode("overwrite").parquet(dataDir.toString)
      Files.createDirectories(dir)
      Files.write(planFile, text.getBytes(StandardCharsets.UTF_8))
    }
    wh.spark.read.schema(df.schema).parquet(dataDir.toString)
  }

  /** True iff `through` would hit for this frame right now (test and
    * monitoring hook — the decision logic, shared verbatim).
    */
  def wouldHit(wh: Warehouse, df: DataFrame): Boolean = {
    val version = wh.versions().lastOption.getOrElse(0L)
    val plan = df.queryExecution.analyzed.canonicalized
    val dir = Paths.get(wh.root, "_cache",
      f"${plan.semanticHash()}%08x_v$version")
    val planFile = dir.resolve("plan.txt")
    Files.exists(planFile) &&
      new String(Files.readAllBytes(planFile), StandardCharsets.UTF_8) == plan.toString &&
      Files.exists(dir.resolve("data").resolve("_SUCCESS"))
  }

  /** Reclaim entries keyed to superseded catalog versions. Returns the
    * number of entries removed.
    */
  def prune(wh: Warehouse): Int = {
    val current = wh.versions().lastOption.getOrElse(0L)
    val root = Paths.get(wh.root, "_cache")
    if (!Files.exists(root)) return 0
    val stale = Files.list(root).iterator().asScala.filter { d =>
      d.getFileName.toString match {
        case s if s.contains("_v") =>
          s.substring(s.lastIndexOf("_v") + 2).toLongOption.exists(_ < current)
        case _ => false
      }
    }.toSeq
    stale.foreach(deleteRecursively)
    stale.size
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
