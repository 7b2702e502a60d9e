package graft.etl

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-feed between two images of a keyed table — the
  * lakehouse "what changed between version A and version B" read that
  * lets an incremental consumer process churn-sized deltas instead of
  * re-scanning snapshots (the Delta CDF / Iceberg changelog shape,
  * computed relationally from the warehouse's time-travel reads).
  *
  * ONE core join, two output shapes:
  *  - [[diffStruct]] — one row per changed key with full
  *    `before`/`after` value structs (`change_type ∈
  *    {insert, delete, update}`) — the shape
  *    [[Warehouse.diffVersions]] exposes;
  *  - [[diff]] — Delta's row convention: `insert` and `delete` rows
  *    carry the surviving image inline, an update emits an
  *    `update_pre`/`update_post` PAIR — what lets a downstream
  *    aggregate subtract the old contribution and add the new one
  *    without touching the base table ([[graft.queries.MiscQueries]]
  *    `q_cdf_apply`).
  *
  * Scale shape: ONE full-outer hash join on the key (bucketed
  * warehouse dims join exchange-free — both version reads carry the
  * layout's HashPartitioning), then a codegen'd per-row case array +
  * explode — no second join, no window, churn-sized output.
  * [[tableChangesPruned]] adds the file-level refinement: immutable
  * dirs + hard-linked bucket carry-over mean an UNCHANGED bucket is
  * the SAME file (inode) in both versions, so the diff can skip it
  * entirely and scan only rewritten buckets — cost ∝ churn, not table
  * size.
  */
object ChangeFeed {

  /** Column names the diff output (and its internals) claim for
    * itself — a table carrying one of these would be silently
    * clobbered by the classification projection, so refuse loudly.
    */
  private val reserved = Set("change_type", "before", "after", "__c")

  private def valueColsOf(oldDf: DataFrame, newDf: DataFrame,
                          keys: Seq[String]): Seq[String] = {
    require(oldDf.schema == newDf.schema,
      s"diff requires identical schemas: ${oldDf.schema.simpleString} vs " +
        newDf.schema.simpleString)
    require(keys.nonEmpty && keys.forall(oldDf.columns.contains),
      s"keys ${keys.mkString(",")} must exist in the table")
    val clash = oldDf.columns.filter(reserved)
    require(clash.isEmpty,
      s"columns [${clash.mkString(", ")}] collide with the diff's output " +
        "columns — rename them before diffing")
    oldDf.columns.filterNot(keys.contains).toSeq
  }

  /** Struct-form diff: keys, `change_type`, full `before`/`after`
    * structs (null on the absent side — after the full-outer join the
    * whole struct is NULL exactly when the key is absent, so a present
    * row whose every value column is null still reads as present).
    * A key-only table (no value columns — a membership/bridge set)
    * diffs on presence alone: the structs carry a single `__present`
    * marker field and the feed is pure insert/delete.
    */
  def diffStruct(oldDf: DataFrame, newDf: DataFrame,
                 keys: Seq[String]): DataFrame = {
    val valueCols = valueColsOf(oldDf, newDf, keys)
    def side(df: DataFrame, as: String) =
      df.select(keys.map(col) :+
        (if (valueCols.isEmpty) struct(lit(true).as("__present"))
         else struct(valueCols.map(col): _*)).as(as): _*)
    side(oldDf, "before").join(side(newDf, "after"), keys, "full_outer")
      .withColumn("change_type",
        when(col("before").isNull, "insert")
          .when(col("after").isNull, "delete")
          .when(not(col("before") <=> col("after")), "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(keys.map(col) :+ col("change_type") :+ col("before") :+
        col("after"): _*)
  }

  /** Row-form diff of two same-schema images on `keys`. Output =
    * `change_type` column followed by the input columns, one row per
    * insert/delete and two (pre/post) per update.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = valueColsOf(oldDf, newDf, keys)
    def img(side: String, tpe: String): Column =
      struct(lit(tpe).as("change_type") +:
        valueCols.map(c => col(s"$side.$c").as(c)): _*)
    // one pass over the struct diff: per row, the 1-2 applicable records
    val cases = array(
      when(col("change_type") === "insert", img("after", "insert")),
      when(col("change_type") === "delete", img("before", "delete")),
      when(col("change_type") === "update", img("before", "update_pre")),
      when(col("change_type") === "update", img("after", "update_post")))
    diffStruct(oldDf, newDf, keys)
      .select(keys.map(col) :+ explode(cases).as("__c"): _*)
      .filter(col("__c").isNotNull)
      .select(col("__c.change_type") +: keys.map(col) ++:
        valueCols.map(c => col(s"__c.$c").as(c)): _*)
  }

  /** The CONSUMER side: apply a [[diff]]-shaped change feed to the old
    * image and get the new one — `applyChanges(old, diff(old, new))`
    * reconstructs `new` exactly (ScalaCheck-pinned round trip). This
    * is how a downstream copy stays in sync at churn cost: drop the
    * keys the feed deletes or updates (one LEFT ANTI join — a
    * churn-sized feed broadcasts by stats; a mass-churn feed, where
    * most of the table turns over, rightly plans a shuffle anti-join
    * instead, so no broadcast hint is forced here), then union the
    * inserted/updated images verbatim.
    */
  def applyChanges(oldDf: DataFrame, changes: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val removed = changes
      .filter(col("change_type").isin("delete", "update_pre"))
      .select(keys.map(col): _*)
    val added = changes
      .filter(col("change_type").isin("insert", "update_post"))
      .select(oldDf.columns.map(col).toIndexedSeq: _*)
    oldDf.join(removed, keys, "left_anti").unionByName(added)
  }

  /** The time-travel form: diff `table` between two committed catalog
    * versions of `wh` (see `Warehouse.readAsOf` for the vacuum
    * retention caveat).
    */
  def tableChanges(wh: Warehouse, table: String, fromVersion: Long,
                   toVersion: Long, keys: Seq[String]): DataFrame =
    diff(wh.readAsOf(table, fromVersion), wh.readAsOf(table, toVersion), keys)

  /** [[tableChanges]] with FILE-LEVEL PRUNING: partial bucket rewrites
    * (`overwriteBuckets` / bucketed `deleteWhere` / the SCD1 merge
    * path) hard-link untouched bucket files into the new version's
    * dir, so an unchanged bucket is the SAME inode on both sides.
    * Those files are bit-identical — a key living only in them cannot
    * have changed — so the diff needs to scan ONLY the files exactly
    * one version has. A nightly merge touching `c` of `B` buckets
    * diffs ~`c/B` of the dim regardless of dim size.
    *
    * Sound only where "one key ↔ one file per version" holds and no
    * row is masked outside the data files; anything else falls back to
    * the full [[tableChanges]] (same answer, full scan): the table
    * must be bucketed by the (leading) key, unpartitioned, single-dir
    * in BOTH versions, and carry no deletion vectors in either version
    * (a DV tombstone changes rows without changing the file). The
    * filesystem must expose file keys (inodes) — hard-link identity is
    * what proves "same file".
    */
  /** Schema of the materialized change log for a table: the [[diff]]
    * row-form columns (`change_type`, keys, value columns) plus the
    * `_commit_version` the change belongs to — what a streaming
    * consumer needs to replay transitions in order.
    */
  def logSchema(tableSchema: org.apache.spark.sql.types.StructType,
                keys: Seq[String]): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val byName = tableSchema.fields.map(f => f.name -> f).toMap
    val keyFields = keys.map(byName(_))
    val valueFields = tableSchema.fields.toSeq.filterNot(f => keys.contains(f.name))
    StructType((StructField("change_type", StringType) +: keyFields) ++
      valueFields :+ StructField("_commit_version", LongType))
  }

  /** The glob every log reader (batch or streaming) scans: one
    * subdirectory per logged transition. */
  def logGlob(logDir: String): String = s"$logDir/t*"

  /** The versions whose transition dirs carry a COMMITTED (`_SUCCESS`-
    * marked) write, ascending. A torn write — a crash mid-job left
    * part files but no marker — is invisible here, which is exactly
    * what lets the next catch-up overwrite it.
    */
  def loggedVersions(logDir: String): Seq[Long] = {
    val dir = Paths.get(logDir)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (Files.isDirectory(p) && n.length > 1 && n.startsWith("t") &&
          n.drop(1).forall(_.isDigit) &&
          Files.exists(p.resolve("_SUCCESS")))
        Some(n.drop(1).toLong)
      else None
    }.toSeq.sorted
    finally s.close()
  }

  /** Catch the change log for `table` up to the newest committed
    * version — the write-side of a streaming CDC tail (the Delta CDF
    * shape: change rows are materialized once, near the commit, and
    * every downstream consumer reads churn-sized parquet instead of
    * re-diffing snapshots). Each catch-up writes, per version
    * transition not yet logged, the [[tableChangesPruned]] rows
    * stamped with `_commit_version` = the transition's target version
    * into the transition's OWN subdirectory (`t<version>`); readers
    * scan [[logGlob]].
    *
    * Contract and crash-safety:
    *  - The log STARTS at the table's first committed version:
    *    consumers seed from that image and fold transitions forward.
    *  - The high-water mark is the newest `_SUCCESS`-marked transition
    *    dir ([[loggedVersions]]). The marker is the job committer's
    *    LAST act, so a crash anywhere mid-write leaves an unmarked
    *    torn dir that the next catch-up overwrites in place — no
    *    double-logging after a complete write (there is no separate
    *    bookkeeping to desync) AND no silently-missing rows after a
    *    torn one. A ZERO-change transition commits an empty marked dir
    *    and advances the mark like any other. The one crack left: a
    *    streaming consumer that lists a torn dir's part files before
    *    the overwrite replaces them can see partial-then-rewritten
    *    rows; the convergent consumers absorb this, strict ones drain
    *    only after catch-up returns (the single-log-writer contract
    *    makes that ordering the caller's to arrange).
    *  - Single log-writer assumed, same as the warehouse's maintenance
    *    contract; concurrent COMMITS are fine (they only extend the
    *    version list a later catch-up sees).
    *  - Transitions are between successive RETAINED versions. If
    *    `vacuum()` pruned versions INTERIOR to a retained pair before
    *    they were logged, their net effect folds into one coarser diff
    *    (correct final image, lost granularity). But if the pruned
    *    version is the log's own high-water mark, the mark-to-oldest-
    *    retained span can no longer be diffed — and re-diffing a wider
    *    span would double-count rows already logged, corrupting every
    *    delta-folding consumer. That state fails loudly here instead:
    *    re-bootstrap the log, or vacuum with a horizon that retains
    *    the logged mark.
    *
    * Returns the versions newly logged by this call, ascending.
    */
  def materializeLog(wh: Warehouse, table: String, keys: Seq[String],
                     logDir: String): Seq[Long] = {
    require(!wh.schemas(table).fieldNames.contains("_commit_version"),
      "table already carries _commit_version — rename it before logging")
    // the high-water mark IS the _SUCCESS marker ([[loggedVersions]]);
    // a session that disabled the committer's marker write would stall
    // the mark forever (every catch-up rewrites the full log, group
    // replication sees an empty frontier) — fail loudly instead
    require(wh.spark.sparkContext.hadoopConfiguration
      .getBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
      "materializeLog requires _SUCCESS markers: set " +
        "mapreduce.fileoutputcommitter.marksuccessfuljobs=true (the " +
        "default) — the marker is the log's committed-transition mark")
    Files.createDirectories(Paths.get(logDir))
    val logged: Long = loggedVersions(logDir).lastOption.getOrElse(Long.MinValue)
    val vs = wh.versions()
    require(logged == Long.MinValue || vs.contains(logged),
      s"change log at $logDir is logged through version $logged, which " +
        s"vacuum() has pruned from the retained versions " +
        s"[${vs.mkString(", ")}] — the un-logged span can no longer be " +
        "diffed without double-logging; re-bootstrap the log from the " +
        "oldest retained image")
    val todo = vs.zip(vs.drop(1)).filter { case (_, to) => to > logged }
    todo.map { case (from, to) =>
      tableChangesPruned(wh, table, from, to, keys)
        .withColumn("_commit_version", lit(to))
        .write.mode("overwrite").parquet(s"$logDir/t$to")
      to
    }
  }

  /** Fold a MULTI-TRANSITION change frame (the [[materializeLog]]
    * shape: [[diff]] rows + `_commit_version`) into the NET diff —
    * exactly what [[diff]] would emit between the log-start image and
    * the image after the last folded version. Per key, one groupBy
    * picks the earliest before-carrier (`min` over (version, rank):
    * an `update_pre`/`delete` row beats the same version's
    * `update_post`) and the latest after-carrier (`max` prefers
    * `update_post` over its paired `update_pre`), then classifies:
    * absent→present = one `insert`, present→absent = one `delete`,
    * present→present = an `update_pre`/`update_post` pair — or
    * NOTHING when the value round-tripped (update-then-revert,
    * delete-then-reinsert-same). Insert-then-delete vanishes too.
    * Equivalence with the direct two-image diff is spec-pinned.
    *
    * Scale shape: one hash aggregation over the folded log slice —
    * no join, no window sort; cost is log-slice-sized, output is
    * net-churn-sized.
    */
  def netChanges(log: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = log.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == "change_type" || c == "_commit_version")
    val preRank = when(col("change_type") === "update_post", 1).otherwise(0)
    val postRank = when(col("change_type") === "update_pre", 0).otherwise(1)
    val vals = struct(valueCols.map(col): _*)
    val agg = log.groupBy(keys.map(col): _*).agg(
      min(struct(col("_commit_version").as("ver"), preRank.as("r"),
        col("change_type").as("t"), vals.as("v"))).as("first"),
      max(struct(col("_commit_version").as("ver"), postRank.as("r"),
        col("change_type").as("t"), vals.as("v"))).as("last"))
    val beforeAbsent = col("first.t") === "insert"
    val afterAbsent = col("last.t") === "delete"
    val changed = !(col("first.v") <=> col("last.v"))
    def rec(tpe: String, side: String): Column =
      struct(lit(tpe).as("change_type") +:
        valueCols.map(c => col(s"$side.v.$c").as(c)): _*)
    val nothing = slice(array(rec("insert", "last")), 1, 0) // typed empty
    val rows = when(beforeAbsent && afterAbsent, nothing)
      .when(beforeAbsent, array(rec("insert", "last")))
      .when(afterAbsent, array(rec("delete", "first")))
      .when(changed, array(rec("update_pre", "first"),
        rec("update_post", "last")))
      .otherwise(nothing)
    agg.select(keys.map(col) :+ explode(rows).as("__c"): _*)
      .select(col("__c.change_type") +: keys.map(col) ++:
        valueCols.map(c => col(s"__c.$c").as(c)): _*)
  }

  /** COMPACT the change log: write a new log at `compactedDir` in
    * which every transition with `_commit_version <= throughVersion`
    * is folded into ONE net transition stamped `throughVersion`
    * ([[netChanges]]), with the later transitions copied verbatim.
    * The original log is left untouched — it is an append-only
    * contract with streaming consumers whose checkpoints track its
    * files; rewriting it in place would redeliver every row to every
    * existing checkpoint. Instead, NEW consumers bootstrap from the
    * compacted dir (cost bounded by net churn + tail, not by the full
    * change history), and existing consumers stay on the original —
    * the same split Kafka's log compaction and Delta's
    * checkpoint-plus-tail reads make.
    *
    * A replica seeded with the log-start image converges to the same
    * final image through either log (spec-pinned). A history consumer
    * ([[graft.streaming.StreamingOps.changeFeedScd2]]) sees the folded
    * span as one coarser transition: correct final image, intermediate
    * versions deliberately collapsed.
    */
  /** RETENTION for a live change log: delete transition dirs with
    * version ≤ `throughVersion`, IN PLACE. Without this the log grows
    * forever — [[compactLog]] folds history into a NEW log for
    * consumers that still need a seedable prefix; vacuum is for the
    * steady state where every consumer's frontier has passed the
    * horizon and the prefix is dead weight.
    *
    * Guards (each fails loudly rather than corrupting a consumer):
    *  - `throughVersion ≤ minConsumerApplied`: the caller passes the
    *    MINIMUM applied watermark across every consumer of this log
    *    (replicas' meta tables, streaming checkpoints); a transition a
    *    consumer has not folded yet is not garbage, it is that
    *    consumer's future input.
    *  - the newest transition always survives, even when eligible:
    *    the log's high-water mark IS the max `_SUCCESS`-marked version
    *    ([[materializeLog]]'s catch-up contract) — deleting it would
    *    reset the next catch-up to re-diff (and double-log) history.
    *
    * A consumer seeded AFTER a vacuum cannot replay the deleted
    * prefix — new consumers seed from a table snapshot (or a
    * [[compactLog]] output) and tail from there, the standard CDC
    * retention contract. Already-drained streaming checkpoints are
    * unaffected (the file source never re-lists processed files).
    * Also sweeps TORN (unmarked) transition dirs under the horizon —
    * the leftovers of a crash mid-vacuum — so a re-run fully reclaims
    * them instead of leaving partial part files for a fresh full-log
    * streaming drain to misread. Returns the COMMITTED versions whose
    * dirs were deleted, ascending (torn sweeps are a side effect, not
    * a version).
    */
  def vacuumLog(logDir: String, throughVersion: Long,
                minConsumerApplied: Long): Seq[Long] = {
    require(throughVersion <= minConsumerApplied,
      s"vacuumLog horizon $throughVersion is beyond the slowest " +
        s"consumer's applied watermark $minConsumerApplied — a " +
        "transition not yet folded by every consumer is not garbage")
    val vs = loggedVersions(logDir)
    require(vs.nonEmpty, s"no committed transitions in $logDir")
    def rmDir(v: Long): Unit = {
      val dir = Paths.get(logDir, s"t$v")
      // the marker goes FIRST — the mirror of the write path, where the
      // committer writes it LAST: a crash mid-vacuum then leaves an
      // unmarked torn dir below the horizon, which the sweep below (not
      // loggedVersions, which skips unmarked dirs) reclaims on re-run,
      // instead of a marked dir with missing part files that a full-log
      // drain would fold as a complete transition
      Files.deleteIfExists(dir.resolve("_SUCCESS"))
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally walk.close()
    }
    val doomed = vs.filter(v => v <= throughVersion && v < vs.max)
    doomed.foreach(rmDir)
    // sweep TORN dirs under the horizon too: a crash mid-vacuum leaves
    // an unmarked t<v> whose surviving part files loggedVersions-based
    // readers ignore but a fresh-checkpoint streaming drain (which
    // globs parquet files with no marker gate) would fold as a PARTIAL
    // transition. Safe under the single-maintenance-writer contract:
    // the only legitimate unmarked dir is an in-flight catch-up write,
    // and that sits ABOVE the logged high-water mark (vs.max), which
    // the v < vs.max bound already excludes.
    val marked = vs.toSet
    val stream = Files.list(Paths.get(logDir))
    val torn = try stream.iterator().asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (Files.isDirectory(p) && n.length > 1 && n.startsWith("t") &&
          n.drop(1).forall(_.isDigit)) Some(n.drop(1).toLong) else None
    }.toSeq.filter(v => !marked(v) && v <= throughVersion && v < vs.max)
    finally stream.close()
    torn.foreach(rmDir)
    doomed
  }

  def compactLog(spark: org.apache.spark.sql.SparkSession, logDir: String,
                 compactedDir: String,
                 logSchema: org.apache.spark.sql.types.StructType,
                 keys: Seq[String], throughVersion: Long): Unit = {
    val (head, tail) = loggedVersions(logDir).partition(_ <= throughVersion)
    require(head.nonEmpty, s"no logged transitions at or before " +
      s"$throughVersion in $logDir — nothing to compact")
    // the folded transition is stamped `throughVersion`, and consumer
    // frontiers/watermarks will reference that stamp — a value that was
    // never a logged version (e.g. between two real ones) would plant a
    // version in the compacted log that the source log cannot account for
    require(head.last == throughVersion,
      s"throughVersion=$throughVersion is not a logged version of " +
        s"$logDir (logged: ${head.mkString(", ")}) — the folded " +
        "transition's stamp must be a real version or downstream " +
        "watermarks reference a version absent from the source log")
    val folded = spark.read.schema(logSchema)
      .parquet(head.map(v => s"$logDir/t$v"): _*)
    netChanges(folded, keys)
      .withColumn("_commit_version", lit(throughVersion))
      .select(logSchema.fieldNames.toIndexedSeq.map(col): _*)
      .write.mode("errorifexists").parquet(s"$compactedDir/t$throughVersion")
    // tail transitions copy verbatim, each into its own dir, so the
    // compacted log is a real log: same layout, same marker contract
    tail.foreach { v =>
      spark.read.schema(logSchema).parquet(s"$logDir/t$v")
        .write.mode("errorifexists").parquet(s"$compactedDir/t$v")
    }
  }

  /** One consumer's applied FRONTIER for a change log: every
    * transition at or below it has been folded into the consumer's
    * state; everything above is that consumer's future input and must
    * not be vacuumed. `Long.MinValue` = nothing applied yet (a
    * registered-but-unstarted consumer pins the whole log).
    */
  trait LogConsumer { def frontier(): Long }

  /** A ledgered replica consumer ([[replicateGroup]]): frontier = its
    * transactional watermark row in `meta` for `table` — the mark
    * moves in the same commit as the merges, so reading it can never
    * run ahead of the applied state.
    */
  case class ReplicaFrontier(replica: Warehouse, meta: String,
                             table: String) extends LogConsumer {
    def frontier(): Long =
      replica.read(meta).filter(col("tbl") === table).select("ver")
        .collect().headOption.map(_.getLong(0)).getOrElse(Long.MinValue)
  }

  /** A streaming consumer (the
    * [[graft.streaming.StreamingOps.changeFeedReplica]] family, or any
    * query tailing [[logGlob]] through a durable checkpoint): frontier
    * = the largest logged version v such that EVERY current data file
    * of every transition ≤ v appears in a micro-batch the checkpoint
    * has COMMITTED. Computed from the checkpoint's own ledgers — the
    * file-source log (`sources/0`, one JSON entry per discovered file,
    * stamped with its batch) gated by `commits/` (a batch is applied
    * only once its commit marker exists; an offsets-only batch is
    * still in flight). Prefix rule: one undrained transition caps the
    * frontier even if later dirs happen to be listed, because the
    * consumer's next batch still needs the gap. A transition dir
    * vacuumed earlier (or a zero-change empty dir) has no current
    * files and is vacuously covered, which keeps re-runs idempotent.
    */
  case class CheckpointFrontier(checkpointDir: String,
                                logDir: String) extends LogConsumer {
    def frontier(): Long = checkpointAppliedThrough(checkpointDir, logDir)
  }

  private[etl] def checkpointAppliedThrough(checkpointDir: String,
                                            logDir: String): Long = {
    val commits = Paths.get(checkpointDir, "commits")
    var maxCommitted = -1L
    if (Files.isDirectory(commits)) {
      val s = Files.list(commits)
      try s.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (n.nonEmpty && n.forall(_.isDigit))
          maxCommitted = math.max(maxCommitted, n.toLong)
      } finally s.close()
    }
    val srcDir = Paths.get(checkpointDir, "sources", "0")
    if (maxCommitted < 0 || !Files.isDirectory(srcDir)) return Long.MinValue
    // every file the source log attributes to a COMMITTED batch, keyed
    // by its "t<version>/<name>" suffix. The ledger is read through
    // Spark's OWN FileStreamSourceLog (replacing r11's "path"/"batchId"
    // regexes over the private JSON format): the class that WRITES the
    // log also parses its version header, compaction layout (a
    // N.compact file restates every prior entry, allFiles() reads the
    // newest compact + later deltas), and any future format evolution.
    // The private-API construction itself lives in graftbridge.Bridge
    // with the other Spark-internals converters (r12 verdict item 6).
    val seen = scala.collection.mutable.HashSet[String]()
    seen ++= org.apache.spark.sql.graftbridge.Bridge.committedSourceFiles(
      org.apache.spark.sql.SparkSession.active, srcDir.toString, maxCommitted)
    def dataFiles(v: Long): Seq[String] = {
      val dir = Paths.get(logDir, s"t$v")
      if (!Files.isDirectory(dir)) return Nil
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith(".")).toSeq
      finally s.close()
    }
    var frontier = Long.MinValue
    val it = loggedVersions(logDir).iterator
    var capped = false
    while (!capped && it.hasNext) {
      val v = it.next()
      if (dataFiles(v).forall(f => seen(s"t$v/$f"))) frontier = v
      else capped = true
    }
    frontier
  }

  /** RETENTION POLICY DRIVER: vacuum `logDir` up to the horizon the
    * CONSUMERS prove safe, instead of making the caller hand-compute
    * `minConsumerApplied` across every replica meta table and
    * streaming checkpoint (the error-prone ritual [[vacuumLog]] alone
    * leaves). The safe horizon is the MINIMUM over the consumer
    * frontiers — one stale consumer (a replica behind on catch-up, a
    * checkpoint that never drained) holds the whole prefix, because
    * its future input is not garbage. [[vacuumLog]]'s own guards still
    * apply (the newest transition always survives; torn dirs under the
    * horizon are swept). Idempotent: a re-run after every consumer
    * advanced reclaims the newly-dead prefix and nothing else.
    *
    * The consumer SET is the caller's contract — a consumer omitted
    * here is a consumer whose future reads may fail, exactly like
    * every CDC retention config (Kafka's `retention.ms`, Delta's
    * `delta.deletedFileRetentionDuration`); the difference is the
    * horizon within that set is computed from ledgers, not guessed.
    * Returns the committed versions vacuumed, ascending (empty = the
    * slowest frontier pins everything, or nothing logged yet).
    */
  def retention(logDir: String, consumers: Seq[LogConsumer]): Seq[Long] = {
    require(consumers.nonEmpty,
      "retention with an empty consumer set would declare the whole " +
        "log dead — list every consumer, or call vacuumLog explicitly")
    if (loggedVersions(logDir).isEmpty) return Nil
    val safe = consumers.map(_.frontier()).min
    vacuumLog(logDir, safe, safe)
  }

  /** One member of a replication group: a source table, its merge
    * keys, and its materialized change log. */
  case class GroupTable(table: String, keys: Seq[String], logDir: String)

  /** The ONE net-apply recipe both replica consumers share
    * ([[replicateGroup]] and the streaming
    * [[graft.streaming.StreamingOps.changeFeedReplica]]): fold the
    * change rows to the per-key net delta, drop the `update_pre`
    * debit records, and apply one MERGE — net deletes drop the key,
    * net inserts/after-images upsert. A batch whose net is EMPTY
    * (only round-trips, or a zero-change transition) writes NOTHING —
    * no fresh dir, no hard-link pass. Returns whether a merge was
    * staged, so a caller with nothing else pending can skip an empty
    * version bump.
    */
  def applyNetBatch(txn: Txn, table: String, keys: Seq[String],
                    batch: DataFrame): Boolean = {
    val src = netChanges(batch, keys)
      .filter(col("change_type") =!= "update_pre")
      .withColumn("__op",
        when(col("change_type") === "delete", lit("d")).otherwise(lit("u")))
      .drop("change_type")
      .persist()
    try {
      val nonEmpty = !src.isEmpty
      if (nonEmpty) {
        Merge.into(txn, table, src, keys,
          whenMatched = Seq(
            Merge.Delete(Some(col("s.__op") === "d")),
            Merge.UpdateAll(Some(col("s.__op") === "u"))),
          whenNotMatched = Seq(
            Merge.Insert(condition = Some(col("s.__op") === "u"))))
      }
      nonEmpty
    } finally src.unpersist()
  }

  /** Multi-TABLE replication with CROSS-TABLE transactional
    * consistency. A source warehouse commit spans every table it
    * touched under ONE catalog version; independent per-table replicas
    * lose that boundary between drains (orders at v3 joining customers
    * still at v2 — orphaned foreign keys a reader can observe). This
    * catch-up preserves it: per call, each table's not-yet-applied log
    * versions fold to their net delta ([[netChanges]]) and ALL tables'
    * merges land in ONE replica transaction, together with the
    * applied-version watermark — so any reader of the replica sees
    * every group table at the same commit frontier.
    *
    * Exactly-once by TRANSACTIONAL WATERMARK, not convergence: the
    * `meta` table (declare it `(tbl STRING, ver BIGINT)` in the
    * replica's schemas) records each table's applied high-water mark
    * and moves in the same commit as the merges — the classic
    * sink-side-ledger pattern, chosen here over the single-table
    * replica's ledger-free convergence because the watermark is ALSO
    * what keeps re-reads churn-sized (only unapplied transition dirs
    * are ever opened; a ledger-free group would re-read whole logs
    * every call).
    *
    * Ordering contract (single maintenance writer, like
    * [[materializeLog]]): materialize ALL group logs, then call this.
    * The frontier defaults to the MIN over the group of each log's
    * newest marked version — every transition (zero-change included)
    * commits a marked dir per logged table, so a log still mid-
    * materialization simply holds the whole group back one call
    * instead of letting another table run ahead of it (the orphan
    * race). Pass `throughVersion` to cap the frontier earlier still.
    * A group table with an EMPTY log has no known frontier and pins
    * the group at nothing-to-do until its first catch-up.
    *
    * Returns the versions newly applied per table (empty map = nothing
    * to do, no commit).
    */
  def replicateGroup(replica: Warehouse, tables: Seq[GroupTable],
                     meta: String,
                     throughVersion: Option[Long] = None)
      : Map[String, Seq[Long]] = {
    val logged: Map[String, Seq[Long]] =
      tables.map(gt => gt.table -> loggedVersions(gt.logDir)).toMap
    if (logged.values.exists(_.isEmpty)) return Map.empty
    val frontier = math.min(logged.values.map(_.max).min,
      throughVersion.getOrElse(Long.MaxValue))
    def todoGiven(applied: Map[String, Long]): Map[String, Seq[Long]] =
      tables.map { gt =>
        gt.table -> logged(gt.table)
          .filter(_ > applied.getOrElse(gt.table, Long.MinValue))
          .filter(_ <= frontier)
      }.toMap
    def marksOf(df: DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // watermark pre-check OUTSIDE any transaction: under the single-
    // maintenance-writer contract a throwaway read sees the same marks
    // the transaction would, so a no-op call never opens a Txn it then
    // abandons (begin() is a pure catalog snapshot today, but leaking
    // one would turn latent the moment Txn ever acquires state)
    if (todoGiven(marksOf(replica.read(meta))).values.forall(_.isEmpty))
      return Map.empty
    val txn = replica.begin()
    // the AUTHORITATIVE read goes through the txn snapshot: if the
    // single-writer contract is ever violated and another writer
    // advanced a mark between the pre-check and begin(), merging from
    // the stale pre-check map would silently regress that mark
    // (transitions re-applied downstream); marks written after begin()
    // are OCC's problem — commit() fails and the caller retries
    val applied: Map[String, Long] = marksOf(txn.read(meta))
    val todo: Map[String, Seq[Long]] = todoGiven(applied)
    // single-writer contract violated between pre-check and begin():
    // someone else already applied the work. Discard the begun txn
    // explicitly — begin() is stateless today, but this is exactly the
    // latent leak path should Txn ever acquire state
    if (todo.values.forall(_.isEmpty)) { txn.discard(); return Map.empty }
    tables.foreach { gt =>
      val vs = todo(gt.table)
      if (vs.nonEmpty) {
        val logSch = logSchema(replica.schemas(gt.table), gt.keys)
        applyNetBatch(txn, gt.table, gt.keys,
          replica.spark.read.schema(logSch)
            .parquet(vs.map(v => s"${gt.logDir}/t$v"): _*))
      }
    }
    // marks MERGE over whatever else the meta table records (another
    // group, a table dropped from this one) — never erase a watermark
    val newMarks = (applied ++ tables.flatMap { gt =>
      todo(gt.table).lastOption.orElse(applied.get(gt.table))
        .map(gt.table -> _)
    }).toSeq
    import replica.spark.implicits._
    txn.overwrite(meta, newMarks.toDF("tbl", "ver"))
    txn.commit() // merges + watermark move as one atomic frontier
    todo.filter(_._2.nonEmpty)
  }

  def tableChangesPruned(wh: Warehouse, table: String, fromVersion: Long,
                         toVersion: Long, keys: Seq[String]): DataFrame = {
    val catA = wh.catalogAsOf(fromVersion)
    val catB = wh.catalogAsOf(toVersion)
    val dirsA = catA.getOrElse(table, Nil)
    val dirsB = catB.getOrElse(table, Nil)
    val noDvs = catA.getOrElse(Warehouse.dvKey(table), Nil).isEmpty &&
      catB.getOrElse(Warehouse.dvKey(table), Nil).isEmpty
    val bucketedByKey = wh.bucketSpec.get(table).exists(_._1 == keys.head)
    val prunable = noDvs && bucketedByKey && !wh.partitionSpec.contains(table) &&
      dirsA.length == 1 && dirsB.length == 1
    if (!prunable)
      return tableChanges(wh, table, fromVersion, toVersion, keys)

    def dataFiles(dir: String): Seq[Path] =
      wh.listDir(Paths.get(dir)).filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
    def fileKey(p: Path): AnyRef =
      Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes])
        .fileKey()
    val fa = dataFiles(dirsA.head)
    val fb = dataFiles(dirsB.head)
    val keysA = fa.map(fileKey)
    val keysB = fb.map(fileKey)
    if ((keysA ++ keysB).exists(_ == null)) // FS without stable file keys
      return tableChanges(wh, table, fromVersion, toVersion, keys)
    val setA = keysA.toSet
    val setB = keysB.toSet
    val onlyA = fa.zip(keysA).collect { case (p, k) if !setB(k) => p.toString }
    val onlyB = fb.zip(keysB).collect { case (p, k) if !setA(k) => p.toString }
    def rd(paths: Seq[String]): DataFrame =
      if (paths.isEmpty) wh.emptyDf(table)
      else wh.spark.read.schema(wh.schemas(table)).parquet(paths: _*)
    diff(rd(onlyA), rd(onlyB), keys)
  }
}
