package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 historization — the natural extension of the reference's
  * Type-1 merge (`/root/reference/main.py:139-343` keeps only the latest
  * image; a Type-2 dim keeps every version with its validity interval).
  * Not in the reference's surface, but the first thing a real warehouse
  * user asks for once SCD1 works, and the semantics compose from the
  * exact same primitives: the null-safe change predicate
  * ([[Scd1.anyChanged]]) and the full-snapshot delete rule (K7).
  *
  * History schema = keys ++ compareCols ++
  * (`valid_from` timestamp, `valid_to` nullable timestamp,
  * `is_current` boolean). Invariants: per key, intervals are
  * non-overlapping, at most one `is_current` row, and
  * `valid_to IS NULL ⇔ is_current`.
  *
  * Merge semantics at load time `asOf` against a FULL snapshot:
  *  - new key            → one open row (asOf, NULL, true)
  *  - changed (null-safe) → current row closes at asOf; new open row
  *  - unchanged          → current row passes through verbatim
  *  - absent from snapshot → current row closes at asOf (soft delete —
  *    the key's history stays; a later re-appearance opens a fresh row)
  *  - already-closed rows pass through untouched, always.
  *
  * Scale shape: ONE full-outer join of the CURRENT slice against the
  * snapshot, producing 0-2 output rows per key via an array-explode (no
  * second pass over the join). Closed rows never enter the join — store
  * the history partitioned by `is_current` (or date-partition `valid_to`)
  * and the merge reads and rewrites only the current partition, which is
  * dim-sized, not history-sized; with the Warehouse's bucketed layout the
  * current slice co-locates with the snapshot like any SCD1 dim.
  */
object Scd2 {

  private val auditCols = Seq("valid_from", "valid_to", "is_current")

  /** First load: every snapshot row becomes an open version. */
  def initial(snapshot: DataFrame, keys: Seq[String], compareCols: Seq[String],
              asOf: java.sql.Timestamp): DataFrame =
    snapshot.select((keys ++ compareCols).map(col): _*)
      .withColumn("valid_from", lit(asOf))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))

  /** A snapshot with two rows for one key would fan the full-outer
    * join out and write two open versions — silently breaking the
    * at-most-one-is_current invariant every asOf/point-in-time join
    * relies on.
    *
    * The guard rides the LOAD'S OWN execution instead of a separate
    * groupBy job (round-8 advice: the old eager check re-shuffled the
    * snapshot once per load purely for validation): a window count
    * partitioned on the merge keys — the SAME hash partitioning the
    * merge join needs, so the snapshot still crosses the wire once —
    * feeds an `assert_true` filter that fails the job loudly on the
    * first duplicate key, naming it. Zero extra Spark jobs, zero extra
    * exchanges; the check costs one in-partition sort it shares with
    * the SMJ. Fails at ACTION time (the merge's own), not at plan
    * build — callers see the error on the load that would have
    * corrupted history, with the offending key in the message.
    *
    * Action-time tradeoffs, accepted deliberately: (a) in the BUCKETED
    * `mergeWarehouse` path the first action over the guarded snapshot
    * is `changedKeyBuckets`' detection collect, which runs BEFORE any
    * write — duplicates abort with zero side effects; (b) in the
    * non-bucketed path the failure lands inside the staging write, and
    * the partially-written (uncommitted, unreferenced) dir is exactly
    * the orphan class `vacuum` reclaims after its grace window — the
    * catalog never sees it; (c) `merge()` returns a LAZY frame, so a
    * caller that builds but never executes it defers the check to
    * whatever action finally runs the plan — the guard travels with
    * the frame.
    */
  private def guardUniqueKeys(snapshot: DataFrame, keys: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    snapshot
      .withColumn("__kcnt", count(lit(1)).over(w))
      .filter(assert_true(col("__kcnt") <= 1,
        concat(lit(s"SCD2 snapshot has multiple rows for one key of " +
            s"(${keys.mkString(", ")}): "),
          concat_ws("|", keys.map(k => col(k).cast("string")): _*))).isNull)
      .drop("__kcnt")
  }

  /** The two load sources share one classification contract: given the
    * aliased full-outer join of the source frame (`s`, with
    * `__sexists`) against the current slice (`d`, with `__dexists`),
    * produce the (isInsert, isDelete, isChange) predicates. A FULL
    * SNAPSHOT classifies by presence (absent-from-snapshot = delete); a
    * CHANGE DELTA classifies by its `change_type` rows (absent-from-
    * delta = untouched). Everything downstream — the array-explode
    * history form and the two-branch warehouse form — is source-shape
    * agnostic.
    */
  private def snapshotClassify(compareCols: Seq[String]): (Column, Column, Column) = {
    val isInsert = col("d.__dexists").isNull
    val isDelete = col("s.__sexists").isNull
    (isInsert, isDelete, !isInsert && !isDelete && Scd1.anyChanged(compareCols))
  }

  private def deltaClassify(compareCols: Seq[String]): (Column, Column, Column) = {
    val inChg = col("s.__sexists").isNotNull
    val hasCur = col("d.__dexists").isNotNull
    val isDelete = inChg && col("s.change_type") === "delete"
    val isChange = inChg && !isDelete && hasCur && Scd1.anyChanged(compareCols)
    (inChg && !isDelete && !hasCur, isDelete, isChange)
  }

  /** The shared single-frame core: split the history, full-outer join
    * the prepped source (`__sexists`, aliased `s`) against the current
    * slice, and emit 0-2 rows per key via one array-explode (no cached
    * second pass). The three row shapes share one struct schema.
    */
  private def historize(history: DataFrame, s: DataFrame, keys: Seq[String],
                        compareCols: Seq[String], asOf: java.sql.Timestamp,
                        classify: (Column, Column, Column)): DataFrame = {
    val attrs = keys ++ compareCols
    val closed = history.filter(!col("is_current"))
      .select((attrs ++ auditCols).map(col): _*)
    val d = history.filter(col("is_current"))
      .select((attrs ++ auditCols).map(col): _*)
      .withColumn("__dexists", lit(1))
      .alias("d")
    val on = keys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _)
    val (isInsert, isDelete, isChange) = classify
    val hasCur = col("d.__dexists").isNotNull

    def shape(side: String, from: Column, to: Column, cur: Column): Column =
      struct(attrs.map(c => col(s"$side.$c").as(c)) ++ Seq(
        from.as("valid_from"), to.as("valid_to"), cur.as("is_current")): _*)
    val oldKept   = shape("d", col("d.valid_from"), col("d.valid_to"), col("d.is_current"))
    val oldClosed = shape("d", col("d.valid_from"), lit(asOf), lit(false))
    val newOpen   = shape("s", lit(asOf), lit(null).cast("timestamp"), lit(true))

    // a delete with no current row (delta redelivery) contributes
    // NOTHING: slice to a typed empty array, explode drops the row.
    // Snapshot loads never hit that branch (their delete ⇒ d exists).
    val rows = when(isInsert, array(newOpen))
      .when(isDelete && hasCur, array(oldClosed))
      .when(isDelete && !hasCur, slice(array(oldClosed), 1, 0))
      .when(isChange, array(oldClosed, newOpen))
      .otherwise(array(oldKept))
    val merged = s.join(d, on, "full")
      .select(explode(rows).as("r"))
      .select((attrs ++ auditCols).map(c => col(s"r.$c").as(c)): _*)
    closed.unionAll(merged)
  }

  /** Merge a full snapshot taken at `asOf` into the history. */
  def merge(history: DataFrame, snapshotIn: DataFrame, keys: Seq[String],
            compareCols: Seq[String], asOf: java.sql.Timestamp): DataFrame = {
    val attrs = keys ++ compareCols
    val s = guardUniqueKeys(snapshotIn, keys)
      .select(attrs.map(col): _*)
      .withColumn("__sexists", lit(1))
      .alias("s")
    historize(history, s, keys, compareCols, asOf,
      snapshotClassify(compareCols))
  }

  /** Apply a CHURN-SIZED change-row frame — the [[ChangeFeed.diff]]
    * row convention (`change_type` ∈ insert/update_pre/update_post/
    * delete, keys, value columns) — to an SCD2 history at load time
    * `asOf`. This is delta-driven historization: the consumer that
    * turns a CDC feed (this engine's materialized change log, or any
    * Debezium-shaped source) into a Type-2 dim WITHOUT reconstructing
    * full snapshots. `update_pre` rows are dropped up front — the
    * after-image carries everything the apply needs.
    *
    * Per change row against the current slice:
    *  - insert/update_post, no current row  → open (asOf, NULL, true)
    *  - insert/update_post, changed (null-safe) → close current at
    *    asOf + open new
    *  - insert/update_post, unchanged → current passes through —
    *    REDELIVERY of an already-applied change is a no-op, which
    *    makes an applied history a FIXPOINT of its own deltas
    *  - delete, current row → close at asOf
    *  - delete, no current row → nothing (already absent)
    *  - keys the change frame never names pass through verbatim.
    *
    * Equivalence (spec-pinned): for d = diff(prev, next),
    * `applyChanges(hist_prev, d, asOf) == merge(hist_prev, next,
    * asOf)` row for row. The win is cost: [[merge]] joins the FULL
    * snapshot against the current slice; this joins only the churn.
    */
  def applyChanges(history: DataFrame, changes: DataFrame, keys: Seq[String],
                   compareCols: Seq[String],
                   asOf: java.sql.Timestamp): DataFrame = {
    val attrs = keys ++ compareCols
    val s = guardUniqueKeys(
        changes.filter(col("change_type") =!= "update_pre"), keys)
      .select(col("change_type") +: attrs.map(col): _*)
      .withColumn("__sexists", lit(1))
      .alias("s")
    historize(history, s, keys, compareCols, asOf,
      deltaClassify(compareCols))
  }

  /** [[applyChanges]] into the two-table warehouse layout (see
    * [[mergeWarehouse]] for the layout contract), inside the CALLER'S
    * transaction so a consumer can apply several versions atomically.
    * The cost story improves on the snapshot merge twice over: the
    * change frame is already churn-sized (no full-snapshot join), and
    * with the current table bucketed on the merge key the touched
    * buckets are read STRAIGHT off the change keys — no
    * `changedKeyBuckets` detection join at all. A load rewrites
    * ~touched/B of the current slice and appends only the rows it
    * closes; an empty delta writes nothing.
    */
  def applyChangesWarehouse(txn: Txn, currentTable: String,
                            closedTable: String, changes: DataFrame,
                            keys: Seq[String], compareCols: Seq[String],
                            asOf: java.sql.Timestamp): Unit = {
    val attrs = keys ++ compareCols
    val chg = guardUniqueKeys(
        changes.filter(col("change_type") =!= "update_pre"), keys)
      .select(col("change_type") +: attrs.map(col): _*)

    def branches(cur: DataFrame, c: DataFrame): (DataFrame, DataFrame) =
      currentBranches(cur,
        c.withColumn("__sexists", lit(1)).alias("s"),
        keys, attrs, asOf, deltaClassify(compareCols))

    txn.wh.bucketSpec.get(currentTable) match {
      // same soundness guard as mergeWarehouse/Merge.into: pruning is
      // only valid when the merge key IS the bucket key
      case Some((bucketKey, n)) if keys == Seq(bucketKey) &&
          txn.currentDirs(currentTable).length == 1 =>
        val chgP = chg.persist()
        try {
          val touched = chgP
            .select(pmod(hash(keys.map(col): _*), lit(n)).as("b"))
            .distinct().collect().map(_.getInt(0)).toIndexedSeq // ≤ n
          if (touched.nonEmpty) {
            val inT = Scd1.inBuckets(keys, n, touched)
            val curT = txn.read(currentTable).filter(inT).persist()
            try {
              val (newCur, closedRows) = branches(curT, chgP)
              txn.overwriteBuckets(currentTable, newCur, touched)
              txn.append(closedTable, closedRows)
            } finally curT.unpersist()
          } // empty delta: the history is already exact — write nothing
        } finally chgP.unpersist()
      case _ =>
        val (newCur, closedRows) = branches(txn.read(currentTable), chg)
        txn.overwrite(currentTable, newCur)
        txn.append(closedTable, closedRows)
    }
  }

  /** Point-in-time lookup: the version of each key valid at `at` —
    * the query an SCD2 dim exists to answer (joins from facts use the
    * same interval predicate). Half-open intervals: [valid_from,
    * valid_to); a row whose valid_to equals `at` is already superseded.
    */
  def asOf(history: DataFrame, at: java.sql.Timestamp): DataFrame =
    history.filter(col("valid_from") <= lit(at) &&
      (col("valid_to").isNull || col("valid_to") > lit(at)))

  /** NET-EFFECT change feed between two points in time, extracted from
    * the history: compare the image valid at `from` with the image
    * valid at `to` and emit one row per key whose version differs —
    * `insert` (no version at `from`), `delete` (no version at `to`),
    * `update` (a different version at each), with before/after
    * attributes (`b_*` / `a_*`, null on the absent side). Keys whose
    * version survived the whole window produce nothing, however many
    * loads ran — this is the downstream-consumer CDC contract (give me
    * what changed since I last looked), the SCD2 sibling of the
    * Warehouse's catalog-version `diffVersions`.
    *
    * Scale shape: two interval filters over the history (with the
    * two-table layout, each touches the current slice plus only closed
    * rows overlapping the window) and ONE key-hash full-outer join of
    * two dim-sized images.
    */
  def changesBetween(history: DataFrame, keys: Seq[String],
                     from: java.sql.Timestamp,
                     to: java.sql.Timestamp): DataFrame = {
    require(from.before(to), "from must precede to")
    val attrs = history.columns.filterNot(auditCols.contains).filterNot(keys.contains)
    val b = asOf(history, from).withColumn("__b", lit(1)).alias("b")
    val a = asOf(history, to).withColumn("__a", lit(1)).alias("a")
    val on = keys.map(k => col(s"b.$k") === col(s"a.$k")).reduce(_ && _)
    val isInsert = col("b.__b").isNull
    val isDelete = col("a.__a").isNull
    val isUpdate = !isInsert && !isDelete &&
      col("b.valid_from") =!= col("a.valid_from")
    val op = when(isInsert, lit("insert")).when(isDelete, lit("delete"))
      .otherwise(lit("update"))
    b.join(a, on, "full")
      .filter(isInsert || isDelete || isUpdate)
      .select(keys.map(k => coalesce(col(s"b.$k"), col(s"a.$k")).as(k)) ++
        Seq(op.as("op")) ++
        attrs.map(c => col(s"b.$c").as(s"b_$c")) ++
        attrs.map(c => col(s"a.$c").as(s"a_$c")): _*)
  }

  /** SCD2 merge INTO THE WAREHOUSE, in the layout that scales: the
    * history is two tables — `currentTable` (one open row per live key:
    * attrs + `valid_from`), bucketed on the key like any SCD1 dim, and
    * `closedTable` (attrs + `valid_from` + `valid_to`), APPEND-ONLY.
    * A load then costs what it changes, not what the history holds:
    *
    *  - the current slice merges exactly like the bucketed SCD1 dim —
    *    changed-key buckets detected first (driver array bounded by the
    *    bucket count), both join inputs pruned to those buckets, zero
    *    current-side Exchange, untouched bucket files hard-linked;
    *    a no-change load writes NOTHING;
    *  - closed versions are never rewritten, re-read, or re-shuffled:
    *    each load APPENDS just the rows it closes. The ever-growing
    *    part of the history is strictly write-once.
    *
    * Both writes commit in ONE transaction (the pair is atomic — a
    * reader never sees a version closed in `closedTable` while still
    * open in `currentTable`). Full history = [[readHistory]].
    */
  /** The shared two-table core: one full-outer join of the (possibly
    * bucket-pruned) current slice against the prepped source, consumed
    * twice as (newCurrent, newlyClosed). One CONDITIONAL projection
    * instead of a two-branch union — the union form executed the
    * full-outer join once per branch (plus once for newlyClosed = 3×
    * the dominant join cost per load). Source-shape agnostic like
    * [[historize]]: the classify tuple is the only difference between
    * a snapshot load and a delta apply.
    */
  private def currentBranches(cur: DataFrame, s: DataFrame,
                              keys: Seq[String], attrs: Seq[String],
                              asOf: java.sql.Timestamp,
                              classify: (Column, Column, Column))
      : (DataFrame, DataFrame) = {
    val d = cur.withColumn("__dexists", lit(1)).alias("d")
    val on = keys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _)
    val joined = s.join(d, on, "full")
    val (isInsert, isDelete, isChange) = classify
    val hasCur = col("d.__dexists").isNotNull
    val takeNew = isInsert || isChange
    val newCurrent = joined.filter(!isDelete)
      .select(attrs.map(c =>
          when(takeNew, col(s"s.$c")).otherwise(col(s"d.$c")).as(c)) :+
        when(takeNew, lit(asOf)).otherwise(col("d.valid_from")).as("valid_from"): _*)
    // hasCur is vacuous for a snapshot source (its delete ⇒ d exists)
    // and load-bearing for a delta (delete-of-absent closes nothing)
    val newlyClosed = joined.filter(hasCur && (isDelete || isChange))
      .select(attrs.map(c => col(s"d.$c").as(c)) ++
        Seq(col("d.valid_from").as("valid_from"), lit(asOf).as("valid_to")): _*)
    (newCurrent, newlyClosed)
  }

  def mergeWarehouse(wh: Warehouse, currentTable: String, closedTable: String,
                     snapshot: DataFrame, keys: Seq[String],
                     compareCols: Seq[String],
                     asOf: java.sql.Timestamp): Unit = {
    val attrs = keys ++ compareCols
    val txn = wh.begin()
    val snapC = guardUniqueKeys(snapshot.select(attrs.map(col): _*), keys)

    def branches(cur: DataFrame, snap: DataFrame): (DataFrame, DataFrame) =
      currentBranches(cur,
        snap.withColumn("__sexists", lit(1)).alias("s"),
        keys, attrs, asOf, snapshotClassify(compareCols))

    wh.bucketSpec.get(currentTable) match {
      // the pruned path is sound only when the MERGE key is exactly the
      // table's bucket key: touched buckets are computed from
      // hash(keys), the carried-over files encode hash(bucketKey) — in
      // different hash spaces a changed row would be BOTH carried over
      // (old version) and rewritten (new version). Same guard as
      // Merge.into; any other key set takes the full-overwrite path.
      case Some((bucketKey, n)) if keys == Seq(bucketKey) &&
          txn.currentDirs(currentTable).length == 1 =>
        val cur = txn.read(currentTable)
        val touched = Scd1.changedKeyBuckets(cur, snapC, keys, compareCols, n,
          deletesVisible = true)
        if (touched.nonEmpty) {
          val inT = Scd1.inBuckets(keys, n, touched.toIndexedSeq)
          // persist the touched-bucket-sized inputs: the current-slice
          // overwrite and the closed append are two Spark actions over
          // the same join, and without the cache each re-reads and
          // re-filters both sides
          val curT = cur.filter(inT).persist()
          val snapT = snapC.filter(inT).persist()
          try {
            val (newCur, closed) = branches(curT, snapT)
            txn.overwriteBuckets(currentTable, newCur, touched.toIndexedSeq)
            txn.append(closedTable, closed)
          } finally { curT.unpersist(); snapT.unpersist() }
        } // else: nothing changed — the history is already exact
      case _ =>
        val (newCur, closed) = branches(txn.read(currentTable), snapC)
        txn.overwrite(currentTable, newCur)
        txn.append(closedTable, closed)
    }
    txn.commit()
  }

  /** [[changesBetween]] over the two-table warehouse layout. Catalyst
    * pushes the two `asOf` interval predicates through the
    * [[readHistory]] union into both parquet scans, so each image read
    * touches the (dim-sized) current slice plus only the closed rows
    * whose intervals overlap the window — the ever-growing closed
    * table is scanned with `valid_from`/`valid_to` PushedFilters, not
    * in full (spec-gated).
    */
  def changesBetweenWarehouse(wh: Warehouse, currentTable: String,
                              closedTable: String, keys: Seq[String],
                              from: java.sql.Timestamp,
                              to: java.sql.Timestamp): DataFrame =
    changesBetween(readHistory(wh, currentTable, closedTable), keys, from, to)

  /** The full version history from the two-table warehouse layout, in
    * [[merge]]'s schema (`valid_to` NULL ⇔ `is_current`).
    */
  def readHistory(wh: Warehouse, currentTable: String,
                  closedTable: String): DataFrame =
    wh.read(closedTable).withColumn("is_current", lit(false))
      .unionByName(wh.read(currentTable)
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true)))

  /** Point-in-time fact enrichment: each fact row joins the dim VERSION
    * that was valid at its event time (`factTs`) — the query an SCD2
    * dim exists for. LEFT join: facts before the key's first version,
    * after its soft delete, or with no key at all keep their row with
    * null dim columns (silently dropping them would corrupt any
    * aggregate downstream).
    *
    * Scale shape: an EQUI join on the key with the interval predicate
    * as a residual filter — versions per key are few (one per change),
    * so the residual scans a handful of rows per fact, never a range
    * scan. Both sides hash-partition on the key; with the history
    * bucketed on the key (Warehouse layout) the dim side plans with no
    * Exchange, exactly like the SCD1 merge.
    */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame,
                      factKeys: Seq[String], dimKeys: Seq[String],
                      factTs: String): DataFrame = {
    val f = facts.alias("f")
    val h = history.alias("h")
    val on = factKeys.zip(dimKeys)
      .map { case (fk, dk) => col(s"f.$fk") === col(s"h.$dk") }
      .reduce(_ && _) &&
      col(s"h.valid_from") <= col(s"f.$factTs") &&
      (col(s"h.valid_to").isNull || col(s"h.valid_to") > col(s"f.$factTs"))
    val dimCols = history.columns.filterNot(dimKeys.contains)
    // a shared non-key name would emit TWO identically-named output
    // columns — every later select by name fails AMBIGUOUS_REFERENCE,
    // and a positional align() would misassign silently. Reject loudly;
    // the caller renames one side (or prefixes like changesBetween).
    val clash = facts.columns.toSet.intersect(dimCols.toSet)
    require(clash.isEmpty,
      s"fact and dim history share non-key column name(s): ${clash.toSeq.sorted.mkString(", ")} — rename before the point-in-time join")
    f.join(h, on, "left")
      .select(facts.columns.map(c => col(s"f.$c").as(c)) ++
        dimCols.map(c => col(s"h.$c").as(c)): _*)
  }
}
