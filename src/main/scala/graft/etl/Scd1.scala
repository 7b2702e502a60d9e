package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-1 snapshot merge.
  *
  * Reference semantics (`/root/reference/main.py`): insert new keys via
  * left-anti join (main.py:153-155), update rows whose compared columns
  * differ null-safely (inner join + per-column 3-clause disjunction,
  * main.py:183-212), delete keys absent from today's full snapshot
  * (main.py:329-343). The reference runs these as three separate SQL DML
  * statements against a mutable Postgres table.
  *
  * Here the whole merge is ONE left outer join with the snapshot on the
  * left: the snapshot drives the output (output keys == snapshot keys, so
  * deletes are implicit — K7), and the dim side classifies each row as
  * insert / update / unchanged (K4 / K6). One shuffle instead of three
  * passes; at 100 TB both sides hash-partition on the key, and a dim
  * stored bucketed by the key merges with no dim-side shuffle at all.
  * The per-column change predicate is Spark's native null-safe equality
  * `<=>` (Catalyst `EqualNullSafe`), replacing the reference's
  * `a <> b OR (a IS NULL AND b IS NOT NULL) OR ...` pattern verbatim.
  */
object Scd1 {

  /** True when any compared column differs between snapshot side `s`
    * and dim side `d`, treating NULL as a comparable value
    * (null→value and value→null both count as changes — main.py:201-209).
    */
  def anyChanged(compareCols: Seq[String], s: String = "s", d: String = "d"): Column =
    compareCols.map(c => !(col(s"$s.$c") <=> col(s"$d.$c"))).reduce(_ || _)

  /** Merge and tag every output row with its action:
    * 'insert' | 'update' | 'unchanged'. Output columns = snapshot's
    * (keys ++ compareCols) plus `action`. Deleted dim keys simply do not
    * appear (snapshot semantics).
    */
  def mergeTagged(dim: DataFrame, snapshot: DataFrame,
                  keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val d = dim
      .select((keys ++ compareCols).map(col): _*)
      .withColumn("__exists", lit(1))
      .alias("d")
    val s = snapshot.alias("s")
    val on = keys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _)
    val action = when(col("d.__exists").isNull, lit("insert"))
      .when(anyChanged(compareCols), lit("update"))
      .otherwise(lit("unchanged"))
    s.join(d, on, "left")
      .select((keys ++ compareCols).map(c => col(s"s.$c").as(c)) :+ action.as("action"): _*)
  }

  /** The key-hash buckets containing at least one insert / update /
    * delete — the ONLY buckets an SCD1 merge against a bucketed dim
    * needs to rewrite (an untouched bucket's merge output is its dim
    * content verbatim, so its files carry over byte-identical). Returned
    * as a driver array: cardinality is bounded by `nBuckets`, never by
    * the data — the one collect the partial-rewrite path performs.
    *
    * `deletesVisible = false` is the incremental-delta mode: absence
    * from the snapshot means "unchanged", not "deleted", so dim-only
    * rows (the whole point of a delta: almost all of them) never mark a
    * bucket and the detection join is delta-sized on one side.
    *
    * The bucket function `pmod(hash(key), n)` is Spark's own bucket
    * assignment (`HashPartitioning.partitionIdExpression` — Murmur3 mod
    * n), so these ids line up with the bucketed writer's file naming.
    */
  def changedKeyBuckets(dim: DataFrame, snapshot: DataFrame, keys: Seq[String],
                        compareCols: Seq[String], nBuckets: Int,
                        deletesVisible: Boolean): Array[Int] = {
    val d = dim.select((keys ++ compareCols).map(col): _*)
      .withColumn("__dexists", lit(1)).alias("d")
    val s = snapshot.select((keys ++ compareCols).map(col): _*)
      .withColumn("__sexists", lit(1)).alias("s")
    val on = keys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _)
    val changed = col("d.__dexists").isNull ||
      (if (deletesVisible) col("s.__sexists").isNull else lit(false)) ||
      anyChanged(compareCols)
    val keyExprs = keys.map(k => coalesce(col(s"s.$k"), col(s"d.$k")))
    s.join(d, on, if (deletesVisible) "full" else "left")
      .filter(changed)
      .select(pmod(hash(keyExprs: _*), lit(nBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
  }

  /** Row predicate: the row's key falls in one of `touched` buckets —
    * the filter that prunes BOTH merge inputs to the buckets actually
    * being rewritten.
    */
  def inBuckets(keys: Seq[String], nBuckets: Int, touched: Seq[Int]): Column =
    pmod(hash(keys.map(col): _*), lit(nBuckets)).isin(touched: _*)

  /** The plain merged dim image (no tag). */
  def merge(dim: DataFrame, snapshot: DataFrame,
            keys: Seq[String], compareCols: Seq[String]): DataFrame =
    mergeTagged(dim, snapshot, keys, compareCols).drop("action")

  /** Full-fidelity merge for warehouse dims carrying the reference's audit
    * columns. Snapshot must provide `create_dt` and `update_dt`; the dim
    * additionally has `processed_dt`.
    *
    *  - insert (main.py:147-156): attrs from snapshot,
    *    `create_dt = coalesce(update_dt, create_dt)`, `update_dt = NULL`,
    *    `processed_dt = runTs`.
    *  - update (main.py:183-212): attrs + `update_dt` from snapshot,
    *    `create_dt` kept from dim, `processed_dt = runTs`.
    *  - unchanged: dim row verbatim.
    *  - delete (main.py:329-343): dim keys absent from snapshot dropped.
    *
    * `runTs` is passed in, not `current_timestamp()`: Postgres `now()` is
    * statement-stable, so one timestamp per run keeps outputs
    * deterministic (SURVEY §2.8).
    */
  def mergeAudit(dim: DataFrame, snapshot: DataFrame, keys: Seq[String],
                 compareCols: Seq[String], runTs: java.sql.Timestamp): DataFrame = {
    val attrs = keys ++ compareCols
    val d = dim
      .select((attrs ++ Seq("create_dt", "update_dt", "processed_dt")).map(col): _*)
      .withColumn("__exists", lit(1))
      .alias("d")
    val s = snapshot.alias("s")
    val on = keys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _)
    val isInsert = col("d.__exists").isNull
    val isUpdate = !isInsert && anyChanged(compareCols)
    val cols: Seq[Column] =
      attrs.map(c => col(s"s.$c").as(c)) ++ Seq(
        when(isInsert, coalesce(col("s.update_dt"), col("s.create_dt")))
          .otherwise(col("d.create_dt")).as("create_dt"),
        when(isInsert, lit(null).cast("timestamp"))
          .when(isUpdate, col("s.update_dt"))
          .otherwise(col("d.update_dt")).as("update_dt"),
        when(isInsert || isUpdate, lit(runTs))
          .otherwise(col("d.processed_dt")).as("processed_dt"))
    s.join(d, on, "left").select(cols: _*)
  }

  /** Audit-carrying merge for an INCREMENTAL delta (rows changed since
    * the last watermark) instead of a full snapshot. Absence from the
    * delta means "unchanged", not "deleted" — so the join is FULL outer
    * and dim-only rows pass through verbatim; there is NO delete path
    * (a full snapshot is the only safe delete signal). Insert/update
    * audit semantics match [[mergeAudit]]. Same single key-shuffle at
    * scale, but the delta side is watermark-small — this is the 100 TB
    * path the reference's own (write-only) meta table begs for.
    */
  def mergeAuditIncremental(dim: DataFrame, delta: DataFrame, keys: Seq[String],
                            compareCols: Seq[String],
                            runTs: java.sql.Timestamp): DataFrame = {
    val attrs = keys ++ compareCols
    val d = dim
      .select((attrs ++ Seq("create_dt", "update_dt", "processed_dt")).map(col): _*)
      .withColumn("__dexists", lit(1))
      .alias("d")
    val s = delta.withColumn("__sexists", lit(1)).alias("s")
    val on = keys.map(k => col(s"s.$k") === col(s"d.$k")).reduce(_ && _)
    val isInsert = col("d.__dexists").isNull
    val isDimOnly = col("s.__sexists").isNull
    val isUpdate = !isInsert && !isDimOnly && anyChanged(compareCols)
    val cols: Seq[Column] =
      attrs.map(c =>
        when(isDimOnly, col(s"d.$c")).otherwise(col(s"s.$c")).as(c)) ++ Seq(
        when(isInsert, coalesce(col("s.update_dt"), col("s.create_dt")))
          .otherwise(col("d.create_dt")).as("create_dt"),
        when(isDimOnly, col("d.update_dt"))
          .when(isInsert, lit(null).cast("timestamp"))
          .when(isUpdate, col("s.update_dt"))
          .otherwise(col("d.update_dt")).as("update_dt"),
        when(isInsert || isUpdate, lit(runTs))
          .otherwise(col("d.processed_dt")).as("processed_dt"))
    s.join(d, on, "full").select(cols: _*)
  }

  /** [[mergeAuditIncremental]] as a WAREHOUSE write with the nightly
    * Pipeline's bucket-pruning discipline: when the dim is bucketed by
    * the (single) merge key, [[changedKeyBuckets]] finds the buckets
    * holding inserted/changed keys (delete detection off — absence
    * from a delta means "unchanged"), BOTH merge inputs prune to those
    * buckets, and only their files rewrite — the rest hard-link
    * byte-identically ([[Txn.overwriteBuckets]]). A delta that changes
    * nothing (e.g. an at-least-once replay of an already-applied
    * batch) writes nothing at all; an unbucketed dim falls back to the
    * full-image overwrite. Shared by the streamed CDC upsert
    * ([[graft.streaming.StreamingOps.scd1UpsertStream]]) so continuous
    * ingestion pays churn-sized writes like the nightly run does.
    */
  def upsertIncrementalWarehouse(txn: Txn, table: String, delta: DataFrame,
                                 keys: Seq[String], compareCols: Seq[String],
                                 runTs: java.sql.Timestamp): Unit = {
    val dimDf = txn.read(table)
    txn.wh.bucketSpec.get(table) match {
      case Some((bucketKey, n)) if keys == Seq(bucketKey) &&
          txn.currentDirs(table).length == 1 =>
        val touched = changedKeyBuckets(dimDf, delta, keys, compareCols, n,
          deletesVisible = false)
        if (touched.nonEmpty) {
          val inT = inBuckets(keys, n, touched.toIndexedSeq)
          txn.overwriteBuckets(table,
            mergeAuditIncremental(dimDf.filter(inT), delta.filter(inT),
              keys, compareCols, runTs),
            touched.toIndexedSeq)
        }
      case _ =>
        txn.overwrite(table,
          mergeAuditIncremental(dimDf, delta, keys, compareCols, runTs))
    }
  }
}
