package graft.streaming

import java.nio.file.Files
import graft.TestSpark
import graft.etl.{ChangeFeed, Warehouse}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming CDC chain: `ChangeFeed.materializeLog` (write side)
  * feeding `StreamingOps.changeFeedDeltas` (aggregate consumer) and
  * `StreamingOps.changeFeedReplica` (merge-applied replica). Pins:
  *
  *  - the log's rows per transition equal the batch `tableChanges`
  *    diff, stamped with the transition's target version;
  *  - catch-up is idempotent (a second `materializeLog` with no new
  *    commits appends nothing) and INCREMENTAL (only not-yet-logged
  *    transitions are appended);
  *  - a delta drain on a DURABLE checkpoint folds ONLY the new
  *    transitions into the checkpointed aggregation state — the
  *    re-emitted totals equal a direct recompute of the new image;
  *  - the replica equals the source image after each drain, and a
  *    FULL re-replay (fresh checkpoint, whole log) onto the
  *    already-current replica converges to the same image — the
  *    at-least-once-safe property the consumer's scaladoc claims.
  */
class StreamingChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("amount", LongType)))
  private val keys = Seq("id")

  private def img(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("id", "grp", "amount")

  private def mkWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("wh-cdf").toString,
      Map("t" -> schema), partitionSpec = Map.empty,
      bucketSpec = Map("t" -> ("id", 4)))

  private def commit(wh: Warehouse, df: DataFrame): Unit = {
    val t = wh.begin(); t.overwrite("t", df); t.commit()
  }

  private def logRows(logDir: String): DataFrame =
    spark.read.schema(ChangeFeed.logSchema(schema, keys)).parquet(logDir)

  // base, then two transitions exercising every change type
  private val v1 = img((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
  private val v2 = img((1L, "a", 11L), (3L, "b", 30L), (4L, "b", 40L)) // upd 1, del 2, ins 4
  private val v3 = img((1L, "a", 11L), (4L, "c", 41L), (5L, "a", 50L)) // del 3, upd 4, ins 5

  test("materializeLog appends each transition's diff once, stamped with its version") {
    val wh = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    commit(wh, v1); commit(wh, v2)
    val first = ChangeFeed.materializeLog(wh, "t", keys, logDir)
    assert(first == Seq(wh.versions()(1)))

    // logged rows == the batch diff for that transition
    val expected = ChangeFeed.tableChanges(wh, "t", wh.versions()(0),
      wh.versions()(1), keys)
    assert(logRows(logDir).drop("_commit_version")
      .exceptAll(expected).isEmpty &&
      expected.exceptAll(logRows(logDir).drop("_commit_version")).isEmpty)

    // idempotent: nothing new to log, nothing appended
    assert(ChangeFeed.materializeLog(wh, "t", keys, logDir).isEmpty)
    assert(logRows(logDir).count() == expected.count())

    // incremental: a third commit logs ONLY the new transition
    commit(wh, v3)
    val second = ChangeFeed.materializeLog(wh, "t", keys, logDir)
    assert(second == Seq(wh.versions()(2)))
    val vs = wh.versions()
    assert(logRows(logDir).filter(col("_commit_version") === vs(2))
      .drop("_commit_version")
      .exceptAll(ChangeFeed.tableChanges(wh, "t", vs(1), vs(2), keys)).isEmpty)
  }

  test("delta drain folds only new transitions into checkpointed state") {
    val wh = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    commit(wh, v1); commit(wh, v2)
    ChangeFeed.materializeLog(wh, "t", keys, logDir)

    val sign = when(col("change_type").isin("insert", "update_post"),
      lit(1L)).otherwise(lit(-1L))
    def drain(): Map[String, (Long, Long)] =
      StreamingOps.changeFeedDeltas(spark, logDir,
        ChangeFeed.logSchema(schema, keys), Seq("grp"),
        Seq(sum(sign).as("dn"), sum(col("amount") * sign).as("da")), ckpt)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def applied(img0: DataFrame, deltas: Map[String, (Long, Long)],
                target: DataFrame): Unit = {
      val base = img0.groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("amount").as("a"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val merged = (base.keySet ++ deltas.keySet).map { g =>
        val (bn, ba) = base.getOrElse(g, (0L, 0L))
        val (dn, da) = deltas.getOrElse(g, (0L, 0L))
        g -> (bn + dn, ba + da)
      }.filter(_._2._1 != 0L).toMap
      val direct = target.groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("amount").as("a"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(merged == direct)
    }
    applied(v1, drain(), v2)

    // grow the log, drain the SAME checkpoint: only the new transition
    // streams, the checkpointed state carries the old sums forward
    commit(wh, v3)
    ChangeFeed.materializeLog(wh, "t", keys, logDir)
    applied(v1, drain(), v3)
  }

  test("replica tracks the source; full re-replay converges, not corrupts") {
    val src = mkWh()
    val logDir = Files.createTempDirectory("cdf-log").toString
    val ckpt = Files.createTempDirectory("cdf-ckpt").toString
    commit(src, v1); commit(src, v2)
    ChangeFeed.materializeLog(src, "t", keys, logDir)

    val replica = mkWh()
    commit(replica, v1) // seed with the log's starting image
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir, ckpt)
    assert(same(replica.read("t"), v2))

    commit(src, v3)
    ChangeFeed.materializeLog(src, "t", keys, logDir)
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir, ckpt)
    assert(same(replica.read("t"), v3))

    // checkpoint reset: the WHOLE log replays in one batch onto the
    // already-current replica — per-version convergent merges land on
    // the same final image (upsert-same-value / delete-absent no-op)
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir,
      Files.createTempDirectory("cdf-ckpt2").toString)
    assert(same(replica.read("t"), v3))
  }
}
