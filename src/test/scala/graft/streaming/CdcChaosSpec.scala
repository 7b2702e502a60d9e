package graft.streaming

import java.nio.file.Files
import graft.TestSpark
import graft.etl.{ChangeFeed, Warehouse}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Chaos-style e2e for the CDC tail: N source commits of
  * deterministic-but-irregular mutations, log catch-ups at uneven
  * cadence (so drains see multi-version batches), replica drains on a
  * durable checkpoint interleaved with zero-change commits and a
  * mid-run source vacuum — asserting after EVERY drain that the
  * replica equals the source image, and at the end that a fresh-
  * checkpoint full replay converges. The serial-replay analogue of
  * MaintenanceChaosSpec, aimed at the log/consumer machinery instead
  * of the warehouse's OCC.
  */
class CdcChaosSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("amount", LongType)))
  private val keys = Seq("id")

  private def mkWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("cdc-chaos").toString,
      Map("t" -> schema), partitionSpec = Map.empty,
      bucketSpec = Map("t" -> ("id", 4)))

  /** Round i's image: fully determined by i, with churn that exercises
    * every change class over time — deletes (i-dependent modulus),
    * updates (amount recomputed), inserts (key range grows), and
    * round-trips (a key deleted in round i reappears in round i+2 with
    * its old value when i is even).
    */
  private def image(i: Int): DataFrame = {
    val rows = (1L to (20L + i)).filter(k => (k + i) % 7 != 0).map { k =>
      val amount = if (k % 3 == i % 3) 100L * k + i else 100L * k
      (k, s"g${k % 4}", amount)
    }
    rows.toDF("id", "grp", "amount")
  }

  test("12 rounds of commits, uneven catch-ups, interleaved drains: replica tracks exactly") {
    val src = mkWh()
    val logDir = Files.createTempDirectory("cdc-chaos-log").toString
    val ckpt = Files.createTempDirectory("cdc-chaos-ckpt").toString

    def commit(df: DataFrame): Unit = {
      val t = src.begin(); t.overwrite("t", df); t.commit()
    }
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    commit(image(0))
    val replica = mkWh()
    locally { val t = replica.begin(); t.overwrite("t", image(0)); t.commit() }

    (1 to 12).foreach { i =>
      commit(image(i))
      if (i % 4 == 0) commit(image(i)) // zero-change transition
      if (i % 2 == 0 || i == 12) {
        // catch-up sees 1-3 versions per call — multi-version batches
        val logged = ChangeFeed.materializeLog(src, "t", keys, logDir)
        assert(logged == logged.sorted)
        StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir, ckpt)
        assert(same(replica.read("t"), image(i)),
          s"replica diverged from source after round $i")
      }
      if (i == 6) {
        // vacuum that RETAINS the logged high-water version — the
        // legal maintenance overlap; materializeLog keeps working
        src.vacuum(retainVersions = 3, graceMs = 0)
      }
    }

    // end state: fresh-checkpoint full replay onto the current replica
    // converges (net-merge application is idempotent on applied state)
    StreamingOps.changeFeedReplica(spark, replica, "t", keys, logDir,
      Files.createTempDirectory("cdc-chaos-ckpt2").toString)
    assert(same(replica.read("t"), image(12)))

    // and the log's net over all transitions equals the direct diff
    val logSch = ChangeFeed.logSchema(schema, keys)
    val net = ChangeFeed.netChanges(
      spark.read.schema(logSch).parquet(ChangeFeed.logGlob(logDir)), keys)
    assert(same(net, ChangeFeed.diff(image(0), image(12), keys)))
  }
}
