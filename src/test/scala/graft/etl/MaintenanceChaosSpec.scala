package graft.etl

import java.nio.file.Files
import java.util.ConcurrentModificationException
import java.util.concurrent.atomic.AtomicReference
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Chaos-style end-to-end for the background-maintenance stack
  * (round-9, VERDICT item 7): the OCC pieces — CAS-retry commits,
  * compaction abandon-on-DV-move / abandon-on-concurrent-overwrite,
  * vacuum's in-flight grace — are individually spec-pinned; this spec
  * runs them TOGETHER. 24 rounds of concurrent append + vectored
  * delete (+ compactOldest racing the writers every 4th round, vacuum
  * every 6th), with the table's expected content tracked as a serial
  * ledger: each round's delete targets only rows committed in PRIOR
  * rounds, so whatever interleaving the threads take inside a round,
  * the post-round image has exactly one correct answer. The invariant
  * checked every round (the "full-table hash" vs serial replay):
  *
  *   read("t") as a (id, v) multiset == appended-so-far minus deleted-so-far
  *
  * Writers retry on ConcurrentModificationException — that is the
  * documented OCC contract (first-committer-wins; the loser re-derives
  * from the new catalog). A failed commit's orphan dir must be
  * reclaimed by the final quiesced vacuum without changing content.
  */
class MaintenanceChaosSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("v", StringType)))

  private val Rounds = 24
  private val BatchSize = 40L

  /** Run `op` in an OCC retry loop: CME means another writer won the
    * CAS — re-derive and try again (bounded; persistent contention in a
    * 2-writer test would be a bug).
    */
  private def occRetry(label: String)(op: () => Unit): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      try { op(); done = true }
      catch {
        case _: ConcurrentModificationException if attempts < 10 =>
          Thread.sleep(10L * attempts)
        case e: ConcurrentModificationException =>
          throw new AssertionError(s"$label: still conflicting after $attempts tries", e)
      }
    }
  }

  private def inThread(err: AtomicReference[Throwable])(body: => Unit): Thread = {
    val t = new Thread(() =>
      try body catch { case e: Throwable => err.compareAndSet(null, e) })
    t.start(); t
  }

  test(s"append + vectored delete + compaction + vacuum race for $Rounds rounds; content equals the serial ledger") {
    val wh = new Warehouse(spark,
      Files.createTempDirectory("wh-chaos").toString, Map("t" -> schema),
      partitionSpec = Map.empty, bucketSpec = Map.empty)

    // the serial ledger: what the table must contain after each round
    var expected = Map.empty[Long, String]

    (1 to Rounds).foreach { r =>
      val base = r * 1000L
      val batch = (1L to BatchSize).map(i => (base + i, s"r$r-$i"))
      // delete targets: ids committed in round r-1 (never this round's —
      // that keeps the ledger exact under any in-round interleaving)
      val delIds = if (r > 1)
        (1L to BatchSize).map(_ + (r - 1) * 1000L).filter(_ % 10 == 3)
      else Seq.empty[Long]

      val err = new AtomicReference[Throwable](null)
      val threads = Seq(
        inThread(err) {
          occRetry(s"append r$r") { () =>
            val t = wh.begin()
            t.append("t", batch.toDF("id", "v"))
            t.commit()
          }
        }) ++
        (if (delIds.nonEmpty) Seq(inThread(err) {
          occRetry(s"delete r$r") { () =>
            val t = wh.begin()
            val n = t.deleteVectored("t", col("id").isin(delIds: _*))
            assert(n == delIds.length,
              s"r$r: delete must tombstone exactly its targets, got $n")
            t.commit()
          }
        }) else Nil) ++
        (if (r % 4 == 0) Seq(inThread(err) {
          wh.compactOldest("t", keep = 2)
        }) else Nil) ++
        (if (r % 6 == 0) Seq(inThread(err) {
          wh.vacuum() // default grace: must never touch in-flight dirs
        }) else Nil)
      threads.foreach(_.join(120000))
      assert(threads.forall(!_.isAlive), s"r$r: a worker thread hung")
      if (err.get() != null) throw err.get()

      expected = expected ++ batch -- delIds
      val got = wh.read("t").collect()
        .map(row => row.getLong(0) -> row.getString(1)).toMap
      assert(got.size == wh.read("t").count().toInt,
        s"r$r: duplicate ids in the table image")
      assert(got == expected,
        s"r$r: table image diverged from the serial ledger " +
          s"(missing=${(expected.keySet -- got.keySet).toSeq.sorted.take(5)}, " +
          s"extra=${(got.keySet -- expected.keySet).toSeq.sorted.take(5)})")
    }

    // compaction actually bounded the dir count across 24 appends
    assert(wh.catalog()("t").length <= 8,
      s"compaction must bound dir growth, got ${wh.catalog()("t").length}")

    // quiesced vacuum: reclaims retired/orphaned dirs, changes nothing
    val before = wh.read("t").collect().map(_.toSeq).toSet
    val removed = wh.vacuum(graceMs = 0L)
    assert(removed > 0,
      "24 rounds of append+compaction must leave retired dirs for vacuum")
    assert(wh.read("t").collect().map(_.toSeq).toSet == before,
      "vacuum must not change the committed image")
  }
}
