package graft.etl

import java.sql.Timestamp
import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property pin for the net-effect CDC contract: against an
  * independent in-memory SCD2 simulation, `changesBetween` must agree
  * for EVERY window of every randomized load sequence — including the
  * cases that make version-based diffing subtle: a key deleted then
  * revived with the SAME value inside the window is an `update` (its
  * version changed even though its attributes didn't), and a key that
  * flip-flopped but ended on its original VERSION (never possible —
  * versions never resurrect) must not appear at all.
  */
class Scd2ChangesPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val times = (1 to 4).map(d => Timestamp.valueOf(f"2024-01-0$d 00:00:00"))

  private def snapDf(s: Map[String, Int]): DataFrame =
    s.toSeq.sortBy(_._1).toDF("k", "v")

  test("changesBetween matches an independent version-tracking reference on random histories") {
    val rng = new Random(42)
    for (scenario <- 1 to 8) {
      // random snapshots over a small key space; ~30% of keys absent per
      // load makes deletes and revivals frequent
      val keys = (0 until 8).map(i => s"k$i")
      val snaps = times.map { _ =>
        keys.flatMap(k => if (rng.nextDouble() < 0.7)
          Some(k -> rng.nextInt(3)) else None).toMap
      }

      // engine history
      var hist = Scd2.initial(snapDf(snaps.head), Seq("k"), Seq("v"), times.head)
      times.tail.zip(snaps.tail).foreach { case (t, s) =>
        hist = Scd2.merge(hist, snapDf(s), Seq("k"), Seq("v"), t)
      }
      val histDf = hist.cache()

      // reference: replay loads, tracking (value, validFrom) per live key
      var state = Map.empty[String, (Int, Timestamp)]
      val images = scala.collection.mutable.ArrayBuffer[Map[String, (Int, Timestamp)]]()
      times.zip(snaps).foreach { case (t, s) =>
        state = (state.keySet ++ s.keySet).flatMap { k =>
          (state.get(k), s.get(k)) match {
            case (_, None)          => None                       // delete
            case (None, Some(v))    => Some(k -> (v, t))          // insert
            case (Some((ov, of)), Some(v)) =>
              Some(k -> (if (v == ov) (ov, of) else (v, t)))      // change?
          }
        }.toMap
        images += state
      }

      for (i <- times.indices; j <- times.indices if i < j) {
        val (bi, aj) = (images(i), images(j))
        val expected = (bi.keySet ++ aj.keySet).flatMap { k =>
          (bi.get(k), aj.get(k)) match {
            case (None, Some((av, _)))  => Some((k, "insert", None, Some(av)))
            case (Some((bv, _)), None)  => Some((k, "delete", Some(bv), None))
            case (Some((bv, bf)), Some((av, af))) if bf != af =>
              Some((k, "update", Some(bv), Some(av)))
            case _ => None                                        // version survived
          }
        }
        val got = Scd2.changesBetween(histDf, Seq("k"), times(i), times(j))
          .collect().map(r => (r.getString(0), r.getString(1),
            if (r.isNullAt(2)) None else Some(r.getInt(2)),
            if (r.isNullAt(3)) None else Some(r.getInt(3)))).toSet
        assert(got == expected,
          s"scenario $scenario window (${i + 1},${j + 1}): got $got\nexpected $expected\nsnaps $snaps")
      }
      histDf.unpersist()
    }
  }
}
