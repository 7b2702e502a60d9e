package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the left-outer stream-stream join's emission semantics on
  * crafted boundary data, then the fixture-level equivalence the
  * `q_stream_outer_join` oracle mirrors:
  *
  *  - matched pairs emit regardless of the watermark;
  *  - an unmatched click emits null-padded once the watermark proves
  *    no future purchase can match (`purchase_ts <= click_ts` ⇒ the
  *    PURCHASE-side watermark must pass the click's OWN timestamp —
  *    not click+range — with the exact </<= edge and millisecond
  *    truncation pinned below);
  *  - unmatched purchases (right side of a left join) never emit.
  */
class StreamingOuterJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def craftedDir(rows: Seq[(Long, Long, Long, String)]): String =
    StreamFixtures.craftedEvents(spark, rows)

  test("outer emission: purchase-side watermark must pass the click's own " +
      "timestamp; matches emit regardless; unmatched purchases never emit") {
    val S = 1000000L // 1 second in micros
    // watermark drivers: clicks max = 5000s, purchases max = 5000s
    val dir = craftedDir(Seq(
      (1L, 1L, 1000 * S, "click"), (2L, 1L, 1000 * S, "purchase"), // match
      (3L, 2L, 1000 * S, "click"), // unmatched, far behind wm → outer
      (4L, 4L, 2000 * S, "click"), // unmatched; click+1h(5600s) > wm(5000s)
      //   but click(2000s) < wm → emitted IFF the threshold is the
      //   click's own ts, not click+range
      (5L, 3L, 5000 * S, "click"), // unmatched, exactly AT the watermark
      (6L, 99L, 5000 * S + 500, "purchase"), // right-side orphan + wm driver
      (7L, 5L, 5000 * S + 300, "click"))) // inside the final partial ms
    // watermarks are ms-TRUNCATED maxima per side: clicks 5000.0003s →
    // 5000s, purchases 5000.0005s → 5000s; join eviction uses the min
    val out = StreamingOps.clickPurchaseStreamOuterJoin(spark, dir)
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(_.toString)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, Some("2")), // the match
      (3L, None), // outer: 1000s < 5000s
      (4L, None) // outer: threshold is the click's OWN ts
      // click id5 at exactly wm: held (eviction needs wm to PASS it);
      // click id7 inside the truncated-away partial ms: held;
      // purchase id6: right side of a left join, never emitted
    ), s"observed (click_id, purchase_id): $out")
  }

  test("fixture equivalence: streamed left-outer == batch left join + " +
      "watermark-gated outer rows") {
    val dir = "/root/testdata/sf0.001"
    // multiset compare (sorted Seq, not Set): a duplicate emission —
    // e.g. a matched click ALSO emitted null-padded at eviction —
    // must fail, and a Set would collapse it
    val streamed = StreamingOps.clickPurchaseStreamOuterJoin(spark, dir)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
        Ordering.by((s: Seq[String]) => s.mkString("|")))

    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    // each side's watermark derives from its OWN events, ms-truncated;
    // the join's eviction uses the min of the two
    val wmUs = math.min(
      clicks.agg(max(unix_micros(col("click_ts")))).head().getLong(0),
      purchases.agg(max(unix_micros(col("purchase_ts")))).head().getLong(0)
    ) / 1000 * 1000
    val joined = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
          col("purchase_ts") <= col("click_ts"), "left_outer")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))
    val batch = joined
      .filter(col("purchase_id").isNotNull ||
        unix_micros(col("click_ts")) < wmUs)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
        Ordering.by((s: Seq[String]) => s.mkString("|")))
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
