package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, oracle-checkable sketch operators.
  *
  * A count-min sketch estimates per-key frequencies in O(width · depth)
  * space — the heavy-hitter primitive a 100 TB pipeline uses when exact
  * per-key counts (a full groupBy over billions of distinct keys) are
  * too expensive to keep. Estimates only ever OVER-count (collisions add,
  * `min` across depth rows tames them).
  *
  * Unlike library sketches (whose merge order perturbs nothing here but
  * whose hash seeds differ per engine), this one derives its `depth`
  * hash rows from fixed chunks of ONE md5 — integer-only arithmetic any
  * engine reproduces bit for bit, so the sketch, and every estimate, is
  * hash-comparable against a DuckDB oracle.
  */
object Sketches {
  /** Max depth: 4 independent 32-bit hash rows from one md5. */
  val MaxDepth = 4

  /** Composed (hex-string) form of the CMS bucket row — retained as the
    * bit-identity yardstick for [[graft.functions.QCms]] (spec-compared;
    * the hot path uses the native expression).
    */
  private[graft] def bucketsComposed(width: Int, depth: Int) =
    array((0 until depth).map { d =>
      expr(s"CAST(conv(substring(__h, ${1 + 8 * d}, 8), 16, 10) AS BIGINT) % $width")
    }: _*)

  /** Per-key estimated counts: every input row increments `depth`
    * counters (its key's bucket in each hash row); a key's estimate is
    * the MIN of its counters. Two aggregations and one join on
    * (d, bucket) — cost is O(rows · depth) map-side plus a
    * width·depth-bounded shuffle, never a per-key state explosion.
    * Output: (k, est_count).
    */
  def countMinEstimates(df: DataFrame, keyCol: String, width: Int,
                        depth: Int = MaxDepth): DataFrame = {
    require(depth >= 1 && depth <= MaxDepth, s"depth must be 1..$MaxDepth")
    require(width > 0, "width must be positive")
    // native bucket row: one md5 digest per key instead of a hex-string
    // md5 plus `depth` substring/conv parses — bit-identical positions
    // (see QCms), so the oracle is unchanged
    def withBuckets(in: DataFrame): DataFrame = in
      .select(col("k"), posexplode(
        graft.functions.QCms.bucketsCol(col("k"), width, depth)).as(Seq("d", "bucket")))
    val contrib = withBuckets(df.select(col(keyCol).cast("string").as("k")))
    val counters = contrib.groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
    val keys = withBuckets(df.select(col(keyCol).cast("string").as("k")).distinct())
    keys.join(counters, Seq("d", "bucket"))
      .groupBy("k").agg(min("cnt").as("est_count"))
  }
}
