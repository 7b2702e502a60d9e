package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join as a HASH join, not a nested loop.
  *
  * A theta join on `p BETWEEN s AND e` plans as
  * BroadcastNestedLoopJoin/CartesianProduct — O(|points|·|intervals|)
  * comparisons, a scale-killer. This operator rewrites it to the classic
  * bucketized form:
  *
  *  1. each interval EXPLODES into the coarse buckets it spans
  *     (`explode(sequence(bucket(s), bucket(e)))` — codegen'd, fan-out =
  *     span/bucketWidth + 1);
  *  2. each point maps to its single bucket;
  *  3. equi-join on the bucket (hash exchange, broadcastable small side);
  *  4. the exact `BETWEEN` filter keeps true containments.
  *
  * Each (point, interval) pair meets in exactly ONE bucket — the point's
  * — so no dedup pass is needed. Cost scales with matches + interval
  * fan-out, never the cross product. Pick `bucketDays` near the median
  * interval span: narrower buckets inflate the interval explosion, wider
  * ones inflate the per-bucket candidate set.
  */
object RangeJoin {

  /** Join `points` (a DATE column `pointCol`) against `intervals`
    * (inclusive DATE columns `startCol`..`endCol`). Output: every points
    * column + every intervals column, one row per true containment.
    * Column names must not collide across the two inputs.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    def bucket(c: Column): Column = floor(unix_date(c.cast("date")) / bucketDays)
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bucket",
        explode(sequence(bucket(col(startCol)), bucket(col(endCol)))))
    val pt = points.withColumn("__bucket", bucket(col(pointCol)))
    pt.join(iv, Seq("__bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }

  /** Interval-overlap join (inclusive endpoints) between two interval
    * sets, same bucketized-hash-join idea as [[pointInInterval]]. An
    * overlapping pair shares every bucket in the overlap span, so to
    * emit each pair EXACTLY ONCE (no distinct pass) the join keeps only
    * the pair's canonical bucket: the one containing
    * `greatest(aStart, bStart)` — the overlap's first day, which by
    * definition of overlap lies inside both spans.
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    def bucket(c: Column): Column = floor(unix_date(c.cast("date")) / bucketDays)
    val av = a.filter(col(aStart) <= col(aEnd))
      .withColumn("__bucket",
        explode(sequence(bucket(col(aStart)), bucket(col(aEnd)))))
    val bv = b.filter(col(bStart) <= col(bEnd))
      .withColumn("__bucket",
        explode(sequence(bucket(col(bStart)), bucket(col(bEnd)))))
    av.join(bv, Seq("__bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bucket") === bucket(greatest(col(aStart), col(bStart))))
      .drop("__bucket")
  }
}
