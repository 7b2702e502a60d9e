package graft.operators

import graft.functions.QBloom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-joins: build a deterministic [[QBloom]] filter from
  * the small side's keys and apply it as a `Filter` on the big side
  * BELOW the join, so non-candidate rows die in the scan stage instead
  * of crossing the shuffle. No false negatives ⇒ results are identical
  * to the plain join (the oracle runs the plain SQL); false positives
  * only cost shuffle bytes.
  */
object BloomJoin {

  /** `big ⋉ small` on `bigKey = smallKey`, Bloom-pruned. */
  def semi(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
           mBits: Long = 1L << 17, k: Int = 5): DataFrame = {
    val bloom = QBloom.build(small, col(smallKey), mBits, k)
    big.filter(bloom.mightContain(col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }

  /** The keys of `big` that MIGHT appear in `small` — the Bloom-pruned
    * right side for a `small LEFT ANTI big` pattern (fact-dedup appends:
    * stg anti-joins the fact table's ids; at scale the fact side is the
    * one worth pruning). No false negatives ⇒ every id that would have
    * matched a stg row still reaches the join.
    */
  def pruneIds(big: DataFrame, small: DataFrame, key: String,
               mBits: Long = 1L << 17, k: Int = 5): DataFrame = {
    val bloom = QBloom.build(small, col(key), mBits, k)
    big.select(col(key)).filter(col(key).isNotNull)
      .filter(bloom.mightContain(col(key)))
      .distinct()
  }
}
