package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join handles sort-merge skew automatically, but when a
  * handful of hot keys dominate (the classic power-law fact table) an
  * explicit salt spreads ONE hot key over `salt` reducers: the skewed
  * (large) side gets a random-like salt derived deterministically from a
  * row fingerprint, the small side is replicated `salt` ways, and the
  * join key becomes (key, salt). Results are identical to the plain
  * join; only the shuffle layout changes.
  *
  * The salt must be deterministic for replayability — `pmod(hash(...),
  * salt)` over the row's own columns, never `rand()`.
  */
object SkewJoin {

  /** Inner equi-join `large ⋈ small` on `keys`, spreading each key of
    * `large` across `salt` partitions. `saltSource` are columns of
    * `large` used to derive the deterministic salt (default: the key
    * itself plus all columns via a monotonic id would break determinism,
    * so callers pass high-cardinality columns).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, saltSource: Seq[String]): DataFrame = {
    require(salt > 0, "salt must be positive")
    val salted = large.withColumn("__salt",
      pmod(hash(saltSource.map(col): _*), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
