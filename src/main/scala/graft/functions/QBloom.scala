package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.ShiftLeft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Deterministic Bloom filter for map-side join pruning.
  *
  * Probe positions are double-hashed (Kirsch–Mitzenmacher) from two
  * 60-bit halves of `md5(key)`: `pos_i = (h1 + i·h2) mod mBits`. md5 is
  * the one hash every engine computes identically (see the portability
  * rules), so the filter — and therefore any plan decision made with it —
  * is bit-reproducible; and because a Bloom filter has NO false
  * negatives, pruning the big side of an (anti/semi) equi-join with
  * `mightContain` never changes the join's result, only its cost. The
  * oracle for a Bloom-pruned query is therefore the PLAIN join SQL.
  *
  * The membership test is composed entirely of codegen'd built-ins
  * (md5/conv/pmod/shift/element_at over an array literal), so it runs
  * inside whole-stage codegen on the scan side, upstream of the join
  * exchange — at 100 TB that's the difference between shuffling every
  * fact row and shuffling the ~matching ones.
  *
  * Sizing: `mBits` defaults to 2^17 (a 16 KiB plan literal). With k=5
  * that holds ~15k keys at ≈1.5% false positives; scale mBits with the
  * build side (false positives only waste shuffle, never correctness).
  */
object QBloom {

  /** Two independent 60-bit hashes from non-overlapping md5 hex chunks
    * (15 hex chars each keeps `conv` clear of BIGINT sign trouble).
    */
  private def hashes(key: Column): (Column, Column) = {
    val h = md5(key.cast("string").cast("binary"))
    (conv(substring(h, 1, 15), 16, 10).cast("long"),
      conv(substring(h, 17, 15), 16, 10).cast("long"))
  }

  /** `(h1 + i·h2) mod m`, with both hashes reduced mod m FIRST so the
    * sum can never overflow BIGINT (h values reach 2^60).
    */
  private def position(h1: Column, h2: Column, i: Int, mBits: Long): Column =
    pmod(pmod(h1, lit(mBits)) + lit(i.toLong) * pmod(h2, lit(mBits)), lit(mBits))

  /** Built filter: a bit array packed into BIGINT words, carried into
    * plans as an array literal.
    */
  final case class Filter(words: Array[Long], mBits: Long, k: Int) {

    /** Codegen'd membership test. Null keys yield null (filtered out by
      * `Filter` nodes), matching equi-join null semantics.
      */
    def mightContain(key: Column): Column = {
      val (h1, h2) = hashes(key)
      val wordsLit = lit(words)
      (0 until k).map { i =>
        val pos = position(h1, h2, i, mBits)
        val word = element_at(wordsLit, (shiftright(pos, 6) + 1).cast("int"))
        // shiftleft with a COLUMN amount — the functions API only takes a
        // literal shift, the Catalyst node takes any expression
        val mask = Bridge.column(ShiftLeft(Bridge.expression(lit(1L)),
          Bridge.expression(pos.bitwiseAND(lit(63L)).cast("int"))))
        word.bitwiseAND(mask) =!= lit(0L)
      }.reduce(_ && _)
    }
  }

  /** Build the filter from the SMALL side's keys — one distributed
    * distinct over `nKeys · k` positions, then a driver collect of the
    * set bit positions (bounded by mBits/…, the same order as a
    * broadcast of the small side itself). This is an explicit build
    * ACTION, not a lazy operator — run it once per batch, like a
    * broadcast.
    */
  def build(df: DataFrame, key: Column, mBits: Long = 1L << 17, k: Int = 5): Filter = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(k > 0, "k must be positive")
    val (h1, h2) = hashes(key)
    val posCols = (0 until k).map(i => position(h1, h2, i, mBits))
    val positions = df.filter(key.isNotNull)
      .select(explode(array(posCols: _*)).as("pos"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long]((mBits / 64).toInt)
    positions.foreach(p => words((p >> 6).toInt) |= 1L << (p & 63).toInt)
    Filter(words, mBits, k)
  }
}
