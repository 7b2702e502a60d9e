package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** Built filter: a bit array packed into BIGINT words.
    *
    * The membership test is the native [[QBloomMightContain]]
    * expression: ONE md5 per row feeding all k probes, with the word
    * array attached as a codegen reference object instead of k copies
    * of an array literal — the earlier composed-builtins form evaluated
    * 2k md5s per row (whole-stage codegen does not CSE across probe
    * conjuncts) and inlined the full bit array per probe, costing
    * ~4.5 µs/row and an 80 KB plan string. Measured: 2.7 s → ~0.3 s
    * over 600k rows at the same probe positions.
    */
  final case class Filter(words: Array[Long], mBits: Long, k: Int) {

    /** Codegen'd membership test. Null keys yield null (filtered out by
      * `Filter` nodes), matching equi-join null semantics.
      */
    def mightContain(key: Column): Column =
      Bridge.column(QBloomMightContain(
        Bridge.expression(key.cast("string")), words, mBits, k))
  }

  /** Build the filter from the SMALL side's keys, fully distributed:
    * each partition ORs its keys' probe positions into a local packed
    * word array, and the arrays tree-reduce to the driver — the driver
    * receives ONE fixed-size result (mBits/8 bytes) regardless of key
    * count, never a data-dependent row set; and because bit-OR is
    * idempotent there is no distinct (no shuffle at all — the build is
    * one map + reduce). This is an explicit build ACTION, not a lazy
    * operator — run it once per batch, like a broadcast.
    */
  def build(df: DataFrame, key: Column, mBits: Long = 1L << 17, k: Int = 5): Filter = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(k > 0, "k must be positive")
    val (h1, h2) = hashes(key)
    val posCols = (0 until k).map(i => position(h1, h2, i, mBits))
    val nWords = (mBits / 64).toInt
    val words = df.filter(key.isNotNull)
      .select(posCols: _*)
      .rdd.treeAggregate(new Array[Long](nWords))(
        seqOp = (w, row) => {
          var i = 0
          while (i < k) {
            val p = row.getLong(i)
            w((p >> 6).toInt) |= 1L << (p & 63).toInt
            i += 1
          }
          w
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
    Filter(words, mBits, k)
  }

  /** Build ONE filter per group (e.g. per source FILE via
    * `input_file_name()`), in a single distributed pass: each partition
    * ORs its rows' probe positions into a per-group local word array and
    * the group→words maps tree-reduce to the driver. The driver receives
    * `groups × mBits/8` bytes regardless of row count — for a per-file
    * Bloom index over a B-bucket dir that is B fixed-size arrays, never
    * a data-dependent row set. Same deterministic geometry as [[build]],
    * so [[testKey]] probes these filters too.
    */
  def buildPerGroup(df: DataFrame, group: Column, key: Column,
                    mBits: Long = 1L << 17, k: Int = 5): Map[String, Filter] = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(k > 0, "k must be positive")
    val (h1, h2) = hashes(key)
    val posCols = group.cast("string") +: (0 until k).map(i => position(h1, h2, i, mBits))
    val nWords = (mBits / 64).toInt
    type Acc = scala.collection.mutable.HashMap[String, Array[Long]]
    val acc = df.filter(key.isNotNull && group.isNotNull)
      .select(posCols: _*)
      .rdd.treeAggregate(new Acc)(
        seqOp = (m, row) => {
          val w = m.getOrElseUpdate(row.getString(0), new Array[Long](nWords))
          var i = 1
          while (i <= k) {
            val p = row.getLong(i)
            w((p >> 6).toInt) |= 1L << (p & 63).toInt
            i += 1
          }
          m
        },
        combOp = (a, b) => {
          b.foreach { case (g, w) =>
            a.get(g) match {
              case Some(aw) =>
                var i = 0
                while (i < aw.length) { aw(i) |= w(i); i += 1 }
              case None => a(g) = w
            }
          }
          a
        })
    acc.iterator.map { case (g, w) => g -> Filter(w, mBits, k) }.toMap
  }

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM mirror of the relational probe formula — MUST stay bit-identical
    * to [[hashes]]/[[position]] (the build side computes positions
    * relationally; the membership test computes them here). h1/h2 are the
    * first/second 15-hex-char chunks of md5(key) as in
    * `conv(substring(md5hex, 1|17, 15), 16, 10)`. Public: the generated
    * code calls it through the companion's static forwarder.
    */
  def testKey(key: UTF8String, words: Array[Long],
              mBits: Long, k: Int): Boolean = {
    val d = mdPool.get().digest(key.getBytes) // digest() resets the instance
    // hex chars 0-14 = bytes 0-6 + high nibble of byte 7
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    h1 = (h1 << 4) | ((d(7) & 0xf0L) >> 4)
    // hex chars 16-30 = bytes 8-14 + high nibble of byte 15
    var h2 = 0L
    i = 8
    while (i < 15) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    h2 = (h2 << 4) | ((d(15) & 0xf0L) >> 4)
    val m1 = h1 % mBits
    val m2 = h2 % mBits
    var j = 0
    while (j < k) {
      val pos = (m1 + j * m2) % mBits
      if ((words((pos >> 6).toInt) & (1L << (pos & 63).toInt)) == 0L) return false
      j += 1
    }
    true
  }
}

/** Native Bloom membership test: md5(key) computed ONCE per row, k
  * double-hashed probes against a referenced bit array — same positions
  * as the relational build-side formula in [[QBloom]].
  */
case class QBloomMightContain(child: Expression, words: Array[Long],
                              mBits: Long, k: Int) extends UnaryExpression {
  require(mBits > 0 && mBits % 64 == 0 && k > 0, "invalid Bloom geometry")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    QBloom.testKey(input.asInstanceOf[UTF8String], words, mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the bit array rides along as a reference object — no 16 KB array
    // literal (let alone k of them) in the generated source or plan string
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, key => {
      s"${ev.value} = graft.functions.QBloom.testKey($key, $wordsRef, ${mBits}L, $k);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  // the case-class default compares `words` by REFERENCE (Array equals);
  // value equality lets canonicalization/semanticEquals dedupe two
  // filters built from the same keys (plan cache hits, subexpr elim)
  override def equals(other: Any): Boolean = other match {
    case q: QBloomMightContain =>
      child == q.child && mBits == q.mBits && k == q.k &&
        java.util.Arrays.equals(words, q.words)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Long.valueOf(mBits),
      Integer.valueOf(k), Integer.valueOf(java.util.Arrays.hashCode(words)))
}
