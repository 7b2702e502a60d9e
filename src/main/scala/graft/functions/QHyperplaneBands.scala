package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: random-hyperplane LSH band values of a
  * quantized `array<bigint>` vector, in ONE projection pass.
  *
  * Semantically identical to the composed form (explode the vector,
  * aggregate `planes` hyperplane dot products, pack sign bits per
  * band) — same Knuth-hash hyperplane components
  * `h(j,i) = (2654435761·(j·1024+i)) mod 2^32 mod 65537 − 32768`, same
  * packing — but as an `Expression` the whole banding becomes a scalar
  * map: NO explode, NO aggregation exchange. At scale that removes a
  * corpus-sized shuffle from the near-dup plan; the only remaining
  * exchange is the band-bucket join itself. The arithmetic is plain
  * 64-bit integer math, so the DuckDB oracle (which computes the same
  * formula relationally) is unaffected.
  *
  * Nulls: null array → null; null ELEMENTS contribute 0 (as in
  * [[QDotProduct]]).
  */
case class QHyperplaneBands(child: Expression, planes: Int, bandBits: Int)
    extends UnaryExpression {
  require(planes > 0 && bandBits > 0 && planes % bandBits == 0,
    "planes must be a positive multiple of bandBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = q.numElements()
    // dims beyond 1024 would alias into the next plane's hash slots
    // (j*1024 + i wraps), silently correlating hyperplanes — and the
    // oracle computes the same formula, so only a loud failure catches it
    if (n > 1024) throw new IllegalArgumentException(
      s"$prettyName supports vectors of dim <= 1024, got $n")
    val bands = new Array[Long](planes / bandBits)
    var j = 0
    while (j < planes) {
      var dot = 0L
      var i = 0
      while (i < n) {
        if (!q.isNullAt(i)) {
          val h = (2654435761L * (j * 1024L + i)) % 4294967296L % 65537L - 32768L
          dot += q.getLong(i) * h
        }
        i += 1
      }
      if (dot >= 0) bands(j / bandBits) |= 1L << (j % bandBits)
      j += 1
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val h = ctx.freshName("h")
      val bands = ctx.freshName("bands")
      s"""
         |int $n = $q.numElements();
         |if ($n > 1024) throw new IllegalArgumentException(
         |  "graft_hyperplane_bands supports vectors of dim <= 1024, got " + $n);
         |long[] $bands = new long[${planes / bandBits}];
         |for (int $j = 0; $j < $planes; $j++) {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$q.isNullAt($i)) {
         |      long $h = (2654435761L * ($j * 1024L + $i)) % 4294967296L % 65537L - 32768L;
         |      $dot += $q.getLong($i) * $h;
         |    }
         |  }
         |  if ($dot >= 0L) $bands[$j / $bandBits] |= 1L << ($j % $bandBits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object QHyperplaneBands {
  /** Column-API form. */
  def bands(q: Column, planes: Int, bandBits: Int): Column =
    Bridge.column(QHyperplaneBands(Bridge.expression(q), planes, bandBits))
}

/** MULTI-PROBE variant of [[QHyperplaneBands]]: per band, the primary
  * band value followed by `flips` single-bit probe variants, each
  * flipping one of the band's lowest-|margin| sign bits (the planes
  * whose dot product sits closest to the boundary — precisely the bits
  * most likely to differ between true near-duplicates). Output is
  * `array<bigint>` of length `(planes/bandBits)·(flips+1)`, laid out
  * `idx = band_id·(flips+1) + p` with `p = 0` the primary value — so
  * `posexplode` recovers both ids with integer div/mod and probing a
  * vector against a PRIMARY-only index needs fewer bands/permutations
  * for the same recall (the multi-probe LSH idea: trade a few cheap
  * extra lookups for whole extra hash tables).
  *
  * Determinism: margins are exact BIGINT |dot|s; the p-th probe flips
  * the p-th smallest (|dot|, plane) — plane index breaks ties — so the
  * probe set is bit-reproducible relationally (a rank over
  * (abs(d), j) in any SQL engine). Probes within a band are pairwise
  * distinct by construction (distinct single-bit flips of one value).
  */
case class QHyperplaneProbes(child: Expression, planes: Int, bandBits: Int,
                             flips: Int) extends UnaryExpression {
  require(planes > 0 && bandBits > 0 && planes % bandBits == 0,
    "planes must be a positive multiple of bandBits")
  require(flips >= 0 && flips < bandBits,
    "flips must be in [0, bandBits) — each probe flips a distinct bit")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_probes"

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = q.numElements()
    if (n > 1024) throw new IllegalArgumentException(
      s"$prettyName supports vectors of dim <= 1024, got $n")
    val nBands = planes / bandBits
    val out = new Array[Long](nBands * (flips + 1))
    val absd = new Array[Long](bandBits)
    var b = 0
    while (b < nBands) {
      var primary = 0L
      var k = 0
      while (k < bandBits) {
        val j = b * bandBits + k
        var dot = 0L
        var i = 0
        while (i < n) {
          if (!q.isNullAt(i)) {
            val h = (2654435761L * (j * 1024L + i)) % 4294967296L % 65537L - 32768L
            dot += q.getLong(i) * h
          }
          i += 1
        }
        if (dot >= 0) primary |= 1L << k
        absd(k) = if (dot < 0) -dot else dot
        k += 1
      }
      out(b * (flips + 1)) = primary
      // p-th probe flips the p-th smallest (|dot|, plane-index) bit:
      // selection by repeated min-scan (flips is 1-3 in practice)
      var used = 0L
      var p = 1
      while (p <= flips) {
        var best = -1
        k = 0
        while (k < bandBits) {
          if ((used & (1L << k)) == 0 && (best < 0 || absd(k) < absd(best)))
            best = k
          k += 1
        }
        used |= 1L << best
        out(b * (flips + 1) + p) = primary ^ (1L << best)
        p += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val h = ctx.freshName("h")
      val primary = ctx.freshName("primary")
      val absd = ctx.freshName("absd")
      val out = ctx.freshName("out")
      val used = ctx.freshName("used")
      val best = ctx.freshName("best")
      val nBands = planes / bandBits
      s"""
         |int $n = $q.numElements();
         |if ($n > 1024) throw new IllegalArgumentException(
         |  "graft_hyperplane_probes supports vectors of dim <= 1024, got " + $n);
         |long[] $out = new long[${nBands * (flips + 1)}];
         |long[] $absd = new long[$bandBits];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $primary = 0L;
         |  for (int $k = 0; $k < $bandBits; $k++) {
         |    int $j = $b * $bandBits + $k;
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$q.isNullAt($i)) {
         |        long $h = (2654435761L * ($j * 1024L + $i)) % 4294967296L % 65537L - 32768L;
         |        $dot += $q.getLong($i) * $h;
         |      }
         |    }
         |    if ($dot >= 0L) $primary |= 1L << $k;
         |    $absd[$k] = $dot < 0L ? -$dot : $dot;
         |  }
         |  $out[$b * ${flips + 1}] = $primary;
         |  long $used = 0L;
         |  for (int $p = 1; $p <= $flips; $p++) {
         |    int $best = -1;
         |    for (int $k = 0; $k < $bandBits; $k++) {
         |      if (($used & (1L << $k)) == 0L &&
         |          ($best < 0 || $absd[$k] < $absd[$best])) $best = $k;
         |    }
         |    $used |= 1L << $best;
         |    $out[$b * ${flips + 1} + $p] = $primary ^ (1L << $best);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object QHyperplaneProbes {
  /** Column-API form. */
  def probes(q: Column, planes: Int, bandBits: Int, flips: Int): Column =
    Bridge.column(QHyperplaneProbes(Bridge.expression(q), planes, bandBits, flips))
}
