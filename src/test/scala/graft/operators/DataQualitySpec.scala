package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite {
  import DataQuality._
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def child = Seq(
    (1L, Option(10L), 5.0),    // clean
    (1L, Option(10L), 5.0),    // duplicate key
    (2L, None, 3.0),           // null FK (not an FK violation; a not-null one)
    (3L, Option(99L), -1.0),   // dangling FK + negative value
    (4L, Option(11L), 2.0)     // clean
  ).toDF("k", "fk", "v")

  private def parent = Seq(10L, 11L).toDF("pk")

  test("audit: every rule shape counts exactly its violations") {
    val out = audit(child, Seq(
        Unique("k_unique", Seq("k")),
        NotNull("fk_not_null", "fk"),
        Check("v_non_negative", col("v") >= 0),
        ForeignKey("fk_exists", Seq("fk"), parent, Seq("pk"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("k_unique" -> 1L, "fk_not_null" -> 1L,
      "v_non_negative" -> 1L, "fk_exists" -> 1L), s"$out")
  }

  test("audit on a clean table reports zero for every rule, no missing rows") {
    val clean = Seq((1L, Option(10L), 1.0), (2L, Option(11L), 2.0)).toDF("k", "fk", "v")
    val out = audit(clean, Seq(
        Unique("k_unique", Seq("k")),
        NotNull("fk_not_null", "fk"),
        Check("v_non_negative", col("v") >= 0),
        ForeignKey("fk_exists", Seq("fk"), parent, Seq("pk"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 4 && out.values.forall(_ == 0L), s"$out")
  }

  test("check with a null predicate result is a violation (null-hostile)") {
    val df = Seq((1L, Option.empty[Double]), (2L, Option(2.0d)))
      .toDF("k", "v")
    val out = audit(df, Seq(Check("v_pos", col("v") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("v_pos") == 1L)
  }

  test("quarantine tags each row with exactly the rules it fails") {
    val out = quarantine(child, Seq(
        NotNull("fk_not_null", "fk"),
        Check("v_non_negative", col("v") >= 0)))
      .select(col("k"), col("v"), col("failed_rules"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[String](2).toList)).toSet
    assert(out == Set(
      (1L, 5.0, Nil), (2L, 3.0, List("fk_not_null")),
      (3L, -1.0, List("v_non_negative")), (4L, 2.0, Nil)), s"$out")
  }

  private def driftEvents(rows: (String, String, Double)*) =
    rows.map { case (d, tpe, v) => (s"$d 12:00:00", tpe, v) }
      .toDF("t", "event_type", "value")
      .selectExpr("CAST(t AS TIMESTAMP) AS ts", "event_type", "value")

  test("ksDrift: exact max ECDF gap on the cent histogram") {
    // type x: half0 cents {1,2,3,4}, half1 {3,4,5,6} -> D = 1/2;
    // type y identical halves -> D = 0
    val d0 = "2024-01-01"; val d1 = "2024-01-02" // span 1: d0->half0, d1->half1
    val ev = driftEvents(
      (d0, "x", 0.01), (d0, "x", 0.02), (d0, "x", 0.03), (d0, "x", 0.04),
      (d1, "x", 0.03), (d1, "x", 0.04), (d1, "x", 0.05), (d1, "x", 0.06),
      (d0, "y", 0.10), (d1, "y", 0.10))
    val got = DataQuality.ksDrift(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("x" -> ((4L, 4L, 5000L)), "y" -> ((1L, 1L, 0L))))
  }

  test("ksDrift: a one-sided series drops (no test without both halves)") {
    val ev = driftEvents(("2024-01-01", "x", 1.0), ("2024-01-02", "x", 2.0),
      ("2024-01-01", "only_first", 1.0))
    val types = DataQuality.ksDrift(ev).collect().map(_.getString(0)).toSet
    assert(types == Set("x"))
  }

  test("wassersteinDrift: exact ECDF area on the cent histogram") {
    // type x: half0 cents {1,2,3,4}, half1 {3,4,5,6} — two ECDFs offset
    // by 2 cents: W1 = 2.0 cents -> 200 centi-cents. Gaps: at v=1..5
    // |F1-F2| = .25,.5,.5,.5,.25 each over dv=1 -> area 2.0. Identical
    // halves (type y) read 0.
    val d0 = "2024-01-01"; val d1 = "2024-01-02"
    val ev = driftEvents(
      (d0, "x", 0.01), (d0, "x", 0.02), (d0, "x", 0.03), (d0, "x", 0.04),
      (d1, "x", 0.03), (d1, "x", 0.04), (d1, "x", 0.05), (d1, "x", 0.06),
      (d0, "y", 0.10), (d1, "y", 0.10))
    val got = DataQuality.wassersteinDrift(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("x" -> ((4L, 4L, 200L)), "y" -> ((1L, 1L, 0L))))
  }

  test("planted location shift: W1 reads the shift exactly, KS the " +
    "displaced mass; doubling the shift doubles W1 and pins KS") {
    // the sensitivity pin (r12 ADVICE item 7): the bench fixture's
    // halves are near-identical, so the gates only proved AGREEMENT —
    // this plants a known pure location shift Δ into half 2 and asserts
    // the measured magnitudes equal the planted ones.
    val half0 = Seq(1.0, 2.0, 3.0, 4.0)
    def shifted(delta: Double) = driftEvents(
      (half0.map(v => ("2024-01-01", "x", v)) ++
        half0.map(v => ("2024-01-02", "x", v + delta))): _*)
    // Δ = $0.50: W1 of a pure shift IS Δ -> 50 cents -> 5000 centi-cents;
    // KS: each order statistic displaces 1/n = 1/4 of the mass -> 2500 bp
    val w1 = DataQuality.wassersteinDrift(shifted(0.5)).collect()(0)
    assert((w1.getLong(1), w1.getLong(2), w1.getLong(3)) == ((4L, 4L, 5000L)))
    assert(DataQuality.ksDrift(shifted(0.5)).collect()(0).getLong(3) == 2500L)
    // Δ = $1.00: W1 doubles to 10000 centi-cents, KS stays 2500 bp —
    // the location-shift signature (total displaced mass grows, the
    // worst single-point gap does not)
    val w2 = DataQuality.wassersteinDrift(shifted(1.0)).collect()(0)
    assert(w2.getLong(3) == 10000L)
    assert(DataQuality.ksDrift(shifted(1.0)).collect()(0).getLong(3) == 2500L)
    // zero shift reads zero on both
    val w0 = DataQuality.wassersteinDrift(shifted(0.0)).collect()(0)
    assert(w0.getLong(3) == 0L)
    assert(DataQuality.ksDrift(shifted(0.0)).collect()(0).getLong(3) == 0L)
  }

  test("psiDrift: exact shares, classic term, null when a half is empty") {
    // half0 mix a:3 b:1, half1 a:1 b:3 -> psi term both
    // (0.75-0.25)*ln(3) = 0.549306; c only in half1 -> null term.
    // totals t1=4, t2=5 (c adds one to half1)
    val ev = driftEvents(
      ("2024-01-01", "a", 1.0), ("2024-01-01", "a", 1.0),
      ("2024-01-01", "a", 1.0), ("2024-01-01", "b", 1.0),
      ("2024-01-02", "a", 1.0), ("2024-01-02", "b", 1.0),
      ("2024-01-02", "b", 1.0), ("2024-01-02", "b", 1.0),
      ("2024-01-02", "c", 1.0))
    val got = DataQuality.psiDrift(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val pa = math.rint((0.75 - 0.2) * math.log(0.75 / 0.2) * 1e6) / 1e6
    val pb = math.rint((0.25 - 0.6) * math.log(0.25 / 0.6) * 1e6) / 1e6
    assert(got == Map(
      "a" -> ((3L, 1L, 7500L, 2000L, Some(pa))),
      "b" -> ((1L, 3L, 2500L, 6000L, Some(pb))),
      "c" -> ((0L, 1L, 0L, 2000L, None))))
  }

  test("psiDrift: a single-day corpus degrades to null shares, no throw") {
    // one day -> every row lands in half 0 (2*0 <= 0), t2 = 0; the
    // second-half share and the psi term must be null, not an ANSI
    // divide-by-zero, matching ksDrift/wassersteinDrift's degradation.
    val ev = driftEvents(
      ("2024-01-01", "a", 1.0), ("2024-01-01", "a", 1.0),
      ("2024-01-01", "b", 1.0))
    val got = DataQuality.psiDrift(ev)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.isNullAt(5)))).toMap
    assert(got == Map(
      "a" -> ((2L, 0L, Some(6666L), None, true)),
      "b" -> ((1L, 0L, Some(3333L), None, true))))
  }
}
