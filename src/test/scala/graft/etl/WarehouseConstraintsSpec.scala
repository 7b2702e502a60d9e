package graft.etl

import java.nio.file.Files
import graft.TestSpark
import graft.operators.DataQuality.{Check, ForeignKey, NotNull, Unique}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Commit-time constraints (appendChecked) and schema evolution — the
  * warehouse-side guarantees the reference got from Postgres DDL.
  */
class WarehouseConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("id", LongType),
    StructField("ref", LongType), StructField("amt", DoubleType)))

  private def freshWh(schemas: Map[String, StructType] = Map(
      "t" -> schema,
      "parent" -> StructType(Seq(StructField("pid", LongType))))) =
    new Warehouse(spark, Files.createTempDirectory("whcons").toString,
      schemas, partitionSpec = Map.empty, bucketSpec = Map.empty)

  private val rules = Seq(
    NotNull("id_not_null", "id"),
    Check("amt_non_negative", col("amt") >= 0),
    Unique("id_unique", Seq("id")))

  test("clean batches commit; violating batches reject with counts, table untouched") {
    val wh = freshWh()
    val t0 = wh.begin()
    t0.appendChecked("t", Seq((1L, 10L, 5.0), (2L, 11L, 6.0)).toDF("id", "ref", "amt"), rules)
    t0.commit()
    assert(wh.read("t").count() == 2)

    // NOT NULL + CHECK violations
    val t1 = wh.begin()
    val bad = Seq((Option.empty[Long], Option(12L), -1.0))
      .toDF("id", "ref", "amt")
    val e1 = intercept[IllegalArgumentException](t1.appendChecked("t", bad, rules))
    assert(e1.getMessage.contains("id_not_null=1") &&
      e1.getMessage.contains("amt_non_negative=1"))

    // batch-internal duplicate
    val e2 = intercept[IllegalArgumentException](t1.appendChecked("t",
      Seq((7L, 1L, 1.0), (7L, 2L, 2.0)).toDF("id", "ref", "amt"), rules))
    assert(e2.getMessage.contains("id_unique=1"))

    // CROSS-BATCH duplicate: id 1 already committed
    val e3 = intercept[IllegalArgumentException](t1.appendChecked("t",
      Seq((1L, 3L, 3.0)).toDF("id", "ref", "amt"), rules))
    assert(e3.getMessage.contains("id_unique=1"))

    // the rejected writes never landed
    assert(wh.read("t").count() == 2)
  }

  test("FK rule rejects dangling references against the parent's committed image") {
    val wh = freshWh()
    val tp = wh.begin(); tp.append("parent", Seq(10L, 11L).toDF("pid")); tp.commit()
    val fk = Seq(ForeignKey("ref_fk", Seq("ref"), wh.read("parent"), Seq("pid")))
    val t = wh.begin()
    t.appendChecked("t", Seq((1L, 10L, 1.0)).toDF("id", "ref", "amt"), fk)
    val e = intercept[IllegalArgumentException](t.appendChecked("t",
      Seq((2L, 99L, 1.0)).toDF("id", "ref", "amt"), fk))
    assert(e.getMessage.contains("ref_fk=1"))
    t.commit()
    assert(wh.read("t").count() == 1)
  }

  test("rejection diagnostics stay driver-bounded: sample truncates at the cap") {
    val wh = freshWh()
    // 10,000 violating rows — the message must carry AT MOST
    // Txn.ViolationSampleRows of them (the limit sits in the plan,
    // upstream of the collect; a fully-violating 100 TB batch costs
    // the driver a handful of rows)
    val big = spark.range(10000)
      .select(col("id"), col("id").as("ref"), lit(-1.0).as("amt"))
    val e = intercept[IllegalArgumentException](
      wh.begin().appendChecked("t", big, rules))
    assert(e.getMessage.contains("amt_non_negative=10000"))
    assert(e.getMessage.contains(s"sample rows (up to ${Txn.ViolationSampleRows})"))
    // each sampled row renders as [id,ref,amt,...failed_rules...]
    val sampled = "\\[[-0-9]+,[0-9]+,-1\\.0".r
      .findAllIn(e.getMessage).length
    assert(sampled > 0 && sampled <= Txn.ViolationSampleRows,
      s"sample must truncate at ${Txn.ViolationSampleRows}, rendered $sampled rows:\n${e.getMessage}")
  }

  test("schema evolution: a column added to the declared schema reads as null from old dirs") {
    val root = Files.createTempDirectory("whevo").toString
    val v1 = Map("t" -> StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType))))
    val wh1 = new Warehouse(spark, root, v1,
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    val t0 = wh1.begin(); t0.append("t", Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v")); t0.commit()

    // same storage, evolved declaration: new nullable column at the end
    val v2 = Map("t" -> StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType), StructField("tag", StringType))))
    val wh2 = new Warehouse(spark, root, v2,
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    val old = wh2.read("t").orderBy("id").collect()
    assert(old.map(r => (r.getLong(0), r.isNullAt(2))).toSeq ==
      Seq((1L, true), (2L, true)), "old rows surface the new column as null")

    val t1 = wh2.begin()
    t1.append("t", Seq((3L, 3.5, "new")).toDF("id", "v", "tag"))
    t1.commit()
    val all = wh2.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(2))))
    assert(all.toSeq == Seq((1L, None), (2L, None), (3L, Some("new"))))
  }
}
