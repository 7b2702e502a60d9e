package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.sql.{Date, Timestamp}
import graft.TestSpark
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Targeted deletion (`Txn.deleteWhere`): SQL DELETE semantics (NULL
  * predicate rows survive), bucket-pruned rewrite on the bucketed
  * layout — only buckets holding matching rows are rewritten, the rest
  * hard-link byte-identically — and a write-nothing fast path when
  * nothing matches.
  */
class WarehouseDeleteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  private val feb1 = Timestamp.valueOf("2021-02-01 00:00:00")

  private def clientRow(i: Int, phone: String = "+7 000") =
    (f"C$i%03d", s"Last$i", s"First$i", Some(s"Pat$i"), Date.valueOf("1980-01-01"),
      f"$i%04d 000000", Some(Date.valueOf("2030-01-01")), phone, feb1,
      None: Option[Timestamp])

  private def dim(rows: Seq[Int], phoneOf: Int => String = _ => "+7 000"): DataFrame =
    ReplayFixtures.clientsDf(spark, rows.map(i => clientRow(i, phoneOf(i))))
      .withColumn("processed_dt", lit(feb1))

  private def parquetFiles(dir: String): Map[String, Path] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> p).toMap

  test("bucketed delete rewrites only touched buckets; untouched files carry byte-identical") {
    val wh = new Warehouse(spark, Files.createTempDirectory("wh-del").toString)
    val t0 = wh.begin()
    t0.overwrite("dim_clients", dim(1 to 40, i => if (i % 10 == 3) "+7 BAD" else "+7 000"))
    t0.commit()
    val oldDir = wh.catalog()("dim_clients").head
    val oldFiles = parquetFiles(oldDir)

    val t1 = wh.begin()
    t1.deleteWhere("dim_clients", col("phone") === "+7 BAD")
    t1.commit()

    val after = wh.read("dim_clients")
    assert(after.count() == 36)
    assert(after.filter(col("phone") === "+7 BAD").count() == 0)

    val newDir = wh.catalog()("dim_clients").head
    assert(newDir != oldDir)
    val newFiles = parquetFiles(newDir)
    val (key, n) = wh.bucketSpec("dim_clients")
    val touched = Seq(3, 13, 23, 33)
      .map(i => f"C$i%03d")
      .map(id => spark.range(1).select(
        pmod(hash(lit(id)), lit(n))).head.getInt(0)).toSet
    val bucketRe = """.*_(\d+)(?:\..*)?$""".r
    def bucketOf(name: String): Int = name match { case bucketRe(b) => b.toInt }
    oldFiles.foreach { case (name, p) =>
      if (!touched.contains(bucketOf(name))) {
        assert(newFiles.contains(name), s"untouched file $name missing")
        assert(Files.mismatch(p, newFiles(name)) == -1L, s"$name not byte-identical")
      } else assert(!newFiles.contains(name), s"touched bucket file $name carried over")
    }
  }

  test("NULL predicate rows survive (SQL DELETE semantics); no-match delete writes nothing") {
    val wh = new Warehouse(spark, Files.createTempDirectory("wh-del2").toString)
    val t0 = wh.begin()
    t0.overwrite("dim_clients", dim(1 to 10))
    t0.commit()
    val dirBefore = wh.catalog()("dim_clients")

    // update_dt is NULL everywhere: predicate evaluates NULL -> keep all,
    // and since nothing matches, the catalog must not move at all
    val t1 = wh.begin()
    t1.deleteWhere("dim_clients", col("update_dt") > lit(feb1))
    t1.commit()
    assert(wh.read("dim_clients").count() == 10)
    assert(wh.catalog()("dim_clients") == dirBefore, "no-match delete must write nothing")
  }

  test("partitioned+bucketed delete carries untouched buckets across dt= subdirs") {
    // the fact layout: date partitions × key-hash buckets. The carry-over
    // walk must preserve files INSIDE partition subdirs — a flat listing
    // would silently drop every untouched-bucket row (data loss).
    import spark.implicits._
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("ts", "timestamp").add("v", "string")
    val wh = new Warehouse(spark, Files.createTempDirectory("wh-del-part").toString,
      schemas = Map("t" -> schema),
      partitionSpec = Map("t" -> ("dt", to_date(col("ts")))),
      bucketSpec = Map("t" -> ("id", 4)))
    val rows = (1L to 40L).map(i =>
      (i, Timestamp.valueOf(s"2021-03-0${(i % 3) + 1} 10:00:00"), s"v$i"))
    val t0 = wh.begin()
    t0.overwrite("t", rows.toDF("id", "ts", "v"))
    t0.commit()
    val oldDir = wh.catalog()("t").head
    def allFiles(dir: String): Map[String, Path] =
      Files.walk(Paths.get(dir)).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => Paths.get(dir).relativize(p).toString -> p).toMap
    val oldFiles = allFiles(oldDir)
    assert(oldFiles.keys.exists(_.contains("dt=")), "fixture must be partitioned")

    val t1 = wh.begin()
    t1.deleteWhere("t", col("id") === 17L)
    t1.commit()

    val got = wh.read("t").select("id").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 40L).toSet - 17L, "exactly id=17 must be gone")

    val newDir = wh.catalog()("t").head
    val newFiles = allFiles(newDir)
    val bucket17 = spark.range(1).select(pmod(hash(lit(17L)), lit(4))).head.getInt(0)
    val bucketRe = """.*_(\d+)(?:\..*)?$""".r
    def bucketOf(name: String): Int =
      name.split('/').last match { case bucketRe(b) => b.toInt }
    val carried = oldFiles.filter { case (rel, _) => bucketOf(rel) != bucket17 }
    assert(carried.nonEmpty, "expected untouched bucket files across partitions")
    carried.foreach { case (rel, p) =>
      assert(newFiles.contains(rel), s"untouched $rel missing from new dir")
      assert(Files.mismatch(p, newFiles(rel)) == -1L, s"$rel not byte-identical")
    }
  }

  test("multi-dir bucketed delete replaces only dirs holding matches, bucket-pruned") {
    import spark.implicits._
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("v", "string")
    val wh = new Warehouse(spark, Files.createTempDirectory("wh-del-multi").toString,
      schemas = Map("t" -> schema), partitionSpec = Map.empty,
      bucketSpec = Map("t" -> ("id", 4)))
    // three append dirs with disjoint id ranges
    for (base <- Seq(0L, 100L, 200L)) {
      val t = wh.begin()
      t.append("t", (base + 1 to base + 20).map(i => (i, s"v$i")).toDF("id", "v"))
      t.commit()
    }
    val dirs0 = wh.catalog()("t")
    assert(dirs0.length == 3)

    // victim lives in the middle dir only
    val t1 = wh.begin()
    t1.deleteWhere("t", col("id") === 107L)
    t1.commit()
    val dirs1 = wh.catalog()("t")
    assert(dirs1.length == 3)
    assert(dirs1(0) == dirs0(0) && dirs1(2) == dirs0(2),
      "match-less dirs must keep their catalog entries verbatim")
    assert(dirs1(1) != dirs0(1), "the matching dir must be replaced")
    val got = wh.read("t").select("id").collect().map(_.getLong(0)).toSet
    assert(got == ((1L to 20L) ++ (101L to 120L) ++ (201L to 220L)).toSet - 107L)

    // within the replaced dir, untouched buckets carried byte-identically
    val bucket107 = spark.range(1).select(pmod(hash(lit(107L)), lit(4))).head.getInt(0)
    val bucketRe = """.*_(\d+)(?:\..*)?$""".r
    def bucketOf(name: String): Int = name match { case bucketRe(b) => b.toInt }
    val oldFiles = parquetFiles(dirs0(1))
    val newFiles = parquetFiles(dirs1(1))
    val carried = newFiles.filter { case (name, _) => oldFiles.contains(name) }
    assert(carried.nonEmpty, "untouched buckets must hard-link")
    carried.foreach { case (name, p) =>
      assert(bucketOf(name) != bucket107)
      assert(Files.mismatch(p, oldFiles(name)) == -1L, s"$name not byte-identical")
    }

    // no-match delete: catalog does not move at all
    val t2 = wh.begin()
    t2.deleteWhere("t", col("id") === 9999L)
    t2.commit()
    assert(wh.catalog()("t") == dirs1, "no-match delete must write nothing")
  }

  test("unbucketed table falls back to a filtered overwrite") {
    val wh = new Warehouse(spark, Files.createTempDirectory("wh-del3").toString)
    import spark.implicits._
    val t0 = wh.begin()
    t0.overwrite("meta", Seq(
      ("keep", "t", None: Option[Timestamp]),
      ("drop", "t", None: Option[Timestamp]))
      .toDF("schema_name", "table_name", "max_update_dt"))
    t0.commit()
    val t1 = wh.begin()
    t1.deleteWhere("meta", col("schema_name") === "drop")
    t1.commit()
    assert(wh.read("meta").collect().map(_.getString(0)).toSeq == Seq("keep"))
  }
}
