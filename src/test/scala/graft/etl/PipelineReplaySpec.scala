package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.{Date, Timestamp}
import graft.TestSpark
import graft.sources.{BankSource, FileSources}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Golden three-day replay (SURVEY §5.1): drive days 01→03 March 2021
  * through the full pipeline against the reference's own data files, with
  * synthesized `bank` dimensions covering every SCD1 path (FIXTURES §1.4).
  * Runs in Corrected mode (report №1 intent predicate, null blacklist
  * rows dropped) so expectations are computable by hand; Faithful-mode
  * quirks get their own test.
  */
object PipelineReplaySpec {
  /** Golden md5 of the sorted canonicalized day-1 faithful rep_fraud
    * (generated once from a verified run; stable because no
    * run-timestamp column reaches the report).
    */
  val goldenFaithfulDay1Hash = "4211998bfd2c94adfb758394731d8c9f"
}

class PipelineReplaySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private val ref = "/root/reference"
  private val feb1 = Timestamp.valueOf("2021-02-01 00:00:00")

  // five real card numbers that occur in the day-1 transactions file
  private lazy val cardNums: Seq[String] =
    FileSources.transactionsCsv(spark, s"$ref/transactions_01032021.txt")
      .select("card_num").distinct().limit(6).collect().map(_.getString(0)).toSeq

  /** client tuple: (id, last, first, patronymic, dob, passport, valid_to, phone, create, update) */
  private def clientsDay1 = Seq(
    ("C1", "Иванов", "Иван", Some("Иванович"), Date.valueOf("1980-01-01"),
      "1111 111111", Some(Date.valueOf("2030-01-01")), "+7 111", feb1, None: Option[Timestamp]),
    ("C2", "Петров", "Пётр", Some("Петрович"), Date.valueOf("1981-01-01"),
      "2222 222222", Some(Date.valueOf("2030-01-01")), "+7 222", feb1, None: Option[Timestamp]),
    ("C3", "Сидоров", "Сидор", Some("Сидорович"), Date.valueOf("1982-01-01"),
      "3333 333333", Some(Date.valueOf("2021-01-01")), "+7 333", feb1, None: Option[Timestamp]), // expired passport
    ("C4", "Козлов", "Козьма", Some("Козьмич"), Date.valueOf("1983-01-01"),
      "9933 106914", Some(Date.valueOf("2030-01-01")), "+7 444", feb1, None: Option[Timestamp]), // blacklisted
    ("C5", "Безотчества", "Ной", None: Option[String], Date.valueOf("1984-01-01"),
      "5555 555555", Some(Date.valueOf("2030-01-01")), "+7 555", feb1, None: Option[Timestamp])) // null patronymic

  private def clientsDf(rows: Seq[(String, String, String, Option[String], Date, String,
    Option[Date], String, Timestamp, Option[Timestamp])]): DataFrame =
    rows.toDF("client_id", "last_name", "first_name", "patronymic", "date_of_birth",
      "passport_num", "passport_valid_to", "phone", "create_dt", "update_dt")

  private def accountsDf(rows: Seq[(String, Date, String, Timestamp, Option[Timestamp])]): DataFrame =
    rows.toDF("account_num", "valid_to", "client", "create_dt", "update_dt")

  private def cardsDf(rows: Seq[(String, String, Timestamp, Option[Timestamp])]): DataFrame =
    rows.toDF("card_num", "account_num", "create_dt", "update_dt")

  private def bankFor(day: Int): BankSource = new BankSource {
    val day2Up = Timestamp.valueOf("2021-03-02 10:00:00")
    def clients(s: SparkSession): DataFrame = {
      val base = clientsDay1
      val rows = if (day == 1) base
      else base.filterNot(_._1 == "C5") // C5 deleted day 2
        .map(r => if (r._1 == "C2") r.copy(_8 = "+7 999", _10 = Some(day2Up)) else r) :+ // C2 phone update
        ("C6", "Новиков", "Нов", Some("Новович"), Date.valueOf("1985-01-01"),
          "6666 666666", Some(Date.valueOf("2030-01-01")), "+7 666", day2Up, None: Option[Timestamp]) // insert
      clientsDf(rows)
    }
    def accounts(s: SparkSession): DataFrame = {
      val base = Seq(
        ("A1", Date.valueOf("2030-01-01"), "C1", feb1, None: Option[Timestamp]),
        ("A2", Date.valueOf("2021-02-01"), "C2", feb1, None: Option[Timestamp]), // expired contract
        ("A3", Date.valueOf("2030-01-01"), "C3", feb1, None: Option[Timestamp]),
        ("A4", Date.valueOf("2030-01-01"), "C4", feb1, None: Option[Timestamp]),
        ("A5", Date.valueOf("2030-01-01"), "C5", feb1, None: Option[Timestamp]))
      accountsDf(if (day == 1) base else base.filterNot(_._3 == "C5") :+
        ("A6", Date.valueOf("2030-01-01"), "C6", day2Up, None: Option[Timestamp]))
    }
    def cards(s: SparkSession): DataFrame = {
      val base = (1 to 5).map(i => (cardNums(i - 1), s"A$i", feb1, None: Option[Timestamp]))
      cardsDf(if (day == 1) base else base.filterNot(_._2 == "A5") :+
        (cardNums(5), "A6", day2Up, None: Option[Timestamp]))
    }
  }

  private def stageDay(drop: Path, day: Int): Unit = {
    val d = f"${day}%02d032021"
    Seq(s"transactions_$d.txt", s"terminals_$d.xlsx", s"passport_blacklist_$d.xlsx")
      .foreach { n =>
        Files.copy(Paths.get(ref, n), drop.resolve(n), StandardCopyOption.REPLACE_EXISTING)
      }
  }

  test("three-day replay reproduces reference semantics") {
    val whRoot = Files.createTempDirectory("wh-replay")
    val drop = Files.createTempDirectory("drop")
    val wh = new Warehouse(spark, whRoot.toString)
    val pipe = new Pipeline(spark, wh, Reports.Corrected)

    val dayTs = (d: Int) => Timestamp.valueOf(f"2021-03-0$d%d 23:55:00")
    val txCounts = Array(15650L, 15686L, 15780L)
    var cumTx = 0L

    (1 to 3).foreach { day =>
      stageDay(drop, day)
      pipe.run(bankFor(day), Some(drop.toString), dayTs(day))
      cumTx += txCounts(day - 1)

      // facts accumulate with dedup; blacklist files are cumulative
      assert(wh.read("fact_transactions").count() == cumTx, s"day $day tx")
      val blackExpected = Seq(7L, 15L, 24L)(day - 1)
      assert(wh.read("fact_blacklist").count() == blackExpected, s"day $day blacklist")

      // terminals: full snapshot per day — dim mirrors the day's file
      val termExpected = Seq(150L, 151L, 150L)(day - 1)
      assert(wh.read("dim_terminals").count() == termExpected, s"day $day terminals")

      // input files archived after commit
      assert(Files.list(drop).filter(Files.isRegularFile(_)).count() == 0)
    }

    // ---- SCD1 dim paths
    val clients = wh.read("dim_clients").collect().map(r => r.getString(0) -> r).toMap
    assert(clients.keySet == Set("C1", "C2", "C3", "C4", "C6")) // C5 deleted, C6 inserted
    assert(clients("C2").getAs[String]("phone") == "+7 999") // updated
    assert(clients("C2").getAs[Timestamp]("update_dt") == Timestamp.valueOf("2021-03-02 10:00:00"))
    assert(clients("C2").getAs[Timestamp]("processed_dt") == dayTs(2)) // unchanged day 3
    assert(clients("C1").getAs[Timestamp]("create_dt") == feb1) // preserved
    assert(clients("C1").getAs[Timestamp]("processed_dt") == dayTs(1)) // never touched again

    // ---- meta watermarks: clients watermark = day-2 update_dt (max)
    val meta = wh.read("meta").collect()
      .map(r => r.getString(1) -> Option(r.getTimestamp(2))).toMap
    assert(meta("lapp_dwh_dim_clients").contains(Timestamp.valueOf("2021-03-02 10:00:00")))
    assert(meta("lapp_dwh_dim_terminals").contains(Timestamp.valueOf("2021-03-03 00:00:00")))

    // ---- report №2: exactly the transactions on the expired contract A2
    // (card #2), accumulated over three runs of the growing fact table
    val k2 = cardNums(1)
    val perDayK2 = (1 to 3).map { d =>
      FileSources.transactionsCsv(spark,
        drop.resolve("archive").resolve(f"transactions_0$d%d032021.backup").toString)
    } // archived files keep CSV content
    val k2Counts = perDayK2.map(_.filter($"card_num" === k2).count())
    val expected2 = k2Counts.head * 3 + k2Counts(1) * 2 + k2Counts(2)
    val rep = wh.read("rep_fraud")
    assert(rep.filter($"event_type" === "2").count() == expected2)

    // ---- report №1 (corrected): expired passport (C3) + blacklisted (C4)
    val k3 = cardNums(2); val k4 = cardNums(3)
    val k34Counts = perDayK2.map(_.filter($"card_num".isin(k3, k4)).count())
    val expected1 = k34Counts.head * 3 + k34Counts(1) * 2 + k34Counts(2)
    assert(rep.filter($"event_type" === "1").count() == expected1)

    // ---- report №3: independent recomputation via plain Spark SQL text
    wh.read("fact_transactions").createOrReplaceTempView("ftx")
    wh.read("dim_cards").createOrReplaceTempView("dcards")
    wh.read("dim_terminals").createOrReplaceTempView("dterm")
    val flagged = spark.sql(
      """WITH pre AS (
        |  SELECT ft.trans_id, dt.terminal_city,
        |    lag(dt.terminal_city) OVER (PARTITION BY dc.card_num
        |      ORDER BY ft.trans_date, ft.trans_id) AS prev_city,
        |    (unix_timestamp(ft.trans_date) - lag(unix_timestamp(ft.trans_date))
        |      OVER (PARTITION BY dc.card_num ORDER BY ft.trans_date, ft.trans_id)) / 3600.0 AS hrs
        |  FROM ftx ft
        |  LEFT JOIN dcards dc ON trim(ft.card_num) = trim(dc.card_num)
        |  LEFT JOIN dterm dt ON ft.terminal = dt.terminal_id)
        |SELECT count(*) AS n FROM pre
        |WHERE terminal_city <> prev_city AND hrs < 1.0""".stripMargin)
      .head.getLong(0)
    // day-3 run flags over the full 3-day fact; earlier runs flagged over
    // smaller facts — assert the final run's contribution is present
    val rep3 = rep.filter($"event_type" === "3").count()
    assert(rep3 >= flagged, s"rep3=$rep3 < final-run flagged=$flagged")

    // fio null-propagation: C5 (null patronymic) transacted day 1 on a
    // non-expired account/passport — check via report №1 faithful? Covered
    // in Faithful test below.
  }

  test("faithful mode: report №1 tautology and null blacklist rows") {
    val whRoot = Files.createTempDirectory("wh-faithful")
    val drop = Files.createTempDirectory("drop-f")
    val wh = new Warehouse(spark, whRoot.toString)
    val pipe = new Pipeline(spark, wh, Reports.Faithful)
    stageDay(drop, 1)
    pipe.run(bankFor(1), Some(drop.toString), Timestamp.valueOf("2021-03-01 23:55:00"))

    // WHERE 1=1 or … — every transaction lands in report №1
    val rep = wh.read("rep_fraud")
    assert(rep.filter($"event_type" === "1").count() == 15650L)

    // styled-empty xlsx rows stage as all-null rows and (null key ⇒ no
    // anti-join match) are inserted into the fact — 7 real + 17 null
    assert(wh.read("fact_blacklist").count() == 24L)

    // fio null-propagates for C5 (null patronymic → null fio), like PG ||
    val c5rows = rep.filter($"passport" === "5555 555555")
    assert(c5rows.count() > 0)
    assert(c5rows.filter($"fio".isNull).count() == c5rows.count())

    // golden content hash of the whole day-1 faithful report (stable:
    // no run-timestamp column reaches rep_fraud)
    val canonical = rep.collect()
      .map(_.toSeq.map(v => if (v == null) "<null>" else v.toString).mkString("|"))
      .sorted.mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString
    info(s"rep_fraud day-1 faithful golden hash: $md")
    assert(md == PipelineReplaySpec.goldenFaithfulDay1Hash)
  }
}
