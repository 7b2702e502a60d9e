package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.{Date, Timestamp}
import graft.sources.{BankSource, FileSources}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared three-day replay fixture (FIXTURES §1.4): the reference's own
  * transactions/terminals/blacklist files for days 01-03 March 2021, plus
  * a synthesized `bank` source covering every SCD1 path (insert, update,
  * delete, expired passport, expired contract, blacklisted passport, null
  * patronymic). Used by the replay spec and by [[graft.RefWarehouseDump]],
  * which freezes the post-replay warehouse into committed parquet for the
  * q_rep_fraud driver oracle.
  */
object ReplayFixtures {
  val ref = "/root/reference"
  val feb1: Timestamp = Timestamp.valueOf("2021-02-01 00:00:00")

  def dayTs(d: Int): Timestamp = Timestamp.valueOf(f"2021-03-0$d%d 23:55:00")

  /** six real card numbers that occur in the day-1 transactions file */
  def cardNums(spark: SparkSession): Seq[String] =
    FileSources.transactionsCsv(spark, s"$ref/transactions_01032021.txt")
      .select("card_num").distinct().limit(6).collect().map(_.getString(0)).toSeq

  /** client tuple: (id, last, first, patronymic, dob, passport, valid_to, phone, create, update) */
  def clientsDay1: Seq[(String, String, String, Option[String], Date, String,
    Option[Date], String, Timestamp, Option[Timestamp])] = Seq(
    ("C1", "Иванов", "Иван", Some("Иванович"), Date.valueOf("1980-01-01"),
      "1111 111111", Some(Date.valueOf("2030-01-01")), "+7 111", feb1, None),
    ("C2", "Петров", "Пётр", Some("Петрович"), Date.valueOf("1981-01-01"),
      "2222 222222", Some(Date.valueOf("2030-01-01")), "+7 222", feb1, None),
    ("C3", "Сидоров", "Сидор", Some("Сидорович"), Date.valueOf("1982-01-01"),
      "3333 333333", Some(Date.valueOf("2021-01-01")), "+7 333", feb1, None), // expired passport
    ("C4", "Козлов", "Козьма", Some("Козьмич"), Date.valueOf("1983-01-01"),
      "9933 106914", Some(Date.valueOf("2030-01-01")), "+7 444", feb1, None), // blacklisted
    ("C5", "Безотчества", "Ной", None, Date.valueOf("1984-01-01"),
      "5555 555555", Some(Date.valueOf("2030-01-01")), "+7 555", feb1, None)) // null patronymic

  def clientsDf(spark: SparkSession, rows: Seq[(String, String, String, Option[String], Date,
    String, Option[Date], String, Timestamp, Option[Timestamp])]): DataFrame = {
    import spark.implicits._
    rows.toDF("client_id", "last_name", "first_name", "patronymic", "date_of_birth",
      "passport_num", "passport_valid_to", "phone", "create_dt", "update_dt")
  }

  def accountsDf(spark: SparkSession,
                 rows: Seq[(String, Date, String, Timestamp, Option[Timestamp])]): DataFrame = {
    import spark.implicits._
    rows.toDF("account_num", "valid_to", "client", "create_dt", "update_dt")
  }

  def cardsDf(spark: SparkSession,
              rows: Seq[(String, String, Timestamp, Option[Timestamp])]): DataFrame = {
    import spark.implicits._
    rows.toDF("card_num", "account_num", "create_dt", "update_dt")
  }

  def bankFor(spark0: SparkSession, day: Int): BankSource = new BankSource {
    val day2Up: Timestamp = Timestamp.valueOf("2021-03-02 10:00:00")
    private lazy val nums = cardNums(spark0)
    def clients(s: SparkSession): DataFrame = {
      val base = clientsDay1
      val rows = if (day == 1) base
      else base.filterNot(_._1 == "C5") // C5 deleted day 2
        .map(r => if (r._1 == "C2") r.copy(_8 = "+7 999", _10 = Some(day2Up)) else r) :+ // C2 phone update
        ("C6", "Новиков", "Нов", Some("Новович"), Date.valueOf("1985-01-01"),
          "6666 666666", Some(Date.valueOf("2030-01-01")), "+7 666", day2Up,
          None: Option[Timestamp]) // insert
      clientsDf(s, rows)
    }
    def accounts(s: SparkSession): DataFrame = {
      val base = Seq(
        ("A1", Date.valueOf("2030-01-01"), "C1", feb1, None: Option[Timestamp]),
        ("A2", Date.valueOf("2021-02-01"), "C2", feb1, None: Option[Timestamp]), // expired contract
        ("A3", Date.valueOf("2030-01-01"), "C3", feb1, None: Option[Timestamp]),
        ("A4", Date.valueOf("2030-01-01"), "C4", feb1, None: Option[Timestamp]),
        ("A5", Date.valueOf("2030-01-01"), "C5", feb1, None: Option[Timestamp]))
      accountsDf(s, if (day == 1) base else base.filterNot(_._3 == "C5") :+
        ("A6", Date.valueOf("2030-01-01"), "C6", day2Up, None: Option[Timestamp]))
    }
    def cards(s: SparkSession): DataFrame = {
      val base = (1 to 5).map(i => (nums(i - 1), s"A$i", feb1, None: Option[Timestamp]))
      cardsDf(s, if (day == 1) base else base.filterNot(_._2 == "A5") :+
        (nums(5), "A6", day2Up, None: Option[Timestamp]))
    }
  }

  def stageDay(drop: Path, day: Int): Unit = {
    val d = f"${day}%02d032021"
    Seq(s"transactions_$d.txt", s"terminals_$d.xlsx", s"passport_blacklist_$d.xlsx")
      .foreach { n =>
        Files.copy(Paths.get(ref, n), drop.resolve(n), StandardCopyOption.REPLACE_EXISTING)
      }
  }
}
