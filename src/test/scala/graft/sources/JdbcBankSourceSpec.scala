package graft.sources

import java.sql.DriverManager
import graft.TestSpark
import graft.etl.Schemas
import org.apache.spark.sql.types.{DateType, StringType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** S1 (JDBC dim scan) round trip through EMBEDDED DERBY — the same
  * `spark.read.format("jdbc")` code path [[JdbcBankSource]] drives
  * against Postgres in production (`main.py:76-85`), exercised without a
  * live server: Derby ships in /opt/spark/jars and registers its driver
  * via the JDBC ServiceLoader. Closes the round-1 gap of S1 being the
  * only spec-less production path: a column-name/order/type drift
  * between the source SQL and `Schemas` now fails here, not in prod.
  *
  * Derby folds unquoted identifiers to upper case (Postgres folds to
  * lower), so name alignment is asserted case-insensitively; order and
  * types are exact. The pipeline itself is robust to either case: the
  * staging schema-fit is positional (`Txn.align`), mirroring the
  * reference's information_schema force-fit (main.py:61-62).
  */
class JdbcBankSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:bankdb;create=true"

  test("JdbcBankSource reads info.{clients,accounts,cards} aligned with Schemas") {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate("CREATE SCHEMA info")
    st.executeUpdate(
      """CREATE TABLE info.clients (
        |  client_id VARCHAR(10), last_name VARCHAR(30), first_name VARCHAR(30),
        |  patronymic VARCHAR(30), date_of_birth DATE, passport_num VARCHAR(15),
        |  passport_valid_to DATE, phone VARCHAR(16),
        |  create_dt TIMESTAMP, update_dt TIMESTAMP)""".stripMargin)
    st.executeUpdate(
      """CREATE TABLE info.accounts (
        |  account_num VARCHAR(20), valid_to DATE, client VARCHAR(10),
        |  create_dt TIMESTAMP, update_dt TIMESTAMP)""".stripMargin)
    st.executeUpdate(
      """CREATE TABLE info.cards (
        |  card_num VARCHAR(20), account_num VARCHAR(20),
        |  create_dt TIMESTAMP, update_dt TIMESTAMP)""".stripMargin)
    st.executeUpdate(
      "INSERT INTO info.clients VALUES ('C1', 'Иванов', 'Иван', NULL, " +
        "DATE('1980-01-01'), '1111 111111', DATE('2030-01-01'), '+7 111', " +
        "TIMESTAMP('2021-02-01 00:00:00'), NULL)")
    st.executeUpdate(
      "INSERT INTO info.accounts VALUES ('A1', DATE('2030-01-01'), 'C1', " +
        "TIMESTAMP('2021-02-01 00:00:00'), TIMESTAMP('2021-03-02 10:00:00'))")
    st.executeUpdate(
      "INSERT INTO info.cards VALUES ('4111 2222 3333 4444', 'A1', " +
        "TIMESTAMP('2021-02-01 00:00:00'), NULL)")
    st.close(); conn.close()

    val src = new JdbcBankSource(url, "app", "app")

    // the bank source supplies every Schemas column except processed_dt,
    // which the pipeline stamps at staging (P3)
    def sourceCols(t: org.apache.spark.sql.types.StructType): Seq[String] =
      t.fieldNames.toSeq.filterNot(_ == "processed_dt")

    val clients = src.clients(spark)
    assert(clients.schema.fieldNames.toSeq.map(_.toLowerCase) ==
      sourceCols(Schemas.clients))
    assert(clients.schema.fields.map(_.dataType).toSeq ==
      Seq(StringType, StringType, StringType, StringType, DateType,
        StringType, DateType, StringType, TimestampType, TimestampType))
    val c = clients.collect()
    assert(c.length == 1)
    assert(c.head.getString(1) == "Иванов") // unicode round trip
    assert(c.head.isNullAt(3) && c.head.isNullAt(9)) // nulls survive
    assert(c.head.getDate(4) == java.sql.Date.valueOf("1980-01-01"))

    val accounts = src.accounts(spark)
    assert(accounts.schema.fieldNames.toSeq.map(_.toLowerCase) ==
      sourceCols(Schemas.accounts))
    assert(accounts.head().getTimestamp(4) ==
      java.sql.Timestamp.valueOf("2021-03-02 10:00:00"))

    val cards = src.cards(spark)
    assert(cards.schema.fieldNames.toSeq.map(_.toLowerCase) ==
      sourceCols(Schemas.cards))
    assert(cards.head().getString(0) == "4111 2222 3333 4444")
  }
}
