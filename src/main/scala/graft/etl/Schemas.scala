package graft.etl

import org.apache.spark.sql.types._

/** Declared, ordered schemas for every warehouse table — the Spark
  * counterpart of the reference DDL (`/root/reference/main.ddl`). Column
  * order is first-class: the reference discovers it from
  * `information_schema.columns` and force-fits incoming frames by position
  * (main.py:48-62); here the order is pinned in code (SURVEY §1).
  *
  * Type map (SURVEY §1): VARCHAR/BPCHAR → StringType (PG blank-padding is
  * normalized explicitly at join sites, not in storage), TIMESTAMP(0) →
  * TimestampType truncated to whole seconds at parse time,
  * DECIMAL(18,5) → DecimalType(18,5).
  */
object Schemas {
  private def audit: Seq[StructField] = Seq(
    StructField("create_dt", TimestampType),
    StructField("update_dt", TimestampType),
    StructField("processed_dt", TimestampType))

  /** main.ddl:7-15 — staging and dim share the shape (SCD1). */
  val terminals: StructType = StructType(Seq(
    StructField("terminal_id", StringType),
    StructField("terminal_type", StringType),
    StructField("terminal_city", StringType),
    StructField("terminal_address", StringType)) ++ audit)

  /** main.ddl:42-54 */
  val clients: StructType = StructType(Seq(
    StructField("client_id", StringType),
    StructField("last_name", StringType),
    StructField("first_name", StringType),
    StructField("patronymic", StringType),
    StructField("date_of_birth", DateType),
    StructField("passport_num", StringType),
    StructField("passport_valid_to", DateType),
    StructField("phone", StringType)) ++ audit)

  /** main.ddl:85-92 */
  val accounts: StructType = StructType(Seq(
    StructField("account_num", StringType),
    StructField("valid_to", DateType),
    StructField("client", StringType)) ++ audit)

  /** main.ddl:118-124 */
  val cards: StructType = StructType(Seq(
    StructField("card_num", StringType),
    StructField("account_num", StringType)) ++ audit)

  /** main.ddl:149-157 — no audit columns on transactions. */
  val transactions: StructType = StructType(Seq(
    StructField("trans_id", StringType),
    StructField("trans_date", TimestampType),
    StructField("amt", DecimalType(18, 5)),
    StructField("card_num", StringType),
    StructField("oper_type", StringType),
    StructField("oper_result", StringType),
    StructField("terminal", StringType)))

  /** main.ddl:177-180 */
  val blacklist: StructType = StructType(Seq(
    StructField("entry_dt", TimestampType),
    StructField("passport_num", StringType)))

  /** main.ddl:196-203 */
  val repFraud: StructType = StructType(Seq(
    StructField("event_dt", TimestampType),
    StructField("passport", StringType),
    StructField("fio", StringType),
    StructField("phone", StringType),
    StructField("event_type", StringType),
    StructField("report_dt", TimestampType)))

  /** main.ddl:208-212 */
  val meta: StructType = StructType(Seq(
    StructField("schema_name", StringType),
    StructField("table_name", StringType),
    StructField("max_update_dt", TimestampType)))

  /** Non-key, non-audit attribute lists driving SCD1 change detection —
    * mirrors the hand-written per-column disjunctions at
    * main.py:183-212 (terminals), 216-268 (clients), 272-299 (accounts),
    * 303-324 (cards).
    */
  val dimKeys: Map[String, String] = Map(
    "dim_terminals" -> "terminal_id",
    "dim_clients" -> "client_id",
    "dim_accounts" -> "account_num",
    "dim_cards" -> "card_num")

  val dimCompareCols: Map[String, Seq[String]] = Map(
    "dim_terminals" -> Seq("terminal_type", "terminal_city", "terminal_address"),
    "dim_clients" -> Seq("last_name", "first_name", "patronymic", "date_of_birth",
      "passport_num", "passport_valid_to", "phone"),
    "dim_accounts" -> Seq("valid_to", "client"),
    "dim_cards" -> Seq("account_num"))

  /** Warehouse table registry: name → schema. `stg_*` are transient
    * snapshots, `dim_*` SCD1, `fact_*` append-only, `rep_fraud` append-only,
    * `meta` upserted (SURVEY §1 layer table).
    */
  val tables: Map[String, StructType] = Map(
    "stg_terminals" -> terminals,
    "stg_clients" -> clients,
    "stg_accounts" -> accounts,
    "stg_cards" -> cards,
    "stg_transactions" -> transactions,
    "stg_blacklist" -> blacklist,
    "dim_terminals" -> terminals,
    "dim_clients" -> clients,
    "dim_accounts" -> accounts,
    "dim_cards" -> cards,
    "fact_transactions" -> transactions,
    "fact_blacklist" -> blacklist,
    "rep_fraud" -> repFraud,
    "meta" -> meta)
}
