package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PRIVACY GUARANTEES for published data — the release-side sibling of
  * the PII scan ([[TextAnalysis]]): after direct identifiers are
  * stripped, the combination of innocuous QUASI-IDENTIFIER columns
  * (zip × birth date × gender re-identifies most of a population) is
  * what leaks. The two classical table-level guarantees:
  *
  *  - K-ANONYMITY (Sweeney): every released row shares its QI
  *    combination with ≥ k-1 others;
  *  - L-DIVERSITY (Machanavajjhala et al.): each QI group also carries
  *    ≥ l distinct values of the SENSITIVE column, closing k-anonymity's
  *    homogeneity hole (a group of 50 identical diagnoses is 50-anonymous
  *    and still discloses everything).
  *
  * Shapes: the audit is ONE partial-combining aggregation over the QI
  * key (distinct-sensitive via a two-level exact aggregation, no
  * Expand); enforcement is one window count over the same key —
  * both single-exchange, 100 TB-safe. Generalization (banding a column
  * until groups clear k) is the caller's lever; these operators measure
  * and enforce, deterministically, so both carry DuckDB oracles.
  */
object Privacy {

  /** Per-QI-group audit: size, distinct sensitive values, and the two
    * guarantee verdicts. The release decision in one frame.
    */
  def anonymityAudit(df: DataFrame, qi: Seq[String], sensitive: String,
                     k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, "k and l must be positive")
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitive)).as("n_sensitive"))
      .withColumn("k_anonymous", col("n_rows") >= k)
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** Strict enforcement by SUPPRESSION: keep only rows whose QI group
    * meets both guarantees. One window over the QI key; rows with a
    * NULL in any QI column form their own (usually suppressed) groups,
    * matching the audit's grouping semantics exactly.
    */
  def anonymize(df: DataFrame, qi: Seq[String], sensitive: String,
                k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, "k and l must be positive")
    val w = Window.partitionBy(qi.map(col): _*)
    df.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", size(collect_set(col(sensitive)).over(w)))
      .filter(col("__n") >= k && col("__s") >= l)
      .drop("__n", "__s")
  }

  /** Order-preserving value banding — the generalization lever callers
    * iterate on until the audit clears: numeric `v` coarsened to its
    * band's lower edge.
    */
  def band(v: Column, width: Long): Column =
    (floor(v.cast("long") / width) * width).cast("long")
}
