package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (deequ-style "expectations"): each
  * check reduces a table to one (check, n_violations) row; `run`
  * unions them with a pass flag — the gate a report pipeline would
  * evaluate before emailing numbers to customers.
  *
  * Scale: every check is a single aggregate (or anti-join + count)
  * over its table — full pushdown, map-side partial counts, no
  * driver-side row handling. Checks on the same table could be fused
  * into one pass; they're kept independent so each can prune to just
  * its own columns (a fused pass reads the union of all columns).
  */
object QualityChecks {

  private def one(name: String, violations: DataFrame): DataFrame =
    violations.select(lit(name).as("check"), col("n").cast("long").as("n_violations"))

  /** Column must contain no NULLs. */
  def notNull(df: DataFrame, c: String, name: String): DataFrame =
    one(name, df.agg(count_if(col(c).isNull).as("n")))

  /** Key columns must identify rows uniquely; violations = rows
    * involved in any duplicate key.
    */
  def unique(df: DataFrame, cols: Seq[String], name: String): DataFrame =
    one(name,
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("n")))

  /** Column values must come from the accepted set (NULLs pass —
    * combine with notNull when they shouldn't).
    */
  def acceptedValues(df: DataFrame, c: String, values: Seq[String], name: String): DataFrame =
    one(name, df.agg(count_if(col(c).isNotNull && !col(c).isin(values: _*)).as("n")))

  /** Numeric column must fall in [lo, hi]. */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double, name: String): DataFrame =
    one(name, df.agg(count_if(col(c) < lo || col(c) > hi).as("n")))

  /** Every child key must exist in the parent (referential
    * integrity); NULL child keys pass. Anti-join counts the orphans —
    * broadcast when the parent key set is small.
    */
  def referential(child: DataFrame, childKey: String, parent: DataFrame, parentKey: String,
      name: String): DataFrame =
    one(name,
      child.filter(col(childKey).isNotNull)
        // parent key renamed so childKey == parentKey can't turn the
        // anti-join condition into an ambiguous self-comparison
        .join(parent.select(col(parentKey).as("_graft_pk")),
          col(childKey) === col("_graft_pk"), "left_anti")
        .agg(count(lit(1)).as("n")))

  /** Union the checks and flag passes. */
  def run(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    checks.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
  }
}
