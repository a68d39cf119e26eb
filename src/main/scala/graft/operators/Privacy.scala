package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-preserving pseudonymization — the privacy step of a shared
  * training-data pipeline: identifier columns are replaced by
  * deterministic salted tokens, so analysts can still JOIN, COUNT
  * DISTINCT and sessionize across masked tables (the same clear value
  * always maps to the same token under one salt) while the clear
  * identifiers never leave the trust boundary. Different salts
  * produce unlinkable token spaces — release epochs can't be joined
  * against each other. Complements [[TextAnalysis]]'s PII redaction
  * (which SCRUBS free text): redaction destroys join keys,
  * pseudonymization preserves them.
  *
  * Kernel honesty: the token is the codegen'd FNV-1a64 fingerprint of
  * `salt ':' value` — deterministic and cross-engine re-derivable
  * (which is what makes the op ORACLE-able), but FNV is NOT a
  * cryptographic MAC; against an adversary who can brute-force the
  * value space, swap the kernel for HMAC-SHA256 — the pipeline
  * property engineered here (map-side projection, join preservation,
  * salt-scoped unlinkability) is unchanged by the kernel choice.
  *
  * Scale shape: a pure projection — map-side, no shuffle, no state,
  * inside whole-stage codegen. Masking a 100 TB table costs exactly
  * one scan+write.
  */
object Privacy {

  /** Replace each named column with its salted token (BIGINT). NULL
    * stays NULL: `concat_ws` would silently DROP a null argument and
    * tokenize every null as fingerprint(salt) — a stable, real-looking
    * token shared by all unknowns, which would both leak "these rows
    * had no id" as a joinable pseudo-identity and diverge from SQL's
    * `'salt:' || NULL IS NULL` semantics. Strict concat + an explicit
    * null gate keep the token column's null set exactly the input's.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "name at least one column to pseudonymize")
    require(!salt.contains(":"), "salt must not contain the ':' separator")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(null).cast("long"))
          .otherwise(graft.functions.HashFunctions.fingerprint64(
            concat(lit(salt), lit(":"), col(c).cast("string")))))
    }
  }

  /** k-anonymity audit over a set of quasi-identifier columns
    * (Sweeney's re-identification model: a row is k-anonymous iff at
    * least k rows share its full quasi-identifier combination —
    * tokens from [[pseudonymize]] don't help when nation+segment+
    * balance-band single out a person). One row per distinct QI
    * combination: (qi..., n, anonymous). One map-side-combined
    * groupBy — the audit of a 100 TB table is one shuffle of its
    * distinct QI combos.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "name at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** k-anonymize by suppression: drop every row whose QI group has
    * fewer than k members — the release then satisfies k-anonymity by
    * construction (the standard cell-suppression baseline;
    * generalization hierarchies trade less data loss for domain
    * knowledge). One window count per partition — a single shuffle,
    * no joins, no driver state.
    */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "name at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("_gn", count(lit(1)).over(w))
      .filter(col("_gn") >= k)
      .drop("_gn")
  }
}
