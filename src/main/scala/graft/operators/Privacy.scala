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

  /** Replace each named column with its salted token (BIGINT). */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "name at least one column to pseudonymize")
    require(!salt.contains(":"), "salt must not contain the ':' separator")
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, graft.functions.HashFunctions.fingerprint64(
        concat_ws(":", lit(salt), col(c).cast("string"))))
    }
  }
}
