package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Web-corpus curation plumbing: URL parsing and per-domain quotas —
  * the C4/CC-style steps between "crawl rows" and "training corpus".
  * (The reference pipeline trusts its catalog for provenance; a web
  * corpus has to derive provenance from the URL itself.)
  *
  * Both ops are pure projections + one bounded window: no UDFs, no
  * driver state, nothing that degrades at 100 TB. URL parsing is
  * `parse_url` (codegen'd built-in) with a regex fallback for the
  * registered domain; the cap is the same shuffle-on-group +
  * row_number shape as language balancing.
  */
object WebCuration {

  /** Split a URL column into host / path / query / registered domain.
    * The registered domain is approximated as the last two labels of
    * the host — the public-suffix list is a lookup table you'd
    * broadcast-join in production; the two-label heuristic keeps the
    * op dependency-free and exactly reproducible.
    */
  def parseUrls(df: DataFrame, urlCol: String = "url"): DataFrame =
    df
      .withColumn("host", expr(s"parse_url($urlCol, 'HOST')"))
      .withColumn("path", expr(s"parse_url($urlCol, 'PATH')"))
      .withColumn("query", expr(s"parse_url($urlCol, 'QUERY')"))
      .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))

  /** Per-domain quota: keep at most `k` rows per registered domain,
    * best-first by `orderCol` descending (quality proxy), doc id as
    * the deterministic tiebreak. One shuffle on the domain; the
    * row_number window never sees more than one domain's rows per
    * partition task — no global sort.
    */
  def domainCap(
      parsed: DataFrame,
      k: Int,
      orderCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("domain"))
      .orderBy(col(orderCol).desc, col(idCol))
    parsed.withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= k)
  }
}
