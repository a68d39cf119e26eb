package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation filters that treat their criteria as DATA, not
  * literals — crawl denylists run to millions of domains and change
  * daily, so they arrive as a table, never an IN-list baked into the
  * plan.
  */
object Curation {

  /** Drop rows whose `sourceCol` appears in the blocklist table:
    * broadcast LEFT ANTI join. The fact side stays shuffle-free while
    * the blocklist fits the broadcast threshold and degrades to a
    * shuffled anti join past it — either way no row of the corpus is
    * ever duplicated or re-ordered, so the filter composes with
    * downstream dedup/split stages.
    */
  def dropBlockedSources(
      df: DataFrame,
      sourceCol: String,
      blocklist: DataFrame,
      blockCol: String): DataFrame =
    df.join(broadcast(blocklist), df(sourceCol) === blocklist(blockCol), "left_anti")
}
