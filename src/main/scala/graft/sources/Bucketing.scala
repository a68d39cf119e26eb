package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed + sorted table layout — the co-located-join half of the
  * reference's clustering story (generate_hudi_table.py:150-156 sorts
  * file layout by a column; bucketing adds the join-locality payoff).
  *
  * Two tables bucketed by the same keys into the same bucket count
  * join with NO exchange on either side: each task reads matching
  * bucket files directly. At 100 TB that removes the largest shuffle
  * a fact-to-fact join would otherwise pay, and the in-bucket sort
  * makes the join a streaming merge. `BucketingSpec` asserts the
  * exchange-free plan.
  */
object Bucketing {

  /** Write `df` into the session catalog as a bucketed, in-bucket
    * sorted parquet table. Bucket files land in the warehouse dir;
    * the catalog entry carries the bucket spec that join planning
    * consumes.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int,
      sortBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession

    def dropWithLocation(name: String): Unit = {
      // The warehouse directory outlives the in-memory catalog: a table
      // written by a previous session leaves an orphaned location that
      // blocks CREATE. Drop both the entry and the location.
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
      val loc = spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(name))
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }

    // Write the replacement COMPLETELY under a staging name, then swap
    // — a failed write never takes down the existing table (the only
    // exposure is the instant between drop and rename, and the staged
    // data survives either way).
    val staging = table + "_graft_staging"
    dropWithLocation(staging)
    val sorted = if (sortBy.nonEmpty) sortBy else keys
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(staging)
    dropWithLocation(table)
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
