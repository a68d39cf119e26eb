package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Copy-on-write upsert semantics over parquet — the graft analog of
  * the reference's Hudi upsert writer
  * (reference: generate_hudi_table.py:86-214):
  *
  *  - record key: identity of a row (`hoodie.datasource.write.recordkey.field`)
  *  - precombine key: among rows sharing a record key, highest
  *    precombine value wins (`...write.precombine.field`)
  *  - optional hive-style partitioning (`...write.partitionpath.field`
  *    with `hive_style_partitioning=true`)
  *  - optional clustering: sort-within-partitions by a column for
  *    data-skipping-friendly file layout
  *    (`hoodie.clustering.plan.strategy.sort.columns`).
  *
  * Scale: `merge` is one hash-shuffle on the record key with map-side
  * partial aggregation (a max_by struct-aggregate, NOT a global sort
  * or window), so it behaves at 100 TB: partial combine collapses
  * duplicates before the shuffle, AQE handles key skew.
  */
object UpsertWriter {

  /** Latest-wins dedup: one row per record key, the row with the
    * maximal (precombine, tiebreakers...) tuple. Tiebreakers make the
    * result deterministic when precombine values collide.
    */
  def merge(df: DataFrame, recordKeys: Seq[String], precombine: String, tiebreakers: Seq[String] = Nil): DataFrame = {
    val orderCols = (precombine +: tiebreakers).map(col)
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    // max_by over a struct ordering: struct comparison is lexicographic
    // over (precombine, tiebreakers), giving latest-wins in a single
    // hash aggregate (partial + final) — one shuffle, no sort.
    val winner = df
      .groupBy(recordKeys.map(col): _*)
      .agg(max_by(payload, struct(orderCols: _*)).as("_graft_row"))
      .select(col("_graft_row.*"))
    winner
  }

  /** Window-based variant kept for semantics tests: identical result
    * to `merge`, but via row_number — useful as an oracle shape and
    * when the full input ordering matters.
    */
  def mergeViaWindow(df: DataFrame, recordKeys: Seq[String], precombine: String, tiebreakers: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy(recordKeys.map(col): _*)
      .orderBy((precombine +: tiebreakers).map(c => col(c).desc): _*)
    df.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
  }

  /** Upsert `updates` into the table at `targetPath`: union existing
    * data (if any) with updates, merge latest-wins, write back
    * copy-on-write. Optional hive-style partitioning and clustering
    * (sort-within-partitions on `clusterBy`).
    */
  def upsert(
      updates: DataFrame,
      targetPath: String,
      recordKeys: Seq[String],
      precombine: String,
      partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = updates.sparkSession
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Updates win over existing rows at equal precombine values.
    val merged =
      if (fs.exists(target)) {
        val existing = spark.read.parquet(targetPath).withColumn("_graft_src", lit(0))
        val tagged = updates.withColumn("_graft_src", lit(1)).unionByName(existing)
        merge(tagged, recordKeys, precombine, tiebreakers = Seq("_graft_src")).drop("_graft_src")
      } else {
        merge(updates, recordKeys, precombine)
      }

    val clustered =
      if (clusterBy.nonEmpty) merged.sortWithinPartitions(clusterBy.map(col): _*)
      else merged

    // Copy-on-write: materialize the new version beside the old one,
    // then swap — never overwrite a path the plan is still reading.
    val tmp = new Path(targetPath + "._graft_cow_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val writer = clustered.write.mode(SaveMode.Overwrite)
    val partitioned = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    partitioned.parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(tmp, target)
  }
}
