package graft.sources

import org.apache.spark.sql.SparkSession

/** Catalog sync — the graft analog of the reference's Hive/Glue sync
  * (reference: generate_hudi_table.py:121-130,
  * `hoodie.datasource.hive_sync.enable/database/table`; enabled for
  * the orders table at generate_hudi_table.py:246): after a commit,
  * the table is registered in the session catalog (`spark_catalog`)
  * as an EXTERNAL datasource table whose location is the committed
  * version directory, so any other Spark session sharing the
  * metastore discovers it by name — `spark.table("db.orders")` —
  * with no knowledge of the graft layout.
  *
  * Re-pointing on commit uses `ALTER TABLE ... SET LOCATION` when the
  * table already exists (one metadata operation, never a drop window
  * where the name is unresolvable) and `CREATE TABLE ... USING
  * parquet LOCATION` on first sync. The location is a VERSION
  * directory, not the table root: readers through the catalog see
  * exactly one complete committed snapshot, and an in-flight writer's
  * uncommitted files are invisible by construction. Hive-style
  * partition subdirectories inside the version are discovered by the
  * datasource's schema inference at create time and re-discovered via
  * `recoverPartitions` after every re-point.
  */
object CatalogSync {

  /** Point `tableName` at the latest committed version of the graft
    * table at `targetPath`. Idempotent; call after each commit (or
    * pass `syncTable` to the ReportPipeline / writer entry points).
    */
  def sync(spark: SparkSession, tableName: String, targetPath: String): Unit = {
    val dir = UpsertWriter.latestVersion(spark, targetPath).getOrElse(
      throw new IllegalArgumentException(
        s"no committed versions to sync at $targetPath"))
    val quoted = quote(tableName)
    if (spark.catalog.tableExists(tableName)) {
      spark.sql(s"ALTER TABLE $quoted SET LOCATION '$dir'")
      // datasource tables cache their file listing per location;
      // re-pointing must invalidate it or readers keep the old files
      spark.sql(s"REFRESH TABLE $quoted")
    } else {
      spark.sql(s"CREATE TABLE $quoted USING parquet LOCATION '$dir'")
    }
    if (spark.catalog.listColumns(tableName).collect().exists(_.isPartition)) {
      spark.catalog.recoverPartitions(tableName)
    }
  }

  /** The catalog identifier, each part backtick-quoted. */
  private def quote(tableName: String): String =
    tableName.split('.').map(p => s"`${p.replace("`", "``")}`").mkString(".")

  /** True iff `tableName` resolves in the catalog (any session
    * sharing the metastore).
    */
  def isSynced(spark: SparkSession, tableName: String): Boolean =
    spark.catalog.tableExists(tableName)
}
