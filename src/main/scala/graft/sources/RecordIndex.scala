package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Record-level index for point lookups — the graft analog of Hudi's
  * record index / bloom index (the reference's upsert writer keys
  * every row by `recordkey.field`; Hudi uses that key to route both
  * upserts and point reads to the few files that can hold it).
  *
  * Implementation is deliberately plan-native: the table is written
  * hive-partitioned by `bucket = pmod(xxhash64(key), nBuckets)`, so a
  * key deterministically lives in exactly one of `nBuckets`
  * directories. A lookup hashes the probe keys (one tiny Spark job —
  * the SAME xxhash64 the write used, so there is no driver-side
  * reimplementation to drift), then reads with a `bucket IN (...)`
  * predicate that Catalyst resolves as PARTITION pruning: the scan
  * plans over only the probed buckets' files, never listing the rest.
  * At 100 TB / 4096 buckets, a point lookup touches 1/4096th of the
  * table regardless of cluster size.
  */
object RecordIndex {

  private def bucketCol(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)).cast("int")

  /** Write `df` partitioned by the key's hash bucket. */
  def write(df: DataFrame, targetPath: String, keyCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    df.withColumn("bucket", bucketCol(keyCol, nBuckets))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(targetPath)
  }

  /** Buckets the probe keys hash to — computed with Spark's own
    * xxhash64 so write and read can never disagree.
    */
  private def bucketsOf(spark: SparkSession, keyType: String, keys: Seq[Any], nBuckets: Int): Seq[Int] = {
    val probe = spark.createDataFrame(
      spark.sparkContext.parallelize(keys.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.DataType.fromDDL(keyType)))))
    probe.select(bucketCol("k", nBuckets).as("b")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
  }

  /** Point lookup: read only the probed keys' buckets (partition
    * pruning), then exact-match the keys. Output drops the internal
    * bucket column — row-identical to `WHERE key IN (...)` over the
    * source table.
    */
  def lookup(
      spark: SparkSession,
      indexPath: String,
      keyCol: String,
      keyType: String,
      keys: Seq[Any],
      nBuckets: Int): DataFrame = {
    val buckets = bucketsOf(spark, keyType, keys, nBuckets)
    spark.read.parquet(indexPath)
      .filter(col("bucket").isin(buckets: _*) && col(keyCol).isin(keys: _*))
      .drop("bucket")
  }
}
