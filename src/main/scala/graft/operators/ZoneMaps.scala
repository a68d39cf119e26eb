package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (min/max data skipping) — the table-format
  * side of the reference's clustered layout
  * (generate_hudi_table.py:150-156: clustering sorts by a column so
  * Hudi's column-stats index can skip files; Delta/Iceberg keep the
  * same stats in their metadata).
  *
  * Spark's parquet reader already skips ROW GROUPS via footer stats,
  * but it still has to OPEN every file to learn that. At 100 TB /
  * millions of files, listing+footer reads dominate point-ish
  * queries; a zone-map table answers "which files can match" from a
  * few KB of metadata instead. `build` computes the stats table with
  * one distributed scan; `prunedRead` intersects it with a range
  * predicate on the driver (the stats table is tiny — one row per
  * file) and plans a scan over only the surviving files, then
  * re-applies the exact predicate for row-level correctness (zone
  * maps are a superset filter, never a substitute).
  *
  * Pruning power tracks layout: on a table clustered by the stats
  * column (UpsertWriter.clusterBy / ZOrder), file ranges are disjoint
  * and a point/range predicate touches ~1 file; on a random layout
  * every file overlaps every range and nothing prunes — same contract
  * as Hudi/Delta data skipping.
  */
object ZoneMaps {

  /** Metadata-only COUNT(*): the sum of parquet footer record counts
    * — zero row-group I/O, the count answer Iceberg/Delta serve from
    * stats while a naive scan reads 100 TB to count it. Footers are
    * read DISTRIBUTED (one task per file batch), so a million-file
    * table costs a million footer reads spread over the cluster, not
    * a driver loop; only the per-task partial sums return.
    *
    * Exactness contract: parquet footers are authoritative for row
    * counts (a file whose footer lies is corrupt). Tasks open files
    * with a fresh Hadoop Configuration — correct for file-scheme and
    * default-configured object stores; plumb credentials through the
    * cluster's core-site for anything else.
    */
  private def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path): Seq[Path] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(p)
      else fs.listStatus(p).toSeq.flatMap { s =>
        val name = s.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) Nil
        else if (s.isDirectory) dataFiles(s.getPath)
        else if (name.endsWith(".parquet") || name.startsWith("part-")) Seq(s.getPath)
        else Nil
      }
    }
    dataFiles(root).map(_.toString)
  }

  def countFromFooters(spark: SparkSession, dir: String): Long = {
    import org.apache.hadoop.fs.Path
    val files = listDataFiles(spark, dir)
    if (files.isEmpty) 0L
    else spark.sparkContext
      .parallelize(files, math.min(files.size, 64))
      .map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(f), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }
      .sum().toLong
  }

  /** Metadata-only MIN/MAX of a numeric column: the per-chunk
    * statistics every parquet footer already carries, reduced
    * distributed (one task per file batch, only per-task partials
    * return) — zero row-group I/O, the stats-served aggregate answer
    * Iceberg/Delta give `SELECT min(x), max(x)` on 100 TB.
    *
    * Integer and floating primitives only, BY CONTRACT: parquet
    * writers may TRUNCATE binary (string/decimal-binary) min/max
    * stats, which stay valid for pruning but are NOT the exact
    * extremes — serving them as aggregate answers would be silently
    * wrong, so strings refuse loudly here and keep using the
    * scan-based path. A chunk missing statistics also refuses loudly
    * (old writers) rather than guessing; all-null chunks are skipped,
    * and an all-null (or empty) table returns the SQL answer: null.
    *
    * Returns one row (min_v, max_v) typed LONG for integral columns,
    * DOUBLE for floating — exact in both (no long→double rounding).
    */
  def minMaxFromFooters(spark: SparkSession, dir: String, column: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val files = listDataFiles(spark, dir)
    // (isIntegral, minLong, maxLong, minDouble, maxDouble) per file with any non-null value
    val partials: Seq[(Boolean, Long, Long, Double, Double)] =
      if (files.isEmpty) Nil
      else spark.sparkContext
        .parallelize(files, math.min(files.size, 64))
        .flatMap { f =>
          import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
          val conf = new org.apache.hadoop.conf.Configuration()
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val md = r.getFooter.getFileMetaData
            val colIdx = md.getSchema.getFields
            import scala.jdk.CollectionConverters._
            val field = md.getSchema.getColumns.asScala
              .find(_.getPath.mkString(".") == column)
              .getOrElse(throw new IllegalArgumentException(
                s"minMaxFromFooters: no leaf column '$column' in $f (schema ${colIdx})"))
            val tpe = field.getPrimitiveType.getPrimitiveTypeName
            val integral = tpe match {
              case INT32 | INT64 => true
              case FLOAT | DOUBLE => false
              case other => throw new IllegalArgumentException(
                s"minMaxFromFooters: column '$column' is $other — binary stats may be " +
                  "truncated by writers and are not exact extremes; use the scan path")
            }
            val chunks = r.getFooter.getBlocks.asScala.flatMap(
              _.getColumns.asScala.find(_.getPath.toDotString == column))
            val live = chunks.filter(_.getValueCount > 0).flatMap { cc =>
              val st = cc.getStatistics
              if (st == null || st.isEmpty)
                throw new IllegalStateException(
                  s"minMaxFromFooters: chunk of '$column' in $f carries no statistics — " +
                    "refusing to guess (re-write with a stats-producing writer or scan)")
              if (!st.hasNonNullValue) None // all-null chunk
              else Some((st.genericGetMin, st.genericGetMax))
            }
            if (live.isEmpty) None
            else {
              def asLong(v: Any): Long = v match {
                case i: java.lang.Integer => i.longValue
                case l: java.lang.Long => l
                case _ => 0L
              }
              def asDouble(v: Any): Double = v match {
                case fl: java.lang.Float => fl.doubleValue
                case d: java.lang.Double => d
                case _ => 0.0
              }
              if (integral)
                Some((true, live.map(c => asLong(c._1)).min, live.map(c => asLong(c._2)).max, 0.0, 0.0))
              else
                Some((false, 0L, 0L, live.map(c => asDouble(c._1)).min, live.map(c => asDouble(c._2)).max))
            }
          } finally r.close()
        }
        .collect().toIndexedSeq
    import spark.implicits._
    if (partials.isEmpty)
      // SQL min/max over no non-null values: one row of nulls (typed long)
      Seq((Option.empty[Long], Option.empty[Long])).toDF("min_v", "max_v")
    else if (partials.head._1)
      Seq((partials.map(_._2).min, partials.map(_._3).max)).toDF("min_v", "max_v")
    else
      Seq((partials.map(_._4).min, partials.map(_._5).max)).toDF("min_v", "max_v")
  }

  /** One row per parquet file: (file, n_rows, min, max) of `statsCol`.
    * One distributed scan, aggregated on the (grouped, pre-combined)
    * file name — no shuffle pressure: partial aggregation collapses
    * each task's rows to one row per file before the exchange.
    */
  def build(spark: SparkSession, dir: String, statsCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(statsCol)).as("min_v"),
        max(col(statsCol)).as("max_v"))

  /** Files whose [min,max] zone intersects [lo,hi] — the candidate
    * set a range predicate must read. Driver-side collect of the
    * stats table is intentional: it's one small row per file.
    */
  def candidateFiles(zoneMap: DataFrame, lo: Any, hi: Any): Seq[String] =
    zoneMap
      .filter(col("max_v") >= lit(lo) && col("min_v") <= lit(hi))
      .select("file")
      .collect()
      .map(_.getString(0))
      .toIndexedSeq

  /** Range scan via the zone map: read ONLY the candidate files, then
    * re-apply the exact predicate. Row-identical to the full scan
    * with the same predicate; cheaper by however many files the
    * layout lets the zone map rule out.
    *
    * The candidate list is collected to the driver because file paths
    * must reach the PLANNER for the scan itself to skip opening
    * files — that is the whole I/O win, and the predicate has already
    * shrunk the list (candidates, not the full stats table, cross the
    * driver). When even the candidate set is unbounded, use
    * [[prunedReadSemiJoin]].
    */
  def prunedRead(
      spark: SparkSession,
      dir: String,
      zoneMap: DataFrame,
      statsCol: String,
      lo: Any,
      hi: Any): DataFrame = {
    val files = candidateFiles(zoneMap, lo, hi)
    val base =
      if (files.isEmpty)
        // no file can match: empty frame with the table's schema
        spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }

  /** The fully-distributed variant: the stats table NEVER touches the
    * driver — candidate file names stay a DataFrame and broadcast into
    * a left-semi join against `input_file_name()` of one scan of the
    * table. Result-identical to [[prunedRead]] (spec-proven).
    *
    * Trade, stated honestly: with no file list at planning time the
    * scan still OPENS every file (parquet footer stats then skip row
    * groups) — this shape prunes row WORK and keeps the driver's
    * memory flat at any file count, while `prunedRead` also prunes
    * file OPENS but pays one driver-side candidate list. At 100 TB:
    * route point-ish queries through `prunedRead` (candidates are few
    * by construction when the layout clusters on the stats column)
    * and analytical sweeps whose candidate set is itself huge through
    * this one.
    */
  def prunedReadSemiJoin(
      spark: SparkSession,
      dir: String,
      zoneMap: DataFrame,
      statsCol: String,
      lo: Any,
      hi: Any): DataFrame = {
    val cand = zoneMap
      .filter(col("max_v") >= lit(lo) && col("min_v") <= lit(hi))
      .select(col("file"))
    spark.read.parquet(dir)
      .withColumn("_zm_file", input_file_name())
      .join(broadcast(cand), col("_zm_file") === col("file"), "left_semi")
      .drop("_zm_file")
      .filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }

  // -----------------------------------------------------------------
  // Persisted zone-map index with O(changes) incremental maintenance
  // (generic machinery in GenerationalFileIndex, shared with the
  // persisted bloom index)
  // -----------------------------------------------------------------

  /** The committed zone-map rows at `indexPath` — same schema as
    * [[build]]'s result; usable with [[candidateFiles]]/[[prunedRead]]
    * /[[prunedReadSemiJoin]].
    */
  def load(spark: SparkSession, indexPath: String): DataFrame =
    GenerationalFileIndex.load(spark, indexPath, "zone-map index")

  /** Build or INCREMENTALLY refresh the persisted zone map at
    * `indexPath` for `statsCol` of the parquet table at `dir`: only
    * files added since the last refresh are scanned (the file-list
    * diff is pure FS metadata), removed files drop their rows
    * scan-free, the HEAD-pointer-last commit leaves a crashed refresh
    * stale-never-torn, and `statsCol` is pinned — a refresh with a
    * different column refuses loudly. Per-commit maintenance cost
    * tracks the COMMIT, not the table: the same contract as the
    * bloom index (10s3) and Hudi/Delta column-stats maintenance.
    */
  def refresh(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      statsCol: String): GenerationalFileIndex.Stats =
    GenerationalFileIndex.refresh(
      spark, dir, indexPath,
      what = "zone-map index",
      metaContent = s"statsCol=$statsCol",
      indexRowsFor = files => spark.read.parquet(files: _*)
        .groupBy(input_file_name().as("file"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col(statsCol)).as("min_v"),
          max(col(statsCol)).as("max_v")),
      emptyRows = () => spark.read.parquet(dir).limit(0)
        .groupBy(input_file_name().as("file"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col(statsCol)).as("min_v"),
          max(col(statsCol)).as("max_v")))
}
