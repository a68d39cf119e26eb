package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level Bloom index — point-predicate data skipping on columns
  * the layout does NOT cluster, the gap [[ZoneMaps]] leaves open: on
  * an unclustered column every file's [min,max] spans the whole
  * domain and zone maps prune nothing, but a per-file membership
  * filter still knows which files can contain `key = v`. This is
  * Hudi's bloom index / the Delta-Iceberg bloom file-skipping shape:
  * the index answers "which files can hold this key" from metadata;
  * the read re-applies the exact predicate (the filter admits FALSE
  * POSITIVES — extra candidate files — never false negatives, so the
  * pruned read is row-identical to the full scan by construction).
  *
  * Representation: a k=1 Bloom filter per file over `m` hash buckets
  * (`xxhash64(canonical(key)) pmod m`), stored as the SORTED ARRAY of
  * set bucket positions rather than a packed bitmap — bounded at `m`
  * ints per file either way, and exact-integer enough for a
  * cross-engine oracle to re-derive bucket-for-bucket. At a million
  * files the index is file-count-sized metadata, built with ONE
  * distributed scan whose per-file partial (collect_set, capped at m
  * values) combines map-side; expected false-positive rate per file
  * is its fill fraction (distinct keys / m), so size m to the
  * per-file key cardinality, not the table's.
  *
  * Hash canonicalization — the no-false-negative contract's fine
  * print: xxhash64 is input-TYPE-sensitive (the Long 7 and the Int 7
  * hash differently), so both build and probe sides hash the value's
  * STRING form. A probe literal whose type drifted from the indexed
  * column (Int vs Long, a re-read schema widening) still lands in the
  * same bucket; the exact re-applied predicate keeps the final rows
  * type-correct. (Fractional/decimal types render scale-sensitively —
  * `7.0` vs `7.00` — so probe fractional columns with the SAME type
  * as indexed; integral/string keys, the point-lookup shape this
  * index exists for, are canonical by construction.)
  */
object BloomFileIndex {

  private def bucket(c: Column, m: Int): Column =
    pmod(xxhash64(c.cast("string")), lit(m.toLong))

  /** One row per parquet file: (file, n_rows, bits) — `bits` the
    * sorted distinct hash buckets of `keyCol` present in the file.
    */
  def build(spark: SparkSession, dir: String, keyCol: String, m: Int = 4096): DataFrame = {
    require(m >= 2, s"m must be >= 2, got $m")
    indexRows(spark.read.parquet(dir), keyCol, m)
  }

  private def indexRows(df: DataFrame, keyCol: String, m: Int): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        array_sort(collect_set(bucket(col(keyCol), m))).as("bits"))

  /** Files that can contain ANY of the probed key values (the
    * candidate set of an `IN`-list probe). Driver-side collect is
    * intentional and bounded: candidates shrink with the filter's
    * fill fraction, and the paths must reach the PLANNER for the
    * scan to skip file opens — same contract as
    * [[ZoneMaps.candidateFiles]].
    */
  def candidateFiles(index: DataFrame, values: Seq[Any], m: Int = 4096): Seq[String] = {
    require(values.nonEmpty, "probe at least one value")
    val probeBits = values.map(v => bucket(lit(v), m))
    index
      .filter(probeBits.map(b => array_contains(col("bits"), b)).reduce(_ || _))
      .select("file").collect().map(_.getString(0)).toIndexedSeq
  }

  /** Point/IN-list read via the index: open ONLY candidate files,
    * then re-apply the exact predicate. Row-identical to the full
    * scan; cheaper by every file whose filter proves the keys absent.
    */
  def prunedRead(
      spark: SparkSession,
      dir: String,
      index: DataFrame,
      keyCol: String,
      values: Seq[Any],
      m: Int = 4096): DataFrame = {
    val files = candidateFiles(index, values, m)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(keyCol).isin(values: _*))
  }

  /** Fully-distributed variant for probe sets too large to enumerate
    * on the driver: probes stay a DataFrame, their buckets join the
    * EXPLODED index (file, bit) to derive candidate files, and those
    * broadcast into a left-semi join against `input_file_name()` of
    * one table scan — then an equi-join against the probe set gives
    * exact rows. The driver never sees a file name or a probe value;
    * as with [[ZoneMaps.prunedReadSemiJoin]], this shape prunes row
    * WORK (and lets parquet row-group stats do the rest) while
    * keeping memory flat at any file or probe count.
    */
  def prunedReadSemiJoin(
      spark: SparkSession,
      dir: String,
      index: DataFrame,
      keyCol: String,
      probes: DataFrame,
      probeCol: String,
      m: Int = 4096): DataFrame = {
    val probeBits = probes.select(bucket(col(probeCol), m).as("_pb")).distinct()
    val cand = index
      .select(col("file"), explode(col("bits")).as("_b"))
      .join(probeBits, col("_b") === col("_pb"), "left_semi")
      .select(col("file")).distinct()
    spark.read.parquet(dir)
      .withColumn("_bf_file", input_file_name())
      .join(broadcast(cand), col("_bf_file") === col("file"), "left_semi")
      .drop("_bf_file")
      .join(probes.select(col(probeCol).as("_pv")).distinct(),
        col(keyCol) === col("_pv"), "left_semi")
  }

  // -----------------------------------------------------------------
  // Persisted index with O(changes) incremental maintenance
  // (generic machinery in GenerationalFileIndex, shared with the
  // persisted zone-map index)
  // -----------------------------------------------------------------

  /** Outcome of a [[refresh]]: how many files were newly indexed
    * (the only ones SCANNED) and how many dropped (metadata-only).
    */
  final case class RefreshStats(added: Long, removed: Long, indexedFiles: Long)

  /** The committed index rows at `indexPath` — same schema as
    * [[build]]'s result; usable with every probe above.
    */
  def load(spark: SparkSession, indexPath: String): DataFrame =
    GenerationalFileIndex.load(spark, indexPath, "bloom index")

  /** Build or INCREMENTALLY refresh the persisted index at
    * `indexPath` for `keyCol` of the parquet table at `dir`: only
    * files added since the last refresh are scanned, removed files
    * drop scan-free, the HEAD-pointer-last commit leaves a crashed
    * refresh stale-never-torn, and `keyCol`/`m` are pinned (mismatch
    * refuses loudly). See [[GenerationalFileIndex]] for the protocol.
    */
  def refresh(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      keyCol: String,
      m: Int = 4096): RefreshStats = {
    require(m >= 2, s"m must be >= 2, got $m")
    val st = GenerationalFileIndex.refresh(
      spark, dir, indexPath,
      what = "bloom index",
      metaContent = s"keyCol=$keyCol\nm=$m",
      indexRowsFor = files => indexRows(spark.read.parquet(files: _*), keyCol, m),
      emptyRows = () => spark.range(0).select(lit("").as("file"), lit(0L).as("n_rows"),
        typedLit(Seq.empty[Long]).as("bits")))
    RefreshStats(st.added, st.removed, st.indexedFiles)
  }
}
