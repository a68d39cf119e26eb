package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import java.time.{Instant, LocalDate, ZoneOffset}
import java.util.UUID

/** CSV report sink with a date-partitioned layout and a download-URL
  * token — the graft analog of the reference's pandas→S3 CSV upload +
  * presigned URL (reference: template.py:451-467).
  *
  * Layout matches the reference:
  * `<root>/reports/year=Y/month=M/day=D/<uuid>.csv`.
  *
  * Unlike the reference (which funnels the whole result through
  * `toPandas()` on the driver), the write is distributed: Spark's CSV
  * sink writes partitions in parallel. For the email-a-single-file
  * use case `singleFile=true` coalesces to one part and renames it —
  * the right call for human-sized reports, explicitly NOT for bulk
  * exports (leave singleFile=false and hand out the directory).
  */
final case class ReportHandle(path: String, url: String, expiresAt: Instant)

class ReportWriter(reportRoot: String, clock: () => Instant = () => Instant.now()) {

  def datedKey(today: LocalDate, id: UUID, ext: String = "csv"): String =
    s"reports/year=${today.getYear}/month=${today.getMonthValue}/day=${today.getDayOfMonth}/$id.$ext"

  /** Write `df` as a CSV report; returns the path plus a
    * file://-scheme download URL with an expiry timestamp — the
    * local-FS stand-in for a presigned URL (the expiry is carried in
    * the handle; enforcement belongs to whatever serves the file).
    */
  def write(df: DataFrame, expiresInSeconds: Long = 86400L, singleFile: Boolean = true,
      format: String = "csv", digestManifest: Boolean = false): ReportHandle = {
    require(format == "csv" || format == "json" || format == "orc" || format == "parquet",
      s"unsupported report format: $format")
    val now = clock()
    val key = datedKey(LocalDate.ofInstant(now, ZoneOffset.UTC), UUID.randomUUID(), ext = format)
    val target = s"$reportRoot/$key"

    def save(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row], path: String): Unit =
      format match {
        case "csv" => w.option("header", "true").csv(path)
        case "json" => w.json(path) // JSON lines: one object per row, self-describing
        // columnar handoffs: not for the emailed link, for the
        // downstream system the report also lands in
        case "orc" => w.orc(path)
        case "parquet" => w.parquet(path)
      }

    if (singleFile) {
      // Write a 1-part directory, then promote the part file to the
      // final single-file name. Coalesce(1) is deliberate and
      // documented: a report emailed to a human is small by
      // construction.
      val tmpDir = s"$target._dir"
      save(df.coalesce(1).write.mode("overwrite"), tmpDir)
      val fs = new Path(tmpDir).getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      try {
        val parts = fs.globStatus(new Path(s"$tmpDir/part-*"))
        if (parts.isEmpty)
          throw new java.io.IOException(s"report write produced no part file under $tmpDir")
        if (!fs.rename(parts(0).getPath, new Path(target)))
          throw new java.io.IOException(s"failed to promote ${parts(0).getPath} to $target")
      } finally fs.delete(new Path(tmpDir), true) // no ._dir debris in the report tree
    } else {
      save(df.write.mode("overwrite"), target)
    }

    if (digestManifest) writeDigestManifest(df, target)
    ReportHandle(target, s"file://$target", now.plusSeconds(expiresInSeconds))
  }

  /** Integrity manifest beside the report: `<report>.digest.json`
    * with the row count and the order-independent content digest
    * (Σ fnv64 of the canonical row string mod 2⁶³ —
    * [[graft.operators.Profiler.contentDigest]]). A downstream
    * consumer recomputes the digest over what it received and
    * compares two numbers instead of re-shipping rows — the same
    * anti-entropy primitive the table layer uses, applied to the
    * delivery edge. Canonical string = all columns cast to string in
    * schema order, US-separated; nulls hash as empty (concat_ws
    * skips them), which is part of the documented contract.
    */
  def writeDigestManifest(df: DataFrame, reportPath: String): Unit = {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val canonical = concat_ws("\u001f", df.columns.map(c => col(c).cast("string")).toIndexedSeq: _*)
    val row = graft.operators.Profiler
      .contentDigest(df.withColumn("_g", lit(1)), Seq("_g"), canonical)
      .collect()
    val (n, d) = if (row.isEmpty) (0L, 0L) else (row(0).getLong(1), row(0).getLong(2))
    val manifest = s"""{"n_rows": $n, "digest": $d}"""
    val p = new Path(s"$reportPath.digest.json")
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Recompute and check a report's digest manifest against `df`
    * (what a consumer read back). True iff both row count and digest
    * match.
    */
  def verifyDigest(df: DataFrame, reportPath: String): Boolean = {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    val p = new Path(s"$reportPath.digest.json")
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val manifest =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val Pattern = """\{"n_rows": (\d+), "digest": (-?\d+)\}""".r
    manifest match {
      case Pattern(n, d) =>
        val canonical = concat_ws("\u001f", df.columns.map(c => col(c).cast("string")).toIndexedSeq: _*)
        val row = graft.operators.Profiler
          .contentDigest(df.withColumn("_g", lit(1)), Seq("_g"), canonical)
          .collect()
        val (gotN, gotD) = if (row.isEmpty) (0L, 0L) else (row(0).getLong(1), row(0).getLong(2))
        gotN == n.toLong && gotD == d.toLong
      case _ => false
    }
  }
}
