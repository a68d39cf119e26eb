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
      format: String = "csv"): ReportHandle = {
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

    ReportHandle(target, s"file://$target", now.plusSeconds(expiresInSeconds))
  }
}
