package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Joining driver-side file lists (or file-path COLUMNS from delete
  * files) against a scan's `_metadata.file_path` needs both sides in
  * one canonical form: `_metadata.file_path` reports a qualified,
  * URI-percent-encoded path (`file:///.../x%20y.parquet`), while
  * table metadata holds decoded paths, relative or absolute. The
  * canonical form here is scheme-less + percent-DECODED.
  */
private[sources] object ScanPaths {

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:/+"

  /** Canonicalize an already-DECODED driver-side path. */
  def normalizeDriver(p: String): String = p.replaceFirst(SchemeRe, "/")

  /** Canonicalize the scan's `_metadata.file_path` column: strip the
    * scheme, percent-decode ('+' shielded first — it is a literal
    * plus in a URI path, not a form-encoded space).
    */
  def normalizeScan(c: Column): Column =
    url_decode(regexp_replace(regexp_replace(c, SchemeRe, "/"), "\\+", "%2B"))

  /** Canonicalize a metadata-carried file-path COLUMN (e.g. the
    * `file_path` of an Iceberg position-delete file): resolve
    * relative values against `tablePath`, strip any scheme. Values
    * are already decoded in such metadata.
    */
  def normalizeMetaColumn(c: Column, tablePath: String): Column = {
    val absolute = when(c.startsWith("/") || c.contains("://"), c)
      .otherwise(concat(lit(s"$tablePath/"), c))
    regexp_replace(absolute, SchemeRe, "/")
  }
}
