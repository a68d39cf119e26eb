package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Per-table incremental-read checkpoint metadata, kept as one tiny
  * JSON file per table on the cluster filesystem — the graft analog
  * of the reference's S3 metadata object
  * `metadata/<table>.json` with `last_processed_commit`
  * (reference: template.py:174-195).
  *
  * Uses the Hadoop FileSystem API so the same code addresses local
  * FS, HDFS, or object stores on a real cluster. State is O(1) per
  * table regardless of data volume.
  */
final case class Checkpoint(tableName: String, lastProcessedCommit: String, path: String)

class CheckpointStore(root: String, hadoopConf: Configuration) {

  private def metaPath(tableName: String) = new Path(s"$root/metadata/$tableName.json")

  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  def exists(tableName: String): Boolean = {
    val p = metaPath(tableName)
    fs(p).exists(p)
  }

  def read(tableName: String): Option[Checkpoint] = {
    val p = metaPath(tableName)
    val f = fs(p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val bytes =
        try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
        finally in.close()
      parse(new String(bytes, StandardCharsets.UTF_8))
    }
  }

  /** Write via temp file + rename so a torn write never corrupts the
    * live metadata file. (Hadoop local rename won't clobber, so the
    * old file is deleted first; a crash in that window leaves no
    * checkpoint — which re-reads from the beginning, the safe side.)
    */
  def write(cp: Checkpoint): Unit = {
    val p = metaPath(cp.tableName)
    val f = fs(p)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(render(cp).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"checkpoint swap failed for $p")
  }

  def delete(tableName: String): Unit = {
    val p = metaPath(tableName)
    val f = fs(p)
    if (f.exists(p)) f.delete(p, false)
  }

  // Minimal flat-JSON codec: the metadata is three known string
  // fields; avoids pulling a JSON library into the hot path.
  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c    => c.toString
    }

  private def render(cp: Checkpoint): String =
    s"""{"table_name": "${esc(cp.tableName)}", "last_processed_commit": "${esc(cp.lastProcessedCommit)}", "path": "${esc(cp.path)}"}"""

  private def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'   => sb.append('\n')
          case other => sb.append(other) // \" and \\ (and identity for the rest)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val Field = """"([^"]+)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  private def parse(json: String): Option[Checkpoint] = {
    val kv = Field.findAllMatchIn(json).map(m => m.group(1) -> unesc(m.group(2))).toMap
    for {
      t <- kv.get("table_name")
      c <- kv.get("last_processed_commit")
    } yield Checkpoint(t, c, kv.getOrElse("path", ""))
  }
}
