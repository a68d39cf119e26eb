package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets
import java.time.Instant

/** Keyed object storage over the Hadoop FileSystem API — the graft
  * analog of the reference's `AWSS3` boto3 helper
  * (reference: template.py:57-157). The same surface (put / exists /
  * get / get-or-put / delete / list-by-prefix / regex search /
  * download-URL-with-expiry) addressed to `file://`, HDFS, or any
  * object store with a Hadoop connector; nothing here is driver-state
  * beyond the handle.
  */
class ObjectStore(bucketRoot: String, hadoopConf: Configuration) {

  private val root = new Path(bucketRoot)
  private def fs: FileSystem = root.getFileSystem(hadoopConf)
  private def keyPath(key: String) = new Path(root, key)

  /** put_files (reference: template.py:64-75): store bytes at key. */
  def put(key: String, data: Array[Byte]): Unit = {
    val out = fs.create(keyPath(key), true)
    try out.write(data)
    finally out.close()
  }

  def putString(key: String, data: String): Unit =
    put(key, data.getBytes(StandardCharsets.UTF_8))

  /** item_exists (reference: template.py:77-83). */
  def exists(key: String): Boolean = fs.exists(keyPath(key))

  /** get_item (reference: template.py:85-95): None instead of the
    * reference's `False`-on-error sentinel. */
  def get(key: String): Option[Array[Byte]] = {
    val p = keyPath(key)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in))
      finally in.close()
    }
  }

  def getString(key: String): Option[String] =
    get(key).map(new String(_, StandardCharsets.UTF_8))

  /** find_one_update (reference: template.py:97-112): return the
    * stored value if the key exists, else store `data` and return it.
    */
  def findOneUpdate(key: String, data: Array[Byte]): Array[Byte] =
    get(key).getOrElse { put(key, data); data }

  /** delete_object (reference: template.py:114-117). */
  def delete(key: String): Boolean = fs.delete(keyPath(key), false)

  /** get_all_keys (reference: template.py:119-137): keys starting with
    * `prefix`, S3-style — the prefix is a STRING prefix of the key,
    * not a directory ("reports/2026/ja" matches "reports/2026/jan.csv").
    * The walk descends from the deepest directory ancestor of the
    * prefix and only into children whose name matches the remaining
    * prefix segment — never a full-bucket listing. Leading slashes are
    * normalized away (S3 keys have none).
    */
  def listKeys(prefix: String = ""): Seq[String] = {
    val norm = prefix.dropWhile(_ == '/')
    val slash = norm.lastIndexOf('/')
    val (start, rest) =
      if (slash < 0) (root, norm)
      else (keyPath(norm.substring(0, slash)), norm.substring(slash + 1))
    if (!fs.exists(start)) Nil
    else {
      val rootUri = fs.makeQualified(root).toUri.getPath.stripSuffix("/") + "/"
      def key(p: Path): String = p.toUri.getPath.stripPrefix(rootUri)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      fs.listStatus(start).foreach { st =>
        if (st.getPath.getName.startsWith(rest)) {
          if (st.isDirectory) {
            val it = fs.listFiles(st.getPath, true)
            while (it.hasNext) buf += key(it.next().getPath)
          } else buf += key(st.getPath)
        }
      }
      // belt-and-braces: when the prefix's directory ancestor is
      // actually a FILE ("a" exists, prefix "a/"), listStatus returns
      // the file itself though its key lacks the prefix — filter on
      // the full key like S3 would
      buf.toSeq.filter(_.startsWith(norm)).sorted
    }
  }

  /** find_one_similar_key (reference: template.py:145-147). */
  def findSimilarKeys(pattern: String): Seq[String] = {
    val re = pattern.r
    listKeys().filter(k => re.findFirstIn(k).isDefined)
  }

  /** generate_pre_signed_url (reference: template.py:152-157): a
    * download URL plus its expiry instant. Local-FS stand-in for a
    * presigned URL — the expiry is carried in the token; enforcement
    * belongs to whatever serves the file.
    */
  def presignedUrl(key: String, expiresInSeconds: Long = 86400L,
      clock: () => Instant = () => Instant.now()): (String, Instant) =
    (fs.makeQualified(keyPath(key)).toString, clock().plusSeconds(expiresInSeconds))
}
