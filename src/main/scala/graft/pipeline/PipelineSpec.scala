package graft.pipeline

/** Declarative pipeline configuration — graft's analog of the
  * reference's `loaders` dict (reference: template.py:471-500).
  *
  * A pipeline is: a list of sources (each FULL snapshot or INC
  * incremental), one SQL transform over the registered views, and a
  * report/notification spec.
  */
sealed trait LoadMode
object LoadMode {
  case object Full extends LoadMode
  case object Incremental extends LoadMode
}

/** One source table.
  *
  * @param tableName  view name the transform SQL refers to
  * @param path       parquet path of the table
  * @param mode       Full snapshot or Incremental-since-checkpoint
  * @param commitColumn for Incremental: the monotone commit/event-time
  *                     column that stands in for a lakehouse commit
  *                     timestamp (reference: `_hoodie_commit_time`)
  */
final case class SourceSpec(
    tableName: String,
    path: String,
    mode: LoadMode = LoadMode.Full,
    commitColumn: String = "ts")

final case class TransformSpec(query: String)

/** Report + notification settings (reference: template.py:492-498).
  * `reportRoot` replaces the S3 bucket; expiry is carried through to
  * the generated download URL token.
  */
final case class ReportSpec(
    senderEmail: String,
    recipientEmail: String,
    subject: String,
    reportRoot: String,
    fileExpiresInSeconds: Long = 86400L,
    notifyTopic: Option[String] = None)

final case class PipelineSpec(
    sources: Seq[SourceSpec],
    transform: TransformSpec,
    report: Option[ReportSpec] = None)
