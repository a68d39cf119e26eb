package graft.pipeline

/** Topic-style notification — the "SNS" alternative in the
  * reference's title (its shipped code path is the SES email in
  * Email.scala; the topic publisher is the other delivery channel the
  * reference names). A notification is subject + message published to
  * a named topic; delivery is a trait so a cloud publisher can be
  * swapped in, and the shipped implementation logs (zero egress).
  */
final case class Notification(topic: String, subject: String, message: String)

trait Notifier {
  /** Returns true on successful handoff. */
  def publish(notification: Notification): Boolean
}

/** No-egress publisher: records notifications for inspection and logs. */
class LoggingNotifier extends Notifier {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Notification]
  def published: Seq[Notification] = buf.toSeq
  override def publish(notification: Notification): Boolean = {
    buf += notification
    System.err.println(s"[graft.notify] topic=${notification.topic} subject=${notification.subject}")
    true
  }
}
