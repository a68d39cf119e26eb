package graft.pipeline

/** Email rendering + delivery — graft analog of the reference's
  * `EmailTemplate`/`DownloadReportEmailTemplate`/`Email` classes
  * (reference: template.py:325-434).
  *
  * Delivery is a trait so the SES-shaped cloud sender can be swapped
  * in on a real deployment; in this environment the only shipped
  * implementation logs (zero egress by design).
  */
trait EmailTemplate {
  def render(): String
}

/** The reference's download-link HTML email, re-rendered verbatim in
  * spirit: container card, greeting, a button linking to `url`
  * (reference: template.py:336-388).
  */
final case class DownloadReportEmailTemplate(url: String) extends EmailTemplate {
  override def render(): String =
    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |  <style>
       |    body { background-color: #f2f2f2; font-family: Arial, sans-serif; line-height: 1.6; margin: 0; padding: 0; }
       |    .container { max-width: 600px; margin: 0 auto; padding: 20px; background-color: white; border-radius: 5px; }
       |    .button { background-color: #0074cc; border: none; color: white; padding: 10px 20px; text-align: center;
       |              text-decoration: none; display: inline-block; font-size: 16px; border-radius: 5px; margin-top: 15px; }
       |  </style>
       |</head>
       |<body>
       |<div class="container">
       |  <p>Hello,</p>
       |  <p>Thank you for using our service. Your requested report is ready for download.</p>
       |  <p>You can download the report by clicking the button below:</p>
       |  <a href="$url" style="color: white;" class="button">Download Report</a>
       |  <p>If you have any questions or need further assistance, please don't hesitate to contact us.</p>
       |  <p>Best regards,</p>
       |  <p>DataTeam</p>
       |</div>
       |</body>
       |</html>
       |""".stripMargin
}

final case class EmailMessage(sender: String, recipient: String, subject: String, htmlBody: String)

trait EmailSender {
  /** Returns true on successful handoff (mirrors the reference's
    * boolean `Email.send`, template.py:415-434). */
  def send(message: EmailMessage): Boolean
}

/** No-egress sender: records messages for inspection and logs. */
class LoggingEmailSender extends EmailSender {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[EmailMessage]
  def sent: Seq[EmailMessage] = buf.toSeq
  override def send(message: EmailMessage): Boolean = {
    buf += message
    System.err.println(s"[graft.email] to=${message.recipient} subject=${message.subject}")
    true
  }
}
