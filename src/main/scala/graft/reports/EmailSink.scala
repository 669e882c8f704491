package graft.reports

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

/** S8 email sink (reference tasks.py:131-234 LiskoEmail + :733-745
  * send_email_report): dependency-free MIME assembly with the reference's
  * exact part semantics — plain text attached FIRST, then HTML ("email
  * clients try to render the last part first", tasks.py:199-204), then
  * base64 attachments carrying both Content-Disposition and the chart's
  * Content-ID so `cid:` references in the HTML resolve (tasks.py:206-218).
  *
  * The network hop is a [[EmailSink.Transport]] seam: real SMTP (SSL /
  * STARTTLS per the reference) binds at deploy time; [[EmailSink.FileTransport]]
  * lands the .eml locally — the engine-side contract is the message, not
  * the socket.
  */
object EmailSink {

  case class Attachment(filename: String, bytes: Array[Byte],
                        contentId: Option[String] = None)

  case class Email(subject: String, from: String, to: String,
                   cc: Option[String] = None, bcc: Option[String] = None,
                   plainBody: Option[String] = None,
                   htmlBody: Option[String] = None,
                   attachments: Seq[Attachment] = Seq.empty)

  /** Assemble the RFC-2045 multipart message (deterministic boundary for
    * golden tests). */
  def buildMime(email: Email,
                boundary: String = "lisko-mime-boundary"): String = {
    val sb = new StringBuilder
    def header(k: String, v: String): Unit = sb.append(s"$k: $v\r\n")
    header("Subject", email.subject)
    header("From", email.from)
    header("To", email.to)
    email.cc.foreach(header("Cc", _))
    email.bcc.foreach(header("Bcc", _))
    header("MIME-Version", "1.0")
    header("Content-Type", s"""multipart/mixed; boundary="$boundary"""")
    sb.append("\r\n")

    def part(headers: Seq[(String, String)], body: String): Unit = {
      sb.append(s"--$boundary\r\n")
      headers.foreach { case (k, v) => header(k, v) }
      sb.append("\r\n").append(body).append("\r\n")
    }
    // plain first, html second — the reference's client-rendering order
    email.plainBody.foreach(p =>
      part(Seq("Content-Type" -> "text/plain; charset=UTF-8"), p))
    email.htmlBody.foreach(h =>
      part(Seq("Content-Type" -> "text/html; charset=UTF-8"), h))
    email.attachments.foreach { a =>
      val b64 = Base64.getMimeEncoder(76, "\r\n".getBytes)
        .encodeToString(a.bytes)
      part(
        Seq("Content-Type" -> "application/octet-stream",
          "Content-Transfer-Encoding" -> "base64",
          "Content-Disposition" -> s"attachment; filename= ${a.filename}") ++
          a.contentId.map(id => "Content-ID" -> s"<$id>"),
        b64)
    }
    sb.append(s"--$boundary--\r\n")
    sb.toString
  }

  /** The network seam (tasks.py:220-233 opens SMTP_SSL/STARTTLS here). */
  trait Transport {
    def send(mime: String, from: String, recipients: Seq[String]): Unit
  }

  /** Local-delivery transport: lands each message as an .eml file. */
  final class FileTransport(dir: String) extends Transport {
    override def send(mime: String, from: String,
                      recipients: Seq[String]): Unit = {
      Files.createDirectories(Paths.get(dir))
      val name = s"${System.nanoTime()}-${recipients.headOption.getOrElse("none")
        .replaceAll("[^A-Za-z0-9.@_-]", "_")}.eml"
      Files.write(Paths.get(dir, name), mime.getBytes(StandardCharsets.UTF_8))
    }
  }

  /** The reference's send_email_report (tasks.py:733-745): subject from the
    * report day, fixed from-address, HTML body, chart attachment under the
    * template's Content-ID. */
  def sendReport(reportHtml: String, dayNumber: Int, emailTo: String,
                 chart: Option[Array[Byte]], transport: Transport,
                 emailFrom: String = "Lisko Home Automation"): Email = {
    val email = Email(
      subject = s"MyfitnessPaw Progress Report (Day $dayNumber)",
      from = emailFrom, to = emailTo, htmlBody = Some(reportHtml),
      attachments = chart.map(bytes =>
        Attachment("temp.png", bytes, Some("test.png@lisko.id"))).toSeq)
    val recipients = Seq(email.to) ++ email.cc ++ email.bcc
    transport.send(buildMime(email), email.from, recipients)
    email
  }
}
