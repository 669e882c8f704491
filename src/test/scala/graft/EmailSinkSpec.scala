package graft

import graft.reports.EmailSink
import graft.reports.EmailSink.{Attachment, Email}

/** S8 golden tests: MIME structure, the reference's part order, attachment
  * encoding, Content-ID plumbing, and the file transport. */
class EmailSinkSpec extends SparkSpec {

  test("MIME assembly: headers, part order (plain before html), attachment") {
    val payload = Array.tabulate[Byte](300)(_.toByte)
    val mime = EmailSink.buildMime(Email(
      subject = "MyfitnessPaw Progress Report (Day 9)",
      from = "Lisko Home Automation", to = "user@example.com",
      cc = Some("cc@example.com"),
      plainBody = Some("plain version"),
      htmlBody = Some("<html><img src=\"cid:test.png@lisko.id\"/></html>"),
      attachments = Seq(Attachment("temp.png", payload,
        Some("test.png@lisko.id")))))

    assert(mime.startsWith("Subject: MyfitnessPaw Progress Report (Day 9)\r\n"))
    assert(mime.contains("Cc: cc@example.com\r\n"))
    assert(!mime.contains("Bcc:"))
    assert(mime.contains("""multipart/mixed; boundary="lisko-mime-boundary""""))
    // plain part must precede the html part (tasks.py:199-204: clients
    // render the LAST part first)
    val plainAt = mime.indexOf("text/plain")
    val htmlAt = mime.indexOf("text/html")
    assert(plainAt >= 0 && htmlAt >= 0 && plainAt < htmlAt)
    // attachment: base64 round-trip + both disposition and Content-ID
    assert(mime.contains("Content-Disposition: attachment; filename= temp.png"))
    assert(mime.contains("Content-ID: <test.png@lisko.id>"))
    val b64 = mime.split("Content-ID: <test.png@lisko.id>\r\n\r\n")(1)
      .split("\r\n--lisko-mime-boundary--")(0)
    assert(java.util.Base64.getMimeDecoder.decode(b64).toSeq == payload.toSeq)
    assert(mime.endsWith("--lisko-mime-boundary--\r\n"))
  }

  test("sendReport: subject shape, cid attachment, file transport delivery") {
    val dir = tmpDir("emails")
    val sent = EmailSink.sendReport("<html>report</html>", dayNumber = 12,
      emailTo = "user@example.com", chart = Some(Array[Byte](1, 2, 3)),
      transport = new EmailSink.FileTransport(dir))
    assert(sent.subject == "MyfitnessPaw Progress Report (Day 12)")
    val files = new java.io.File(dir).listFiles()
    assert(files.length == 1 && files.head.getName.endsWith("user@example.com.eml"))
    val delivered = java.nio.file.Files.readString(files.head.toPath)
    assert(delivered.contains("<html>report</html>"))
    assert(delivered.contains("Content-ID: <test.png@lisko.id>"))
  }
}
