package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

import graft.core.GbXml
import graft.frontier.PageRow

/** S4: WARC/ARC container ingest — the reference treats a .warc/.arc
  * document as a container whose archived responses are re-injected one
  * by one (`/root/reference/src/XmlDoc.cpp:3552` indexWarcOrArc,
  * `Url.cpp:1610/1647` isWarc/isArc). Here the container becomes a
  * DataFrame source: `binaryFile` scan → per-record split (ISO 28500
  * record grammar) → `PageRow`s with byte-exact extracted text.
  *
  * At 100 TB this is the primary ingest path: one Spark task per WARC
  * file (they are independently splittable at record boundaries), no
  * shuffle until the frontier append. */
object Warc {

  final case class WarcRecord(url: String, date: String, httpStatus: Int,
                              contentType: String, body: Array[Byte],
                              charset: String = "",
                              ctId: Int = graft.core.GbHttpMime.CtHtml,
                              gzip: Boolean = false,
                              deflate: Boolean = false)

  /** Content-Encoding decode of a payload member (the reference
    * gunzips in HttpServer/Msg13 — gbuncompress — before XmlDoc ever
    * sees the bytes, so the stored content is UNCOMPRESSED). A corrupt
    * stream returns null — the member is skipped, like the reference's
    * ECORRUPTHTTPGZIP drop. */
  private[sources] def contentDecode(body: Array[Byte], gzip: Boolean, deflate: Boolean): Array[Byte] = {
    if (!gzip && !deflate) return body
    try {
      val in =
        if (gzip) new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
        else new java.util.zip.InflaterInputStream(new java.io.ByteArrayInputStream(body))
      val out = new java.io.ByteArrayOutputStream(body.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => null }
  }

  private val CRLF2 = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val max = hay.length - needle.length
    while (i <= max) {
      var k = 0
      while (k < needle.length && hay(i + k) == needle(k)) k += 1
      if (k == needle.length) return i
      i += 1
    }
    -1
  }

  /** Parse all `response` records of a WARC file (uncompressed). */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = new ArrayBuffer[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      // find record header start
      val hdrStart = indexOf(bytes, "WARC/".getBytes(StandardCharsets.US_ASCII), pos)
      if (hdrStart < 0) return out.toSeq
      val hdrEnd = indexOf(bytes, CRLF2, hdrStart)
      if (hdrEnd < 0) return out.toSeq
      val header = new String(bytes, hdrStart, hdrEnd - hdrStart, StandardCharsets.ISO_8859_1)
      val fields = header.split("\r\n").drop(1).flatMap { l =>
        val i = l.indexOf(':')
        if (i > 0) Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim) else None
      }.toMap
      val len = fields.get("content-length").flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(0)
      val contentStart = hdrEnd + 4
      val contentEnd = math.min(contentStart + len, bytes.length)
      if (fields.get("warc-type").contains("response")) {
        val url = fields.getOrElse("warc-target-uri", "")
        val date = fields.getOrElse("warc-date", "")
        // content is an HTTP response: the X17 HttpMime port parses the
        // status line + headers (reference boundary/charset/location
        // quirks preserved — core/GbHttpMime.scala)
        val http = java.util.Arrays.copyOfRange(bytes, contentStart, contentEnd)
        graft.core.GbHttpMime.parse(http) match {
          case Some(m) if url.nonEmpty =>
            val body = java.util.Arrays.copyOfRange(http, m.mimeLen, http.length)
            out += WarcRecord(url, date, m.status, m.contentTypeRaw, body,
              m.charset, m.contentType, m.gzip, m.deflate)
          case _ => // no mime boundary → not an indexable response
        }
      }
      pos = contentEnd
    }
    out.toSeq
  }

  /** Read WARC files into the pages table shape: one task per file, text
    * extracted byte-exactly per url. */
  def readPages(spark: SparkSession, path: String): Dataset[PageRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { blob =>
        parseWarc(blob).iterator
          // PDF members ride through too — the reference's
          // indexWarcOrArc accepts CT_PDF (XmlDoc.cpp:4012-4020) and
          // each sub-doc converts in the pipeline (here: GbPdf at the
          // fetch CT gate, via the content_type carried on the row)
          .filter(r => r.httpStatus == 200 &&
            (graft.core.GbHttpMime.isTextual(r.ctId) ||
              r.ctId == graft.core.GbHttpMime.CtPdf))
          // gzip/deflate payload members decode first (gbuncompress);
          // corrupt streams drop the member (ECORRUPTHTTPGZIP)
          .map(r => r.copy(body = contentDecode(r.body, r.gzip, r.deflate)))
          .filter(_.body != null)
          .map { r =>
            val ts = scala.util.Try(java.sql.Timestamp.from(java.time.Instant.parse(r.date)))
              .getOrElse(new java.sql.Timestamp(0L))
            // the Target-URI string is a Latin-1 byte carrier (header
            // decode above) — canonicalize through the byte-exact entry
            // so non-ASCII URIs aren't UTF-8 double-encoded downstream
            val gu = graft.core.GbUrl.parseLatin1(r.url)
            val url = if (gu.isValid) gu.url else r.url
            // X17→X7 precedence: the header's charset param wins over
            // BOM/meta/sniff (XmlDoc::getCharset order)
            val hdrCs = graft.core.GbCharset.fromHttpHeader(r.charset)
            val utf8 = graft.core.GbCharset.toUtf8(r.body, hdrCs)
            // carry the header charset so downstream re-decodes of the
            // raw bytes (fetch / iframe expansion) keep the same
            // precedence as this text extraction; carry the CT so the
            // fetch gate routes PDFs through GbPdf
            val isPdf = r.ctId == graft.core.GbHttpMime.CtPdf
            val text =
              if (isPdf) {
                val conv = graft.core.GbPdf.toHtml(r.body)
                if (conv != null)
                  GbXml.extractText(conv.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                else "" // unconvertible (image-only) PDF: index nothing,
                        // the reference's empty-filter-output fate —
                        // never tokenize raw PDF bytes as text
              } else GbXml.extractText(utf8)
            PageRow(url, ts, r.body, text, "", r.charset,
              if (isPdf) "application/pdf" else "")
          }
      }
  }

  /** Build a WARC byte blob (test fixture / round-trip). */
  def buildWarc(records: Seq[(String, String, Array[Byte])]): Array[Byte] =
    buildWarcEnc(records.map(r => (r._1, r._2, r._3, "")))

  /** Like buildWarc with a per-record Content-Encoding ("", "gzip" or
    * "deflate"): the body is compressed accordingly and the header
    * advertises it — the gzip'd-payload-member fixture. */
  def buildWarcEnc(records: Seq[(String, String, Array[Byte], String)]): Array[Byte] =
    buildWarcCt(records.map(r => (r._1, r._2, r._3, r._4, "text/html")))

  /** Full fixture builder: per-record Content-Encoding AND
    * Content-Type (the PDF-member fixture sets application/pdf). */
  def buildWarcCt(records: Seq[(String, String, Array[Byte], String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (url, date, raw, enc, ct) =>
      val body = enc match {
        case "gzip" =>
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(raw); gz.close(); bos.toByteArray
        case "deflate" =>
          val bos = new java.io.ByteArrayOutputStream()
          val df = new java.util.zip.DeflaterOutputStream(bos)
          df.write(raw); df.close(); bos.toByteArray
        case _ => raw
      }
      val encHdr = if (enc.isEmpty) "" else s"Content-Encoding: $enc\r\n"
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n$encHdr" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1)
      val contentLen = http.length + body.length
      val hdr = (s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"WARC-Date: $date\r\n" +
        s"Content-Length: $contentLen\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1)
      out.write(hdr)
      out.write(http)
      out.write(body)
      out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    }
    out.toByteArray
  }
}
