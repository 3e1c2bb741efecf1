package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.textops.TextOps

/** X-media: real header decode (PNG IHDR / GIF LSD / BMP
  * BITMAPINFOHEADER / JPEG SOFn) over synthesized VALID containers.
  * javax.imageio re-reads the fixtures to prove they are real files,
  * not just byte sequences our own parser happens to accept. */
class MediaDecodeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def dims(id: Long) =
    (1 + math.floorMod(id * 7 + 3, 64).toInt, 1 + math.floorMod(id * 13 + 5, 64).toInt)

  test("fixture blobs are valid images: imageio round-trip agrees on dims") {
    for (id <- 0L to 40L; fmt <- Seq("png", "gif", "bmp")) {
      val b = TextOps.mediaBlob(id, fmt)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(img != null, s"imageio rejected $fmt blob for id=$id")
      val (w, h) = dims(id)
      assert(img.getWidth == w && img.getHeight == h,
        s"$fmt id=$id imageio=(${img.getWidth},${img.getHeight}) expected=($w,$h)")
    }
  }

  test("decodeHeader parses dims out of the bytes for all three formats") {
    for (id <- 0L to 100L; fmt <- Seq("png", "gif", "bmp")) {
      val (f, w, h) = TextOps.decodeHeader(TextOps.mediaBlob(id, fmt))
      val (ew, eh) = dims(id)
      assert(f == fmt && w == ew && h == eh, s"$fmt id=$id got ($f,$w,$h) want ($fmt,$ew,$eh)")
    }
  }

  test("junk, empty and truncated blobs are unknown, not exceptions") {
    assert(TextOps.decodeHeader(Array.empty[Byte]) == (("unknown", -1, -1)))
    assert(TextOps.decodeHeader(TextOps.mediaBlob(7L, "unknown"))._1 == "unknown")
    for (fmt <- Seq("png", "gif", "bmp"); n <- Seq(1, 3, 7)) {
      val b = TextOps.mediaBlob(5L, fmt).take(n)
      assert(TextOps.decodeHeader(b)._1 == "unknown", s"$fmt truncated to $n")
    }
  }

  test("JPEG SOFn scan: marker walk past APP0/DQT finds the frame header") {
    // hand-built minimal JPEG stream: SOI, APP0 (JFIF), DQT (stub), SOF0
    val bos = new java.io.ByteArrayOutputStream()
    def m(marker: Int, body: Array[Byte]): Unit = {
      bos.write(0xff); bos.write(marker)
      val len = body.length + 2
      bos.write(len >> 8); bos.write(len & 0xff); bos.write(body, 0, body.length)
    }
    bos.write(0xff); bos.write(0xd8) // SOI
    m(0xe0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    m(0xdb, new Array[Byte](65)) // DQT stub
    val sof = Array[Byte](8, // precision
      0x01, 0x2c, // height 300
      0x02, 0x58, // width 600
      1, 1, 0x11, 0) // 1 component
    m(0xc0, sof)
    val (f, w, h) = TextOps.decodeHeader(bos.toByteArray)
    assert(f == "jpeg" && w == 600 && h == 300)
  }

  test("decodeMedia: dataframe plumbing carries format/dims/features") {
    import spark.implicits._
    val df = (0L to 11L).map(id => (id, TextOps.mediaBlob(id, TextOps.mediaFixtureFormat(id))))
      .toDF("doc_id", "blob")
    val out = TextOps.decodeMedia(df, "blob", "doc_id")
      .select("doc_id", "format", "width", "height", "features")
      .as[(Long, String, Int, Int, Array[Float])].collect().sortBy(_._1)
    assert(out.length == 12)
    for ((id, f, w, h, feat) <- out) {
      assert(f == TextOps.mediaFixtureFormat(id))
      if (f == "unknown") assert(w == -1 && h == -1)
      else { val (ew, eh) = dims(id); assert(w == ew && h == eh) }
      assert(feat.length == 8 && math.abs(feat.sum - 1f) < 1e-3)
    }
  }
}
