package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.core.GbXml

/** NON-CIRCULAR extraction goldens: the expected `.txt` bytes in
  * `src/test/resources/reffix/` are produced by `refharness/harness`,
  * which links the REFERENCE parser itself (Xml.cpp, XmlNode.cpp,
  * Entities.cpp, fctypes.cpp, Unicode.cpp compiled verbatim from
  * /root/reference/src). This is the per-row invariant of the north
  * star — "extracted text byte-identical to the reference parser" —
  * asserted against reference-derived bytes, not engine-derived ones.
  *
  * Regenerate: `cd refharness && make && python3 gen_fixtures.py &&
  * build/harness --batch ../src/test/resources/reffix`.
  */
class RefGoldenSpec extends AnyFunSuite {

  private val dir = Paths.get(getClass.getResource("/reffix").toURI)

  private val cases: Seq[String] = Files.list(dir).iterator().asScala
    .map(_.getFileName.toString)
    .filter(_.endsWith(".html"))
    .map(_.stripSuffix(".html"))
    .toSeq.sorted

  test("fixture inventory is present") {
    assert(cases.size >= 60, s"expected >=60 fixtures, found ${cases.size}")
  }

  for (name <- cases) {
    test(s"extraction matches reference parser bytes: $name") {
      val html = Files.readAllBytes(dir.resolve(s"$name.html"))
      val expected = Files.readAllBytes(dir.resolve(s"$name.txt"))
      val actual = GbXml.extractTextBytes(html)
      if (!java.util.Arrays.equals(actual, expected)) {
        val a = new String(actual, "ISO-8859-1")
        val e = new String(expected, "ISO-8859-1")
        val firstDiff = a.zip(e).indexWhere { case (x, y) => x != y } match {
          case -1 => math.min(a.length, e.length)
          case i => i
        }
        fail(
          s"byte mismatch at offset $firstDiff (actual ${actual.length}B, expected ${expected.length}B)\n" +
          s"actual  : ${a.slice(firstDiff - 20, firstDiff + 40).replace("\n", "\\n")}\n" +
          s"expected: ${e.slice(firstDiff - 20, firstDiff + 40).replace("\n", "\\n")}")
      }
    }
  }
}
