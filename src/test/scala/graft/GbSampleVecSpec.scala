package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GbSampleVec, GbXml}
import java.nio.charset.StandardCharsets

/** Page-sample-vector + similarity port (computeVector,
  * XmlDoc.cpp:9543-9660; computeSimilarity :9893-10038). */
class GbSampleVecSpec extends AnyFunSuite {

  private def vec(html: String): Array[Int] = {
    val work = html.getBytes(StandardCharsets.UTF_8)
    val nodes = GbXml.parse(work)
    GbSampleVec.sampleVector(work, nodes)
  }

  test("identical docs → similarity 100") {
    val v = vec("<html><body><p>alpha beta gamma delta</p></body></html>")
    assert(v.nonEmpty)
    assert(GbSampleVec.similarity(v, v) == 100f)
  }

  test("disjoint docs → similarity 0; empty vector → 0") {
    val a = vec("<p>alpha beta gamma</p>")
    val b = vec("<p>delta epsilon zeta</p>")
    assert(GbSampleVec.similarity(a, b) == 0f)
    assert(GbSampleVec.similarity(a, Array.empty[Int]) == 0f)
    assert(GbSampleVec.similarity(Array.empty[Int], Array.empty[Int]) == 0f)
  }

  test("partial overlap → 100·2m/(n0+n1) (XmlDoc.cpp:10030)") {
    val a = vec("<p>alpha beta gamma delta</p>")
    val b = vec("<p>alpha beta epsilon zeta</p>")
    // 2 matches of 4+4 → 100*4/8 = 50
    assert(GbSampleVec.similarity(a, b) == 50f)
  }

  test("case-insensitive word ids (hash64Lower_utf8)") {
    val a = vec("<p>Alpha BETA</p>")
    val b = vec("<p>alpha beta</p>")
    assert(GbSampleVec.similarity(a, b) == 100f)
  }

  test("script bodies and comments are tag nodes — excluded (Words wid==0)") {
    val a = vec("<p>alpha</p><script>var beta = 'gamma';</script><!-- delta -->")
    val b = vec("<p>alpha</p><script>var other = 'words';</script><!-- changed -->")
    assert(GbSampleVec.similarity(a, b) == 100f)
  }

  test("vector is deduped, unsigned-sorted, capped at 31 terms") {
    val many = (0 until 200).map(i => s"word$i word$i").mkString(" ")
    val v = vec(s"<p>$many</p>")
    assert(v.length <= GbSampleVec.MaxTerms)
    assert(v.distinct.length == v.length)
    val sorted = v.map(Integer.valueOf).sortWith((x, y) => Integer.compareUnsigned(x, y) < 0).map(_.intValue())
    assert(v.toSeq == sorted.toSeq)
  }

  test("numbers are words too (wids from digit runs)") {
    val a = vec("<p>release 2014 build 7</p>")
    val b = vec("<p>release 2015 build 7</p>")
    // 3 of 4 words shared → 100*6/8 = 75
    assert(GbSampleVec.similarity(a, b) == 75f)
  }
}
