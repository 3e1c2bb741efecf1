package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbUrl

/** X16 url classifiers: isBadExtension (version-gated list) and
  * isLinkLoop (repeating path components). */
class ClassifierSpec extends AnyFunSuite {

  test("isBadExtension: banned list, version gating, warc/arc exempt") {
    assert(GbUrl.parse("http://a.test/setup.exe").isBadExtension())
    assert(GbUrl.parse("http://a.test/archive.gz").isBadExtension())
    assert(GbUrl.parse("http://a.test/video.wmv").isBadExtension(121))
    assert(!GbUrl.parse("http://a.test/video.wmv").isBadExtension(72), "wmv banned at 73")
    assert(!GbUrl.parse("http://a.test/page.html").isBadExtension())
    assert(!GbUrl.parse("http://a.test/noext").isBadExtension())
    assert(!GbUrl.parse("http://a.test/crawl.warc.gz").isBadExtension(), "warc exempt")
  }

  test("isLinkLoop: 3x same component, or two adjacent doubled components") {
    assert(GbUrl.parse("http://a.test/x/x/x/page.html").isLinkLoop)
    assert(GbUrl.parse("http://a.test/a/b/a/b/page.html").isLinkLoop)
    assert(!GbUrl.parse("http://a.test/a/b/c/page.html").isLinkLoop)
    assert(!GbUrl.parse("http://a.test/a/b/a/c/page.html").isLinkLoop, "single double is fine")
    assert(!GbUrl.parse("http://a.test/").isLinkLoop)
  }
}
