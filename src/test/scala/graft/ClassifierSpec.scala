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

  test("isSpam: word hits, exception sublists, hyphen rule, edu/gov exemption") {
    import graft.core.GbAdult
    // plain word hits, anywhere in a host segment
    assert(GbAdult.isSpam("http://www.pornsite.test/clean/path"))
    assert(GbAdult.isSpam("http://xxxmovies.example.com/"))
    // hornyear.com comment case — substring, not word-boundary
    assert(GbAdult.isSpam("http://hornyear.com/"))
    // sex with its exception sublist (whole-string quirk)
    assert(GbAdult.isSpam("http://buysex.test/"))
    assert(!GbAdult.isSpam("http://www.middlesex.test/"))
    assert(!GbAdult.isSpam("http://sextant-sales.test/"))
    assert(!GbAdult.isSpam("http://www.essex.test/"))
    // anal exceptions
    assert(!GbAdult.isSpam("http://analog-devices.test/"))
    assert(!GbAdult.isSpam("http://canalboats.test/"))
    // losAnaLos.de case (host is lowercased by Url::set)
    assert(GbAdult.isSpam("http://www.losAnaLos.de/"))
    // cum exceptions
    assert(!GbAdult.isSpam("http://document-store.test/"))
    assert(!GbAdult.isSpam("http://cucumber.test/"))
    // pairwise exception words
    assert(!GbAdult.isSpam("http://fuckedcompany.com/"), "fuckedcomp rescue")
    assert(!GbAdult.isSpam("http://swank-hotels.test/"))
    assert(!GbAdult.isSpam("http://babelfish.altavista.com/"))
    // albaberlin.com contains "babe": the reference rescues it via the
    // speller dictionary-split pass, which is NOT ported (data dep) —
    // this port flags it. Pinned as the documented divergence.
    assert(GbAdult.isSpam("http://albaberlin.com/"))
    // edu/gov exempt even with a hit
    assert(!GbAdult.isSpam("http://sexstudies.someu.edu/"))
    assert(!GbAdult.isSpam("http://sex-ed.health.gov/"))
    // >30 chars + >=4 hyphens
    assert(GbAdult.isSpam("http://a-very-long-hyphenated-host-name.test/"))
    assert(!GbAdult.isSpam("http://a-b-c-d.test/"), "short many-hyphen host ok")
    // clean hosts
    assert(!GbAdult.isSpam("http://www.example.com/"))
    assert(!GbAdult.isSpam("http://news.ycombinator.com/"))
  }

  test("isLinkLoop: 3x same component, or two adjacent doubled components") {
    assert(GbUrl.parse("http://a.test/x/x/x/page.html").isLinkLoop)
    assert(GbUrl.parse("http://a.test/a/b/a/b/page.html").isLinkLoop)
    assert(!GbUrl.parse("http://a.test/a/b/c/page.html").isLinkLoop)
    assert(!GbUrl.parse("http://a.test/a/b/a/c/page.html").isLinkLoop, "single double is fine")
    assert(!GbUrl.parse("http://a.test/").isLinkLoop)
  }
}
