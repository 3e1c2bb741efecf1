package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rules._

/** A6 quota predicates (Spider.cpp:12659-12800) and their no-table
  * quirks. */
class QuotaSpec extends AnyFunSuite {

  private val now = 1400003600L
  private def rules(exprs: String*): IndexedSeq[UrlFilterRule] =
    exprs.toIndexedSeq.map(e => UrlFilterRule(e, harvestLinks = true, 7.0, 99, 7, 1000, 50))

  private val req = UfnRequest(url = "http://www.q.test/a", hopCount = 1,
    siteHash32 = 111, sitePages = 25, domainPages = 12, siteAdds = 1, domainAdds = 3)
  private val ctxOn = RuleCtx(quotaValid = true)
  private val ctxOff = RuleCtx(quotaValid = false)

  test("sitepages/domainpages/siteadds/domainadds compare the joined counts") {
    val rs = rules("sitepages>20", "default")
    assert(UrlFilters.urlFilterNumCtx(req, None, now, rs, ctxOn) == 0)
    assert(UrlFilters.urlFilterNumCtx(req.copy(sitePages = 5), None, now, rs, ctxOn) == 1)

    val rd = rules("domainpages>=12 && hopcount>=1", "default")
    assert(UrlFilters.urlFilterNumCtx(req, None, now, rd, ctxOn) == 0)

    val ra = rules("siteadds<=1", "domainadds==3", "default")
    assert(UrlFilters.urlFilterNumCtx(req, None, now, ra, ctxOn) == 0)
    assert(UrlFilters.urlFilterNumCtx(req.copy(siteAdds = 9), None, now, ra, ctxOn) == 1)
  }

  test("no quota table: sitepages/siteadds/domainadds skip the ROW (Spider.cpp:12668 continue)") {
    val rs = rules("sitepages>20", "siteadds>=0", "domainadds>=0", "default")
    // all three quota rows skipped; default matches
    assert(UrlFilters.urlFilterNumCtx(req, None, now, rs, ctxOff) == 3)
  }

  test("no quota table: domainpages ABORTS the whole run with -1 (Spider.cpp:12797 return -1)") {
    val rd = rules("domainpages>10", "default")
    assert(UrlFilters.urlFilterNumCtx(req, None, now, rd, ctxOff) == -1)
  }

  test("missing key semantics: joined value 0 compares normally (:12677 a=0)") {
    val r0 = req.copy(sitePages = 0)
    assert(UrlFilters.urlFilterNumCtx(r0, None, now, rules("sitepages==0", "default"), ctxOn) == 0)
  }
}
