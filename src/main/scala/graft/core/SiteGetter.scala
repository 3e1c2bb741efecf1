package graft.core

/** Port of the reference's site-resolution logic (`SiteGetter.cpp`) —
  * the portable core of tagdb's "what is a site" answer.
  *
  * The reference resolves a url's site three ways, in order
  * (`SiteGetter.cpp:87-235` getSite):
  *
  *  1. `setRecognizedSite()` (`:576-720`): hardcoded user-page path
  *     prefixes (`/~`, `/users/`, `/user/`, `/members/`, `/membres/`,
  *     `/member/`, `/membre/`, `/member.php?u=`) make the user dir its
  *     own site, and four "homestead" hosts (vimeo.com, www.myspace.com,
  *     twitter.com, www.facebook.com) make the first path component a
  *     site. A `www.` is prepended when the url has no subdomain
  *     (`:655-659`).
  *  2. the tagdb `sitepathdepth` voting algorithm (`:236-400`) — needs
  *     the posdb "siteterm" index (search side, out of declared scope)
  *     and only ever runs on host #0 with 10-day tag aging; every other
  *     host uses `sitePathDepth = -1` = "full hostname" (`:180-195`).
  *     NOT ported; the -1 path is what the fleet actually computes.
  *  3. `setSite()` fallback (`:619-...`): the full hostname, again
  *     www-prepended when the url is domain-only.
  *
  * Tagdb lookups KEY TagRecs by this same function: `Msg8a::getTagRec`
  * runs SiteGetter with no tag rec to derive the key
  * (`Tagdb.cpp:2597-2623`), so `site(url)` is both the site definition
  * and the tagdb key of a url.
  *
  * NOTE the outlink path is different: `XmlDoc::getLinkSiteHashes`
  * (`XmlDoc.cpp:8895-8920`) uses the linkee's CACHED tagdb "site" tag
  * when present and falls back to the RAW HOST (no www-prepend, no
  * recognized-site guess) when the linkee was never indexed — that
  * cold/warm asymmetry is modelled in `frontier.Crawl.resolveOutlinks`,
  * not here.
  */
object SiteGetter {

  private val userPrefixes: Array[String] = Array(
    // SiteGetter.cpp:611-619 (order irrelevant: prefixes are disjoint)
    "/~", "/users/", "/user/", "/members/", "/membres/", "/member/",
    "/membre/", "/member.php?u=")

  /** Homestead hosts where the first path component is the site
    * (SiteGetter.cpp:681-687; matched with strstr on the HOST, quirk
    * preserved: "xvimeo.com" also matches). */
  private val homesteadHosts: Array[String] =
    Array("vimeo.com", "www.myspace.com", "twitter.com", "www.facebook.com")

  /** `::hasSubdomain` (Url.cpp:2094-2154): hostname != domain; pure-IP
    * hostnames count as having a subdomain. */
  def hasSubdomain(u: GbUrl): Boolean = {
    val h = u.host
    if (h.isEmpty) false
    else if (!h.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) true // ip (Url.cpp:2133-2136)
    else if (u.domain.isEmpty) false // no TLD → no domain → "no subdomain" (Url.cpp:2139-2141)
    else u.subdomainPrefixLen > 0
  }

  /** `setRecognizedSite` (SiteGetter.cpp:576-720). Returns the site
    * string (no scheme, trailing `/` where the reference forces one), or
    * None when no hardcoded pattern applies. */
  def recognizedSite(u: GbUrl): Option[String] = {
    if (!u.isValid) return None
    val host = u.host
    val path = u.path + (if (u.hasQuery) "?" + u.query else "")
    val www = if (!hasSubdomain(u)) "www." else ""

    // user-page prefixes: site = host + prefix + username + '/'
    var len = 0
    var i = 0
    while (i < userPrefixes.length) {
      val pre = userPrefixes(i)
      if (path.length >= pre.length && path.regionMatches(true, 0, pre, 0, pre.length)) len = pre.length
      i += 1
    }
    if (len > 0) {
      // scan the username: stop at '/' or '?', must contain an alnum
      // (SiteGetter.cpp:630-644)
      var p = len
      var username = false
      while (p < path.length && path.charAt(p) != '/' && path.charAt(p) != '?') {
        if (GbUrl.isAlnum(path.charAt(p))) username = true
        p += 1
      }
      if (username) {
        var site = www + host + path.substring(0, p)
        // force a trailing '/' unless it ends in '=' (the /?uid= case,
        // SiteGetter.cpp:668-676)
        if (!site.endsWith("/") && !site.endsWith("=")) site += "/"
        return Some(site)
      }
    }

    // homestead hosts: first path component is the site (:681-720)
    var depth = 0
    i = 0
    while (i < homesteadHosts.length) {
      if (host.contains(homesteadHosts(i))) depth = 1
      i += 1
    }
    if (depth == 0) return None
    if (path.length <= 1) return Some(www + host) // root path: hostname (:700-714)
    var p = 1
    var d = depth
    var done = false
    while (p < path.length && !done) {
      if (path.charAt(p) == '/') { d -= 1; if (d == 0) done = true }
      if (!done) p += 1
    }
    var site = www + host + path.substring(0, p)
    if (!site.endsWith("/") && !site.endsWith("=")) site += "/"
    Some(site)
  }

  /** The url's site (and tagdb key): recognized pattern, else the full
    * hostname, www-prepended when domain-only (`setSite`,
    * SiteGetter.cpp:619-660 with sitePathDepth = -1). */
  def site(u: GbUrl): String =
    recognizedSite(u).getOrElse {
      (if (!hasSubdomain(u)) "www." else "") + u.host
    }

  def site(url: String): String = site(GbUrl.parse(url))

  def siteHash32(url: String): Int = GbHash.hash32(site(url))

  /** `isSiteRootFunc3` (XmlDoc.cpp:21395-21406): the url, scheme
    * stripped and trailing `/` removed, hashes to the site hash. Used
    * for the outlink hop-count-0 decision (XmlDoc.cpp:27709,27766). */
  def urlNoSchemeHash32(url: String): Int = {
    var s = url
    if (s.startsWith("http://")) s = s.substring(7)
    else if (s.startsWith("https://")) s = s.substring(8)
    if (s.nonEmpty && s.charAt(s.length - 1) == '/') s = s.substring(0, s.length - 1)
    GbHash.hash32(s)
  }

  def isSiteRoot(url: String, siteHash32: Int): Boolean =
    urlNoSchemeHash32(url) == siteHash32
}
