package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.frontier.Flags

/** Compiles a URL-filter rule table into native Catalyst Column
  * expressions so the scheduler's scoring runs inside whole-stage codegen
  * with zero per-row object allocation (SURVEY §2.2 F1: "a compiled
  * when/otherwise Column chain"). Semantics are cross-validated against
  * the reference-exact interpreter (`UrlFilters.urlFilterNum`) by
  * property tests.
  *
  * Input columns (the scheduler's joined row):
  *  - request: url, hop_count, flags, added_time, discovery_time,
  *    site_num_inlinks, err_count, page_num_inlinks (0 today)
  *  - reply (nullable): rep_exists, rep_spidered_time, rep_err_code,
  *    rep_err_count, rep_http_status
  *  - politeness: last_download_end_ms (−1 none), dom_crawl_delay_ms (−1)
  *
  * Returns None if any rule uses a token this compiler does not support
  * (caller falls back to the interpreter). */
object RuleCompiler {

  final case class Cols(
      url: Column, hopCount: Column, flags: Column,
      addedTime: Column, discoveryTime: Column,
      siteNumInlinks: Column, pageNumInlinks: Column,
      repExists: Column, repSpideredTime: Column, repErrCode: Column,
      repErrCount: Column, repHttpStatus: Column,
      now: Column)

  final case class Compiled(ufn: Column, priority: Column, forceDelete: Column,
                            ipMaxSpiders: Column, ipWaitMs: Column, spiderFreqDays: Column,
                            harvestLinks: Column)

  @inline private def bit(flags: Column, b: Long): Column = (flags.bitwiseAND(lit(b)) =!= lit(0L))

  /** One token → Some(predicate Column), or None if unsupported. */
  private def compileToken(tokIn: String, c: Cols, siteListEmpty: Boolean,
                           patterns: CrawlPatterns): Option[Column] = {
    var tok = tokIn
    var neg = false
    if (tok.startsWith("!") && !tok.startsWith("!=")) { neg = true; tok = tok.substring(1).trim }
    def fin(col: Column): Option[Column] = Some(if (neg) !col else col)

    val hadReply = bit(c.flags, Flags.HadReply) || c.repExists

    if (tok.startsWith("isreindex")) return fin(bit(c.flags, Flags.IsPageReindex))
    if (tok.startsWith("ismanualadd"))
      return fin(bit(c.flags, Flags.IsAddUrl) || bit(c.flags, Flags.IsInjecting) || bit(c.flags, Flags.IsPageReindex))
    if (tok.startsWith("insitelist")) {
      // non-empty site list → interpreter fallback (pattern matching)
      if (!siteListEmpty) return None
      return fin(lit(true))
    }
    if (tok.startsWith("matchesucp")) {
      if (patterns.ucpConfigured) return None // interpreter fallback
      return Some(lit(true)) // unconfigured → always passes, '!' ignored
    }
    if (tok.startsWith("matchesupp")) {
      if (patterns.uppConfigured) return None
      return Some(lit(true))
    }
    if (tok.startsWith("isaddurl")) return fin(bit(c.flags, Flags.IsAddUrl))
    if (tok.startsWith("isinjected")) return fin(bit(c.flags, Flags.IsInjecting))
    if (tok.startsWith("ismedia"))
      // negation ignored by the reference (gotOne path, Spider.cpp:12309)
      return Some(bit(c.flags, Flags.HasMediaExtension))
    if (tok.startsWith("isnewoutlink")) return fin(bit(c.flags, Flags.IsNewOutlink))
    if (tok.startsWith("isnewrequest"))
      return fin(when(!c.repExists, lit(true)).otherwise(c.addedTime > c.repSpideredTime))
    if (tok.startsWith("isnew")) return fin(!hadReply)
    if (tok.startsWith("iswww")) {
      // Spider.cpp:12554-12582 char scan
      val www = when(substring(c.url, 5, 1) === ":", substring(c.url, 8, 3))
        .when(substring(c.url, 6, 1) === ":", substring(c.url, 9, 3))
        .otherwise(substring(c.url, 1, 3)) === "www"
      return fin(www)
    }
    if (tok.startsWith("isrssext")) return fin(bit(c.flags, Flags.IsRSSExt))
    if (tok.startsWith("ispermalinkformat")) return fin(bit(c.flags, Flags.IsUrlPermalinkFormat))
    if (tok.startsWith("isparentindexed")) return fin(bit(c.flags, Flags.WasParentIndexed))
    if (tok.startsWith("isparentrss")) return fin(bit(c.flags, Flags.ParentIsRSS))
    if (tok.startsWith("isparentsitemap")) return fin(bit(c.flags, Flags.ParentIsSiteMap))
    if (tok.startsWith("isparentpingserver")) return fin(bit(c.flags, Flags.ParentIsPingServer))
    if (tok.startsWith("ispingserver")) return fin(bit(c.flags, Flags.IsPingServer))
    if (tok.startsWith("isfakeip")) return fin(bit(c.flags, Flags.FakeFirstIp))
    if (tok.startsWith("hastmperror")) {
      // the rep_exists guard stays OUTSIDE the negation: with no reply
      // the interpreter returns RowSkip (row fails) regardless of '!'
      // (UrlFilters.evalToken hastmperror → RowSkip on None)
      val pred = c.repErrCode.isInCollection(UrlFilters.tmpErrors)
      return Some(c.repExists && (if (neg) !pred else pred))
    }
    if (tok.startsWith("hasreply")) return fin(hadReply)
    if (tok == "default") return Some(lit(true))

    // numeric comparisons
    val (name, sign, value) = parseCmpPublic(tok)
    if (sign != 0) {
      def cmp(a: Column, b: Long): Column = sign match {
        case 1 => a === b
        case 2 => a =!= b
        case 3 => a > b
        case 4 => a < b
        case 5 => a >= b
        case 6 => a <= b
      }
      val v = try value.toDouble.toLong catch { case _: Throwable => return None }
      name match {
        case "hopcount" => return Some(cmp(c.hopCount, v)) // no '!' form in C
        case "errorcount" => return Some(c.repExists && cmp(c.repErrCount, v))
        case "errorcode" => return Some(c.repExists && cmp(c.repErrCode, v))
        case "numinlinks" => return Some(cmp(c.pageNumInlinks, v))
        case "sitenuminlinks" => return Some(c.siteNumInlinks =!= -1 && cmp(c.siteNumInlinks, v))
        case "lastspidertime" => return Some(c.repExists && cmp(c.repSpideredTime, v))
        case "spiderwaited" => return Some(c.repExists && cmp(c.now - c.repSpideredTime, v))
        case "httpstatus" => return Some(c.repExists && cmp(c.repHttpStatus, v))
        case "urlage" =>
          val age = when(c.discoveryTime =!= 0, c.now - c.discoveryTime).otherwise(c.now - c.addedTime)
          return Some(cmp(age, v))
        case _ => // fall through to patterns
      }
    }

    // pattern predicates
    if (tok.startsWith("^")) {
      val pat = tok.substring(1).takeWhile(ch => !ch.isWhitespace)
      if (pat.isEmpty) return Some(lit(false))
      return fin(c.url.startsWith(pat))
    }
    if (tok.startsWith("$")) {
      var pat = tok.substring(1)
      if (pat.startsWith("\\.")) pat = pat.substring(1)
      pat = pat.takeWhile(ch => !ch.isWhitespace)
      if (pat.isEmpty) return Some(lit(false))
      return fin(c.url.endsWith(pat))
    }
    if (tok.nonEmpty && tok.head.isLetter && !tok.contains("==") && !tok.contains("<") &&
        !tok.contains(">") && !tok.contains("!=")) {
      // bare substring; only safe when it's not an unrecognized is*/has* token
      if (tok.startsWith("is") || tok.startsWith("has") || tok.startsWith("in") ||
          tok.startsWith("tag:") || tok.startsWith("lang") || tok.startsWith("tld") ||
          tok.startsWith("parentlang") || tok.startsWith("matches")) return None
      val pat = tok.takeWhile(ch => !ch.isWhitespace)
      return fin(c.url.contains(pat))
    }
    None
  }

  // reuse UrlFilters' comparator parse (duplicated here to keep it private there)
  private def parseCmpPublic(tok: String): (String, Int, String) = {
    var i = 0
    while (i < tok.length && tok.charAt(i).isLetter) i += 1
    val name = tok.substring(0, i)
    while (i < tok.length && tok.charAt(i).isWhitespace) i += 1
    if (i >= tok.length) return (name, 0, "")
    var sign = 0
    tok.charAt(i) match {
      case '=' => i += 1; if (i < tok.length && tok.charAt(i) == '=') i += 1; sign = 1
      case '!' if i + 1 < tok.length && tok.charAt(i + 1) == '=' => i += 2; sign = 2
      case '<' => i += 1; if (i < tok.length && tok.charAt(i) == '=') { sign = 6; i += 1 } else sign = 4
      case '>' => i += 1; if (i < tok.length && tok.charAt(i) == '=') { sign = 5; i += 1 } else sign = 3
      case _ => return (name, 0, "")
    }
    while (i < tok.length && tok.charAt(i).isWhitespace) i += 1
    (name, sign, tok.substring(i))
  }

  /** Compile the whole table; None if any token is unsupported. */
  def compile(rules: IndexedSeq[UrlFilterRule], c: Cols, siteListEmpty: Boolean = true,
              patterns: CrawlPatterns = CrawlPatterns()): Option[Compiled] = {
    val ruleCols: Seq[Column] = rules.map { r =>
      val toks = r.expr.split("&&").map(_.trim)
      val parts = toks.map(t => compileToken(t, c, siteListEmpty, patterns))
      if (parts.exists(_.isEmpty)) return None
      parts.flatten.reduce(_ && _)
    }
    var ufn: Column = lit(-1)
    // build from the last rule backwards so the FIRST match wins
    for (i <- rules.indices.reverse) ufn = when(ruleCols(i), lit(i)).otherwise(ufn)
    val idx = ufn + 1
    val priority = when(ufn >= 0, element_at(array(rules.map(r => lit(r.priority)): _*), idx)).otherwise(lit(-1))
    val forceDelete = when(ufn >= 0, element_at(array(rules.map(r => lit(r.forceDelete)): _*), idx)).otherwise(lit(true))
    val ipMax = when(ufn >= 0, element_at(array(rules.map(r => lit(r.ipMaxSpiders)): _*), idx)).otherwise(lit(0))
    val ipWait = when(ufn >= 0, element_at(array(rules.map(r => lit(r.ipWaitMs)): _*), idx)).otherwise(lit(0))
    val freq = when(ufn >= 0, element_at(array(rules.map(r => lit(r.spiderFreqDays)): _*), idx)).otherwise(lit(0.0))
    val harvest = when(ufn >= 0, element_at(array(rules.map(r => lit(r.harvestLinks)): _*), idx)).otherwise(lit(false))
    Some(Compiled(ufn, priority, forceDelete, ipMax, ipWait, freq, harvest))
  }

  /** getSpiderTimeMS as native columns (Spider.cpp:5966-6063). */
  def spiderTimeCol(c: Cols, compiled: Compiled,
                    lastDownloadMs: Column, domCrawlDelayMs: Column): Column = {
    val base = c.addedTime * 1000L
    val lastMs = when(lastDownloadMs < 0, 0L).otherwise(lastDownloadMs)
    val min1 = lastMs + compiled.ipWaitMs
    val cd = least(domCrawlDelayMs, lit(UrlFilters.MaxCrawlDelayMs))
    val min2 = when(domCrawlDelayMs >= 0, lastMs + cd).otherwise(lit(0L))
    val noRep = greatest(base, min1, min2)
    val waitMs = when(bit(c.flags, Flags.IsPageReindex), lit(0L))
      .otherwise((compiled.spiderFreqDays * 3600 * 24.0).cast("long") * 1000L)
    val min3 = c.repSpideredTime * 1000L + waitMs
    val withRep = when(c.repSpideredTime <= 0, noRep).otherwise(greatest(noRep, min3))
    when(!c.repExists && (bit(c.flags, Flags.IsInjecting) || bit(c.flags, Flags.IsPageReindex)), base)
      .otherwise(when(c.repExists, withRep).otherwise(noRep))
  }
}
