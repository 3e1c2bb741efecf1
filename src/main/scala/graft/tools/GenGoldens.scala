package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.core._
import graft.frontier._
import graft.rules._

/** Generates the committed golden files (FIXTURES.md §5 — the reference's
  * crctable.dat pattern, qa.cpp:234-262): once generated and reviewed,
  * the goldens pin crawl order, seen set, hashes, canonicalization,
  * robots verdicts, and extracted text across future code changes.
  * Run: `sbt "runMain graft.tools.GenGoldens"` (rewrites
  * src/test/resources/golden/). */
object GenGoldens {
  def main(args: Array[String]): Unit = {
    val outDir = "src/test/resources/golden"
    Files.createDirectories(Paths.get(outDir))
    def write(name: String, lines: Seq[String]): Unit = {
      Files.writeString(Paths.get(s"$outDir/$name"), lines.mkString("", "\n", "\n"))
      println(s"wrote $name (${lines.size} lines)")
    }

    // uh48.tsv — tabulation-hash port incl. table derivation
    val urls = (0 until 16).flatMap { k =>
      Seq(s"http://www.h$k.test/", s"http://www.h$k.test/s1/", s"http://www.h$k.test/s1/leaf0.html")
    }
    write("uh48.tsv", urls.map(u => s"$u\t${GbHash.uh48(u)}\t${GbHash.hash32(GbUrl.parse(u).host)}"))

    // canon.tsv — Url::set port
    val raws = Seq(
      "WWW.Example.COM/a/../b//c.html#frag",
      "http://http://www.foo.com/index.html",
      "https://News.Ycombinator.com:443/item?id=1&&x=2",
      "http://www.h0.test\\p\\q.jpg",
      "http://sub.domain.co.uk/path/./x/",
      "http://1.2.3.4:8080/ip",
      "http://a.com/p?x=1&&&y=2",
      "http://a.com./x",
      "  \t http://a.com/ws",
      "http://a.com/p#frag",
      "http://a.com/p#!bang",
      "http://a.com/p?q=1#frag",
      "ftp://files.example.com:21/pub",
      "http://bücher.example/straße")
    write("canon.tsv", raws.map { r =>
      val g = GbUrl.parse(r)
      s"${r.replace("\t", "\\t")}\t${g.url}\t${g.domain}\t${g.tld}\t${g.port}"
    })

    // robots.tsv — isAllowed2 quirks
    val robotsBody =
      ("User-agent: Gigablast\nCrawl-delay: 2.5\n\n" +
        "User-agent: *\nDisallow: /priv\nAllow: /priv/ok.html\nCrawl-delay: .5\nDisallow: sub\n").getBytes("UTF-8")
    val paths = Seq("/", "/priv", "/priv/ok.html", "/privateer", "/sub/x", "/pub", "/x?sub=1")
    write("robots.tsv", paths.map { p =>
      val (a, d) = Robots.evaluate(p, robotsBody)
      s"$p\t$a\t$d"
    })

    // ufn.tsv — url-filter first-match over a scenario matrix
    val now = 1400003600L
    val scenarios = for {
      hop <- Seq(0, 1, 2, 3)
      hadReply <- Seq(false, true)
      www <- Seq(false, true)
      media <- Seq(false, true)
    } yield {
      val host = if (www) "www.a.com" else "a.com"
      val url = if (media) s"http://$host/h$hop.jpg" else if (hop == 0) s"http://$host/" else s"http://$host/h$hop"
      val req = UfnRequest(url = url, hopCount = hop, hadReply = hadReply, hasMediaExtension = media, addedTime = now - 5000)
      val rep = if (hadReply) Some(UfnReply(spideredTime = now - 1000)) else None
      val n = UrlFilters.urlFilterNum(req, rep, now)
      val pri = if (n >= 0) UrlFilters.defaultWebRules(n).priority else -1
      s"$url\t$hop\t$hadReply\t$media\t$n\t$pri"
    }
    write("ufn.tsv", scenarios)

    // extracted text per micro-corpus page (url \t byte-len \t uh48-of-text)
    val spec = Corpus.micro
    val textLines = for {
      k <- 0 until spec.nHosts
      p <- 0 until spec.pagesPerHost
    } yield {
      val url = Corpus.pageUrl(k, p, spec)
      val text = GbXml.extractTextBytes(Corpus.pageHtml(k, p, spec).getBytes("UTF-8"))
      s"$url\t${text.length}\t${GbHash.hash64(text, 0, text.length, 0L)}"
    }
    write("text.tsv", textLines)

    // crawl order + seen set: 5 iterations on the micro corpus
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = Files.createTempDirectory("graft_golden").toString
    Crawl.run(spark, work, spec, 5)
    val order = (1 to 5).flatMap { i =>
      spark.read.parquet(s"${Crawl.snapDir(work, i)}/fetch_log")
        .select("iteration", "first_ip", "seq", "url", "priority", "err_code")
        .as[(Int, Int, Int, String, Int, Int)].collect()
        .sortBy(r => (r._1, r._2.toLong & 0xffffffffL, r._3))
    }
    write("crawl_order.tsv", order.map(r => s"${r._1}\t${r._2}\t${r._3}\t${r._4}\t${r._5}\t${r._6}"))
    val seen = Crawl.loadRequests(spark, work, 5).select("uh48").as[Long].collect().sorted
    write("seen_set.tsv", seen.map(_.toString))
    spark.stop()
  }
}
