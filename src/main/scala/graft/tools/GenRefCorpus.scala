package graft.tools

import java.nio.file.{Files, Paths}
import graft.frontier.Corpus

/** Generates `src/test/resources/golden/ref_text.tsv`: the expected
  * extracted text for corpus pages, computed by the REFERENCE parser
  * (refharness/build/harness — Xml.cpp/Entities.cpp/fctypes.cpp compiled
  * verbatim from /root/reference/src), so the corpus extraction golden is
  * NOT derived from the Scala engine under test.
  *
  * Covers every page of the micro spec (all crawl goldens run on it) plus
  * representative hosts of the bench spec (different section/leaf counts
  * change the nav-link shapes).
  *
  * Run: `cd refharness && make` then `sbt "runMain graft.tools.GenRefCorpus"`.
  */
object GenRefCorpus {

  def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")

  def main(args: Array[String]): Unit = {
    val harness = Paths.get("refharness/build/harness")
    require(Files.exists(harness), "build refharness first: cd refharness && make")
    val tmp = Files.createTempDirectory("refcorpus")

    final case class Page(spec: String, k: Int, p: Int, url: String, html: Array[Byte])
    val micro = for {
      k <- 0 until Corpus.micro.nHosts
      p <- 0 until Corpus.micro.pagesPerHost
    } yield Page("micro", k, p, Corpus.pageUrl(k, p, Corpus.micro), Corpus.pageBytes(k, p, Corpus.micro))
    // bench hosts include k≡6 (mod 8) so the meta-charset pages are
    // covered across the WHOLE codepage rotation — 6: latin1, 14:
    // koi8-r, 30: iso-8859-2, 46: shift_jis (byte-parity of the
    // charset-detect + iconv conversion vs the reference) — and k≡3
    // (mod 8) for the domain-only user-dir hosts (tagdb/SiteGetter)
    val benchHosts = Seq(0, 1, 2, 3, 6, 11, 14, 30, 31, 46, 999, 1998, 1999)
    val bench = for {
      k <- benchHosts
      p <- 0 until Corpus.bench.pagesPerHost
    } yield Page("bench", k, p, Corpus.pageUrl(k, p, Corpus.bench), Corpus.pageBytes(k, p, Corpus.bench))
    val pages = micro ++ bench

    pages.zipWithIndex.foreach { case (pg, i) =>
      Files.write(tmp.resolve(f"pg$i%05d.html"), pg.html)
    }
    val rc = new ProcessBuilder(harness.toAbsolutePath.toString, "--batch", tmp.toString)
      .inheritIO().start().waitFor()
    require(rc == 0, s"harness exited $rc")

    val lines = pages.zipWithIndex.map { case (pg, i) =>
      val txt = new String(Files.readAllBytes(tmp.resolve(f"pg$i%05d.txt")), "UTF-8")
      s"${pg.spec}\t${pg.k}\t${pg.p}\t${pg.url}\t${escape(txt)}"
    }
    val out = Paths.get("src/test/resources/golden/ref_text.tsv")
    Files.writeString(out, lines.mkString("", "\n", "\n"))
    println(s"wrote ${lines.size} reference-derived text goldens to $out")
  }
}
