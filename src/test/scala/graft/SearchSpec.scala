package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.Search

/** §2.6 search slice: postings, AND-intersection, tf scoring, site
  * clustering (≤2 per site, Msg40.cpp:1822), bounded top-k. */
class SearchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def docs() = {
    import spark.implicits._
    Seq(
      // site A: three docs match "fast spark" with distinct scores —
      // clustering must keep only the best two
      (1L, "fast spark spark spark fast", "a"),   // score 5
      (2L, "fast fast spark", "a"),               // score 3
      (3L, "fast spark", "a"),                    // score 2 — clustered away
      // site B
      (4L, "spark is fast, fast!", "b"),          // score 3 (punct split)
      // AND misses: one term only
      (5L, "spark spark spark spark spark", "b"),
      (6L, "fast fast fast", "c"),
      (7L, "nothing relevant", "c")
    ).toDF("doc_id", "text", "source")
  }

  test("postings: lowercase alnum tokenization with positions") {
    import spark.implicits._
    val p = Search.postings(docs().filter("doc_id = 4"), "doc_id", "text")
      .select("pos", "word").as[(Int, String)].collect().sortBy(_._1)
    assert(p.map(_._2).toSeq == Seq("spark", "is", "fast", "fast"))
    assert(p.map(_._1).toSeq == Seq(0, 1, 2, 3))
  }

  test("AND intersection + tf score + site clustering + top-k + rank") {
    import spark.implicits._
    val r = Search.searchTopK(docs(), "doc_id", "text", "source", "fast spark", 10)
      .as[(Long, Long, Int)].collect().toSeq
    // doc 3 clustered away (3rd best on site a); docs 5,6,7 fail AND
    assert(r == Seq((1L, 5L, 1), (2L, 3L, 2), (4L, 3L, 3)))
  }

  test("k bounds the result") {
    import spark.implicits._
    val r = Search.searchTopK(docs(), "doc_id", "text", "source", "fast spark", 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(r == Seq((1L, 5L, 1), (2L, 3L, 2)))
  }

  test("single-term query needs no intersection") {
    import spark.implicits._
    val r = Search.searchTopK(docs(), "doc_id", "text", "source", "SPARK", 10)
      .as[(Long, Long, Int)].collect().toSeq
    // per-site best two: a → 1 (tf 3), 3|2 tie → doc 2? tf: doc1=3, doc2=1, doc3=1
    // site a keeps doc1(3), doc2(1) (tie with doc3 broken by doc_id);
    // site b: doc5(5), doc4(1)
    assert(r.map(_._1) == Seq(5L, 1L, 2L, 4L))
    assert(r.head._2 == 5L)
  }

  test("termId is the engine's own tabulation hash family") {
    assert(Search.termId("spark") == graft.core.GbHash.hash64b("spark"))
    assert(Search.termId("spark") != Search.termId("sparks"))
  }

  test("proximity bonus: near pairs of DIFFERENT terms, hand-computed (Posdb window idea)") {
    import spark.implicits._
    val d = Seq(
      // doc 1: fast@0 spark@1 → 1 near pair within w=2; tf sum 2+1=3
      //   (the extra "fast" at pos 4 is 3 > 2 from spark@1 → no pair)
      (1L, "fast spark x x fast", "a"),
      // doc 2: fast@0 ... spark@4 → no pair at w=2; tf sum 2
      (2L, "fast x x x spark", "b"),
      // doc 3: fast@0 spark@1 fast@2 spark@3 → CROSS-term pairs within
      //   w=2: f0-s1, f2-s1, f2-s3 (f0-s3 is 3 apart; s1-s3 and f0-f2
      //   are same-term, never paired) = 3 pairs; tf 4
      (3L, "fast spark fast spark", "c")
    ).toDF("doc_id", "text", "source")
    val r = Search.searchTopK(d, "doc_id", "text", "source", "fast spark", 10,
        proxWindow = 2, proxBonus = 100L)
      .as[(Long, Long, Int)].collect().toSeq
    // doc3: 4 + 300 = 304; doc1: 3 + 100 = 103; doc2: 2 + 0
    assert(r == Seq((3L, 304L, 1), (1L, 103L, 2), (2L, 2L, 3)))
  }

  test("proxWindow=0 and single-term queries skip the pair join entirely") {
    import spark.implicits._
    val d = Seq((1L, "fast spark", "a")).toDF("doc_id", "text", "source")
    val plain = Search.searchTopK(d, "doc_id", "text", "source", "fast spark", 10)
    assert(!org.apache.spark.sql.GraftShim.explainFormatted(plain).contains("n_near"))
    val single = Search.searchTopK(d, "doc_id", "text", "source", "spark", 10,
      proxWindow = 8)
    assert(single.as[(Long, Long, Int)].collect().toSeq == Seq((1L, 1L, 1)))
  }

  test("density scoring: per-sentence rank → squared weight, hand-computed") {
    import spark.implicits._
    // reference weight table: w(dr) = min(1, 0.35 * 1.03445^dr)
    // (Posdb.cpp initWeights), dr = max(1, 31 - (alnum-1))
    // (XmlDoc.cpp getDensityRanks)
    def w(cnt: Long): Double =
      math.min(1.0, 0.35 * math.pow(1.03445, math.max(1, 32 - cnt)))
    val d = Seq(
      // doc 1: "spark" alone in a terse sentence (dr=31, w=1.0) +
      // "hash merge" in a 2-word sentence (dr=30)
      (1L, "spark. hash merge", "a"),
      // doc 2: all three terms buried in one 12-word run-on
      (2L, "spark and hash and merge live in a long winded sentence here", "b"),
      // doc 3: missing "merge" → AND-filtered out
      (3L, "spark. hash.", "c")
    ).toDF("doc_id", "text", "source")
    val r = Search.searchDensityTopK(d, "doc_id", "text", "source",
        "spark hash merge", 10)
      .as[(Long, Long, Int)].collect().toSeq
    val s1 = Math.round(1e6 * (1 * w(1) * w(1) + 2 * w(2) * w(2)))
    val s2 = Math.round(1e6 * (3 * w(12) * w(12)))
    assert(s1 > s2, "terse sentences must outrank the run-on")
    assert(r == Seq((1L, s1, 1), (2L, s2, 2)))
  }

  test("phraseTermId is the Phrases.cpp continuation hash (hash64 of the concat)") {
    // setPhrase starts h at the first word's id and CONTINUES the
    // tabulation position over the second word's bytes
    // (hash64Lower_utf8_cont, Phrases.cpp:290) — i.e. one hash64 over
    // the concatenated bytes, NOT a restart-at-position-0 rehash
    assert(Search.phraseTermId("slow", "hash") == graft.core.GbHash.hash64("slowhash"))
    assert(Search.phraseTermId("slow", "hash") !=
      graft.core.GbHash.hash64b("hash", graft.core.GbHash.hash64b("slow")))
    // the concat hash cannot see the split point — same property as the
    // reference's ids (a continuation hash only depends on the bytes)
    assert(Search.phraseTermId("slowh", "ash") == Search.phraseTermId("slow", "hash"))
    assert(Search.phraseTermId("slow", "hash") != Search.phraseTermId("hash", "slow"))
  }

  test("bigramPostings: adjacent pairs at the first word's position; edge artifacts dropped") {
    import spark.implicits._
    val d = Seq((1L, ".slow hash batch!", "a")).toDF("doc_id", "text", "source")
    // split gives ["", slow, hash, batch, ""]: pairs touching the empty
    // edge artifacts are dropped (canPairAcross-punt analogue)
    val p = Search.bigramPostings(d, "doc_id", "text")
      .select("pos", "term_id").as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(p == Seq(
      (1, Search.phraseTermId("slow", "hash")),
      (2, Search.phraseTermId("hash", "batch"))))
  }

  test("phrase query: positional bigram chain = full adjacency, clustering, rank") {
    import spark.implicits._
    val d = Seq(
      (1L, "slow hash batch slow hash batch", "a"), // starts 0,3 → score 2
      (2L, "slow hash x batch", "a"),               // all words, broken chain → miss
      (3L, "slow hash batch", "b"),                 // score 1
      (4L, "hash batch slow", "b"),                 // rotation → miss
      (5L, "x slow hash batch x", "a"),             // score 1
      (6L, "slow hash batch y slow hash batch y slow hash batch", "a") // score 3
    ).toDF("doc_id", "text", "source")
    val r = Search.searchPhraseTopK(d, "doc_id", "text", "source",
        "slow hash batch", 10)
      .as[(Long, Long, Int)].collect().toSeq
    // site a: 6(3), 1(2), 5(1) → doc 5 clustered away; site b: 3(1)
    assert(r == Seq((6L, 3L, 1), (1L, 2L, 2), (3L, 1L, 3)))
  }

  test("string facet: counts over the FULL intersection, not the clustered top-k") {
    import spark.implicits._
    val d = Seq(
      (1L, "fast spark", "en"),
      (2L, "fast spark spark", "en"),
      (3L, "fast spark", "en"),   // 3rd en doc — would be clustered away in topk
      (4L, "fast spark", "de"),
      (5L, "spark only", "de"),   // fails AND
      (6L, "fast only", "fr")     // fails AND
    ).toDF("doc_id", "text", "lang")
    val r = Search.searchFacetStr(d, "doc_id", "text", "lang", "fast spark")
      .as[(String, Long, Int)].collect().toSeq
    // en counts ALL THREE matching docs (facet votes ignore clustering)
    assert(r == Seq(("en", 3L, 1), ("de", 1L, 2)))
  }

  test("int range facet: first-match histogram buckets, empty ranges zero-filled") {
    import spark.implicits._
    val d = Seq(
      (1L, "fast spark", 5L),
      (2L, "fast spark", 15L),
      (3L, "fast spark", 17L),
      (4L, "fast spark", 9999L), // outside every range → dropped
      (5L, "spark only", 5L)     // fails AND → no vote
    ).toDF("doc_id", "text", "n")
    val r = Search.searchFacetInt(d, "doc_id", "text", "n", "fast spark",
        Seq((0L, 10L), (10L, 20L), (20L, 30L)))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0L, 1L, 5L, 5L, 5L),
      (10L, 2L, 32L, 15L, 17L),
      (20L, 0L, 0L, 0L, 0L)))
  }

  test("summaries: best window around matches, /15 repeat damping, earliest tie-break") {
    import spark.implicits._
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = Seq(
      // matches at pos 0 (1 term then filler) and pos 31.. where BOTH
      // terms sit in one window — the two-term window must win
      (1L, s"fast $filler fast spark tail words", "a"),
      // single window, doc included for rank-2
      (2L, s"fast spark $filler", "b")
    ).toDF("doc_id", "text", "source")
    val r = Search.searchSummaries(d, "doc_id", "text", "source",
        "fast spark", 10, windowTokens = 5)
      .as[(Long, Int, String)].collect().toSeq
    // doc1 windows: a=0 → [fast w1 w2 w3 w4] = 100000+4*100;
    // a=31 → [fast spark tail words] (doc ends) = 200000+2*100;
    // a=32 → [spark tail words] = 100000+200. winner a=31.
    // doc2: a=0 → [fast spark w1 w2 w3] = 200000+300; a=1 loses.
    assert(r == Seq(
      (1L, 1, "fast spark tail words"),
      (2L, 2, "fast spark w1 w2 w3")))
  }

  test("gigabits: QTR zone bonuses, once-per-doc merge, single-page /4 penalty (Msg40.cpp computeGigabits)") {
    import spark.implicits._
    // doc 1 tokens: fast(0) spark(1) table(2) words(3) here(4)
    //   table: d(fast)=2,d(spark)=1 → 1000+1000=2000; ×4 = 8000
    //   words: d=3,2 → 2000 → 8000;  here: d=4→800, d=3→1000 → 7200
    // doc 2: fast(0) spark(1) table(2) → table 2000 → 8000
    // master: table (16000, 2 pages) → 32000; words (8000, 1) → /4 =
    // 2000; here (7200, 1) → 1800
    val d = Seq(
      (1L, "fast spark table words here", "a"),
      (2L, "fast spark table", "b")).toDF("doc_id", "text", "source")
    val r = Search.searchGigabits(d, "doc_id", "text", "source", "fast spark", 10)
      .as[(String, Double, Long)].collect().toSeq
    assert(r == Seq(("table", 32000.0, 2L), ("words", 2000.0, 1L), ("here", 1800.0, 1L)))
  }

  test("gigabit candidates skip query terms, stopwords, short and -ed/-ing words (hashExcerpt)") {
    import spark.implicits._
    // "that" is a stopword, "run" is <4 chars, "parsed"/-ed and
    // "parsing"/-ing are banned, "alpha" survives
    val d = Seq((1L, "fast spark that run parsed parsing alpha", "a"))
      .toDF("doc_id", "text", "source")
    val r = Search.searchGigabits(d, "doc_id", "text", "source", "fast spark", 10)
      .as[(String, Double, Long)].collect().toSeq
    assert(r.map(_._1) == Seq("alpha"))
  }

  test("gigabit phrases: bigrams compete with singles under the numWords multiplier (gigabitCmp)") {
    import spark.implicits._
    // both docs: table(2000) words(2000) adjacent → bigram "table
    // words" prox 2000 → per-doc 8000; master ×2 pages ×2 words =
    // 64000 beats each single's 32000
    val d = Seq(
      (1L, "fast spark table words", "a"),
      (2L, "fast spark table words", "b")).toDF("doc_id", "text", "source")
    val r = Search.searchGigabitPhrases(d, "doc_id", "text", "source", "fast spark", 10)
      .as[(String, Double, Long, Int)].collect().toSeq
    assert(r == Seq(
      ("table words", 64000.0, 2L, 2),
      ("table", 32000.0, 2L, 1),
      ("words", 32000.0, 2L, 1)))
  }

  test("minus terms veto docids without contributing score (Posdb.cpp rmDocIdVotes)") {
    import spark.implicits._
    val d = Seq(
      (1L, "spark hash alpha", "a"),
      (2L, "spark hash merge", "a"),
      (3L, "spark beta", "b")).toDF("doc_id", "text", "source")
    val r = Search.searchMinusTopK(d, "doc_id", "text", "source", "spark hash -merge", 10)
      .as[(Long, Long, Int)].collect().toSeq
    assert(r == Seq((1L, 2L, 1)))
  }

  test("boolean queries: parens, NOT, and the isTruth left-to-right accumulation (Query.cpp:5524)") {
    import spark.implicits._
    val d = Seq(
      (1L, "spark hash", "a"),      // spark AND (hash) → match, score 2
      (2L, "spark merge", "b"),     // spark AND (merge) → match, score 2
      (3L, "spark batch hash", "c"), // NOT batch fails
      (4L, "hash merge", "d"),      // no spark
      (5L, "spark spark hash", "e")) // score 3
      .toDF("doc_id", "text", "source")
    val r = Search.searchBoolTopK(d, "doc_id", "text", "source",
        "spark AND (hash OR merge) AND NOT batch", 10)
      .as[(Long, Long, Int)].collect().toSeq
    assert(r == Seq((5L, 3L, 1), (1L, 2L, 2), (2L, 2L, 3)))
    // the reference's mixed-operator quirk at one level:
    // 'a AND b OR c' == (a AND b) OR b OR c — so b alone matches
    val q = Seq((1L, "beta", "x"), (2L, "gamma", "x"), (3L, "alpha", "x"))
      .toDF("doc_id", "text", "source")
    val r2 = Search.searchBoolTopK(q, "doc_id", "text", "source",
        "alpha AND beta OR gamma", 10)
      .as[(Long, Long, Int)].collect().toSeq
    // beta alone (doc 1) matches via the quirk; gamma (doc 2) via OR;
    // alpha alone (doc 3) does not
    assert(r2.map(_._1).sorted == Seq(1L, 2L))
  }

  test("site: field restricts results; -site: excludes (Query.cpp FIELD_SITE)") {
    import spark.implicits._
    val d = Seq(
      (1L, "spark hash", "a"),
      (2L, "spark hash spark", "b"),
      (3L, "spark hash", "b")).toDF("doc_id", "text", "source")
    val req = Search.searchMinusTopK(d, "doc_id", "text", "source",
        "spark hash site:b", 10)
      .as[(Long, Long, Int)].collect().toSeq
    assert(req == Seq((2L, 3L, 1), (3L, 2L, 2)))
    val neg = Search.searchMinusTopK(d, "doc_id", "text", "source",
        "spark hash -site:b", 10)
      .as[(Long, Long, Int)].collect().toSeq
    assert(neg == Seq((1L, 2L, 1)))
  }

  test("pair-min scoring: maximin over term pairs, out-of-order penalty (Posdb.cpp ZAK'S ALGO)") {
    import spark.implicits._
    // doc 1 "spark hash merge": pairs (s,h)=100, (s,m)=100/3 (d=2),
    // (h,m)=100 → min = 100/3 → 33333333 micro (fw=1.0, df=2/2)
    // doc 2 "merge hash spark": every pair out of order → (s,h) d=1 →
    // 50, (s,m) d=3 → 25, (h,m) d=1 → 50 → min 25 → 25000000
    val d = Seq(
      (1L, "spark hash merge", "a"),
      (2L, "merge hash spark", "b")).toDF("doc_id", "text", "source")
    val r = Search.searchPairMinTopK(d, "doc_id", "text", "source",
        "spark hash merge", 10)
      .as[(Long, Long, Int)].collect().toSeq
    assert(r == Seq((1L, 33333333L, 1), (2L, 25000000L, 2)))
  }

  test("highlight wraps matches in the per-term color span (Highlight.cpp s_frontTags)") {
    import spark.implicits._
    val d = Seq((1L, "x fast spark y", "a")).toDF("doc_id", "text", "source")
    val r = Search.searchSummaries(d, "doc_id", "text", "source",
        "fast spark", 10, windowTokens = 4, highlight = true)
      .as[(Long, Int, String)].collect().toSeq
    // window at a=1 holds both terms; fast = term 0, spark = term 1
    assert(r == Seq((1L, 1,
      "<span class=\"gbcnst gbcnst00\">fast</span> " +
        "<span class=\"gbcnst gbcnst01\">spark</span> y")))
  }
}
