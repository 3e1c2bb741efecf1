package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.GbHash

/** Minimal search-side slice (SURVEY §2.6): posting lists → term
  * AND-intersection → per-doc score → site-clustered top-k.
  *
  * The reference's query path is Query.cpp:133 (parse → term table),
  * Posdb.cpp:1531 intersectLists9_r (posting-list AND-intersection,
  * docid-ordered lists zipped in one pass), TopTree.cpp (bounded top-k),
  * Msg3a.cpp (per-shard merge) and Msg40.cpp:1822 gotSummary
  * (site-clustering: at most 2 results per site unless
  * &sc=0 — m_clusterLevels / CR_OK path).
  *
  * Spark-first re-expression, not a translation:
  *  - a posting list is a DataFrame (term_id, doc_id, pos) — Posdb's
  *    termlist-per-termId becomes a partition-pruned scan filtered on a
  *    literal term_id set (predicate pushdown reaches parquet, no join
  *    against a term table needed for a literal query);
  *  - intersectLists9_r's zip over docid-sorted lists becomes
  *    groupBy(doc).agg(countDistinct(term) = nTerms) — the shuffle
  *    hash-aggregate IS the intersection, with map-side partial
  *    aggregation standing in for the per-shard phase (Msg39) and the
  *    exchange for the Msg3a gather;
  *  - TopTree's bounded heap becomes TakeOrderedAndProject
  *    (orderBy.limit(k) — Spark's own bounded heap, no full sort);
  *  - Msg40's site dedup becomes row_number().over(partitionBy(site)) ≤ 2
  *    computed BEFORE the global top-k, exactly like gotSummary clusters
  *    before filling the final window.
  *
  * Scoring: score = Σ tf over query terms, plus an optional windowed
  * proximity bonus (one step toward Posdb's sliding-window scoring —
  * :1266 window, :3296 term pairs — counting near co-occurrences of
  * different query terms; the full density/position weighting stays
  * inventoried, not ported; the plan shape is what
  * scales). At 100 TB the postings table is hash-partitioned by term_id
  * (bucketed), the literal-term filter prunes partitions at the scan,
  * and the per-doc aggregate shuffles only rows matching the query —
  * O(Σ posting-list length), the same bound as the reference's
  * intersection.
  */
object Search {

  /** termId: hash64 of the LOWERCASED word — the reference's termids
    * are hash64d (lowercase hash64, hash.h) of the word; same family,
    * same table, via the engine's own tabulation hash (X2). */
  def termId(word: String): Long = GbHash.hash64b(word)

  private val TokenRe = "[^a-z0-9]+"

  /** Posting lists from a (id, text[, site]) table: one row per word
    * occurrence, (term_id, doc_id, pos, word). Words.cpp tokenization is
    * alnum runs; the slice matches the textops tokenizer (lowercase,
    * non-alnum split) so the DuckDB oracle can recompute it. term_id is
    * the engine's codegen'd hash expression (functions.Hash64bExpr) —
    * no UDF SerDe in the postings build. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), TokenRe)).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
      .withColumn("term_id", graft.functions.GraftFunctions.gbHash64b(col("word")))

  /** AND-query over a document table: every query term must appear;
    * score = Σ term frequency, plus — when `proxWindow > 0` — a
    * proximity bonus of `proxBonus` per unordered pair of occurrences
    * of two DIFFERENT query terms within `proxWindow` token positions
    * (the simplest honest step toward Posdb's sliding-window scoring,
    * Posdb.cpp:1266 window / :3296 term pairs: near co-occurrence
    * outranks scattered tf). At most `perSite` results per site
    * (Msg40.cpp:1822 site clustering); global top-k by (score desc,
    * doc_id asc). Output: (doc_id, score, rank).
    *
    * Scale shape of the pair join: both sides are the query-term-pruned
    * postings (O(Σ posting-list length) rows, never the corpus),
    * equi-joined on doc_id — per-doc pair expansion is bounded by the
    * doc's query-term occurrence count squared, the same bound as the
    * reference's in-memory window walk over one docid's term lists. */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String, siteCol: String,
                 query: String, k: Int, perSite: Int = 2,
                 proxWindow: Int = 0, proxBonus: Long = 10L): DataFrame = {
    val terms = query.toLowerCase.split(TokenRe).filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "empty query")
    val termIds = terms.map(termId)
    val sites = docs.select(col(idCol).as("site_doc_id"), col(siteCol).as("site"))

    val posts = postings(docs, idCol, textCol)
      // literal IN-set on the scan side: with a bucketed/partitioned
      // postings table this prunes before any shuffle
      .filter(col("term_id").isInCollection(termIds))

    val tf = posts
      .groupBy(col("doc_id"), col("term_id"))
      .agg(count(lit(1)).as("tf"))

    val baseScored = tf.groupBy("doc_id")
      .agg(sum(col("tf")).as("base_score"), count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === terms.length) // AND intersection
      .drop("n_terms")

    val scored =
      if (proxWindow <= 0 || terms.length < 2)
        baseScored.select(col("doc_id"), col("base_score").as("score"))
      else {
        // pairs keyed a.term_id < b.term_id: each unordered pair of
        // different-term occurrences counted exactly once (the oracle
        // pairs by word order — different key, same pair set)
        val a = posts.select(col("doc_id"), col("term_id").as("ta"), col("pos").as("pa"))
        val b = posts.select(col("doc_id").as("doc_b"), col("term_id").as("tb"), col("pos").as("pb"))
        val near = a.join(b,
            col("doc_id") === col("doc_b") && col("ta") < col("tb") &&
              abs(col("pa") - col("pb")) <= proxWindow)
          .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
        baseScored.join(near, Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            (col("base_score") + lit(proxBonus) * coalesce(col("n_near"), lit(0L))).as("score"))
      }

    // site clustering before the global top-k (gotSummary order). The
    // site join is a broadcast at sane site-table sizes; at 100 TB the
    // site hash rides IN the postings row (like site_hash32 in titledb)
    // and this join disappears.
    clusteredTopK(scored, sites, k, perSite)
  }

  /** Shared result tail: site clustering before the global top-k
    * (Msg40.cpp:1822 gotSummary clusters before filling the final
    * window), then TakeOrderedAndProject — TopTree's bounded heap. */
  private def clusteredTopK(scored: DataFrame, sites: DataFrame,
                            k: Int, perSite: Int): DataFrame = {
    val wSite = Window.partitionBy(col("site"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored
      .join(sites, col("doc_id") === col("site_doc_id"))
      .withColumn("site_rank", row_number().over(wSite))
      .filter(col("site_rank") <= perSite)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k) // TakeOrderedAndProject — TopTree's bounded heap
      // unpartitioned window is fine HERE (Spark's single-partition
      // warning notwithstanding): its input is the k-row top-k result,
      // never the corpus — one tiny task assigns the final ranks
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
  }

  /** Density-rank scoring — the next Posdb step after q3's proximity:
    * the reference weights every posting by the DENSITY of its
    * containing sentence at index time (getDensityRanks,
    * XmlDoc.cpp:41627-41699: per sentence, densityRank =
    * MAXDENSITYRANK(31) - (alnumWords-1), floored at 1 — a term in a
    * terse sentence outranks one buried in a run-on), then maps rank →
    * weight via s_densityWeights (Posdb.cpp:1100-1112: w(dr) =
    * min(1.0, 0.35 × 1.03445^dr)) and multiplies the occurrence's
    * score by the weight TWICE (Posdb.cpp:3124-3125 — squared, so
    * single-term scores stay on the term-pair scale).
    *
    * Slice stand-ins, documented: sentence boundaries are a [.!?]+
    * split (the reference's Sections sentence machinery is out of
    * scope); every occurrence scores (no top-N-per-list truncation);
    * hashgroup/diversity/spam weights are 1 (diversity is disabled in
    * the reference's own initWeights; body hashgroup weight is the
    * baseline). Scores are emitted in integer MICRO-units
    * (round(1e6·Σw²)) so the driver's oracle compare is immune to
    * double-sum association order.
    *
    * Scale shape: everything keys on (doc_id, sentence) — one
    * hash-aggregate for sentence stats, one for matched occurrences,
    * an equi-join between them, and the same clustered top-k tail as
    * searchTopK. No window over the corpus, no cross join. */
  def searchDensityTopK(docs: DataFrame, idCol: String, textCol: String,
                        siteCol: String, query: String, k: Int,
                        perSite: Int = 2): DataFrame = {
    val terms = query.toLowerCase.split(TokenRe).filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "empty query")
    val sites = docs.select(col(idCol).as("site_doc_id"), col(siteCol).as("site"))

    val words = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "[.!?]+")).as(Seq("sidx", "sent")))
      .select(col("doc_id"), col("sidx"),
        explode(split(lower(col("sent")), TokenRe)).as("word"))
      .filter(col("word") =!= "")

    // per-sentence density: dr = max(1, 31 - (alnum-1)) = max(1, 32-cnt)
    val stats = words.groupBy(col("doc_id"), col("sidx"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id").as("st_doc"), col("sidx").as("st_sidx"),
        least(lit(1.0), lit(0.35) *
          pow(lit(1.03445), greatest(lit(1), lit(32) - col("cnt"))))
          .as("dw"))

    val matched = words.filter(col("word").isInCollection(terms.toSeq))
    val andDocs = matched.groupBy("doc_id")
      .agg(countDistinct(col("word")).as("nt"))
      .filter(col("nt") === terms.length).select("doc_id")

    val scored = matched.groupBy(col("doc_id"), col("sidx"))
      .agg(count(lit(1)).as("m"))
      .join(stats, col("doc_id") === col("st_doc") && col("sidx") === col("st_sidx"))
      .groupBy("doc_id")
      .agg(round(sum(col("m") * col("dw") * col("dw")) * lit(1e6))
        .cast("long").as("score"))
      .join(andDocs, Seq("doc_id"), "left_semi")

    clusteredTopK(scored, sites, k, perSite)
  }

  /** Phrase termId — Phrases.cpp:118 setPhrase: the two-word phrase id
    * starts from the first word's id and CONTINUES the tabulation hash
    * over the second word's bytes at the running byte position
    * (hash64Lower_utf8_cont, Phrases.cpp:290 with the conti/pos
    * carry), which for NUL-free lowercase tokens is exactly hash64 of
    * the concatenated words. */
  def phraseTermId(w1: String, w2: String): Long = GbHash.hash64(w1 + w2)

  /** Bigram posting lists: one row per ADJACENT alnum word pair,
    * (term_id = phraseTermId, doc_id, pos of the first word). The
    * reference indexes these for every document (XmlDoc hashes
    * m_phraseIds2 into posdb next to the unigrams) — phrase terms are
    * an INDEX-side artifact precisely so quoted queries never rescan
    * text. The pair construction is a per-row array zip (no self-join,
    * no window): split → zip_with(words, words[1:], concat) →
    * posexplode keeps the first word's raw array position, matching
    * postings()'s convention. Pairs touching an empty split artifact
    * (text edges) are dropped, like canPairAcross punts on
    * non-pairable separators (Phrases.cpp:216). */
  def bigramPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), TokenRe).as("ws"))
      .select(col("doc_id"),
        posexplode(zip_with(col("ws"),
          slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
          (a, b) => when(a =!= "" && b.isNotNull && b =!= "", concat(a, b))))
          .as(Seq("pos", "bigram")))
      .filter(col("bigram").isNotNull)
      .withColumn("term_id", graft.functions.GraftFunctions.gbHash64b(col("bigram")))

  /** Quoted-phrase query ("exact phrase"), served from the bigram
    * postings the way the reference serves quoted queries: Query.cpp
    * marks in-quotes terms and PosdbTable intersects their PHRASE
    * termlists instead of rescanning documents. An n-word phrase
    * intersects its n−1 bigram lists with the positional chain
    * pos_k = start + k — overlapping bigrams pin every word, so the
    * chain IS the full adjacency verification. score = number of
    * complete phrase occurrences (phrase tf); same site-clustered
    * top-k tail as searchTopK. Output: (doc_id, score, rank).
    *
    * Scale shape: the literal bigram-id IN-set prunes at the scan
    * (bigram lists are far more selective than unigrams — the reason
    * the reference pays to index phrase terms at all); ONE broadcast
    * of the (slot, term_id) offset table tags each posting with its
    * phrase slot; ONE hash-aggregate on (doc_id, start) counts
    * distinct slots (countDistinct, so a phrase with REPEATED bigrams
    * — "a b a b" — still needs every slot). No corpus self-join, no
    * window over the corpus. */
  def searchPhraseTopK(docs: DataFrame, idCol: String, textCol: String,
                       siteCol: String, phrase: String, k: Int,
                       perSite: Int = 2): DataFrame = {
    val ws = phrase.toLowerCase.split(TokenRe).filter(_.nonEmpty)
    require(ws.length >= 2, "phrase needs at least two words")
    val spark = docs.sparkSession
    import spark.implicits._
    val slots = ws.sliding(2).zipWithIndex
      .map { case (p, i) => (i, phraseTermId(p(0), p(1))) }.toSeq
    val slotDf = slots.toDF("slot", "slot_term")
    val sites = docs.select(col(idCol).as("site_doc_id"), col(siteCol).as("site"))

    val posts = bigramPostings(docs, idCol, textCol)
      .filter(col("term_id").isInCollection(slots.map(_._2).distinct))

    val starts = posts
      .join(broadcast(slotDf), col("term_id") === col("slot_term"))
      .select(col("doc_id"), (col("pos") - col("slot")).as("start"), col("slot"))
      .groupBy(col("doc_id"), col("start"))
      .agg(countDistinct(col("slot")).as("n_slots"))
      .filter(col("n_slots") === slots.length)

    val scored = starts.groupBy("doc_id")
      .agg(count(lit(1)).as("score"))
    clusteredTopK(scored, sites, k, perSite)
  }

  /** Doc ids matching the AND query — the intersection BEFORE any
    * clustering or top-k truncation. Facet stats run over this set:
    * Posdb.cpp:7339 "even if docid did not have a score high enough to
    * be in the winner's list, still add its facet stats, it still is
    * in the search results, just not in the top X." */
  private def andMatchedDocs(docs: DataFrame, idCol: String, textCol: String,
                             query: String): DataFrame = {
    val terms = query.toLowerCase.split(TokenRe).filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "empty query")
    val termIds = terms.map(termId)
    postings(docs, idCol, textCol)
      .filter(col("term_id").isInCollection(termIds))
      .groupBy("doc_id")
      .agg(countDistinct(col("term_id")).as("nt"))
      .filter(col("nt") === terms.length)
      .select("doc_id")
  }

  /** String facet over the result set (`gbfacetstr:field`,
    * Query.cpp:4425; aggregation Posdb.cpp:7339-7520 — one vote per
    * docid per facet value, FacetEntry.m_count — merged and printed by
    * Msg40.cpp:5445/6454). The facet column is a per-doc meta field
    * (like the reference's humanLang / gbtagsite meta-tag facets), so
    * the one-vote-per-docid dedup is a countDistinct(doc_id).
    * Output: (facet_value, n_docs, rank), count-desc like the result
    * page's facet box.
    *
    * Scale shape: the matched-doc set is the query-pruned postings
    * aggregate (O(Σ posting-list length)); the facet aggregate is one
    * hash-aggregate over matched docs with map-side combine — no
    * window, no sort beyond the final tiny value list. */
  def searchFacetStr(docs: DataFrame, idCol: String, textCol: String,
                     facetCol: String, query: String): DataFrame =
    docs.select(col(idCol).as("fdoc"), col(facetCol).as("facet_value"))
      .join(andMatchedDocs(docs, idCol, textCol, query),
        col("fdoc") === col("doc_id"), "left_semi")
      .groupBy(col("facet_value"))
      .agg(countDistinct(col("fdoc")).as("n_docs"))
      .orderBy(col("n_docs").desc, col("facet_value").asc)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_docs").desc, col("facet_value").asc)))

  /** Int range facet — the reference's histogram logic
    * (`gbfacetint:field,0-10,10-50`, Query.cpp:2662 "CONDENSE THE
    * FACETS", Posdb.cpp:7425-7445): a doc's value maps to the FIRST
    * range [lo, hi) containing it; every requested range gets a bucket
    * up front (Posdb.cpp:5576-5618 pre-inits one FacetEntry per range,
    * memset 0 — empty buckets report count 0 with zeroed stats), and
    * each bucket carries count + sum/min/max of the voted values
    * (FacetEntry.m_sum/m_min/m_max, Posdb.cpp:7493-7520). Values
    * outside every range are dropped (fe stays NULL → continue).
    * Output: (range_lo, n_docs, val_sum, val_min, val_max) ordered by
    * range_lo. */
  def searchFacetInt(docs: DataFrame, idCol: String, textCol: String,
                     facetCol: String, query: String,
                     ranges: Seq[(Long, Long)]): DataFrame = {
    require(ranges.nonEmpty, "int facet needs ranges")
    val spark = docs.sparkSession
    import spark.implicits._
    // first-match range assignment, in the caller's range order
    val bucket = ranges.foldLeft(lit(null).cast("long")) { case (acc, (a, b)) =>
      coalesce(acc, when(col("fval") >= a && col("fval") < b, lit(a)))
    }
    val voted = docs
      .select(col(idCol).as("fdoc"), col(facetCol).cast("long").as("fval"))
      .join(andMatchedDocs(docs, idCol, textCol, query),
        col("fdoc") === col("doc_id"), "left_semi")
      .withColumn("range_lo", bucket)
      .filter(col("range_lo").isNotNull)
      .groupBy(col("range_lo"))
      .agg(countDistinct(col("fdoc")).as("n_docs"),
        sum(col("fval")).as("val_sum"),
        min(col("fval")).as("val_min"),
        max(col("fval")).as("val_max"))
    ranges.map(_._1).toDF("range_lo")
      .join(voted, Seq("range_lo"), "left_outer")
      .select(col("range_lo"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("val_sum"), lit(0L)).as("val_sum"),
        coalesce(col("val_min"), lit(0L)).as("val_min"),
        coalesce(col("val_max"), lit(0L)).as("val_max"))
      .orderBy(col("range_lo").asc)
  }

  /** Result summaries — the Msg20/Summary.cpp step that runs per
    * RESULT (Msg40.cpp:1822 gotSummary fetches one per top-k doc,
    * never per corpus doc): pick the best excerpt window around the
    * query-term matches and return its text.
    *
    * The reference's getBestWindow (Summary.cpp:656) anchors a window
    * at each match, extends to maxExcerptLen chars, and scores it
    * (Summary.cpp:850-990): every word is worth 100, a query-term
    * match 100,000 (× a tf-based word weight), a term repeated within
    * the window divides by 15, one already covered by a previous
    * excerpt by 12; sentence-start/fragment bonuses and tag-crossing /
    * URL penalties adjust the tail. The winning window per doc is the
    * summary.
    *
    * Slice stand-ins, documented: windows are `windowTokens` TOKENS
    * anchored AT each match (the left-extension/sentence-boundary walk
    * needs the Bits/Sections machinery); word weights are 1.0 (the tf
    * table lives in Msg20 state); one excerpt per doc (numExcerpts=1,
    * so the `retired` /12 never fires); no sentence-start bonus or
    * tag/URL penalties (no HTML positions in the documents table); the
    * snippet is the window's lowercase alnum tokens joined by spaces
    * (the slice tokenizer, so the DuckDB oracle can recompute it
    * byte-for-byte). Kept from the reference: the 100-per-word +
    * 100000-per-match scoring with the integer /15 in-window repeat
    * damping, and the earliest-window tie-break (the match loop takes
    * a new winner only on score > maxScore, Summary.cpp:404).
    *
    * Scale shape: summaries join tokens ONLY for the k result docs
    * (left-semi on the top-k), so the match-window expansion is
    * O(k × doc tokens) — per-result work exactly like the reference's
    * per-result Msg20 fetch, never a corpus scan; the final per-doc
    * argmax window runs over k docs. Output: (doc_id, rank, summary). */
  def searchSummaries(docs: DataFrame, idCol: String, textCol: String,
                      siteCol: String, query: String, k: Int,
                      perSite: Int = 2, windowTokens: Int = 20,
                      highlight: Boolean = false): DataFrame = {
    val terms = query.toLowerCase.split(TokenRe).filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "empty query")
    val topk = searchTopK(docs, idCol, textCol, siteCol, query, k, perSite)
      .select(col("doc_id").as("top_doc"), col("rank"))

    val toks = docs
      .join(topk, col(idCol) === col("top_doc"), "left_semi")
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), TokenRe)).as(Seq("pos", "word")))
      .filter(col("word") =!= "")

    val matches = toks.filter(col("word").isInCollection(terms.toSeq))
      .select(col("doc_id").as("m_doc"), col("pos").as("a"))

    // window [a, a+W): per (doc, a, term) occurrence counts → term
    // score 100000 + (cnt-1) * (100000/15); + 100 per window token
    val win = matches.join(toks,
      col("doc_id") === col("m_doc") &&
        col("pos") >= col("a") && col("pos") < col("a") + windowTokens)
    val termScores = win.filter(col("word").isInCollection(terms.toSeq))
      .groupBy(col("m_doc"), col("a"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("m_doc"), col("a"))
      .agg(sum(lit(100000L) + (col("cnt") - 1) * lit(100000L / 15)).as("match_score"),
        sum(col("cnt")).as("n_match"))
    // a matched word's 100000 REPLACES its per-word 100 ("undo old
    // score", Summary.cpp:937) — only non-match tokens earn the 100
    val scored = win.groupBy(col("m_doc"), col("a"))
      .agg(count(lit(1)).as("n_toks"))
      .join(termScores, Seq("m_doc", "a"))
      .select(col("m_doc"), col("a"),
        (col("match_score") + lit(100L) * (col("n_toks") - col("n_match"))).as("w_score"))

    // winner window per doc: score desc, earliest a on ties — a
    // k-doc-bounded window, the per-result Msg20 analogue
    val wDoc = Window.partitionBy(col("m_doc"))
      .orderBy(col("w_score").desc, col("a").asc)
    val best = scored.withColumn("wr", row_number().over(wDoc))
      .filter(col("wr") === 1).select(col("m_doc"), col("a"))

    // Highlight.cpp:280-306 wraps every match in the per-query-term
    // color span s_frontTags[colorNum % 10] ... "</span>"
    // (Highlight.cpp:24-33, :211); colorNum is the term's index in the
    // query. The slice highlights within the summary snippet only
    // (the reference also highlights cached pages; same loop).
    val displayWord =
      if (!highlight) col("word")
      else terms.zipWithIndex.foldLeft(col("word")) { case (acc, (t, i)) =>
        when(col("word") === t,
          concat(lit(f"""<span class="gbcnst gbcnst${i % 10}%02d">"""),
            col("word"), lit("</span>"))).otherwise(acc)
      }
    val snippet = best.join(toks,
        col("doc_id") === col("m_doc") &&
          col("pos") >= col("a") && col("pos") < col("a") + windowTokens)
      .groupBy(col("m_doc"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), displayWord.as("word")))),
        s => s.getField("word")), " ").as("summary"))

    topk.join(snippet, col("top_doc") === col("m_doc"))
      .select(col("top_doc").as("doc_id"), col("rank"), col("summary"))
      .orderBy(col("rank").asc)
  }

  // ------------------------------------------------------- boolean queries

  /** Parsed boolean query item: a term, a NOT, or a parenthesized
    * sub-expression; a level is `item (AND|OR item)*`. */
  private sealed trait BItem
  private final case class BTerm(w: String) extends BItem
  private final case class BGroup(level: BLevel) extends BItem
  private final case class BLevel(items: Seq[(String, Boolean, BItem)]) // (opBefore, notted, item)

  /** Tokenize + recursive-descent parse. Operators must be UPPERCASE
    * (Query.cpp:2168-2206 only recognizes 'AND'/'OR'/'NOT' as opcodes;
    * lowercase 'and' is an ordinary — usually ignored — query word). */
  private def parseBool(q: String): BLevel = {
    val toks = q.replace("(", " ( ").replace(")", " ) ")
      .split("\\s+").filter(_.nonEmpty).toList
    def level(ts: List[String]): (BLevel, List[String]) = {
      var rest = ts
      val items = Seq.newBuilder[(String, Boolean, BItem)]
      var op = ""
      var first = true
      while (rest.nonEmpty && rest.head != ")") {
        rest.head match {
          case "AND" | "OR" => op = rest.head; rest = rest.tail
          case _ =>
            var notted = false
            while (rest.nonEmpty && rest.head == "NOT") { notted = !notted; rest = rest.tail }
            require(rest.nonEmpty && rest.head != ")", s"dangling NOT in '$q'")
            val item: BItem =
              if (rest.head == "(") {
                val (l, r2) = level(rest.tail)
                require(r2.nonEmpty && r2.head == ")", s"unbalanced parens in '$q'")
                rest = r2.tail
                BGroup(l)
              } else {
                val w = rest.head.toLowerCase.replaceAll(TokenRe, "")
                rest = rest.tail
                BTerm(w)
              }
            // operator-less adjacency ('a b') behaves differently in
            // the reference (isTruth keeps result=-1 and the LAST
            // operand wins) — reject instead of silently diverging
            require(first || op.nonEmpty,
              s"boolean query needs AND/OR between operands: '$q'")
            items += (((if (first) "" else op), notted, item)); first = false
            op = ""
        }
      }
      (BLevel(items.result()), rest)
    }
    val (l, rest) = level(toks)
    require(rest.isEmpty, s"unbalanced parens in '$q'")
    l
  }

  private def boolTerms(l: BLevel): Seq[String] = l.items.flatMap {
    case (_, _, BTerm(w)) => Seq(w)
    case (_, _, BGroup(g)) => boolTerms(g)
  }

  /** Terms that SCORE: outside any NOT (a vetoed term never adds tf). */
  private def boolPositiveTerms(l: BLevel): Seq[String] = l.items.flatMap {
    case (_, false, BTerm(w)) => Seq(w)
    case (_, false, BGroup(g)) => boolPositiveTerms(g)
    case _ => Nil
  }

  /** Render one level with the reference's isTruth accumulation
    * (Query.cpp:5524-5645): a flat left-to-right loop with NO operator
    * precedence — at each operand after the first, the LAST operator
    * seen combines (runningResult, prevOperand, thisOperand):
    * AND turns the result off unless both neighbors hold (seeding
    * true), OR turns it on if either holds (seeding false) WITHOUT
    * resetting an earlier true — the reference's mixed-operator quirk
    * ('a AND b OR c' = (a AND b) OR b OR c), ported as-is. `tv`/`fv`
    * abstract true/false literals; `and`/`or`/`not` the connectives —
    * one renderer for Catalyst Columns, one for DuckDB SQL text. */
  private def renderBool[T](l: BLevel, term: String => T,
                            and: (T, T) => T, or: (T, T) => T, not: T => T,
                            tv: T, fv: T): T = {
    var result: Option[T] = None
    var prevOperand: Option[T] = None
    var lastOp = ""
    l.items.foreach { case (opBefore, notted, item) =>
      if (opBefore.nonEmpty) lastOp = opBefore
      val raw = item match {
        case BTerm(w) => term(w)
        case BGroup(g) => renderBool(g, term, and, or, not, tv, fv)
      }
      val operand = if (notted) not(raw) else raw
      prevOperand.foreach { prev =>
        lastOp match {
          case "OR" => result = Some(or(or(result.getOrElse(fv), prev), operand))
          case _ => result = Some(and(and(result.getOrElse(tv), prev), operand))
        }
      }
      prevOperand = Some(operand)
    }
    result.orElse(prevOperand).getOrElse(tv)
  }

  /** Boolean query over the documents table (Query.cpp m_isBoolean;
    * Posdb evaluates each docid's term-presence bit vector against the
    * expression, Query.h:193 isTruth / Posdb.cpp bitVec). Presence
    * bits come from the query-term-pruned postings pivoted per doc;
    * score = Σ tf of the present NON-NEGATED terms (a NOT'd term never
    * scores), and a doc must hit at least one positive termlist — the
    * reference only ever sees docids gathered FROM term lists, so a
    * doc satisfying the expression purely by absence is never a
    * candidate there either. Clustering/top-k are q2's. */
  def searchBoolTopK(docs: DataFrame, idCol: String, textCol: String,
                     siteCol: String, query: String, k: Int,
                     perSite: Int = 2): DataFrame = {
    val tree = parseBool(query)
    val terms = boolTerms(tree).distinct
    val positive = boolPositiveTerms(tree).distinct
    require(terms.nonEmpty, "empty boolean query")
    val sites = docs.select(col(idCol).as("site_doc_id"), col(siteCol).as("site"))

    val tf = postings(docs, idCol, textCol)
      .filter(col("term_id").isInCollection(terms.map(termId)))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val pivoted = tf.groupBy("doc_id")
      .agg(terms.head match { case h =>
        max(when(col("word") === h, col("tf"))).as(s"tf_$h") },
        terms.tail.map(t => max(when(col("word") === t, col("tf"))).as(s"tf_$t")): _*)

    val predicate = renderBool[Column](tree,
      w => col(s"tf_$w").isNotNull,
      _ && _, _ || _, c => !c, lit(true), lit(false))
    val score = positive.map(t => coalesce(col(s"tf_$t"), lit(0L)))
      .reduceOption(_ + _).getOrElse(lit(0L))

    val scored = pivoted.filter(predicate)
      .select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0)

    clusteredTopK(scored, sites, k, perSite)
  }

  /** The DuckDB rendering of the same parse — (all terms, SQL boolean
    * over `tf_<term> IS NOT NULL` columns, positive terms) — so the
    * oracle provably shares the expression semantics. */
  def boolOracleParts(query: String): (Seq[String], String, Seq[String]) = {
    val tree = parseBool(query)
    val sql = renderBool[String](tree,
      w => s"(tf_$w IS NOT NULL)",
      (a, b) => s"($a AND $b)", (a, b) => s"($a OR $b)", a => s"(NOT $a)",
      "TRUE", "FALSE")
    (boolTerms(tree).distinct, sql, boolPositiveTerms(tree).distinct)
  }

  /** The reference's actual multi-term ranking SHAPE — min over query
    * term pairs of the best pair score ("ZAK'S ALGO",
    * Posdb.cpp:2929-2966: minPairScore over all (i,j); the final doc
    * score is that min, :2972-2983). Per pair, best = MAX over
    * occurrence pairs of the distance kernel
    * (getTermPairScoreForWindow, Posdb.cpp:3548-3617):
    *
    *   dist = |p1 − p2|, floored at 2, minus qdist(=2), +1 when the
    *   occurrences are out of query order; score = 100 / (dist + 1),
    *
    * times the two terms' frequency weights (m_freqWeights,
    * Posdb.cpp:1395; getTermFreqWeight :1216-1244 = 0.5 +
    * min(termFreq/numDocs, 0.5) — COMMON terms weigh more so the min
    * lands on the rare pair). Slice stand-ins, documented: positions
    * are token indexes (the reference's posdb units run ~2 per word —
    * dist = 2·Δtokens); body-only hashgroup/density/spam weights = 1
    * (density's effect is evidenced separately in q4); termFreq =
    * document frequency over the corpus; no sliding-window restriction
    * of body occurrences (the window only prunes which occurrence
    * pairs are eligible — the kernel and the maximin combination are
    * what this operator pins); no siterank multiplier (:2983 — the
    * documents table carries none).
    *
    * Scale shape: the pair join runs on the query-term-pruned postings
    * (O(Σ posting-list length)), per-doc expansion bounded by the
    * occurrence count squared — the same bound as the reference's
    * in-memory term-pair walk over one docid's lists. */
  def searchPairMinTopK(docs: DataFrame, idCol: String, textCol: String,
                        siteCol: String, query: String, k: Int,
                        perSite: Int = 2): DataFrame = {
    val terms = query.toLowerCase.split(TokenRe).filter(_.nonEmpty).distinct
    require(terms.length >= 2, "pair scoring needs >= 2 terms")
    val nPairs = terms.length * (terms.length - 1) / 2
    val sites = docs.select(col(idCol).as("site_doc_id"), col(siteCol).as("site"))

    // qidx = the term's position in the query (order matters for the
    // out-of-order penalty)
    val qidx = terms.zipWithIndex.tail.foldLeft(when(col("word") === terms.head, 0)) {
      case (acc, (t, i)) => acc.when(col("word") === t, i)
    }
    val posts = postings(docs, idCol, textCol)
      .filter(col("term_id").isInCollection(terms.map(termId)))
      .select(col("doc_id"), col("pos"), qidx.as("qi"))

    // per-term document frequency → freq weight 0.5 + min(df/N, 0.5)
    val nDocs = docs.count().toDouble
    val fw = posts.groupBy(col("qi")).agg(countDistinct(col("doc_id")).as("df"))
      .select(col("qi").as("fw_qi"),
        (lit(0.5) + least(col("df") / lit(nDocs), lit(0.5))).as("fw"))

    val a = posts.select(col("doc_id"), col("qi").as("ia"), col("pos").as("pa"))
    val b = posts.select(col("doc_id").as("doc_b"), col("qi").as("ib"), col("pos").as("pb"))
    // dist in reference units = 2·Δtokens (floored at 2) − qdist(2),
    // +1 out of query order; kernel = 100/(dist+1); best per pair
    val dist = greatest(lit(2), abs(col("pa") - col("pb")) * 2) - lit(2) +
      when(col("pb") < col("pa"), 1).otherwise(0)
    val pairBest = a.join(b, col("doc_id") === col("doc_b") && col("ia") < col("ib"))
      .select(col("doc_id"), col("ia"), col("ib"),
        (lit(100.0) / (dist.cast("double") + lit(1.0))).as("s"))
      .groupBy(col("doc_id"), col("ia"), col("ib"))
      .agg(max(col("s")).as("best"))
      .join(fw, col("ia") === col("fw_qi"))
      .withColumn("best", col("best") * col("fw")).drop("fw", "fw_qi")
      .join(fw, col("ib") === col("fw_qi"))
      .withColumn("best", col("best") * col("fw")).drop("fw", "fw_qi")

    // min over pairs; requiring ALL pairs present IS the AND check
    val scored = pairBest.groupBy("doc_id")
      .agg(min(col("best")).as("minbest"), count(lit(1)).as("np"))
      .filter(col("np") === nPairs)
      // micro-units so the oracle compare is float-format-proof
      .select(col("doc_id"), round(col("minbest") * lit(1e6)).cast("long").as("score"))

    clusteredTopK(scored, sites, k, perSite)
  }

  /** AND-query with NEGATIVE terms — the reference's '-term' sign:
    * Query.cpp:2494-2496 reads the sign off the preceding punct token
    * (a '-' straight after whitespace), Query.cpp:933 carries it to
    * QueryTerm::m_termSign, and the Posdb intersection removes every
    * docid that appears in a negative term's list from the docid vote
    * buffer (Posdb.cpp:5841-5852 rmDocIdVotes; BF_NEGATIVE set at
    * :1819). Scoring/clustering/top-k are q2's — negative terms never
    * contribute score, they only veto.
    *
    * Scale shape: the veto is a LEFT ANTI join of the scored AND-docs
    * against the minus-term-pruned postings — both sides are
    * query-term slices (O(posting-list length)), never the corpus;
    * the anti-join is the set-subtract analogue of rmDocIdVotes. */
  def searchMinusTopK(docs: DataFrame, idCol: String, textCol: String,
                      siteCol: String, query: String, k: Int,
                      perSite: Int = 2): DataFrame = {
    val raw = query.toLowerCase.split("\\s+").filter(_.nonEmpty)
    // site: field terms (Query.cpp:442 FIELD_SITE; '-site:' excludes):
    // the slice matches the site/clustering column exactly — the
    // reference matches the url's site prefix, which IS that column
    // for titledb-backed search (SiteGetter site)
    val siteRe = "^(-?)site:(.+)$".r
    val siteReq = raw.collect { case siteRe("", s) => s }
    val siteNeg = raw.collect { case siteRe("-", s) => s }
    val words = raw.filterNot(t => siteRe.pattern.matcher(t).matches)
    val minus = words.filter(_.startsWith("-")).map(_.drop(1))
      .flatMap(_.split(TokenRe)).filter(_.nonEmpty).distinct
    val plus = words.filterNot(_.startsWith("-"))
      .flatMap(_.split(TokenRe)).filter(_.nonEmpty).distinct
    require(plus.nonEmpty, "need at least one positive term")
    // clusteredTopK inner-joins scored docs with `sites`, so the field
    // restriction is a filter on that dimension side — it prunes before
    // the clustering window, never rescans postings
    val sites = docs.select(col(idCol).as("site_doc_id"), col(siteCol).as("site"))
      .filter(
        (if (siteReq.isEmpty) lit(true) else col("site").isInCollection(siteReq.toSeq)) &&
          (if (siteNeg.isEmpty) lit(true) else !col("site").isInCollection(siteNeg.toSeq)))

    val posts = postings(docs, idCol, textCol)
    val tf = posts.filter(col("term_id").isInCollection(plus.map(termId)))
      .groupBy(col("doc_id"), col("term_id"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf.groupBy("doc_id")
      .agg(sum(col("tf")).as("score"), count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === plus.length)
      .drop("n_terms")

    val vetoed =
      if (minus.isEmpty) scored
      else scored.join(
        posts.filter(col("term_id").isInCollection(minus.map(termId)))
          .select(col("doc_id")),
        Seq("doc_id"), "left_anti")

    clusteredTopK(vetoed, sites, k, perSite)
  }

  /** Related-topic ("gigabit") extraction over the result set —
    * Msg40.cpp:3484 computeGigabits / :4320 hashExcerpt, distilled to
    * single-word topics:
    *  - candidate words: not a query term, ≥ 4 chars (hashExcerpt's
    *    wlen<3 skip plus the wlen<=3 "second-class citizen" rule that
    *    zeroes 3-char prox scores, so only ≥4 ever survives
    *    proxScore>0), not a common word (isCommonWord → the engine's
    *    stopword list), not ending in "ed" (own-gigabit ban,
    *    Msg40.cpp:4920) or "ing" (lowercase -ing ban, Msg40.cpp:4905;
    *    the slice lowercases all tokens so the rule applies to all)
    *  - occurrence proximity score (QTR zones, Msg40.cpp:50-57):
    *    Σ over query terms matching in the doc of
    *    bonus(min |pos − matchpos|): <4→1000, <8→800, <12→500,
    *    <20→200, ≥20→0; popWeight = 1 (no speller popularity table
    *    in this engine). Distances are token positions (the
    *    reference's Words slots interleave punct tokens).
    *  - per-doc score = max occurrence score × POP_BOOST_0 = 4.0
    *    (minPop = 1 < POP_ZONE_0 = 10 at uniform popularity,
    *    Msg40.cpp:5195; the reference's per-key local add OVERWRITES
    *    (HashTableX::addKey semantics) so the last occurrence wins —
    *    the slice takes the occurrence max, order-independent and
    *    identical whenever the best window occurs last)
    *  - master merge across docs counts each doc once
    *    (hashGigabitSample, Msg40.cpp:4236-4243: m_numPages++,
    *    m_gbscore +=, m_lastDocId guard)
    *  - final rank = gbscore × numPages (× numWords = 1 for single
    *    words), ÷4 when on a single page; ties numPages desc then
    *    term asc (gigabitCmp, Msg40.cpp:3452-3472).
    *
    * Scale shape: every stage after searchTopK touches tokens of the
    * k result docs only (left-semi on the top-k) — the candidate ×
    * match join is O(k × docTokens × queryMatches), the same
    * per-result bound as the reference's per-Msg20 sample hashing;
    * nothing rescans the corpus. Output: (term, gb_score, num_pages),
    * top `topics` rows. */
  def searchGigabits(docs: DataFrame, idCol: String, textCol: String,
                     siteCol: String, query: String, k: Int,
                     perSite: Int = 2, topics: Int = 20): DataFrame = {
    val (_, occ) = gigabitOcc(docs, idCol, textCol, siteCol, query, k, perSite)
    val perDoc = occ.groupBy(col("doc_id"), col("word"))
      .agg((max(col("prox")) * lit(4.0)).as("doc_score"))

    val master = perDoc.groupBy(col("word"))
      .agg(sum(col("doc_score")).as("gbscore"), count(lit(1)).as("num_pages"))

    master.select(col("word").as("term"),
        (col("gbscore") * col("num_pages") /
          when(col("num_pages") <= 1, lit(4.0)).otherwise(lit(1.0))).as("gb_score"),
        col("num_pages"))
      .orderBy(col("gb_score").desc, col("num_pages").desc, col("term").asc)
      .limit(topics)
  }

  /** Shared q10/q15 front half: result-doc tokens and the per-candidate
    * occurrence proximity scores ((doc_id, pos, word, prox) — only
    * occurrences within QTR_ZONE_3 of some query match). */
  private def gigabitOcc(docs: DataFrame, idCol: String, textCol: String,
                         siteCol: String, query: String, k: Int,
                         perSite: Int): (DataFrame, DataFrame) = {
    val terms = query.toLowerCase.split(TokenRe).filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "empty query")
    val topk = searchTopK(docs, idCol, textCol, siteCol, query, k, perSite)
      .select(col("doc_id").as("top_doc"))

    val toks = docs
      .join(topk, col(idCol) === col("top_doc"), "left_semi")
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), TokenRe)).as(Seq("pos", "word")))
      .filter(col("word") =!= "")

    val matches = toks.filter(col("word").isInCollection(terms.toSeq))
      .select(col("doc_id").as("m_doc"), col("word").as("m_term"),
        col("pos").as("m_pos"))

    val cands = toks
      .filter(length(col("word")) >= 4)
      .filter(!col("word").isInCollection(terms.toSeq))
      .filter(!col("word").isInCollection(graft.textops.TextOps.stopwords))
      .filter(!col("word").endsWith("ed") && !col("word").endsWith("ing"))

    // nearest-match distance per (occurrence, query term) — the
    // hashExcerpt posPtr walk computes exactly min |i − matchpos|
    val nearest = cands.join(matches, col("doc_id") === col("m_doc"))
      .groupBy(col("doc_id"), col("pos"), col("word"), col("m_term"))
      .agg(min(abs(col("pos") - col("m_pos"))).as("d"))
      .filter(col("d") < 20)

    val occ = nearest
      .select(col("doc_id"), col("pos"), col("word"),
        when(col("d") < 4, 1000L).when(col("d") < 8, 800L)
          .when(col("d") < 12, 500L).otherwise(200L).as("bonus"))
      .groupBy(col("doc_id"), col("pos"), col("word"))
      .agg(sum(col("bonus")).as("prox"))

    (toks, occ)
  }

  /** Multi-word gigabits (maxWordsPerTopic = 2): single-word topics AND
    * adjacent-token bigrams compete in ONE ranking with the reference's
    * numWords multiplier ("King John on 6 pages should be John on 12" —
    * gigabitCmp, Msg40.cpp:3459-3461 sa ×= numWords). Bigram rules
    * distilled from hashExcerpt's phrase walk (Msg40.cpp:4852-5230):
    * the phrase must START at a QTR-scoring candidate word ("must start
    * with a QTR-scoring word", :4800); its score is the MAX proxScore
    * over the phrase's words (wordProxMax, :5206); the next token is
    * any word (query/common words may ride inside a phrase — only
    * all-query/common phrases are banned, :5040, which a candidate
    * first word already precludes); token adjacency stands in for the
    * punct-bounded walk (split artifacts break phrases exactly where
    * topicMaxPunctLen would). Overlap removal (topicRemoveOverlaps)
    * is NOT applied — both "king john" and "john" may list.
    * Output: (term, gb_score, num_pages, num_words). */
  def searchGigabitPhrases(docs: DataFrame, idCol: String, textCol: String,
                           siteCol: String, query: String, k: Int,
                           perSite: Int = 2, topics: Int = 20): DataFrame = {
    val (toks, occ) = gigabitOcc(docs, idCol, textCol, siteCol, query, k, perSite)

    val singles = occ.groupBy(col("doc_id"), col("word"))
      .agg((max(col("prox")) * lit(4.0)).as("doc_score"))
      .select(col("doc_id"), col("word").as("term"),
        col("doc_score"), lit(1).as("num_words"))

    // bigram = candidate occurrence + its next token; phrase prox =
    // max of the two words' prox (a non-candidate second word scores 0)
    val next = toks.select(col("doc_id").as("n_doc"), col("pos").as("n_pos"),
      col("word").as("n_word"))
    val occ2 = occ.select(col("doc_id").as("o2_doc"), col("pos").as("o2_pos"),
      col("prox").as("o2_prox"))
    val bigrams = occ
      .join(next, col("doc_id") === col("n_doc") && col("n_pos") === col("pos") + 1)
      .join(occ2, col("doc_id") === col("o2_doc") && col("o2_pos") === col("pos") + 1,
        "left_outer")
      .select(col("doc_id"),
        concat(col("word"), lit(" "), col("n_word")).as("term"),
        greatest(col("prox"), coalesce(col("o2_prox"), lit(0L))).as("prox"))
      .groupBy(col("doc_id"), col("term"))
      .agg((max(col("prox")) * lit(4.0)).as("doc_score"))
      .withColumn("num_words", lit(2))
      .select(col("doc_id"), col("term"), col("doc_score"), col("num_words"))

    val master = singles.unionByName(bigrams)
      .groupBy(col("term"), col("num_words"))
      .agg(sum(col("doc_score")).as("gbscore"), count(lit(1)).as("num_pages"))

    master.select(col("term"),
        (col("gbscore") * col("num_pages") * col("num_words") /
          when(col("num_pages") <= 1, lit(4.0)).otherwise(lit(1.0))).as("gb_score"),
        col("num_pages"), col("num_words").cast("int").as("num_words"))
      .orderBy(col("gb_score").desc, col("num_pages").desc, col("term").asc)
      .limit(topics)
  }

  /** Same query over the crawl's own titledb (uh48, url, extracted
    * text): site = SiteGetter site hash, the real Msg40 clustering key
    * (the codegen'd SiteKeyHash32Expr — hash32 of the SiteGetter site). */
  def searchTitledb(titledb: DataFrame, query: String, k: Int, perSite: Int = 2): DataFrame =
    searchTopK(
      titledb.withColumn("site_hash32",
        graft.functions.GraftFunctions.siteKeyHash32(col("url"))),
      "uh48", "text", "site_hash32", query, k, perSite)
}
