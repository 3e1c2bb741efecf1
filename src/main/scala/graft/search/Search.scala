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
  * Scoring is the minimal honest slice: score = Σ tf over query terms
  * (Posdb's full proximity/density scoring — sliding window :1266, term
  * pairs :3296 — is inventoried, not ported; the plan shape is what
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
    * non-alnum split) so the DuckDB oracle can recompute it. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tid = udf((w: String) => termId(w))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), TokenRe)).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
      .withColumn("term_id", tid(col("word")))
  }

  /** AND-query over a document table: every query term must appear;
    * score = Σ term frequency; at most `perSite` results per site
    * (Msg40.cpp:1822 site clustering); global top-k by (score desc,
    * doc_id asc). Output: (doc_id, score, rank). */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String, siteCol: String,
                 query: String, k: Int, perSite: Int = 2): DataFrame = {
    val terms = query.toLowerCase.split(TokenRe).filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "empty query")
    val termIds = terms.map(termId)
    val sites = docs.select(col(idCol).as("site_doc_id"), col(siteCol).as("site"))

    val tf = postings(docs, idCol, textCol)
      // literal IN-set on the scan side: with a bucketed/partitioned
      // postings table this prunes before any shuffle
      .filter(col("term_id").isInCollection(termIds))
      .groupBy(col("doc_id"), col("term_id"))
      .agg(count(lit(1)).as("tf"))

    val scored = tf.groupBy("doc_id")
      .agg(sum(col("tf")).as("score"), count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === terms.length) // AND intersection
      .drop("n_terms")

    // site clustering before the global top-k (gotSummary order). The
    // site join is a broadcast at sane site-table sizes; at 100 TB the
    // site hash rides IN the postings row (like site_hash32 in titledb)
    // and this join disappears.
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

  /** Same query over the crawl's own titledb (uh48, url, extracted
    * text): site = SiteGetter site hash, the real Msg40 clustering key. */
  def searchTitledb(titledb: DataFrame, query: String, k: Int, perSite: Int = 2): DataFrame = {
    val siteHash = udf((u: String) => GbHash.hash32(graft.core.SiteGetter.site(u)))
    searchTopK(
      titledb.withColumn("site_hash32", siteHash(col("url"))),
      "uh48", "text", "site_hash32", query, k, perSite)
  }
}
