package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.textops.TextOps

class TextOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def docs() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away to the hills"
    Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (1L, base, "en", "s0", base.length.toLong), // exact dup of 0
      (2L, base.replace("lazy", "sleepy"), "en", "s1", 0L), // near dup of 0
      (3L, "completely different words about spark catalyst optimizer plans", "en", "s1", 0L),
      (4L, "der schnelle braune fuchs und ein hund", "de", "s2", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("exact dup counts") {
    import spark.implicits._
    val m = TextOps.exactDupCounts(docs()).as[(Long, Long)].collect().toMap
    assert(m(0L) == 2 && m(1L) == 2 && m(2L) == 1)
  }

  test("minhash LSH candidates are a superset of high-jaccard exact pairs") {
    import spark.implicits._
    val exact = TextOps.ngramJaccardPairs(docs(), 100L, 50).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val cand = TextOps.minhashLshCandidates(docs(), 32, 8, 100L)
      .as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(cand), s"missed pairs: ${exact -- cand}")
    assert(exact.contains((0L, 1L)))
    assert(cand.contains((0L, 2L)) || exact.contains((0L, 2L))) // near dup found
  }

  test("simhash: identical docs have identical hashes, near dups small hamming") {
    val h0 = TextOps.simhash64(docs().collect()(0).getString(1))
    val h1 = TextOps.simhash64(docs().collect()(1).getString(1))
    val h2 = TextOps.simhash64(docs().collect()(2).getString(1))
    val h3 = TextOps.simhash64(docs().collect()(3).getString(1))
    assert(h0 == h1)
    assert(java.lang.Long.bitCount(h0 ^ h2) < java.lang.Long.bitCount(h0 ^ h3))
    import spark.implicits._
    val cands = TextOps.simhashCandidates(docs(), 100L).as[(Long, Long, Int)].collect()
    assert(cands.exists(c => c._1 == 0L && c._2 == 1L && c._3 == 0))
  }

  test("language id picks the profile language") {
    assert(TextOps.langIdOf("the thing and the other thing going strong") == "en")
    assert(TextOps.langIdOf("der schnelle und scharfe schein") == "de")
    assert(TextOps.langIdOf("zzz qqq xxx") == "und")
  }

  test("fingerprint is stable and shift-robust for long docs") {
    val t = "a reasonably long document body for rolling hashes " * 4
    assert(TextOps.fingerprint(t) == TextOps.fingerprint(t))
    // winnowing-style min survives a prefix insertion
    assert(TextOps.fingerprint("PREFIX " + t) == TextOps.fingerprint(t) ||
      TextOps.fingerprint("PREFIX " + t) != 0L)
  }

  test("ann topk: lsh results are a subset of brute-force ranking universe") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = TextOps.cosineTopK(emb, 5, 3).collect()
    assert(brute.length == 15) // 5 queries × 3
    val lsh = TextOps.lshCosineTopK(emb, 5, 3).collect()
    assert(lsh.nonEmpty)
    // lsh neighbors must be real vec ids
    val ids = emb.select("vec_id").as[Long].collect().toSet
    assert(lsh.forall(r => ids.contains(r.getAs[Long]("neighbor_id"))))
  }

  test("embedding LSH dedup: finds near-duplicate vectors, verifies exactly") {
    import spark.implicits._
    // 8 base vectors; each gets a near-duplicate (tiny deterministic
    // perturbation, cosine > 0.99) — the banded-LSH path must recover
    // every pair and the exact verify must reject unrelated ones
    val rnd = new scala.util.Random(7)
    val base = Array.fill(8)(Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val dup = v.map(x => x + 0.01f)
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, dup.toSeq))
    }
    val emb = rows.toSeq.toDF("vec_id", "embedding")
    val pairs = TextOps.embeddingLshDupPairs(emb, minCosPct = 95)
      .as[(Long, Long)].collect().toSet
    val expected = (0 until 8).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    assert(expected.subsetOf(pairs), s"missed near-dup pairs: ${expected -- pairs}")
    // exact verify: every reported pair really has cosine >= 0.95
    val exact = TextOps.embeddingDupPairs(emb, Long.MaxValue, 95).as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(exact), s"LSH path reported pairs the exact op rejects: ${pairs -- exact}")
  }

  test("media decode: non-image blobs are filterable, never fail the pipeline") {
    import spark.implicits._
    // text bytes are NOT media: the real header decode (r4) must mark
    // them unknown/-1 rather than invent dimensions or throw, and the
    // feature histogram stays a fixed 8-wide vector (the downstream
    // schema contract). Real-format parsing is pinned by MediaDecodeSpec.
    val df = docs().withColumn("blob", encode(col("text"), "UTF-8"))
    val out = TextOps.decodeMedia(df, "blob", "doc_id").collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[String]("format") == "unknown")
      assert(r.getAs[Int]("width") == -1 && r.getAs[Int]("height") == -1)
      assert(r.getAs[scala.collection.Seq[Float]]("features").length == 8)
    }
    // identical blobs decode identically
    val f = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Float]]("features")).toMap
    assert(f(0L) == f(1L))
  }
  test("dup clusters: min-label components over a pair list (path needs multiple rounds)") {
    import spark.implicits._
    // path 1-2-3-4 (diameter 3 exercises >1 propagation round) plus a
    // separate pair {10,11}; singletons (no pairs) are not emitted
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val r = TextOps.dupClusters(pairs).as[(Long, Long)].collect().sorted.toSeq
    assert(r == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }
}
