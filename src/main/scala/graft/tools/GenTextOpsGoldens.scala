package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Generates VALUES-oracle goldens for the deterministic textops whose
  * math DuckDB cannot recompute (tabulation-hash MinHash/SimHash
  * signatures, hyperplane LSH buckets, Karp-Rabin fingerprints, the
  * two-stage langid): run each op ONCE over the fixed seed-42 sf0.01
  * testdata and commit the outputs to the main classpath; SparkEntry
  * embeds them as DuckDB VALUES oracles, converting these queries from
  * rows-only checks into driver-visible hash-match signal (same pattern
  * as the crawl_order/seen_set oracles).
  *
  * Run: `sbt "runMain graft.tools.GenTextOpsGoldens"` (only when an op's
  * semantics intentionally change). */
object GenTextOpsGoldens {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = "src/main/resources/graft/golden"
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def write(name: String, lines: Seq[String]): Unit = {
      Files.writeString(Paths.get(s"$outDir/$name"), lines.mkString("", "\n", "\n"))
      println(s"wrote $name (${lines.size} lines)")
    }

    def rows(q: String): Seq[Seq[String]] =
      SparkEntry.queries(q)(spark, sfDir).collect().toSeq
        .map(_.toSeq.map(String.valueOf))

    write("textops_minhash_lsh.tsv", rows("dedup_minhash_lsh").map(_.mkString("\t")).sorted)
    write("textops_simhash.tsv", rows("dedup_simhash").map(_.mkString("\t")).sorted)
    write("textops_ann_lsh.tsv", rows("ann_lsh_topk").map(_.mkString("\t")).sorted)
    write("textops_fingerprint.tsv", rows("text_fingerprint").map(_.mkString("\t")).sorted)
    write("textops_langid.tsv", rows("text_langid").map(_.mkString("\t")).sorted)
    write("textops_embedding_lsh.tsv", rows("dedup_embedding_lsh").map(_.mkString("\t")).sorted)
    // (mm_decode needs no golden: its oracle is pure arithmetic — the
    // fixture blobs' dimensions derive from doc_id)

    // recall of the LSH path vs the exact op, on the subset the exact op
    // covers (vec_id < 300, same 35% threshold) — recorded in BENCH.md
    {
      import org.apache.spark.sql.functions.col
      val exact = SparkEntry.queries("dedup_embedding_cosine")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = SparkEntry.queries("dedup_embedding_lsh")(spark, sfDir)
        .filter(col("vec_a") < 300 && col("vec_b") < 300)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = exact.count(lsh.contains)
      println(f"dedup_embedding_lsh recall vs exact (vec_id<300, cos>=0.35): $hit/${exact.size} = ${if (exact.isEmpty) 1.0 else hit.toDouble / exact.size}%.4f")

      val bf = SparkEntry.queries("ann_cosine_topk")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val annLsh = SparkEntry.queries("ann_lsh_topk")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val annHit = bf.count(annLsh.contains)
      println(f"ann_lsh_topk recall vs brute-force top-5: $annHit/${bf.size} = ${if (bf.isEmpty) 1.0 else annHit.toDouble / bf.size}%.4f")
    }
    spark.stop()
  }
}
