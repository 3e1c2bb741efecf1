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
    write("textops_mm_decode.tsv", rows("mm_decode_stub").map(_.mkString("\t")).sorted)
    spark.stop()
  }
}
