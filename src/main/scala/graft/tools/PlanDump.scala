package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<query>_<suffix>.txt` — the plan evidence files for the
  * optimization rounds (plans/r06/...). Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1 q2 ...]
  * (no query args = all queries). Measurement tooling only — never on
  * the bench/oracle path. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val wanted = args.drop(3).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
          println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable => System.err.println(s"[plandump] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
