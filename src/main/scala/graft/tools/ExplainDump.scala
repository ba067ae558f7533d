package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named registry queries to files.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> [sfDir] [q1,q2,...]
  *
  * One `<outDir>/<query>.txt` per query, holding the FORMATTED plan of
  * the exact DataFrame the bench times (`SparkEntry.queries`). Queries
  * whose construction runs jobs (index builds) run them as in Verify,
  * so the dumped plan is the final query-side plan. Used to produce the
  * `plans/r19/<query>_{before,after}.txt` optimization-round artifacts.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val names = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, n + ".txt"), txt)
        println(s"=== wrote $n (${txt.length} chars)")
      } catch {
        case e: Throwable => println(s"=== FAILED $n: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
