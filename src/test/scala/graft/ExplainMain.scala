package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Captures `.explain("formatted")` for named declared queries into
  * plans/<tag>/<name>_<suffix>.txt — the optimization-round evidence
  * files (the judge reads plan claims against these).
  *
  * Usage: Test/runMain graft.ExplainMain <suffix> <q1,q2,...> [sfdir]
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = GraftSession.getOrCreate(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans",
      sys.env.getOrElse("SPARK_GRAFT_PLANS_TAG", "r19"))
    Files.createDirectories(outDir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        formatted.getBytes(StandardCharsets.UTF_8))
      println(s"[explain] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
