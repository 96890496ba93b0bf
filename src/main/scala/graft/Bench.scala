package graft

import org.apache.spark.sql.SparkSession

import graft.functions.Registry

/** Per-round benchmark main (driver contract): times every declared query
  * at SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement notes:
  *  - results go to the `noop` sink so the FULL plan executes (a bare
  *    count() would let the optimizer drop sorts and projections);
  *  - one warmup execution of the flagship query amortizes JVM/codegen
  *    startup out of the numbers;
  *  - shuffle partitions = cores (local mode; AQE coalesces further).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.registerAll(spark)

    def execute(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: flagship + one ops query, results discarded
    execute("q07_agg_group")
    execute("t04_fingerprint")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> execute(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
