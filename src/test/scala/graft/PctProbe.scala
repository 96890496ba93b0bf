package graft

/** Times separate exact-percentile aggregates vs one array-argument
  * call (shared buffer) — the evidence probe for the MergePercentiles
  * optimizer rule.
  */
object PctProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    def run(label: String, q: String): Unit = {
      // warm once, then 3 timed reps, min
      val df = () => spark.sql(q)
      df().write.mode("overwrite").format("noop").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pct] $label min=${ts.min}%.2fs")
    }
    run("separate x3",
      """SELECT l_returnflag, percentile(l_extendedprice, 0.25D) p25,
                percentile(l_extendedprice, 0.5D) p50,
                percentile(l_extendedprice, 0.9D) p90
         FROM lineitem GROUP BY l_returnflag""")
    run("array x1",
      """SELECT l_returnflag, percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D)) ps
         FROM lineitem GROUP BY l_returnflag""")
    // bitwise equivalence check
    val a = spark.sql(
      """SELECT l_returnflag, percentile(l_extendedprice, 0.25D) p25,
                percentile(l_extendedprice, 0.5D) p50,
                percentile(l_extendedprice, 0.9D) p90
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
    val b = spark.sql(
      """SELECT l_returnflag, ps[0] p25, ps[1] p50, ps[2] p90 FROM (
           SELECT l_returnflag, percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D)) ps
           FROM lineitem GROUP BY l_returnflag) ORDER BY l_returnflag""").collect()
    val same = a.zip(b).forall { case (ra, rb) =>
      (1 to 3).forall(i =>
        java.lang.Double.doubleToRawLongBits(ra.getDouble(i)) ==
          java.lang.Double.doubleToRawLongBits(rb.getDouble(i)))
    }
    println(s"[pct] bitwise identical: $same")
    spark.stop()
  }
}
