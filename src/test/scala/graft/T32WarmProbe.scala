package graft

/** Advice r16 #3: a WARM 3-pass-min measurement of t32 (and its
  * siblings t30/t31 for reference) at sf0.1 and the derived sf1 — the
  * round-16 ScaleStress wall for t32 (7.9 s → 79.5 s) was a single
  * cold-JVM shot, the exact failure mode the r15 t30 lesson documented
  * (one lazy-plan recompile hid a 32× constant). Three passes in one
  * warm JVM, min per (query, sf) printed as JSONL for SCALE.md.
  */
object T32WarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[32]")
    graft.functions.Registry.registerAll(spark)
    spark.sparkContext.setLogLevel("ERROR")
    ScaleStress.buildSf1(spark)
    val queries = Seq("t32_wordpiece_tokenize", "t31_wordpiece",
      "t30_unigram_tokenize")
    for (q <- queries; (sfName, dir) <-
           Seq("sf0.1" -> ScaleStress.Sf01, "sf1" -> ScaleStress.Sf1)) {
      val walls = (1 to 3).map { _ =>
        val t0 = System.currentTimeMillis()
        SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.currentTimeMillis() - t0) / 1000.0
      }
      println(f"""WARM {"q":"$q","sf":"$sfName","min_sec":${walls.min}%.2f,""" +
        f""""passes":[${walls.map(w => f"$w%.2f").mkString(",")}]}""")
    }
    spark.stop()
    println("WARM DONE")
  }
}
