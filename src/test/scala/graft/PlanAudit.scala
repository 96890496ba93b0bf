package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq("d02_minhash_pairs", "d04_ngram_jaccard", "s01_ann_brute",
                  "j04_join_shuffle", "w01_window_running", "q07_agg_group",
                  "e02_sessionize", "d17_containment_pairs", "s15_bm25",
                  "sp11_dsir_weights", "sp12_gumbel_topk", "gr05_kcore")) {
      println(s"##### $n")
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      // summarize operator shapes only
      plan.linesIterator
        .map(_.replaceAll("\\(\\d+\\)", "").trim)
        .filter(l => l.matches(".*(Join|Exchange|HashAggregate|Sort|Window|Scan parquet|Generate|WholeStageCodegen|Filter).*"))
        .map(_.split("[\\[,]")(0))
        .foreach(l => println("  " + l.take(100)))
    }
    spark.stop()
  }
}
