package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Certifies e20's 100 TB story: swapping the exact `percentile` cutpoints
  * for `approx_percentile` (the sketch you'd run at scale, where an exact
  * multi-quantile needs a full sort-or-collect of the rollup) keeps the
  * SAME plan shape and assigns (almost) all users to the same RFM bucket.
  *
  * Exact agreement is not the contract — `percentile` interpolates between
  * order statistics while `approx_percentile` returns a real element, so a
  * user whose dimension value falls between the two cutpoints can land one
  * bucket over. With integer-valued r/f/m the disagreement band is at most
  * the single value straddling each cutpoint, hence the >= 99% gate.
  */
class RfmCutpointSpec extends GraftSuite {

  private val dir = "/root/testdata/sf0.1"

  private def bucketed(cut: DataFrame): DataFrame = {
    val q = SparkEntry.rfmRollup(spark, dir)
    def ascB(v: String, c: String): Column =
      lit(1) + when(col(v) > col(c)(0), 1).otherwise(0) +
        when(col(v) > col(c)(1), 1).otherwise(0) +
        when(col(v) > col(c)(2), 1).otherwise(0)
    def descB(v: String, c: String): Column =
      lit(1) + when(col(v) < col(c)(2), 1).otherwise(0) +
        when(col(v) < col(c)(1), 1).otherwise(0) +
        when(col(v) < col(c)(0), 1).otherwise(0)
    q.join(broadcast(cut))
      .select(col("user_id"),
        (ascB("r", "rc") * 100 + descB("f", "fc") * 10 + descB("m", "mc"))
          .cast("long").as("rfm"))
  }

  test("approx_percentile cutpoints agree with exact percentile on >=99% of users at sf0.1") {
    val q = SparkEntry.rfmRollup(spark, dir)
    val exactCut = q.agg(
      expr("percentile(r, array(0.25, 0.5, 0.75))").as("rc"),
      expr("percentile(f, array(0.25, 0.5, 0.75))").as("fc"),
      expr("percentile(m, array(0.25, 0.5, 0.75))").as("mc"))
    val approxCut = q.agg(
      expr("approx_percentile(r, array(0.25, 0.5, 0.75), 10000)").cast("array<double>").as("rc"),
      expr("approx_percentile(f, array(0.25, 0.5, 0.75), 10000)").cast("array<double>").as("fc"),
      expr("approx_percentile(m, array(0.25, 0.5, 0.75), 10000)").cast("array<double>").as("mc"))

    val exact = bucketed(exactCut).withColumnRenamed("rfm", "rfm_exact")
    val approx = bucketed(approxCut).withColumnRenamed("rfm", "rfm_approx")
    val joined = exact.join(approx, "user_id").cache()
    try {
      val total = joined.count()
      assert(total > 0, "empty rollup at sf0.1")
      val agree = joined.filter(col("rfm_exact") === col("rfm_approx")).count()
      val frac = agree.toDouble / total
      assert(frac >= 0.99,
        f"approx cutpoint buckets agree on only $frac%.4f of $total users")
    } finally joined.unpersist()
  }

  test("the approx variant plans identically: broadcast join, no Window, no shuffle join") {
    val q = SparkEntry.rfmRollup(spark, dir)
    val approxCut = q.agg(
      expr("approx_percentile(r, array(0.25, 0.5, 0.75), 10000)").cast("array<double>").as("rc"),
      expr("approx_percentile(f, array(0.25, 0.5, 0.75), 10000)").cast("array<double>").as("fc"),
      expr("approx_percentile(m, array(0.25, 0.5, 0.75), 10000)").cast("array<double>").as("mc"))
    val p = bucketed(approxCut).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window in approx-RFM plan:\n${p.take(800)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"shuffle join in approx-RFM plan:\n${p.take(800)}")
  }
}
