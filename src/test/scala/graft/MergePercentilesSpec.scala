package graft

import org.apache.spark.sql.functions._

/** The round-18 percentile-merge optimizer rule
  * ([[graft.sql.MergePercentiles]]): N same-column exact percentiles
  * collapse into ONE array-argument buffer, results bitwise unchanged.
  */
class MergePercentilesSpec extends GraftSuite {

  private def df = {
    val rows = (1 to 4000).map(i => ((i * 37) % 11, (i * i % 997) / 7.0))
    spark.createDataFrame(rows).toDF("g", "x")
  }

  private val q =
    """SELECT g, percentile(x, 0.25D) p25, percentile(x, 0.5D) p50,
              percentile(x, 0.9D) p90
       FROM pct_t GROUP BY g ORDER BY g"""

  test("three same-column percentiles merge into one array buffer") {
    df.createOrReplaceTempView("pct_t")
    val plan = spark.sql(q).queryExecution.optimizedPlan.toString
    assert(plan.contains("array(0.25, 0.5, 0.9)"),
      s"expected merged array percentile in:\n$plan")
    // exactly one percentile aggregate function remains (partial+final
    // appear in the PHYSICAL plan; the optimized logical plan carries
    // the merged call once per output column reference)
    assert(!plan.contains("percentile(x#") ||
      !plan.contains(", 0.25, 1"), "scalar percentile survived the merge")
  }

  test("merged results are bitwise-identical to the unmerged plan") {
    df.createOrReplaceTempView("pct_t")
    val merged = spark.sql(q).collect()
    val bare = spark.newSession() // no registerAll -> no rule installed
    df.createOrReplaceTempView("pct_t") // view is session-scoped; rebind
    val d2 = bare.createDataFrame(
      (1 to 4000).map(i => ((i * 37) % 11, (i * i % 997) / 7.0))).toDF("g", "x")
    d2.createOrReplaceTempView("pct_t")
    assert(!bare.experimental.extraOptimizations.contains(
      graft.sql.MergePercentiles))
    val plain = bare.sql(q).collect()
    assert(merged.length == plain.length)
    merged.zip(plain).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(0))
      (1 to 3).foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(i)) ==
          java.lang.Double.doubleToRawLongBits(b.getDouble(i)),
          s"mismatch at row $a vs $b col $i")
      }
    }
  }

  test("fast path handles -0.0 / 0.0 / NaN / empty groups like Spark") {
    val vals: Seq[(Int, java.lang.Double)] = Seq(
      (0, -0.0), (0, 0.0), (0, 0.0), (0, -0.0), (0, 1.0),
      (1, Double.NaN), (1, 1.0), (1, 2.0),
      (2, null), (3, 5.0))
    val d = spark.createDataFrame(vals).toDF("g", "x")
    d.createOrReplaceTempView("pct_edge")
    val qe =
      """SELECT g, percentile(x, 0.25D) a, percentile(x, 0.5D) b,
                percentile(x, 0.9D) c
         FROM pct_edge GROUP BY g ORDER BY g"""
    val fast = spark.sql(qe).collect()
    val bare = spark.newSession()
    bare.createDataFrame(vals).toDF("g", "x")
      .createOrReplaceTempView("pct_edge")
    val plain = bare.sql(qe).collect()
    fast.zip(plain).foreach { case (a, b) =>
      (1 to 3).foreach { i =>
        val (x, y) = (a.get(i), b.get(i))
        assert((x == null) == (y == null), s"null mismatch $a vs $b")
        if (x != null)
          assert(java.lang.Double.doubleToRawLongBits(
            x.asInstanceOf[Double]) == java.lang.Double.doubleToRawLongBits(
            y.asInstanceOf[Double]), s"bits mismatch $a vs $b col $i")
      }
    }
  }

  test("single scalar percentile over double swaps to the fast buffer") {
    df.createOrReplaceTempView("pct_t")
    val p = spark.sql(
      "SELECT g, percentile(x, 0.5D) m FROM pct_t GROUP BY g")
      .queryExecution.optimizedPlan.toString
    assert(p.contains("fast_percentile"), s"fast swap missing:\n$p")
  }

  test("DISTINCT / FILTER / different-column percentiles do not merge") {
    df.createOrReplaceTempView("pct_t")
    val p = spark.sql(
      """SELECT g, percentile(x, 0.5D) a,
                percentile(x, 0.9D) FILTER (WHERE x > 10) b
         FROM pct_t GROUP BY g""").queryExecution.optimizedPlan.toString
    // the filtered call must survive unmerged
    assert(p.contains("0.9"), s"filtered percentile missing:\n$p")
    val p2 = spark.sql(
      """SELECT g, percentile(x, 0.5D) a, percentile(x + 1.0D, 0.9D) b
         FROM pct_t GROUP BY g""").queryExecution.optimizedPlan.toString
    assert(!p2.contains("array(0.5, 0.9)"),
      s"different children must not merge:\n$p2")
  }
}
