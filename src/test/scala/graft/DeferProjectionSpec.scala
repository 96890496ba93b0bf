package graft

import org.apache.spark.sql.functions._

import graft.functions.Registry

/** The round-18 defer-expensive-projection optimizer rule
  * ([[graft.sql.DeferExpensiveProjection]]): a deterministic expensive
  * scalar projection under a global sort moves above it (one evaluation
  * instead of the range-sampler's two, and it lands post-exchange where
  * the rows are spread over many partitions), results bitwise unchanged;
  * the guarded shapes stay put.
  */
class DeferProjectionSpec extends GraftSuite {

  // parquet-backed (a LocalRelation would let ConvertToLocalRelation
  // fold the whole projection before the rule could see a Sort)
  private def df = {
    Registry.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity").as("x"),
        col("l_returnflag").as("t"))
  }

  /** index of the first expensive marker vs the first Sort in the
    * optimized plan string; fired = marker ABOVE (before) the Sort.
    */
  private def firedIn(plan: String, marker: String): Boolean = {
    val sortIdx = plan.indexOf("Sort [")
    val projIdx = plan.indexOf(marker)
    assert(sortIdx >= 0 && projIdx >= 0, s"missing Sort/$marker in:\n$plan")
    projIdx < sortIdx
  }

  test("fires: expensive math under ORDER BY moves above the sort") {
    val q = df.select(col("k"),
        round(sin(col("x")), 6).as("s"), round(log(col("x") + 1.0), 6).as("l"))
      .orderBy("k")
    assert(firedIn(q.queryExecution.optimizedPlan.toString, "SIN("),
      "expected the math projection above the Sort")
  }

  test("bitwise-identical results vs the undeferred plan") {
    val q = df.select(col("k"),
        round(sin(col("x")), 6).as("s"), round(log(col("x") + 1.0), 6).as("l"))
      .orderBy("k")
    val fired = q.collect()
    val bare = spark.newSession() // no registerAll -> no rule installed
    assert(!bare.experimental.extraOptimizations.contains(
      graft.sql.DeferExpensiveProjection))
    val q2 = bare.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity").as("x"),
        col("l_returnflag").as("t"))
      .select(col("k"),
        round(sin(col("x")), 6).as("s"), round(log(col("x") + 1.0), 6).as("l"))
      .orderBy("k")
    assert(!firedIn(q2.queryExecution.optimizedPlan.toString, "SIN("),
      "control plan unexpectedly fired")
    val plain = q2.collect()
    assert(fired.length == plain.length)
    // k is not unique in lineitem; canonicalize tie order client-side and
    // compare the full multiset bitwise
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0),
      java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
      java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
    assert(fired.map(key).sorted.toSeq == plain.map(key).sorted.toSeq,
      "bitwise mismatch between fired and control plans")
  }

  test("does not fire: sort key is the computed column") {
    val q = df.select(col("k"), round(sin(col("x")), 6).as("s")).orderBy("s")
    assert(!firedIn(q.queryExecution.optimizedPlan.toString, "SIN("),
      "computed sort key must keep the projection below the Sort")
  }

  test("does not fire: moved expression reads a string column (width guard)") {
    val q = df.select(col("k"), round(sin(length(col("t"))), 6).as("s"))
      .orderBy("k")
    assert(!firedIn(q.queryExecution.optimizedPlan.toString, "SIN("),
      "string-sourced expression must stay below the Sort")
  }

  test("does not fire: non-deterministic projection") {
    val q = df.select(col("k"), (rand() + sin(col("x"))).as("r")).orderBy("k")
    assert(!firedIn(q.queryExecution.optimizedPlan.toString, "SIN("),
      "non-deterministic projection must stay below the Sort")
  }

  test("does not fire: cheap arithmetic only") {
    val q = df.select(col("k"), (col("x") * 2.0 + 1.0).as("y")).orderBy("k")
    val plan = q.queryExecution.optimizedPlan.toString
    val sortIdx = plan.indexOf("Sort [")
    val projIdx = plan.indexOf("* 2.0")
    assert(sortIdx >= 0 && projIdx >= 0 && projIdx > sortIdx,
      s"cheap arithmetic must stay below the Sort:\n$plan")
  }
}
