package graft

import org.apache.spark.sql.functions._

import graft.functions.Registry

/** The round-18 suffix-frame reversal rule
  * ([[graft.sql.ReverseSuffixFrames]]): `x FOLLOWING .. UNBOUNDED
  * FOLLOWING` frames move onto a reversed-order running frame (O(n)
  * instead of Spark's O(n²) UnboundedFollowing evaluation), results
  * identical; order-sensitive shapes stay put.
  */
class ReverseSuffixFramesSpec extends GraftSuite {

  private def df = {
    Registry.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        (col("o_orderkey") % 97).cast("long").as("v"))
  }

  test("fires: min over a ROWS suffix frame reverses to a running frame") {
    df.createOrReplaceTempView("rsf_t")
    val q = spark.sql(
      """SELECT k, min(v) OVER (PARTITION BY st ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mn
         FROM rsf_t""")
    val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!opt.contains("unboundedfollowing$()"),
      s"suffix frame survived the rewrite:\n$opt")
    assert(opt.contains("k#") && opt.contains("desc"),
      s"expected a reversed (DESC) window order:\n$opt")
  }

  test("suffix min/max/count/sum match the stock evaluation exactly") {
    df.createOrReplaceTempView("rsf_t")
    val sql =
      """SELECT k,
           min(v)   OVER (PARTITION BY st ORDER BY k ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mn,
           max(v)   OVER (PARTITION BY st ORDER BY k ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS mx,
           count(v) OVER (PARTITION BY st ORDER BY k ROWS BETWEEN 2 FOLLOWING AND UNBOUNDED FOLLOWING) AS c,
           sum(v)   OVER (PARTITION BY st ORDER BY k ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS s
         FROM rsf_t ORDER BY k"""
    val fired = spark.sql(sql).collect()
    val bare = spark.newSession()
    assert(!bare.experimental.extraOptimizations.contains(
      graft.sql.ReverseSuffixFrames))
    bare.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        (col("o_orderkey") % 97).cast("long").as("v"))
      .createOrReplaceTempView("rsf_t")
    val plain = bare.sql(sql).collect()
    assert(fired.length == plain.length && fired.sameElements(plain),
      "reversed suffix frames diverged from the stock evaluation")
  }

  test("RANGE suffix frame over a non-null key reverses and matches") {
    df.createOrReplaceTempView("rsf_t")
    // dense_rank is never null -> the RANGE arm applies (the w16/w19
    // lowering shape: GROUPS legs ride RANGE over a dense_rank index)
    val sql =
      """WITH b AS (SELECT k, st, v,
             dense_rank() OVER (PARTITION BY st ORDER BY v) AS gi
           FROM rsf_t)
         SELECT k, min(v) OVER (PARTITION BY st ORDER BY gi
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mn
         FROM b ORDER BY k"""
    val fired = spark.sql(sql).collect()
    val opt = spark.sql(sql).queryExecution.optimizedPlan.toString
    assert(!opt.contains("unboundedfollowing$()"),
      s"RANGE suffix frame survived:\n$opt")
    val bare = spark.newSession()
    bare.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        (col("o_orderkey") % 97).cast("long").as("v"))
      .createOrReplaceTempView("rsf_t")
    val plain = bare.sql(sql).collect()
    assert(fired.sameElements(plain),
      "reversed RANGE suffix frame diverged from the stock evaluation")
  }

  test("does not fire: double SUM (order-sensitive accumulation)") {
    df.withColumn("d", col("v").cast("double"))
      .createOrReplaceTempView("rsf_d")
    val q = spark.sql(
      """SELECT k, sum(d) OVER (PARTITION BY st ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS s
         FROM rsf_d""")
    val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("unboundedfollowing$()"),
      s"double sum must keep its suffix frame:\n$opt")
  }

  test("does not fire: collect_list (order-sensitive output)") {
    df.createOrReplaceTempView("rsf_t")
    val q = spark.sql(
      """SELECT k, collect_list(v) OVER (PARTITION BY st ORDER BY k
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS l
         FROM rsf_t""")
    val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("unboundedfollowing$()"),
      s"collect_list must keep its suffix frame:\n$opt")
  }

  // --- round-19 hardening (ADVICE r18) --------------------------------

  test("TIED ROWS keys: reversal still matches stock exactly when every " +
    "legal enumeration agrees (values constant within tie groups)") {
    // k % 5 ties ~3,000 rows per (st, key) group; v is a function of the
    // tie key, so EVERY legal enumeration yields the same min/max/count —
    // stock and rewritten must agree bit for bit. (The round-18 rule
    // reversed the raw sort and could mix two tie enumerations across
    // split legs; the rn-pinned rewrite cannot.)
    Registry.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select((col("o_orderkey") % 5).cast("long").as("k"),
        col("o_orderstatus").as("st"),
        ((col("o_orderkey") % 5) * 11).cast("long").as("v"),
        col("o_orderkey").as("orig"))
      .createOrReplaceTempView("rsf_ties")
    val sql =
      """SELECT orig,
           min(v)   OVER (PARTITION BY st ORDER BY k ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mn,
           count(v) OVER (PARTITION BY st ORDER BY k ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS c,
           max(v)   OVER (PARTITION BY st ORDER BY k ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS sib
         FROM rsf_ties ORDER BY orig, mn, c, sib"""
    val fired = spark.sql(sql)
    val opt = fired.queryExecution.optimizedPlan.toString
    assert(!opt.contains("unboundedfollowing$()"),
      s"suffix frame survived on tied keys:\n$opt")
    assert(opt.contains("__rev_rn"),
      s"expected the pinned row_number enumeration:\n$opt")
    val bare = spark.newSession()
    bare.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select((col("o_orderkey") % 5).cast("long").as("k"),
        col("o_orderstatus").as("st"),
        ((col("o_orderkey") % 5) * 11).cast("long").as("v"),
        col("o_orderkey").as("orig"))
      .createOrReplaceTempView("rsf_ties")
    val plain = bare.sql(sql).collect()
    assert(fired.collect().sameElements(plain),
      "tied-key reversal diverged from the stock evaluation")
  }

  test("does not fire: a positional sibling that cannot share the pinned " +
    "enumeration (row_number) refuses the WHOLE node") {
    df.createOrReplaceTempView("rsf_t")
    val q = spark.sql(
      """SELECT k,
           min(v) OVER (PARTITION BY st ORDER BY k ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mn,
           row_number() OVER (PARTITION BY st ORDER BY k) AS rn
         FROM rsf_t""")
    val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("unboundedfollowing$()"),
      s"node with a row_number sibling must stay stock:\n$opt")
  }

  test("does not fire: MinValue FOLLOWING bound (negation cannot " +
    "round-trip)") {
    df.createOrReplaceTempView("rsf_t")
    val q = spark.sql(
      s"""SELECT k, min(v) OVER (PARTITION BY st ORDER BY k
           ROWS BETWEEN ${Int.MinValue} FOLLOWING AND UNBOUNDED FOLLOWING)
           AS mn
         FROM rsf_t""")
    val opt = q.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("unboundedfollowing$()"),
      s"MinValue bound must refuse the rewrite:\n$opt")
  }
}
