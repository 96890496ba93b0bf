package graft

import org.apache.spark.sql.functions._

import graft.api.Table
import graft.ops.Skew

/** Scale tooling behavior: salted joins preserve semantics; bucketed
  * tables join without a shuffle. Plus the reference's error-case
  * patterns (unknown column/function, group-by violations —
  * reference test_query_results.py:1500-1566).
  */
class ScaleToolsSpec extends GraftSuite {
  import spark.implicits._

  test("saltedJoin equals the plain join result") {
    val big = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val small = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"))
    val plain = big.join(small, "k")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == plain)
  }

  test("bucketed tables sort-merge join without a shuffle exchange") {
    // disable auto-broadcast so the assertion is about bucketing, not a
    // broadcast join that trivially has no hash exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val or = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      Skew.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
      Skew.writeBucketed(or.withColumnRenamed("o_orderkey", "l_orderkey"),
        "or_bucketed", "l_orderkey", 8)
      val joined = spark.table("li_bucketed")
        .join(spark.table("or_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
      // contrast: the same join over raw parquet does shuffle
      val raw = li.join(or.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF trainCentroids: sparse non-dense ids, bounded sample, deterministic") {
    val rnd = new scala.util.Random(11)
    // ids are sparse multiples of 7 plus an offset — the round-1 pmod
    // sampling would select almost none of these once n > maxSample
    val rows = (0 until 40).map(i =>
      (1000003L + i * 7L, Array.fill(8)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = graft.ops.Ivf.trainCentroids(df, "vec_id", "embedding",
      nlist = 4, maxSample = 8)
    assert(cents.length == 4 && cents.forall(_.length == 8))
    // deterministic: identical input -> identical centroids
    val again = graft.ops.Ivf.trainCentroids(df, "vec_id", "embedding",
      nlist = 4, maxSample = 8)
    assert(cents.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // corpus-fits-in-sample path: every row participates, same as round 1
    val full = graft.ops.Ivf.trainCentroids(df, "vec_id", "embedding",
      nlist = 4, maxSample = 100)
    assert(full.length == 4)
  }

  test("unknown column errors clearly (reference error-case parity)") {
    val t = Table(Seq((1L, 2.0)).toDF("id", "v"))
    val e = intercept[Exception](t.sql("select nope from t").toDF.collect())
    assert(e.getMessage.contains("nope"))
  }

  test("unknown function errors clearly") {
    val t = Table(Seq((1L, 2.0)).toDF("id", "v"))
    val e = intercept[Exception](t.sql("select not_a_fn(v) from t").toDF.collect())
    assert(e.getMessage.contains("not_a_fn"))
  }

  test("group-by violation errors (non-aggregated column in select)") {
    val t = Table(Seq((1L, 2.0)).toDF("id", "v"))
    val e = intercept[Exception](
      t.sql("select id, v from t group by id").toDF.collect())
    assert(e.getMessage.toLowerCase.contains("group"))
  }
}
