package graft

import org.apache.spark.sql.functions._

/** [[graft.ops.Iterate]] — the bounded-lineage loop under gr01/gr02/gr04.
  * The lineage pin is the point: plan size after the loop must be
  * INDEPENDENT of the iteration count (every round ends in a
  * checkpoint-cut scan at the configured cadence), otherwise a 20-round
  * fixed point at cluster scale pays O(rounds) analysis time and
  * O(rounds) recomputation per lost executor.
  */
class IterateSpec extends GraftSuite {

  import graft.ops.Iterate

  private def base = {
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("x")
  }

  test("loop applies step n times with 1-based round index") {
    val out = Iterate.loop(base, 5) { (df, i) =>
      df.withColumn("x", col("x") * 2).withColumn("last_round", lit(i))
    }
    val rows = out.orderBy("x").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(32L, 64L, 96L))
    assert(rows.forall(_.getInt(1) == 5))
    assert(Iterate.loop(base, 0)((df, _) => df.limit(0)).count() == 3)
  }

  test("lineage depth is independent of the iteration count") {
    def planNodes(n: Int): Int = {
      val out = Iterate.loop(base, n, checkpointEvery = 2) { (df, _) =>
        // a join + aggregate per round — the gr-family round shape
        df.groupBy((col("x") % 2).as("k")).agg(sum(col("x")).as("x"))
          .select(col("x"))
      }
      out.queryExecution.optimizedPlan.collect { case p => p }.size
    }
    val n3 = planNodes(3)
    val n9 = planNodes(9)
    assert(n3 == n9,
      s"plan grew with iteration count: n=3 -> $n3 nodes, n=9 -> $n9")
    assert(n9 <= 3, s"expected a checkpoint-cut scan, got $n9 nodes")
  }

  test("cadence cuts fire on boundary rounds even when THAT round " +
    "returned identity (advice r16: alternating changed/identity rounds)") {
    // change on odd rounds only; boundaries (every 2nd round) always
    // land on identity rounds — pre-fix, every cut was deferred to the
    // single trailing one, so the INTERMEDIATE plan the step received
    // grew one layer per change round despite checkpointEvery = 2
    def maxMidLoopNodes(n: Int): Int = {
      var worst = 0
      Iterate.loop(base, n, checkpointEvery = 2) { (df, i) =>
        worst = math.max(worst,
          df.queryExecution.optimizedPlan.collect { case p => p }.size)
        if (i % 2 == 1)
          df.groupBy((col("x") % 2).as("k")).agg(sum(col("x")).as("x"))
            .select(col("x"))
        else df // identity — declared fixed point this round
      }
      worst
    }
    val n4 = maxMidLoopNodes(4)
    val n12 = maxMidLoopNodes(12)
    assert(n4 == n12,
      s"mid-loop plan grew with iteration count: n=4 -> $n4, n=12 -> $n12")
    assert(n12 <= 4, s"expected cadence-bounded plans, got $n12 nodes")
    // an all-identity loop still returns the (already materialized) init
    assert(Iterate.loop(base, 5, checkpointEvery = 2)((df, _) => df)
      .count() == 3)
  }

  test("loopUntil stops at the fixed point, not maxIter") {
    var rounds = 0
    // clamping step: x -> min(x+1, 5); fixed point after a few rounds
    val out = Iterate.loopUntil(base, maxIter = 50) { (df, _) =>
      rounds += 1
      df.select(least(col("x") + 1, lit(5L)).as("x"))
    } { (prev, next) =>
      next.except(prev).isEmpty && prev.except(next).isEmpty
    }
    assert(out.orderBy("x").collect().map(_.getLong(0)).toSeq ==
      Seq(5L, 5L, 5L))
    assert(rounds < 10, s"did not converge early: $rounds rounds")
  }

  test("Bellman-Ford relaxation (the gr06 shape) prefers a cheap multi-hop path") {
    import spark.implicits._
    // 0 -> 3 directly costs 10; 0 -> 1 -> 2 -> 3 costs 3. BFS would pick
    // the 1-hop path; weighted relaxation must find cost 3 once enough
    // rounds run, and the intermediate 2-round state must hold the
    // <=2-edge optimum (10) — the hop-bounded semantics the gr06 oracle
    // encodes.
    val edges = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val dist0 = Seq((0L, 0L)).toDF("id", "dist")
    def run(rounds: Int) = Iterate.loop(dist0, rounds) { (d, _) =>
      val relax = edges.join(d, col("src") === col("id"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      d.unionByName(relax).groupBy("id").agg(min("dist").as("dist"))
    }.as[(Long, Long)].collect().toMap
    assert(run(2)(3L) === 10L, "2 rounds = best path with <=2 edges")
    assert(run(3)(3L) === 3L, "3 rounds finds the cheap 3-edge path")
  }

  test("Table.iterate facade delegates to the combinator") {
    val t = graft.api.Table(base)
      .iterate(3) { (t, _) => graft.api.Table(t.df.withColumn("x", col("x") + 10)) }
    assert(t.df.orderBy("x").collect().map(_.getLong(0)).toSeq ==
      Seq(31L, 32L, 33L))
  }
}
