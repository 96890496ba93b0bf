package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Committed pins for the CORPUS assumptions the operators' documented
  * equivalences rely on. Each of these was previously a probe result
  * quoted in a comment; as a spec, a driver-side testdata regeneration
  * that breaks an assumption fails the build instead of silently turning
  * a documented equivalence into a wrong answer.
  */
class CorpusAssumptionSpec extends GraftSuite {

  private val sfs = Seq("sf0.001", "sf0.01", "sf0.1")

  test("no user has consecutive events EXACTLY one session gap apart (any shipped SF)") {
    // Events.streamingSessionWindows (native session_window) merges
    // strictly — an event exactly `gap` after the previous one starts a
    // NEW session — while the batch sessionizer's `diff > gap` keeps it.
    // The two agree exactly when no exact-gap adjacent pair exists;
    // streaming/Events.scala documents that the corpus satisfies this,
    // and st15's batch oracle depends on it. Gap = 30 minutes.
    val gapMicros = 30L * graft.streaming.Events.MicrosPerMinute
    for (sf <- sfs) {
      val ev = graft.streaming.Events.readRaw(spark, s"/root/testdata/$sf")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val exactGaps = ev
        .select(col("user_id"), col("ts"),
          (col("ts") - lag(col("ts"), 1).over(w)).as("diff"))
        .filter(col("diff") === gapMicros)
        .count()
      assert(exactGaps == 0L,
        s"$sf: $exactGaps adjacent event pairs exactly $gapMicros micros " +
          "apart — session_window and the batch sessionizer now DISAGREE; " +
          "regenerate the corpus or change the documented gap")
    }
  }

  test("right-side (user_id, ts) pairs are unique per SF (ASOF tie determinism)") {
    // a01/a02/a04 document that right-side times are unique per user, so
    // both engines pick identical as-of candidates without a declared
    // tie-break. Pin it everywhere the queries can run.
    for (sf <- sfs) {
      val dups = graft.streaming.Events.readRaw(spark, s"/root/testdata/$sf")
        .groupBy(col("user_id"), col("ts")).count()
        .filter(col("count") > 1).count()
      assert(dups == 0L,
        s"$sf: $dups duplicate (user_id, ts) pairs — ASOF tie-break is " +
          "now engine-dependent; the a-family oracles are no longer exact")
    }
  }
}
