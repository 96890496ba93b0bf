package graft.ops

import org.apache.spark.sql.DataFrame

/** Bounded-lineage iteration — the engine's substitute for a recursive
  * CTE (the graph family gr01–gr04 and the connected-components pass in
  * [[Clustering]] are all fixed-point loops).
  *
  * Why a combinator: a naive `for` loop over DataFrames grows the
  * logical plan by one join+agg layer per round. At 3 rounds that is
  * noise; at 20 rounds on a 1000-executor cluster the plan is thousands
  * of nodes deep — analysis/optimization time explodes and the lineage
  * chain means one lost executor recomputes EVERY prior round. The loop
  * here truncates lineage every `checkpointEvery` rounds with an eager
  * `localCheckpoint`, so plan size and recovery cost stay O(one round),
  * independent of the iteration count.
  *
  * `localCheckpoint` (executor block storage) is deliberate: it skips
  * the distributed-filesystem round-trip of a reliable checkpoint and
  * is the standard choice for iterative analytics where a lost block
  * just means re-running the job. Pass `reliable = true` (requires
  * `spark.sparkContext.setCheckpointDir`) when a 100 TB run must
  * survive executor loss mid-iteration.
  */
object Iterate {

  /** Run `step` for rounds 1..n, truncating lineage every
    * `checkpointEvery` rounds (and after the final round, so downstream
    * consumers start from materialized state, not the loop's plan).
    * `step` receives the current frame and the 1-based round index.
    */
  def loop(init: DataFrame, n: Int, checkpointEvery: Int = 1,
           reliable: Boolean = false)
          (step: (DataFrame, Int) => DataFrame): DataFrame = {
    require(n >= 0, s"iteration count must be >= 0, got $n")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    var cur = init
    var i = 1
    var dirty = false // changed since the last cut
    while (i <= n) {
      val next = step(cur, i)
      // identity return = the step declared a fixed point (a drained
      // trainer, a converged relaxation): nothing new to cut —
      // re-checkpointing the unchanged frame would rewrite its blocks
      // once per remaining round for no state change (review-caught)
      if (next ne cur) {
        cur = next
        dirty = true
      }
      // the boundary check sits OUTSIDE the changed branch: uncut
      // progress cuts on every cadence round, whether or not THIS round
      // changed the frame — else alternating changed/identity rounds
      // that never land on a boundary defer every cut to the trailing
      // one and lineage grows O(n) despite checkpointEvery (advice r16)
      if (dirty && (i % checkpointEvery == 0 || i == n)) {
        cur = cut(cur, reliable); dirty = false
      }
      i += 1
    }
    // the consumers-start-materialized contract survives identity tails
    // under checkpointEvery > 1
    if (dirty) cur = cut(cur, reliable)
    cur
  }

  /** Fixed-point variant: run `step` until `done(prev, next)` or
    * `maxIter` rounds. The predicate typically counts changed rows —
    * one small job per round, the price of data-dependent termination
    * (a known-round algorithm should use [[loop]] and skip it).
    */
  def loopUntil(init: DataFrame, maxIter: Int, checkpointEvery: Int = 1,
                reliable: Boolean = false)
               (step: (DataFrame, Int) => DataFrame)
               (done: (DataFrame, DataFrame) => Boolean): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    var cur = cut(init, reliable) // `done` may scan prev: materialize once
    var i = 1
    var stop = false
    while (i <= maxIter && !stop) {
      // honor the cadence: between cuts the frame stays lazy, so `done`'s
      // scans re-run at most checkpointEvery-1 rounds of lineage
      val stepped = step(cur, i)
      val next =
        if (i % checkpointEvery == 0) cut(stepped, reliable) else stepped
      stop = done(cur, next)
      cur = next
      i += 1
    }
    cur
  }

  private def cut(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
