package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture style operators for incremental pipelines: a
  * training corpus is rarely rebuilt from scratch — it is a base snapshot
  * plus a stream of upserted/deleted records, folded into a new snapshot.
  *
  * The reference engine is batch-only (vinum/README.rst:246 lists
  * incremental execution as future work); this is the Spark-first
  * extension of its MaterializeTable surface to evolving tables.
  *
  * Scale shape: one shuffle on the upsert key (window over key, ordered
  * by version) — the same cost as any keyed aggregation, no driver-side
  * state, no broadcast of the delta (deltas can be arbitrarily large).
  */
object Cdc {

  /** Latest-wins upsert: fold `updates` into `base`, keeping for every
    * key exactly one row — the one with the highest `versionCol` (ties
    * broken toward `updates`, which is tagged with the higher change
    * priority). Columns are aligned by name; both frames must carry the
    * key, version, and payload columns.
    *
    * Equivalent to MERGE ... WHEN MATCHED UPDATE / WHEN NOT MATCHED
    * INSERT with deterministic last-writer-wins semantics.
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
             versionCol: String): DataFrame =
    fold(base, updates, keyCols, versionCol, evolve = false)

  /** [[upsert]] with schema evolution: `updates` may carry columns
    * `base` lacks (and vice versa) — alignment is by NAME with the
    * missing side null-filled, the MERGE-with-automatic-schema-evolution
    * behavior of lakehouse table formats. Existing rows surface the new
    * columns as null until an update touches them. Same single-shuffle
    * cost; the payload tiebreak hashes the UNION schema, so it stays
    * deterministic whichever side a column came from.
    */
  def upsertEvolved(base: DataFrame, updates: DataFrame,
                    keyCols: Seq[String], versionCol: String): DataFrame =
    fold(base, updates, keyCols, versionCol, evolve = true)

  private def fold(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
                   versionCol: String, evolve: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val tagged = base.withColumn("__chg", lit(0))
      .unionByName(updates.withColumn("__chg", lit(1)),
        allowMissingColumns = evolve)
    // final payload-hash tiebreak: if one side carries two rows with the
    // same (key, version), the winner must not depend on partition order —
    // without it the sort below is tied and "last writer" is whichever
    // row the shuffle happened to deliver first
    val payloadTiebreak =
      xxhash64(tagged.columns.filter(_ != "__chg").map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__chg").desc, payloadTiebreak)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__chg")
  }

  /** Upsert with tombstones: rows of `updates` whose `deletedCol` is true
    * delete the key from the result after version resolution (a newer
    * insert resurrects it, an older one does not).
    */
  def upsertWithDeletes(base: DataFrame, updates: DataFrame,
                        keyCols: Seq[String], versionCol: String,
                        deletedCol: String): DataFrame =
    upsert(base.withColumn(deletedCol, lit(false)), updates, keyCols,
      versionCol)
      .filter(!col(deletedCol))
      .drop(deletedCol)

  /** SCD-type-2 history: keep EVERY version of every key and attach the
    * validity upper bound — `effToCol` = the next version's `versionCol`
    * value, or `openEnd` for the current row. One keyed window (lead),
    * one shuffle; the inverse of [[upsert]]'s collapse-to-latest.
    */
  def scd2(history: DataFrame, keyCols: Seq[String], versionCol: String,
           effToCol: String = "eff_to", openEnd: Long = Long.MaxValue): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    // payload-hash tiebreak: lead() over a tied sort is partition-order
    // nondeterministic when history holds duplicate (key, version) rows
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol), xxhash64(history.columns.map(col): _*))
    history.withColumn(effToCol,
      coalesce(lead(col(versionCol), 1).over(w), lit(openEnd)))
  }

  /** Point-in-time view over an [[scd2]] history: the rows effective AT
    * version/time `at` — `version <= at < eff_to`. This is the "AS OF"
    * time-travel read a warehouse runs against an interval-encoded
    * dimension; a partition-pruned filter, no join and no shuffle.
    */
  def asOf(history: DataFrame, versionCol: String, at: Long,
           effToCol: String = "eff_to"): DataFrame =
    history.filter(col(versionCol) <= at && col(effToCol) > at)

  /** BITEMPORAL point-in-time (u08): rows are STATEMENTS "key has this
    * payload, business-valid [validFrom, validTo)", recorded at
    * transaction version `txCol`; a later transaction about the same
    * (key, validFrom) SUPERSEDES earlier ones (a correction). The query
    * answers the two-axis question [[asOf]] cannot: as we BELIEVED at
    * `txAt`, what was true at business time `validAt`?
    *
    *  1. believed statements = per (key, validFrom), the max-`txCol`
    *     row among tx ≤ txAt;
    *  2. effective row = per key, the max-`validFrom` believed
    *     statement whose interval covers validAt.
    *
    * Both steps are ONE `max(struct)` argmax aggregation (the
    * nearestJoin idiom) — no window over history volume, shuffle keyed
    * on (key, validFrom) then key. Contract: at most one statement per
    * (key, validFrom, tx) — the struct tie-break would otherwise pick
    * by payload order. Output: keyCols, validFrom, validTo, tx,
    * payload columns (original names).
    */
  def bitemporalAsOf(history: DataFrame, keyCols: Seq[String],
                     validFromCol: String, validToCol: String,
                     txCol: String, txAt: Long, validAt: Long): DataFrame = {
    val payload = history.columns.filterNot(c => keyCols.contains(c) ||
      c == validFromCol || c == validToCol || c == txCol).toSeq
    val carry = Seq(txCol, validToCol) ++ payload
    // getField, not col("__b.name"): a dotted payload name must resolve
    // as ONE field, never a nested path (the SUMMARIZE lesson)
    val believed = history.filter(col(txCol) <= txAt)
      .groupBy((keyCols :+ validFromCol).map(col): _*)
      .agg(max(struct(carry.map(col): _*)).as("__b"))
      .select((keyCols :+ validFromCol).map(col) ++
        carry.map(f => col("__b").getField(f).as(f)): _*)
    val effCarry = Seq(validFromCol, validToCol, txCol) ++ payload
    believed
      .filter(col(validFromCol) <= validAt && col(validToCol) > validAt)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(effCarry.map(col): _*)).as("__e"))
      .select(keyCols.map(col) ++
        effCarry.map(f => col("__e").getField(f).as(f)): _*)
  }

  /** Incremental aggregate maintenance — keep a (count, sum) rollup in
    * sync with a last-writer-wins delta WITHOUT rescanning the base
    * table: the materialized-view fold every warehouse does nightly,
    * done as algebra. For each delta key the winning row (vs the base
    * row, version tiebreak toward the delta like [[upsert]]) contributes
    * (+1, +value) to its group and, when it REPLACES a base row, that
    * row contributes (−1, −value) to its OLD group; the adjustments
    * collapse to one tiny per-group frame folded into `oldAgg`.
    *
    * Contracts: `oldAgg` has columns (`groupCol`, n, sv) — exactly what
    * this function returns, so folds chain; `valueCol` should be an
    * exact type (long cents, not double) or the incremental sum will
    * drift from a recompute by float merge order; base must hold at most
    * one row per key (it is a snapshot). Groups whose count reaches 0
    * drop.
    *
    * Scale shape: one delta-sized window, one key-equi-join of the delta
    * against base (bucket base by key — Skew.writeBucketed — and the
    * probe never reshuffles the snapshot), one aggregation of
    * delta-sized adjustments, one join with the #groups-sized rollup.
    * Work tracks |delta|, never |base| — the entire point.
    */
  def maintainCountSum(base: DataFrame, delta: DataFrame,
                       keyCols: Seq[String], versionCol: String,
                       groupCol: String, valueCol: String,
                       oldAgg: DataFrame): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc,
        xxhash64(delta.columns.map(col): _*))
    val dLatest = delta.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val b = base.select(
      keyCols.map(col) ++ Seq(col(versionCol).as("__bver"),
        col(groupCol).as("__bg"), col(valueCol).as("__bv")): _*)
    // delta wins on version ties (the upsert __chg convention)
    val j = dLatest.join(b, keyCols, "left")
      .filter(col("__bver").isNull || col(versionCol) >= col("__bver"))
    val adj = j.select(col(groupCol).as("__g"), lit(1L).as("__dn"),
        col(valueCol).cast("long").as("__dv"))
      .unionByName(j.filter(col("__bver").isNotNull)
        .select(col("__bg").as("__g"), lit(-1L).as("__dn"),
          (-col("__bv")).cast("long").as("__dv")))
      .groupBy(col("__g"))
      .agg(sum(col("__dn")).as("__dn"), sum(col("__dv")).as("__dv"))
    oldAgg.join(adj, oldAgg(groupCol) === adj("__g"), "full")
      .select(coalesce(col(groupCol), col("__g")).as(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("sv"), lit(0L)) + coalesce(col("__dv"), lit(0L))).as("sv"))
      .filter(col("n") > 0)
  }

  /** Snapshot diff — the changelog BETWEEN two keyed snapshots: for
    * every key, `insert` (only in `after`), `delete` (only in
    * `before`), or `update` (in both with any `compareCols` value
    * differing, null-safe). Keys whose compared payload is unchanged
    * are absent from the output — the output size tracks the CHANGE
    * volume, which is what makes diff-then-apply cheaper than rebuild.
    *
    * Inverse-ish of [[upsertWithDeletes]]: applying the returned ops to
    * `before` reproduces `after` (over the compared columns).
    *
    * Scale shape: one full-outer equi-join on the key (both sides
    * shuffle once on the key; AQE picks broadcast when a side is small)
    * and a map-side struct comparison — no window, no collect. Both
    * snapshots must be keyed (at most one row per key), the usual
    * snapshot contract.
    */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compared column")
    val b = before.select(
      (keyCols.map(col) :+ struct(compareCols.map(col): _*).as("__b")): _*)
    val a = after.select(
      (keyCols.map(col) :+ struct(compareCols.map(col): _*).as("__a")): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn("op",
        when(col("__b").isNull, lit("insert"))
          .when(col("__a").isNull, lit("delete"))
          .when(!(col("__b") <=> col("__a")), lit("update")))
      .filter(col("op").isNotNull)
      .select((keyCols.map(col) :+ col("op")) ++
        compareCols.map(c => col("__a").getField(c).as(c)): _*)
  }
}
