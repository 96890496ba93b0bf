package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: downsample an event stream to fixed-width
  * bins per key, emit a dense bin grid (gaps included) and forward-fill
  * carried values — the feature-pipeline primitive behind "activity per
  * user per 15 minutes, holes filled with the last observation".
  *
  * Scale shape: one keyed aggregation to bins, one tiny per-key bounds
  * aggregation, grid expansion via `sequence`/`explode` (rows ∝ key
  * count × span/width — bounded by the OBSERVED span per key, never a
  * global calendar), a left join back on (key, bin) and one keyed
  * window for the fill. No driver materialization anywhere. Hot keys
  * with years of span would make one task's grid large; cap spans
  * upstream or widen the bin for such keys.
  */
object Resample {

  /** Dense per-key bin grid over `tsCol` (an epoch LONG — any fixed
    * unit; the events corpus uses canonical micros from
    * [[graft.streaming.Events.readRaw]]) with `binWidth`-wide bins (same
    * unit as `tsCol`): per bin the event count, the summed cents, and
    * the forward-filled cents (last non-empty bin's sum carried across
    * gaps).
    */
  def binFill(df: DataFrame, keyCol: String, tsCol: String,
              centsCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and epoch
    // longs can exceed a double's 2^53 exact-integer range (nanos do).
    val binned = df
      .select(col(keyCol),
        expr(s"cast(`$tsCol` as bigint) div ${binWidth}L").as("bin"),
        col(centsCol).cast("long").as("__c"))
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("__cents"))
    val bounds = binned.groupBy(col(keyCol))
      .agg(min(col("bin")).as("__lo"), max(col("bin")).as("__hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as("bin"))
    val joined = grid.join(binned, Seq(keyCol, "bin"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bin"))
    joined.select(col(keyCol), col("bin"),
      coalesce(col("n"), lit(0L)).as("n"),
      last(col("__cents"), ignoreNulls = true).over(w).as("cents_ff"))
  }
}
