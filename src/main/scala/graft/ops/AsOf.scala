package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single right row
  * with the greatest `rightTime` ≤ / < `leftTime` within the same key —
  * the standard operator for "state as of event time" feature joins.
  *
  * Spark-first formulation: no range join, no per-key collect. Both sides
  * are tagged and unioned, then ONE hash shuffle on the key sorts each
  * key's timeline, and `last(value, ignoreNulls)` over the ordered window
  * carries the latest right-side payload forward onto left rows. Cost:
  * one shuffle of (key, time, payload), O(n log n) per partition — the
  * same shape Flink/kdb temporal joins use, and exactly as scalable as a
  * windowed aggregation (AQE handles skewed keys).
  *
  * Strictness: `strict = true` matches right rows with time strictly less
  * than the left row's (same-instant right rows are not visible).
  * Ties among right rows at the same time break by `rightIdCol` (larger
  * id wins — "latest write") for deterministic output.
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String],
      rightIdCol: String,
      strict: Boolean = true): DataFrame = {

    val leftCols = left.columns.toSeq
    val vPrefixed = valueCols.map(v => s"asof_$v")

    // align both sides on one schema: left payload + nullable right payload
    val lTagged = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
      .withColumn("__rid", lit(null).cast("long"))
      .select(
        (Seq(col(keyCol).as("__k"), col("__t"), col("__side"), col("__rid")) ++
          leftCols.map(c => col(c)) ++
          valueCols.map(v => lit(null).cast(right.schema(v).dataType).as(s"__v_$v"))): _*)
    val rTagged = right
      .withColumn("__t", col(rightTimeCol))
      .withColumn("__side", lit(0))
      .withColumn("__rid", col(rightIdCol).cast("long"))
      .select(
        (Seq(col(keyCol).as("__k"), col("__t"), col("__side"), col("__rid")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          valueCols.map(v => col(v).as(s"__v_$v"))): _*)

    // strict: left sorts BEFORE same-time right rows (side desc), so the
    // running last() cannot see a same-instant right row; non-strict: the
    // right row sorts first and is visible.
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, sideOrder, col("__rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .select(
        (Seq(col("__side")) ++
          leftCols.map(col) ++
          valueCols.map(v => last(col(s"__v_$v"), ignoreNulls = true).over(w)
            .as(s"asof_$v"))): _*)

    carried.filter(col("__side") === 1)
      .select((leftCols ++ vPrefixed).map(col): _*)
  }
}
