package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single closest
  * right row within the same key — backward (greatest rightTime ≤ / <
  * leftTime, the "state as of event time" feature join) or forward
  * (smallest rightTime ≥ / > leftTime), optionally bounded by a match
  * tolerance (pandas merge_asof semantics: matches farther than the
  * tolerance become nulls).
  *
  * Spark-first formulation: no range join, no per-key collect. Both sides
  * are tagged and unioned, then ONE hash shuffle on the key sorts each
  * key's timeline (descending for forward joins), and
  * `last(value, ignoreNulls)` over the ordered window carries the
  * nearest right-side payload onto left rows. Cost: one shuffle of
  * (key, time, payload), O(n log n) per partition — the same shape
  * Flink/kdb temporal joins use, and exactly as scalable as a windowed
  * aggregation (AQE handles skewed keys).
  *
  * Strictness: `strict = true` hides same-instant right rows. Ties among
  * right rows at the same time break by `rightIdCol` (larger id wins —
  * "latest write") for deterministic output in both directions.
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
      strict: Boolean = true,
      direction: String = "backward",
      tolerance: Option[Column] = None,
      keepMatchedTime: Boolean = false): DataFrame = {

    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val forward = direction == "forward"

    val leftCols = left.columns.toSeq
    val vPrefixed = valueCols.map(v => s"asof_$v")

    // the right payload travels as ONE struct (all value columns + the
    // matched time), so a single last(ignoreNulls) carries the nearest
    // right ROW wholesale — per-column last() would let a null in one
    // right column fall through to an OLDER right row and emit a match
    // mixing columns from different rows. The struct is null exactly on
    // left-tagged rows (and never on right rows, whatever their fields),
    // so ignoreNulls skips left rows only.
    val rPayload = struct(
      (valueCols.map(v => col(v).as(s"v_$v")) :+
        col(rightTimeCol).as("__mt")): _*)
    val payloadType = right.select(rPayload.as("p")).schema("p").dataType

    // align both sides on one schema: left payload + nullable right payload
    val lTagged = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
      .withColumn("__rid", lit(null).cast("long"))
      .select(
        (Seq(col(keyCol).as("__k"), col("__t"), col("__side"), col("__rid")) ++
          leftCols.map(c => col(c)) :+
          lit(null).cast(payloadType).as("__p")): _*)
    val rTagged = right
      // a null right TIME can satisfy no inequality (SQL comparison with
      // NULL is never true) and would otherwise sort to the timeline's
      // edge and shadow real matches — drop such rows up front
      .filter(col(rightTimeCol).isNotNull)
      .withColumn("__t", col(rightTimeCol))
      .withColumn("__side", lit(0))
      .withColumn("__rid", col(rightIdCol).cast("long"))
      .select(
        (Seq(col(keyCol).as("__k"), col("__t"), col("__side"), col("__rid")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          rPayload.as("__p")): _*)

    // strict: left sorts BEFORE same-time right rows (side desc), so the
    // running last() cannot see a same-instant right row; non-strict: the
    // right row sorts first and is visible. Forward joins walk the
    // timeline in reverse — same trick, descending time.
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy("__k")
      .orderBy(timeOrder, sideOrder, col("__rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .select(
        (Seq(col("__side"), col("__t").as("__lt")) ++
          leftCols.map(col) :+
          last(col("__p"), ignoreNulls = true).over(w).as("__p")): _*)

    val onlyLeft = carried.filter(col("__side") === 1)
      // a null LEFT time likewise compares false against every right
      // time — such rows are unmatched by definition (DuckDB agrees)
      .withColumn("__p", when(col("__lt").isNotNull, col("__p")))
      .select(
        (leftCols.map(col) ++
          valueCols.map(v => col("__p").getField(s"v_$v").as(s"asof_$v")) :+
          col("__p").getField("__mt").as("asof___mt")): _*)
    val result = tolerance match {
      case None => onlyLeft
      case Some(tol) =>
        // distance from the left time to the matched right time; matches
        // beyond the tolerance are nulled, not dropped (merge_asof)
        val dist =
          if (forward) col("asof___mt") - col(leftTimeCol)
          else col(leftTimeCol) - col("asof___mt")
        val within = col("asof___mt").isNotNull && dist <= tol
        valueCols.foldLeft(onlyLeft) { (df, v) =>
          df.withColumn(s"asof_$v", when(within, col(s"asof_$v")))
        }
    }
    // asof_t (keepMatchedTime) is the RAW nearest candidate's time,
    // deliberately untouched by the tolerance nulling — nearestJoin
    // applies its own tolerance at choose time and needs the raw value
    val withT =
      if (keepMatchedTime) result.withColumnRenamed("asof___mt", "asof_t")
      else result
    val outCols = leftCols ++ vPrefixed ++
      (if (keepMatchedTime) Seq("asof_t") else Nil)
    withT.select(outCols.map(col): _*)
  }

  /** Nearest-direction as-of join (pandas merge_asof
    * direction='nearest'): for every left row the closest right row in
    * EITHER direction, ties to the backward (earlier) match, optionally
    * bounded by a tolerance on |Δt|. Composed as the backward pass
    * feeding the forward pass — the backward payload rides through the
    * second union as ordinary left columns — so the total cost is two
    * keyed window shuffles, still no range join and no per-key collect.
    */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String],
      rightIdCol: String,
      strict: Boolean = true,
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = valueCols :+ "t"
    val b0 = join(left, right, keyCol, leftTimeCol, rightTimeCol,
      valueCols, rightIdCol, strict, "backward", None, keepMatchedTime = true)
    val b = carried.foldLeft(b0)((df, v) =>
      df.withColumnRenamed(s"asof_$v", s"__b_$v"))
    val f0 = join(b, right, keyCol, leftTimeCol, rightTimeCol,
      valueCols, rightIdCol, strict, "forward", None, keepMatchedTime = true)
    val f = carried.foldLeft(f0)((df, v) =>
      df.withColumnRenamed(s"asof_$v", s"__f_$v"))
    val db = col(leftTimeCol) - col("__b_t")
    val dfw = col("__f_t") - col(leftTimeCol)
    val bOk = tolerance match {
      case Some(tol) => col("__b_t").isNotNull && db <= tol
      case None      => col("__b_t").isNotNull
    }
    val fOk = tolerance match {
      case Some(tol) => col("__f_t").isNotNull && dfw <= tol
      case None      => col("__f_t").isNotNull
    }
    val pickB = bOk && (!fOk || db <= dfw)
    val out = valueCols.foldLeft(f)((df, v) =>
      df.withColumn(s"asof_$v",
        when(pickB, col(s"__b_$v")).when(fOk, col(s"__f_$v"))))
    out.select((leftCols ++ valueCols.map(v => s"asof_$v")).map(col): _*)
  }
}
