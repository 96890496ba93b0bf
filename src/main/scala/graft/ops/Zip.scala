package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Position-based zip join (j12 — DuckDB's POSITIONAL JOIN): pair the
  * i-th row of the left frame with the i-th row of the right, padding
  * the shorter side with NULLs. The relational model has no row order,
  * so the operator's contract is explicit: each input contributes ITS
  * OWN row order — callers pass ordered frames (an `ORDER BY`ed frame's
  * order survives into the zip because the RDD boundary below executes
  * that plan with the sort at its root, where a same-plan join would
  * let the optimizer drop a subquery sort).
  *
  * Scale shape: positional semantics make the GLOBAL ORDER the join
  * key, and `zipWithIndex` is the only distributed way to obtain it —
  * one count-per-partition job per side (offsets assembled driver-side
  * from the per-partition counts, never the rows), then ONE equi-join
  * on the position and a positional sort of the output. This is one of
  * the few genuinely imperative per-partition jobs (the documented RDD
  * escape hatch); everything around it stays declarative.
  */
object Zip {

  def positionalJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val clash = left.columns.map(_.toLowerCase).toSet
      .intersect(right.columns.map(_.toLowerCase).toSet)
    require(clash.isEmpty,
      s"positional join sides share column names ${clash.mkString(", ")} " +
        "— alias or rename one side first")
    val spark = left.sparkSession
    def indexed(df: DataFrame): DataFrame = {
      val schema = StructType(
        StructField("__pos", LongType, nullable = false) +: df.schema.fields)
      val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(i +: r.toSeq)
      }
      spark.createDataFrame(rdd, schema)
    }
    indexed(left).join(indexed(right), Seq("__pos"), "full_outer")
      .orderBy(col("__pos"))
      .drop("__pos")
  }
}
