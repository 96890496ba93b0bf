package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Column-level data profiling — the corpus QA pass run before and after
  * every curation stage (did dedup drop nulls? did a join explode
  * cardinality?).
  *
  * One aggregation job over the data produces every metric (Spark plans
  * the multi-column exact distinct via one Expand — rows×columns
  * map-side, still a single pass and one shuffle); the single result row
  * is then unpivoted driver-free into one row per column. Output:
  * (column STRING, n BIGINT, n_null BIGINT, n_distinct BIGINT).
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n"),
        col(s"__nn_$c").cast("long").as("n_null"),
        col(s"__nd_$c").as("n_distinct")))
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.column"), col("p.n"), col("p.n_null"), col("p.n_distinct"))
  }
}
