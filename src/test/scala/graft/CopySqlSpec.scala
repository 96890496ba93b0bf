package graft

import graft.api.Table
import org.apache.spark.sql.functions._

/** COPY … TO export statement form (io21, [[graft.sql.CopySql]]):
  * parquet round-trip fidelity, CSV divergence, extension defaults,
  * overwrite semantics, loud refusals.
  */
class CopySqlSpec extends GraftSuite {
  import spark.implicits._

  private def tmp(name: String): String =
    s"target/tmp/copyspec_${name}_${java.util.UUID.randomUUID.toString.take(8)}"

  test("parquet COPY round-trips values and types exactly") {
    Seq((1L, "a", 1.5), (2L, null.asInstanceOf[String], -0.0))
      .toDF("k", "s", "d").createOrReplaceTempView("copy_src")
    val p = tmp("pq")
    val back = Table.sessionSql(spark,
      s"COPY copy_src TO '$p' (FORMAT PARQUET)").toDF
    // names + types round-trip exactly (nullability widens on read —
    // parquet carries no required-ness for these writers)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      spark.table("copy_src").schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("k").collect().map(_.toSeq).toSeq ==
      spark.table("copy_src").orderBy("k").collect().map(_.toSeq).toSeq)
    // overwrite: a second COPY to the same path replaces, never appends
    val again = Table.sessionSql(spark,
      s"COPY copy_src TO '$p' (FORMAT PARQUET)").toDF
    assert(again.count() == 2)
  }

  test("format defaults from the path extension; subquery sources " +
    "re-enter the pipeline") {
    Seq((10L, 3L), (20L, 4L)).toDF("k", "v")
      .createOrReplaceTempView("copy_sub")
    val p = tmp("ext") + ".parquet"
    val back = Table.sessionSql(spark,
      s"COPY (SELECT k, v * 2 AS v2 FROM copy_sub ORDER BY k) TO '$p'").toDF
    assert(back.columns.toSeq == Seq("k", "v2"))
    assert(back.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 6L), (20L, 8L)))
  }

  test("CSV writes a header and reads back inferred (documented " +
    "divergence); loud refusals on malformed shapes") {
    Seq((1L, "x")).toDF("k", "tag").createOrReplaceTempView("copy_csv")
    val back = Table.sessionSql(spark,
      s"COPY copy_csv TO '${tmp("csv")}.csv'").toDF
    assert(back.columns.toSeq == Seq("k", "tag"))
    assert(back.collect().head.getString(1) == "x")
    assert(intercept[IllegalArgumentException](graft.sql.CopySql.parse(
      "COPY t TO 'x.json'")).getMessage.contains("FORMAT"))
    assert(intercept[IllegalArgumentException](graft.sql.CopySql.parse(
      "COPY t TO x.parquet")).getMessage.contains("single-quoted"))
    assert(intercept[IllegalArgumentException](graft.sql.CopySql.parse(
      "COPY t TO 'x.parquet' (DELIMITER ',')")).getMessage
      .contains("FORMAT"))
    // non-COPY statements are not claimed
    assert(graft.sql.CopySql.parse("SELECT 'copy t to' AS s").isEmpty)
  }
}
