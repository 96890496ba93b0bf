package graft

import graft.api.Table
import org.apache.spark.sql.functions._

/** POSITIONAL JOIN (j12): zip semantics, NULL padding, order
  * preservation through the RDD boundary, refusals.
  */
class PositionalSqlSpec extends GraftSuite {
  import spark.implicits._

  test("Zip.positionalJoin pairs by position and NULL-pads the shorter " +
    "side; shared names refuse") {
    val a = Seq("x", "y", "z").toDF("l")
    val b = Seq(10L, 20L).toDF("r")
    val got = graft.ops.Zip.positionalJoin(a, b).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq(("x", 10L), ("y", 20L), ("z", -1L)))
    assert(intercept[IllegalArgumentException](
      graft.ops.Zip.positionalJoin(a, Seq("q").toDF("L")))
      .getMessage.contains("share column names"))
  }

  test("SQL surface: ordered derived tables keep their order; aliases " +
    "drop; refusals fire") {
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .createOrReplaceTempView("pos_l")
    Seq(100L, 200L).toDF("v").createOrReplaceTempView("pos_r")
    val got = Table.sessionSql(spark,
      """SELECT l.s, r.v
         FROM (SELECT s FROM pos_l ORDER BY k DESC) l
         POSITIONAL JOIN (SELECT v FROM pos_r ORDER BY v) r
         ORDER BY s""").toDF.collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // DESC left order: c, b, a → pairs (c,100), (b,200), (a,NULL)
    assert(got.toSeq == Seq(("a", -1L), ("b", 200L), ("c", 100L)))
    // bare table operands work; WHERE runs over the zipped frame
    val bare = Table.sessionSql(spark,
      """SELECT s, v FROM pos_l POSITIONAL JOIN pos_r
         WHERE v IS NOT NULL ORDER BY s""").toDF
    assert(bare.count() == 2)
    // two positional joins in one statement refuse loudly
    assert(intercept[IllegalArgumentException](Table.sessionSql(spark,
      """SELECT 1 FROM a POSITIONAL JOIN b POSITIONAL JOIN c"""))
      .getMessage.contains("one POSITIONAL JOIN"))
    // a bare identifier named positional never routes here
    assert(!graft.sql.PositionalSql.detect("SELECT positional FROM t"))
    assert(!graft.sql.PositionalSql.detect(
      "SELECT x FROM t WHERE tag = 'positional join'"))
    // a WITH head would silently vanish in the reassembly — refuse
    // loudly instead (review-caught)
    assert(intercept[IllegalArgumentException](Table.sessionSql(spark,
      """WITH seed AS (SELECT 1 AS a)
         SELECT * FROM (SELECT a FROM seed) x
         POSITIONAL JOIN (SELECT 2 AS b) y"""))
      .getMessage.contains("inline the WITH"))
  }

  test("clause-keyword aliases refuse; GROUP/ORDER bound the tail only " +
    "with BY (advice r16)") {
    Seq((1L, "a")).toDF("k", "s").createOrReplaceTempView("pos_kw_l")
    Seq(7L).toDF("v").createOrReplaceTempView("pos_kw_r")
    // pre-fix: `AS window` silently truncated the right operand and
    // reinterpreted the alias as tail text — now a loud refusal
    for (kw <- Seq("window", "order", "group", "limit"))
      assert(intercept[IllegalArgumentException](Table.sessionSql(spark,
        s"SELECT s, v FROM pos_kw_l POSITIONAL JOIN pos_kw_r AS $kw"))
        .getMessage.contains("alias"), s"alias $kw")
    // a genuine ORDER BY after an aliased operand still bounds the tail
    val got = Table.sessionSql(spark,
      "SELECT s, v FROM pos_kw_l AS a POSITIONAL JOIN pos_kw_r AS b " +
        "ORDER BY s").toDF.collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 7L)))
  }
}
