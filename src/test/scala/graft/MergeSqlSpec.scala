package graft

import graft.api.Table
import graft.sql.MergeSql

/** MERGE INTO at the SQL surface (u09): statement-form parse +
  * full-outer-join lowering. The engine's tables are immutable frames,
  * so the statement returns the post-merge table; arms apply in textual
  * order, first match wins, and the SQL-standard one-source-row-per-
  * target-row contract is enforced loudly.
  */
class MergeSqlSpec extends GraftSuite {
  import spark.implicits._

  private def bind(): Unit = {
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "tag", "v").createOrReplaceTempView("mt_target")
    Seq((2L, "B", 200L), (3L, "C", 300L), (4L, "D", 400L))
      .toDF("k", "tag", "v").createOrReplaceTempView("mt_source")
  }

  private def run(sql: String): Seq[(Long, String, Long)] =
    Table.sessionSql(spark, sql).toDF
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("MATCHED UPDATE + NOT MATCHED INSERT (the upsert shape)") {
    bind()
    val got = run(
      """MERGE INTO mt_target t USING mt_source s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET tag = s.tag, v = s.v + 1
         WHEN NOT MATCHED THEN INSERT (k, tag, v) VALUES (s.k, s.tag, s.v)""")
    assert(got == Seq((1L, "a", 10L), (2L, "B", 201L), (3L, "C", 301L),
      (4L, "D", 400L)))
  }

  test("conditional MATCHED DELETE ahead of UPDATE — textual arm order") {
    bind()
    val got = run(
      """MERGE INTO mt_target AS t USING mt_source AS s ON t.k = s.k
         WHEN MATCHED AND s.v >= 300 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.v""")
    // k=3 deleted (s.v=300), k=2 updated, k=1 kept, k=4 dropped (no arm)
    assert(got == Seq((1L, "a", 10L), (2L, "b", 200L)))
  }

  test("INSERT * by name and positional INSERT VALUES") {
    bind()
    val star = run(
      """MERGE INTO mt_target t USING mt_source s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT *""")
    assert(star.contains((4L, "D", 400L)) && star.size == 4)
    val pos = run(
      """MERGE INTO mt_target t USING mt_source s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT VALUES (s.k * 10, lower(s.tag), 7)""")
    assert(pos.contains((40L, "d", 7L)) && pos.size == 4)
  }

  test("NOT MATCHED BY SOURCE arms see target-only rows") {
    bind()
    val got = run(
      """MERGE INTO mt_target t USING mt_source s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    // k=1 (target-only) deleted; 2,3 updated; 4 dropped (no insert arm)
    assert(got == Seq((2L, "b", 200L), (3L, "c", 300L)))
  }

  test("multi-match refusal is loud (equi-ON: source-side agg, no join)") {
    bind()
    Seq((2L, "x", 1L), (2L, "y", 2L)).toDF("k", "tag", "v")
      .createOrReplaceTempView("mt_dup")
    val e = intercept[IllegalArgumentException] {
      run("""MERGE INTO mt_target t USING mt_dup s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e.getMessage.contains("2 source rows"))
    // equi-ON guard is deliberately stricter: a duplicated source key
    // refuses even when no target row matches it (k=9 unmatched)
    Seq((9L, "x", 1L), (9L, "y", 2L)).toDF("k", "tag", "v")
      .createOrReplaceTempView("mt_dup9")
    intercept[IllegalArgumentException] {
      run("""MERGE INTO mt_target t USING mt_dup9 s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    // null source keys never equi-match — they must NOT trip the guard
    Seq((Option.empty[Long], "x", 1L), (Option.empty[Long], "y", 2L),
      (Some(2L), "z", 5L)).toDF("k", "tag", "v")
      .createOrReplaceTempView("mt_dupn")
    val ok = run(
      """MERGE INTO mt_target t USING mt_dupn s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = s.v""")
    assert(ok.exists(_ == ((2L, "b", 5L))))
  }

  test("multi-match refusal via the join guard on theta ON") {
    bind()
    Seq((2L, "x", 1L), (2L, "y", 2L)).toDF("k", "tag", "v")
      .createOrReplaceTempView("mt_dup")
    val e = intercept[IllegalArgumentException] {
      run("""MERGE INTO mt_target t USING mt_dup s
             ON t.k = s.k AND s.v < t.v
             WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    // the theta conjunct defeats key extraction — join guard fires
    assert(e.getMessage.contains("matches 2 source rows"))
  }

  test("equi-ON MERGE plans exactly one join (guard adds none)") {
    bind()
    import graft.sql.MergeSql
    val st = MergeSql.parse(
      """MERGE INTO mt_target t USING mt_source s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = s.v""").get
    val out = MergeSql.run(spark, st, spark.table)
    val p = out.queryExecution.optimizedPlan.toString
    val joins = "(?i)join".r.findAllIn(p).length
    assert(joins == 1, s"expected exactly one join, got $joins:\n$p")
  }

  test("equiSourceKeys: extraction and conservative bail-outs") {
    import graft.sql.MergeSql
    assert(MergeSql.equiSourceKeys("t.k = s.k", "t", "s")
      .contains(Seq("s.k")))
    assert(MergeSql.equiSourceKeys(
      "s.a = t.x AND t.y = upper(s.b)", "t", "s")
      .contains(Seq("s.a", "upper(s.b)")))
    // CASE side owned by the source
    assert(MergeSql.equiSourceKeys(
      "t.k = CASE WHEN s.v > 0 THEN s.k ELSE -1 END", "t", "s")
      .contains(Seq("CASE WHEN s.v > 0 THEN s.k ELSE -1 END")))
    // theta conjunct / bare column / mixed side / unknown qualifier bail
    assert(MergeSql.equiSourceKeys("t.k < s.k", "t", "s").isEmpty)
    assert(MergeSql.equiSourceKeys("t.k = s.k AND v > 0", "t", "s").isEmpty)
    assert(MergeSql.equiSourceKeys("t.k = s.k + t.k", "t", "s").isEmpty)
    assert(MergeSql.equiSourceKeys("t.k = x.k", "t", "s").isEmpty)
  }

  test("subquery source, arm expressions cast into target types") {
    bind()
    val got = run(
      """MERGE INTO mt_target t
         USING (SELECT k, v FROM mt_source WHERE v > 250) AS s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET v = CAST(s.v AS INT)""")
    // INT expression cast back to the target's BIGINT column
    assert(got == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 300L)))
  }

  test("parse guards: unknown column, alias collision, malformed arms") {
    bind()
    assert(intercept[IllegalArgumentException](run(
      """MERGE INTO mt_target t USING mt_source s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET nope = 1"""))
      .getMessage.contains("unknown target column"))
    assert(intercept[IllegalArgumentException](run(
      """MERGE INTO mt_target USING mt_target ON 1=1
         WHEN MATCHED THEN DELETE"""))
      .getMessage.contains("aliases collide"))
    assert(intercept[IllegalArgumentException](run(
      """MERGE INTO mt_target t USING mt_source s ON t.k = s.k
         WHEN NOT MATCHED THEN UPDATE SET v = 1"""))
      .getMessage.contains("cannot UPDATE"))
    assert(intercept[IllegalArgumentException](run(
      """MERGE INTO mt_target t USING mt_source s ON t.k = s.k
         WHEN MATCHED THEN INSERT *"""))
      .getMessage.contains("only valid in WHEN NOT MATCHED"))
  }

  test("non-MERGE statements pass through untouched") {
    assert(MergeSql.parse("SELECT 'merge into' AS s").isEmpty)
    assert(MergeSql.parse("-- merge into\nSELECT 1").isEmpty)
  }

  test("NOT-MATCHED-only MERGE emits a multi-matched target row ONCE") {
    bind()
    Seq((2L, "x", 1L), (2L, "y", 2L), (9L, "n", 9L)).toDF("k", "tag", "v")
      .createOrReplaceTempView("mt_multi")
    val got = run(
      """MERGE INTO mt_target t USING mt_multi s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT *""")
    // k=2 matched twice but must survive once, unchanged; k=9 inserts
    assert(got == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (9L, "n", 9L)))
  }

  test("unparenthesized CASE WHEN in ON / conditions never splits arms") {
    bind()
    val got = run(
      """MERGE INTO mt_target t USING mt_source s
         ON t.k = CASE WHEN s.v > 0 THEN s.k ELSE -1 END
         WHEN MATCHED AND CASE WHEN s.v > 250 THEN true ELSE false END
           THEN UPDATE SET v = CASE WHEN s.v > 350 THEN 0 ELSE s.v END
         WHEN NOT MATCHED THEN INSERT (k, tag, v) VALUES (s.k, 'N', s.v)""")
    // k=2 matched, cond false (200) -> kept; k=3 matched, cond true,
    // SET CASE 300<=350 -> 300; k=4 not matched -> ('N', 400)
    assert(got == Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 300L),
      (4L, "N", 400L)))
  }
}
