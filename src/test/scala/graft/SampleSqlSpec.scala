package graft

import graft.api.Table
import graft.sql.SampleSql
import org.apache.spark.sql.functions._

/** Sampling clauses (q64): spec grammar, the deterministic md5 gate in
  * both clause positions, entry-point parity, and the map-only plan
  * shape for a fraction sample.
  */
class SampleSqlSpec extends GraftSuite {
  import spark.implicits._

  private def docs = (1L to 200L).map(i => (i, s"d$i", (i % 3).toString))
    .toDF("id", "name", "grp")

  // the engine-side gate re-derived driver-side: 16-bit md5 prefix
  private def bucket(id: Long): Int =
    Integer.parseInt(org.apache.commons.codec.digest.DigestUtils
      .md5Hex(id.toString).substring(0, 4), 16)

  test("parseSpec grammar: percent, rows, bare, methods, seeds") {
    assert(SampleSql.parseSpec("10%") == SampleSql.Percent(10.0))
    assert(SampleSql.parseSpec(" 2.5 PERCENT ") == SampleSql.Percent(2.5))
    assert(SampleSql.parseSpec("17 ROWS") == SampleSql.Rows(17L))
    assert(SampleSql.parseSpec("17") == SampleSql.Rows(17L))
    assert(SampleSql.parseSpec("bernoulli(10%)") == SampleSql.Percent(10.0))
    assert(SampleSql.parseSpec("system(4 percent)") == SampleSql.Percent(4.0))
    assert(SampleSql.parseSpec("reservoir(40 rows)") == SampleSql.Rows(40L))
    // method defaults: bernoulli/system → percent, reservoir/bare → rows
    assert(SampleSql.parseSpec("bernoulli(7)") == SampleSql.Percent(7.0))
    assert(SampleSql.parseSpec("reservoir(7)") == SampleSql.Rows(7L))
    // trailing (method[, seed]) accepted and ignored (gate is already
    // deterministic)
    assert(SampleSql.parseSpec("10% (bernoulli)") == SampleSql.Percent(10.0))
    assert(SampleSql.parseSpec("10% (system, 42)") == SampleSql.Percent(10.0))
    intercept[IllegalArgumentException](SampleSql.parseSpec("abc"))
    intercept[IllegalArgumentException](SampleSql.parseSpec("150%"))
    intercept[IllegalArgumentException](SampleSql.parseSpec("2.5 ROWS"))
    intercept[IllegalArgumentException](SampleSql.parseSpec("bernoulli(10%"))
  }

  test("splitUsingSample: clause split, tail, join-USING immunity") {
    val s = SampleSql.splitUsingSample(
      "SELECT id FROM t WHERE id > 3 USING SAMPLE 10% ORDER BY id LIMIT 5")
    assert(s.contains(("SELECT id FROM t WHERE id > 3",
      SampleSql.Percent(10.0), "ORDER BY id LIMIT 5")))
    // join-USING never triggers; literal/comment occurrences masked
    assert(SampleSql.splitUsingSample(
      "SELECT * FROM a JOIN b USING (k)").isEmpty)
    assert(SampleSql.splitUsingSample(
      "SELECT 'using sample 10%' FROM t -- using sample 5 rows").isEmpty)
    // depth > 0 does not split (a subquery's clause is its own)
    assert(SampleSql.splitUsingSample(
      "SELECT * FROM (SELECT id FROM t USING SAMPLE 5 ROWS) s").isEmpty)
  }

  test("USING SAMPLE percent: deterministic md5 gate on first column") {
    val out = Table(docs)
      .sql("SELECT id, name FROM d WHERE id <= 100 USING SAMPLE 25%")
      .df.collect().map(_.getLong(0)).toSet
    val expect = (1L to 100L).filter(bucket(_) < 16384).toSet
    assert(out == expect)
    assert(out.nonEmpty && out.size < 100)
  }

  test("USING SAMPLE rows: n lowest (md5, id) rows; tail applies after") {
    val out = Table(docs)
      .sql("SELECT id FROM d USING SAMPLE 10 ROWS ORDER BY id")
      .df.collect().map(_.getLong(0)).toSeq
    val expect = (1L to 200L).sortBy(i =>
      (org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString), i))
      .take(10).sorted
    assert(out == expect) // ordered tail ran after the sample
  }

  test("TABLESAMPLE lowers to the same gate; alias and 100% fast-path") {
    docs.createOrReplaceTempView("smp_t")
    val out = Table.sessionSql(spark,
      "SELECT x.id FROM smp_t TABLESAMPLE (bernoulli(25%)) AS x " +
        "WHERE x.id <= 100 ORDER BY x.id")
      .df.collect().map(_.getLong(0)).toSeq
    val expect = (1L to 100L).filter(bucket(_) < 16384)
    assert(out == expect)
    // 100% keeps everything (threshold saturates the grid)
    val all = Table.sessionSql(spark,
      "SELECT count(*) AS n FROM smp_t TABLESAMPLE (100%)")
      .df.collect().head.getLong(0)
    assert(all == 200L)
  }

  test("TABLESAMPLE rows form through Table.sql binds the receiver") {
    val out = Table(docs)
      .sql("SELECT id FROM d TABLESAMPLE (3 ROWS)")
      .df.collect().map(_.getLong(0)).toSet
    val expect = (1L to 200L).sortBy(i =>
      (org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString), i))
      .take(3).toSet
    assert(out == expect)
  }

  test("TABLESAMPLE on derived tables (r17): gate keys on the " +
    "subquery's first column; all alias positions (DuckDB-probed)") {
    docs.createOrReplaceTempView("smp_t")
    val expect = (1L to 100L).filter(bucket(_) < 16384)
    // (subq) AS alias TABLESAMPLE — DuckDB's only derived-table shape
    val sub = Table.sessionSql(spark,
      """SELECT d.id FROM (SELECT id FROM smp_t WHERE id <= 100)
           AS d TABLESAMPLE (25%) ORDER BY d.id""")
      .df.collect().map(_.getLong(0)).toSeq
    assert(sub == expect)
    // unaliased and bare-alias variants parse too
    assert(Table.sessionSql(spark,
      "SELECT id FROM (SELECT id FROM smp_t WHERE id <= 100) " +
        "TABLESAMPLE (25%)").toDF.count() == expect.size)
    assert(Table.sessionSql(spark,
      "SELECT s.id FROM (SELECT id FROM smp_t WHERE id <= 100) s " +
        "TABLESAMPLE (25%)").toDF.count() == expect.size)
    // alias BEFORE the clause on a base table (DuckDB's position)
    val pre = Table.sessionSql(spark,
      "SELECT x.id FROM smp_t AS x TABLESAMPLE (25%) " +
        "WHERE x.id <= 100 ORDER BY x.id")
      .df.collect().map(_.getLong(0)).toSeq
    assert(pre == expect)
    // a subquery whose FIRST column differs keys the gate on ITS column
    val flip = Table.sessionSql(spark,
      """SELECT cnt FROM (SELECT count(*) AS cnt FROM smp_t)
           AS a TABLESAMPLE (100%)""").toDF.collect().head.getLong(0)
    assert(flip == 200L)
  }

  test("refusals: derived-table TABLESAMPLE on the single-table " +
    "surface; malformed spec") {
    docs.createOrReplaceTempView("smp_t")
    assert(intercept[IllegalArgumentException] {
      Table(docs).sql("SELECT id FROM (SELECT id FROM d) TABLESAMPLE (10%)")
    }.getMessage.contains("session surface"))
    intercept[IllegalArgumentException] {
      Table(docs).sql("SELECT id FROM d USING SAMPLE grp PERCENT")
    }
  }

  test("percent sample is map-only: no Exchange below the gate") {
    val p = Table(docs).explainSql("SELECT id FROM d USING SAMPLE 25%")
    assert(!p.contains("Exchange"),
      s"fraction sample must not shuffle:\n$p")
    // explainTree parity (the lifecycle contract)
    val t = Table(docs).explainTree("SELECT id FROM d USING SAMPLE 25%")
    assert(t.nonEmpty)
  }

  test("deterministic across runs and partitionings") {
    val a = SampleSql.applySample(docs.repartition(7), SampleSql.Percent(30))
      .select(sum($"id")).collect().head.getLong(0)
    val b = SampleSql.applySample(docs.coalesce(1), SampleSql.Percent(30))
      .select(sum($"id")).collect().head.getLong(0)
    assert(a == b)
  }

  test("rows-form orders NULLS LAST — cross-engine hash grid parity " +
    "(review-caught)") {
    // a null first column hashes to a null md5; Spark's default NULLS
    // FIRST would always select those rows where DuckDB's NULLS LAST
    // default never does — the gate pins last-ness on both keys
    val withNulls = Seq[(Option[Long], String)](
      (None, "n1"), (None, "n2"), (Some(1L), "a"), (Some(2L), "b"),
      (Some(3L), "c")).toDF("id", "tag")
    val got = SampleSql.applySample(withNulls, SampleSql.Rows(3))
      .collect()
    assert(got.forall(!_.isNullAt(0)),
      "null-keyed rows must sort last and never enter an undersized sample")
  }
}
