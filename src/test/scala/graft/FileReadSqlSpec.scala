package graft

import graft.api.Table
import graft.sql.FileReadSql

/** DuckDB's file-reading FROM forms (io24): read_parquet / read_csv /
  * read_json table functions and bare FROM '<path>' literals.
  */
class FileReadSqlSpec extends GraftSuite {

  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"frs_$tag").toString

  test("read_parquet / bare literal / read_json bind lazy views; " +
    "names never leak") {
    val d = tmp("rp")
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "s")
      .write.mode("overwrite").parquet(s"$d/t.parquet")
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .write.mode("overwrite").json(s"$d/j.json")
    val got = Table.sessionSql(spark,
      s"""SELECT t.s, count(*) AS n, sum(j.v) AS sv
          FROM read_parquet('$d/t.parquet') t
          LEFT JOIN read_json('$d/j.json') j ON t.k = j.k
          GROUP BY t.s ORDER BY t.s""").toDF
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)))).toSeq
    assert(got == Seq(("a", 2L, Some(10L)), ("b", 1L, Some(20L))))
    // bare literal form, ext-typed
    assert(Table.sessionSql(spark,
      s"SELECT count(*) AS n FROM '$d/t.parquet'").toDF
      .collect().head.getLong(0) == 3L)
    // statement-scoped names dropped
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("__file_read_")))
  }

  test("read_csv: header + inference defaults, header=false positional, " +
    "delim option; refusals") {
    val d = tmp("rc")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/h.csv"),
      "k,s\n1,a\n2,b\n".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/nh.csv"),
      "1|x\n2|y\n".getBytes)
    assert(Table.sessionSql(spark,
      s"SELECT sum(k) AS sk FROM read_csv('$d/h.csv')").toDF
      .collect().head.getLong(0) == 3L)
    val nh = Table.sessionSql(spark,
      s"""SELECT * FROM read_csv('$d/nh.csv', header = false,
          delim = '|') ORDER BY 1""").toDF.collect()
    assert(nh.length == 2 && nh.head.getString(1) == "x")
    // refusals: named args on non-csv, unknown option, bad extension
    assert(intercept[IllegalArgumentException](Table.sessionSql(spark,
      s"SELECT * FROM read_parquet('$d/h.csv', header = false)"))
      .getMessage.contains("read_csv options"))
    assert(intercept[IllegalArgumentException](Table.sessionSql(spark,
      s"SELECT * FROM read_csv('$d/h.csv', quote = 'x')"))
      .getMessage.contains("not supported"))
    // a FROM literal without a data-file extension is left untouched
    // (it is data, not a path) — Spark's parser rejects it loudly
    assert(intercept[Exception](Table.sessionSql(spark,
      s"SELECT * FROM '$d/file.unknown'"))
      .getMessage.toLowerCase.contains("syntax"))
  }

  test("FROM inside trim/extract/substring argument lists is expression " +
    "syntax — never rewritten, even when the literal looks like a path") {
    // standard-SQL forms that previously mangled
    assert(FileReadSql.rewrite(
      "SELECT trim(BOTH 'x' FROM 'xxabcxx') AS s FROM t").isEmpty)
    assert(FileReadSql.rewrite(
      "SELECT extract(year FROM '2020-01-01') AS y FROM t").isEmpty)
    assert(FileReadSql.rewrite(
      "SELECT substring('abcdef' FROM 2 FOR 3) AS s FROM t").isEmpty)
    // even a .csv-suffixed literal inside trim stays data
    assert(FileReadSql.rewrite(
      "SELECT trim(BOTH 'x' FROM 'weird.csv') AS s FROM t").isEmpty)
    // but a genuine table-position literal in the same statement still
    // rewrites while the function-embedded one does not
    val Some((rw, binds)) = FileReadSql.rewrite(
      "SELECT trim(BOTH 'x' FROM 'xxaxx') AS s FROM '/p/t.parquet'")
    assert(binds.map(_.path) == Seq("/p/t.parquet"))
    assert(rw.contains("FROM 'xxaxx'"))
    // doubled-quote escape in a path literal un-doubles
    val Some((_, b2)) = FileReadSql.rewrite(
      "SELECT * FROM '/p/it''s.parquet'")
    assert(b2.head.path == "/p/it's.parquet")
  }

  test("rewrite surgical: literals elsewhere untouched, COPY paths " +
    "never rewritten, no-file statements pass through") {
    // a quoted literal NOT after FROM/JOIN is data, not a path
    assert(FileReadSql.rewrite(
      "SELECT 'x.parquet' AS s FROM t").isEmpty)
    assert(FileReadSql.rewrite("SELECT k FROM t JOIN u ON 1=1").isEmpty)
    // the rewrite replaces only the call spans
    val Some((rw, binds)) = FileReadSql.rewrite(
      "SELECT a, 'from keep.parquet' AS lit FROM read_parquet('/p/x.parquet') z")
    assert(binds.map(b => (b.kind, b.path)) ==
      Seq(("parquet", "/p/x.parquet")))
    assert(rw.contains("'from keep.parquet'") && rw.endsWith(" z"))
    // a literal inside a string containing FROM never triggers (mask)
    assert(FileReadSql.rewrite(
      "SELECT '  from ''/x.parquet'' ' AS s FROM t").isEmpty)
  }
}
