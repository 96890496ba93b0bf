package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `COPY … TO '<path>'` export statement form (io21) — DuckDB's export
  * surface:
  *
  *   COPY name TO 'path' [(FORMAT PARQUET | CSV)]
  *   COPY ( <select statement> ) TO 'path' [(FORMAT PARQUET | CSV)]
  *
  * The format defaults from the path extension (.parquet / .csv) when
  * no FORMAT option is given — DuckDB's rule. The statement RETURNS the
  * exported table READ BACK from the written files (the u09/u10
  * statement-form convention, strengthened: the returned frame proves
  * the round-trip, not just the write). Parquet round-trips arrow types
  * exactly; CSV is written with a header and read back with schema
  * inference — the lossy-format divergence every engine shares,
  * documented rather than hidden. An existing target is overwritten
  * (DuckDB COPY semantics).
  *
  * Spark writes a DIRECTORY of part files where DuckDB writes one file —
  * the distributed-writer shape; the path names the dataset, not a
  * single file. Scale shape: the write is the terminal exchange-free
  * action of the defining plan (each task writes its partition — this
  * is exactly how a 100 TB export must fan out); the read-back is a
  * fresh pruned scan.
  */
object CopySql {

  final case class Stmt(ref: String, isSubquery: Boolean, path: String,
                        format: String)

  import Dialect.{stripLiterals, wordAt, matchParenAt => matchParen,
    skipWsAt => skipWs}

  /** First-word dispatch (masked scan): None unless the statement is
    * COPY … TO. Malformed COPY fails loudly from here.
    */
  def parse(sql: String): Option[Stmt] = {
    val m = stripLiterals(sql)
    var i = skipWs(m, 0)
    if (!wordAt(m, i, "copy")) return None
    i = skipWs(m, i + 4)
    val (ref, isSub, afterRef) =
      if (i < m.length && m.charAt(i) == '(') {
        val close = matchParen(m, i)
        (sql.substring(i + 1, close).trim, true, skipWs(m, close + 1))
      } else {
        val ns = i
        var j = i
        while (j < m.length && !m.charAt(j).isWhitespace) j += 1
        (sql.substring(ns, j), false, skipWs(m, j))
      }
    require(ref.nonEmpty, "empty COPY source")
    if (!isSub) require(Dialect.isBareIdentifier(ref),
      s"COPY source must be a table name or a parenthesized statement, " +
        s"got: $ref")
    var k = afterRef
    require(wordAt(m, k, "to"), "COPY requires TO '<path>'")
    // the path literal is INVISIBLE on the mask (quotes included), so
    // walk the original text: skip real whitespace, then scan to the
    // closing quote with the mask's own escape rule
    k += 2
    while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
    require(k < sql.length && sql.charAt(k) == '\'',
      "COPY TO requires a single-quoted path literal")
    var pathEnd = k + 1
    while (pathEnd < sql.length && sql.charAt(pathEnd) != '\'') {
      pathEnd += (if (sql.charAt(pathEnd) == '\\') 2 else 1)
    }
    require(pathEnd < sql.length, "unterminated COPY TO path literal")
    val path = sql.substring(k + 1, pathEnd)
    require(path.nonEmpty && !path.contains("'") && !path.contains("\\"),
      "COPY TO path must be a plain non-empty literal")
    k = skipWs(m, pathEnd + 1)
    var format = ""
    if (k < m.length && m.charAt(k) == '(') {
      val close = matchParen(m, k)
      val opts = sql.substring(k + 1, close).trim.split("\\s+").toSeq
      require(opts.length == 2 && opts.head.equalsIgnoreCase("format"),
        s"COPY options support (FORMAT PARQUET|CSV), got: (${
          sql.substring(k + 1, close).trim})")
      format = opts(1).toLowerCase
      k = skipWs(m, close + 1)
    }
    require(k >= m.length,
      s"unexpected text after COPY options: ${sql.substring(k).trim.take(40)}")
    if (format.isEmpty)
      format =
        if (path.toLowerCase.endsWith(".parquet")) "parquet"
        else if (path.toLowerCase.endsWith(".csv")) "csv"
        else ""
    require(format == "parquet" || format == "csv",
      "COPY TO needs FORMAT PARQUET or CSV (or a .parquet/.csv path) — " +
        "other formats are not supported")
    Some(Stmt(ref, isSub, path, format))
  }

  /** Execute: resolve the source (bare name → session catalog,
    * subquery → the caller's full pipeline), write, read back, return.
    */
  def run(spark: SparkSession, st: Stmt,
          resolve: String => DataFrame): DataFrame = {
    val src = resolve(st.ref)
    st.format match {
      case "parquet" =>
        src.write.mode("overwrite").parquet(st.path)
        spark.read.parquet(st.path)
      case "csv" =>
        src.write.mode("overwrite").option("header", "true").csv(st.path)
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(st.path)
    }
  }
}
