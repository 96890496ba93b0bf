package graft

import org.apache.spark.sql.functions._

import graft.api.Table

/** SQL-dialect ASOF JOIN (graft.sql.AsOfSql): parser, semantics vs the
  * AsOf API plan, alias rewriting, join types, and error paths.
  */
class AsOfSqlSpec extends GraftSuite {
  import spark.implicits._

  // trades (left) / quotes (right): the classic as-of pairing
  private lazy val trades = Seq(
    (1L, "a", 100L, 10.0),
    (2L, "a", 205L, 11.0),
    (3L, "b", 150L, 12.0),
    (4L, "c", 400L, 13.0) // no quotes for c at all
  ).toDF("trade_id", "sym", "t", "px")

  private lazy val quotes = Seq(
    (10L, "a", 100L, 9.5),
    (11L, "a", 200L, 9.9),
    (12L, "b", 150L, 11.5),
    (13L, "b", 300L, 11.9)
  ).toDF("quote_id", "sym", "qt", "bid")

  private def runSession(sql: String) = {
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")
    Table.sessionSql(spark, sql).toDF
  }

  test("backward non-strict (>=) inner ASOF JOIN picks latest quote at/before") {
    val got = runSession(
      """SELECT tr.trade_id, tr.px, q.quote_id, q.bid
         FROM trades tr ASOF JOIN quotes q
           ON tr.sym = q.sym AND tr.t >= q.qt
         ORDER BY tr.trade_id""")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // trade 1 @100 -> quote 10 @100 (same instant matches, non-strict)
    // trade 2 @205 -> quote 11 @200; trade 3 @150 -> quote 12 @150
    // trade 4 (sym c) dropped: inner
    assert(got.toSeq == Seq((1L, 10L, 9.5), (2L, 11L, 9.9), (3L, 12L, 11.5)))
  }

  test("backward strict (>) hides same-instant quotes; LEFT keeps unmatched") {
    val got = runSession(
      """SELECT tr.trade_id, q.quote_id
         FROM trades tr ASOF LEFT JOIN quotes q
           ON tr.sym = q.sym AND tr.t > q.qt
         ORDER BY tr.trade_id""")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // trade 1 @100: quote 10 is AT 100 -> hidden by strict -> null
    // trade 3 @150: quote 12 at 150 hidden -> null; trade 4: no quotes
    assert(got.toSeq == Seq((1L, -1L), (2L, 11L), (3L, -1L), (4L, -1L)))
  }

  test("forward (<=, <) directions") {
    val le = runSession(
      """SELECT tr.trade_id, q.quote_id FROM trades tr ASOF LEFT JOIN quotes q
         ON tr.sym = q.sym AND tr.t <= q.qt ORDER BY tr.trade_id""")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(le.toSeq == Seq((1L, 10L), (2L, -1L), (3L, 12L), (4L, -1L)))
    val lt = runSession(
      """SELECT tr.trade_id, q.quote_id FROM trades tr ASOF LEFT JOIN quotes q
         ON tr.sym = q.sym AND tr.t < q.qt ORDER BY tr.trade_id""")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(lt.toSeq == Seq((1L, 11L), (2L, -1L), (3L, 13L), (4L, -1L)))
  }

  test("reversed conjunct order and right-side-first inequality normalize") {
    val got = runSession(
      """SELECT tr.trade_id, q.quote_id
         FROM trades tr ASOF JOIN quotes q
           ON q.qt <= tr.t AND q.sym = tr.sym
         ORDER BY tr.trade_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("bare right-only identifiers resolve to the matched right columns") {
    val got = runSession(
      """SELECT trade_id, quote_id, bid
         FROM trades tr ASOF JOIN quotes q
           ON tr.sym = q.sym AND tr.t >= q.qt
         WHERE bid > 9.6 ORDER BY trade_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((2L, 11L), (3L, 12L)))
  }

  test("multi-key equality joins on the composite key") {
    val l = Seq((1L, "a", "x", 10L), (2L, "a", "y", 10L)).toDF("id", "k1", "k2", "t")
    val r = Seq((7L, "a", "x", 5L), (8L, "a", "y", 6L)).toDF("rid", "k1", "k2", "rt")
    l.createOrReplaceTempView("lmk")
    r.createOrReplaceTempView("rmk")
    val got = Table.sessionSql(spark,
      """SELECT a.id, b.rid FROM lmk a ASOF JOIN rmk b
         ON a.k1 = b.k1 AND a.k2 = b.k2 AND a.t >= b.rt
         ORDER BY a.id""").toDF
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    assert(got.toSeq == Seq((1L, 7L), (2L, 8L)))
  }

  test("Table.sql self-as-of matches the AsOf API result") {
    val ev = graft.streaming.Events.read(spark, "/root/testdata/sf0.001")
    val viaSql = Table(ev).sql(
      """SELECT e.event_id, e.user_id, e2.event_id AS prev_id, e2.value AS prev_value
         FROM events e ASOF LEFT JOIN events e2
           ON e.user_id = e2.user_id AND e.ts > e2.ts
         ORDER BY e.event_id""").toDF
    val viaApi = graft.ops.AsOf.join(ev, ev, keyCol = "user_id",
        leftTimeCol = "ts", rightTimeCol = "ts",
        valueCols = Seq("event_id", "value"), rightIdCol = "event_id",
        strict = true)
      .select(col("event_id"), col("user_id"),
        col("asof_event_id").as("prev_id"), col("asof_value").as("prev_value"))
      .orderBy(col("event_id"))
    assert(viaSql.columns.toSeq ==
      Seq("event_id", "user_id", "prev_id", "prev_value"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("plan is the keyed-window carry: no rank, no nested-loop, no cartesian") {
    val df = runSession(
      """SELECT tr.trade_id, q.quote_id FROM trades tr ASOF JOIN quotes q
         ON tr.sym = q.sym AND tr.t >= q.qt""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "as-of must run as a window carry")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"nested-loop in plan:\n$plan")
    assert(!plan.contains("rank("), s"rank in plan:\n$plan")
  }

  test("error paths: keyless, double inequality, unsupported shapes") {
    val kl = intercept[IllegalArgumentException] {
      runSession("SELECT tr.trade_id FROM trades tr ASOF JOIN quotes q ON tr.t >= q.qt")
    }
    // UX golden: the rejection tells the user both escape hatches
    assert(kl.getMessage.contains("keyless"))
    assert(kl.getMessage.contains("add an equality key to the ON clause"))
    assert(kl.getMessage.contains("graft.ops.AsOf API"))
    val di = intercept[IllegalArgumentException] {
      runSession("""SELECT tr.trade_id FROM trades tr ASOF JOIN quotes q
        ON tr.sym = q.sym AND tr.t >= q.qt AND tr.t < q.qt""")
    }
    assert(di.getMessage.contains("exactly one inequality"))
    val uq = intercept[IllegalArgumentException] {
      runSession("""SELECT tr.trade_id FROM trades tr ASOF RIGHT JOIN quotes q
        ON tr.sym = q.sym AND tr.t >= q.qt""")
    }
    assert(uq.getMessage.contains("unsupported ASOF join type"))
    val expr = intercept[IllegalArgumentException] {
      runSession("""SELECT tr.trade_id FROM trades tr ASOF JOIN quotes q
        ON tr.sym = q.sym AND tr.t + 1 >= q.qt""")
    }
    assert(expr.getMessage.contains("qualified column comparisons"))
  }

  test("ASOF inside a string literal or comment does not trigger the translator") {
    val t = Table(spark.range(3).toDF("x"))
    val got = t.sql(
      "SELECT x, 'asof join' AS s FROM t /* asof join */ ORDER BY x")
      .toDF.collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 1L, 2L))
  }

  test("NULL join keys never match (SQL equality semantics, DuckDB parity)") {
    // right rows with a null key are unmatchable; left rows with a null
    // key are unmatched (kept with nulls under LEFT, dropped under inner)
    val tn = Seq(
      (1L, Option("a"), 100L),
      (2L, Option.empty[String], 100L) // null key
    ).toDF("trade_id", "sym", "t")
    val qn = Seq(
      (10L, Option("a"), 50L, 9.5),
      (11L, Option.empty[String], 50L, 1.0) // null key: must match NOTHING
    ).toDF("quote_id", "sym", "qt", "bid")
    tn.createOrReplaceTempView("tn")
    qn.createOrReplaceTempView("qn")
    val left = Table.sessionSql(spark,
      """SELECT l.trade_id, r.quote_id AS qid FROM tn l ASOF LEFT JOIN qn r
         ON l.sym = r.sym AND l.t >= r.qt ORDER BY l.trade_id""").toDF
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(left.toSeq == Seq((1L, 10L), (2L, -1L)),
      "null-key left row must be unmatched; null-key right row must match nothing")
    val inner = Table.sessionSql(spark,
      """SELECT l.trade_id FROM tn l ASOF JOIN qn r
         ON l.sym = r.sym AND l.t >= r.qt""").toDF
      .collect().map(_.getLong(0))
    assert(inner.toSeq == Seq(1L), "inner ASOF drops the null-key left row")
  }

  test("null right-side fields: the carry is one consistent row, null time matches nothing") {
    // quote 21 has a null bid; the old per-column carry would pair
    // quote 21's id with quote 20's bid — the struct carry must emit
    // quote 21's own (id, null bid). Quote 22 has a null TIME and must
    // be invisible to matching entirely.
    val tv = Seq((1L, "a", 300L)).toDF("trade_id", "sym", "t")
    val qv = Seq(
      (20L, Option("a"), Option(100L), Option(9.5)),
      (21L, Option("a"), Option(200L), Option.empty[Double]), // null value col
      (22L, Option("a"), Option.empty[Long], Option(99.9))    // null time
    ).toDF("quote_id", "sym", "qt", "bid")
    tv.createOrReplaceTempView("tv")
    qv.createOrReplaceTempView("qv")
    val row = Table.sessionSql(spark,
      """SELECT l.trade_id, r.quote_id AS qid, r.bid AS b
         FROM tv l ASOF JOIN qv r
         ON l.sym = r.sym AND l.t >= r.qt""").toDF.collect()
    assert(row.length == 1)
    assert(row(0).getLong(1) == 21L, "nearest right row is quote 21")
    assert(row(0).isNullAt(2),
      "quote 21's null bid must stay null, not borrow quote 20's bid")
  }

  test("a column named asof does not route to the translator") {
    Seq((1L, "x")).toDF("asof", "s").createOrReplaceTempView("asof_t")
    val viaSession = Table.sessionSql(spark,
      "SELECT asof FROM asof_t WHERE asof = 1").toDF.collect()
    assert(viaSession.map(_.getLong(0)).toSeq == Seq(1L))
    val viaTable = Table(Seq((2L, "y")).toDF("asof", "s"))
      .sql("SELECT asof, s FROM t WHERE asof = 2").toDF.collect()
    assert(viaTable.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("sessionSql supports QUALIFY (dialect parity with Table.sql)") {
    trades.createOrReplaceTempView("trades")
    val got = Table.sessionSql(spark,
      """SELECT trade_id, sym, px FROM trades
         QUALIFY row_number() OVER (PARTITION BY sym ORDER BY t DESC) = 1
         ORDER BY sym""").toDF.collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L, 3L, 4L), "latest trade per symbol")
  }

  test("derived-table operands: a parenthesized SELECT on either side") {
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")
    // right side derived: only quotes with bid >= 9.9 are candidates
    val r = Table.sessionSql(spark,
      """SELECT tr.trade_id, q.quote_id AS qid
         FROM trades tr ASOF LEFT JOIN
           (SELECT quote_id, sym, qt FROM quotes WHERE bid >= 9.9) q
           ON tr.sym = q.sym AND tr.t >= q.qt
         ORDER BY tr.trade_id""").toDF.collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
    // trade 1 (a,100): quote 10 (bid 9.5) is filtered out, quote 11
    // (a,200) is too late -> unmatched; trade 2 (a,205): quote 11;
    // trade 3 (b,150): quote 12 (b,150, bid 11.5) matches at >=
    assert(r.toSeq == Seq((1L, -1L), (2L, 11L), (3L, 12L), (4L, -1L)))
    // both sides derived
    val both = Table.sessionSql(spark,
      """SELECT l.trade_id, r.quote_id AS qid
         FROM (SELECT trade_id, sym, t FROM trades WHERE sym = 'a') AS l
           ASOF JOIN (SELECT quote_id, sym, qt FROM quotes) AS r
           ON l.sym = r.sym AND l.t >= r.qt
         ORDER BY l.trade_id""").toDF.collect().map(_.getLong(1))
    assert(both.toSeq == Seq(10L, 11L))
    // single-table facade: the subquery binds the receiver by FROM name
    val facade = Table(quotes)
      .sql("""SELECT a.quote_id, b.quote_id AS prev_qid
              FROM quotes a ASOF LEFT JOIN
                (SELECT quote_id, sym, qt FROM quotes) b
                ON a.sym = b.sym AND a.qt > b.qt
              ORDER BY a.quote_id""").toDF.collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
    assert(facade.toSeq ==
      Seq((10L, -1L), (11L, 10L), (12L, -1L), (13L, 12L)))
    // a derived table without an alias is a loud error
    val noAlias = intercept[IllegalArgumentException] {
      runSession("""SELECT 1 FROM trades tr ASOF JOIN
        (SELECT sym, qt FROM quotes) ON tr.sym = q.sym AND tr.t >= q.qt""")
    }
    assert(noAlias.getMessage.contains("needs an alias"))
  }

  test("snake_case identifiers containing keywords never confuse the scanners") {
    // qualify_flag / asof_trades / limit_price / group_id all contain a
    // keyword at an identifier boundary that is an underscore — the
    // masked-view scanners must use IDENT boundaries, not letter/digit
    import spark.implicits._
    Seq((1L, 2L, 10L, 5L)).toDF("qualify_flag", "asof_col", "limit_price", "group_id")
      .createOrReplaceTempView("asof_trades")
    val r = Table.sessionSql(spark,
      """SELECT qualify_flag, asof_col, group_id FROM asof_trades
         WHERE group_id = 5 ORDER BY limit_price""").toDF.collect()
    assert(r.length == 1 && r(0).getLong(0) == 1L && r(0).getLong(1) == 2L)
    // a table NAMED asof_trades in an actual ASOF JOIN statement
    trades.createOrReplaceTempView("trades2")
    Seq((1L, "a", 50L, 9.0)).toDF("quote_id", "sym", "qt", "bid")
      .createOrReplaceTempView("asof_quotes")
    val j = Table.sessionSql(spark,
      """SELECT tr.trade_id, q.quote_id AS qid
         FROM trades2 tr ASOF JOIN asof_quotes q
         ON tr.sym = q.sym AND tr.t >= q.qt ORDER BY tr.trade_id""").toDF
      .collect().map(_.getLong(0))
    assert(j.toSeq == Seq(1L, 2L), "table names containing 'asof' must parse")
  }

  test("ASOF JOIN composes with QUALIFY in one statement") {
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")
    // latest trade per symbol, each with its as-of quote
    val got = Table.sessionSql(spark,
      """SELECT tr.trade_id, tr.sym, q.quote_id AS qid
         FROM trades tr ASOF LEFT JOIN quotes q
         ON tr.sym = q.sym AND tr.t >= q.qt
         QUALIFY row_number() OVER (PARTITION BY tr.sym ORDER BY tr.t DESC) = 1
         ORDER BY tr.sym""").toDF.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq((2L, 11L), (3L, 12L), (4L, -1L)))
  }

  test("nested ASOF subquery through the single-table facade recurses") {
    // inner ASOF (prev quote per quote) feeds the outer ASOF — the
    // facade's sub-resolver must route the inner statement back through
    // the translator rather than raw spark.sql
    val out = Table(quotes).sql(
      """SELECT a.quote_id, b.prev_qid
         FROM quotes a ASOF LEFT JOIN
           (SELECT x.quote_id, x.sym, x.qt, y.quote_id AS prev_qid
            FROM quotes x ASOF LEFT JOIN quotes y
            ON x.sym = y.sym AND x.qt > y.qt) b
         ON a.sym = b.sym AND a.qt >= b.qt AND a.quote_id = b.quote_id
         ORDER BY a.quote_id""").toDF.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq ==
      Seq((10L, -1L), (11L, 10L), (12L, -1L), (13L, 12L)))
  }

  test("USING shorthand: keys + >= ordering, DuckDB semantics") {
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")
    // USING needs shared names: expose quote time as t
    val viaUsing = Table.sessionSql(spark,
      """SELECT tr.trade_id, q.quote_id AS qid
         FROM trades tr ASOF LEFT JOIN
           (SELECT sym, qt AS t, quote_id FROM quotes) q
           USING (sym, t)
         ORDER BY tr.trade_id""").toDF.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // equivalent ON form: tr.sym = q.sym AND tr.t >= q.t
    val viaOn = Table.sessionSql(spark,
      """SELECT tr.trade_id, q.quote_id AS qid
         FROM trades tr ASOF LEFT JOIN
           (SELECT sym, qt AS t, quote_id FROM quotes) q
           ON tr.sym = q.sym AND tr.t >= q.t
         ORDER BY tr.trade_id""").toDF.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(viaUsing.toSeq == viaOn.toSeq)
    assert(viaUsing.toSeq == Seq((1L, 10L), (2L, 11L), (3L, 12L), (4L, -1L)))
    // a single USING column is the keyless global sort — rejected loudly
    val single = intercept[IllegalArgumentException] {
      runSession("""SELECT tr.trade_id FROM trades tr ASOF JOIN
        (SELECT qt AS t, quote_id FROM quotes) q USING (t)""")
    }
    assert(single.getMessage.contains("keyless"))
    // expressions in the USING list are rejected loudly
    val exprErr = intercept[IllegalArgumentException] {
      runSession("""SELECT tr.trade_id FROM trades tr ASOF JOIN
        (SELECT sym, qt AS t, quote_id FROM quotes) q USING (sym, t + 1)""")
    }
    assert(exprErr.getMessage.contains("bare column names"))
  }

  test("SELECT * through an ASOF statement expands over the joined view") {
    trades.createOrReplaceTempView("trades")
    quotes.createOrReplaceTempView("quotes")
    val out = Table.sessionSql(spark,
      """SELECT * FROM trades tr ASOF LEFT JOIN quotes q
         ON tr.sym = q.sym AND tr.t >= q.qt
         ORDER BY tr.trade_id""").toDF
    // left columns verbatim plus the asof_-prefixed right payload
    assert(out.columns.toSeq ==
      Seq("trade_id", "sym", "t", "px",
        "asof_quote_id", "asof_sym", "asof_qt", "asof_bid"))
    val r = out.collect()
    assert(r.length == 4)
    assert(r(0).getLong(0) == 1L && r(0).getLong(4) == 10L)
    assert(r(3).isNullAt(4), "unmatched trade keeps nulls under LEFT")
  }
}
