package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Dialect

class DialectSpec extends AnyFunSuite {

  test("np.* rewrites to np_* outside literals") {
    assert(Dialect.rewrite("select np.log(x), NP.sqrt(y) from t") ==
      "select np_log(x), NP_sqrt(y) from t")
  }

  test("np. inside string literal untouched") {
    assert(Dialect.rewrite("select 'np.log' from t") == "select 'np.log' from t")
  }

  test("np. as part of a longer identifier untouched") {
    assert(Dialect.rewrite("select anp.log(x) from t") == "select anp.log(x) from t")
  }

  test("# becomes ^ outside literals only") {
    assert(Dialect.rewrite("select a # b, '#lit', \"q#id\" from t") ==
      "select a ^ b, '#lit', \"q#id\" from t")
  }

  test("orderByNullsLast appends to bare sort items only") {
    assert(Dialect.orderByNullsLast("select * from t order by a, b desc limit 3") ==
      "select * from t order by a NULLS LAST, b desc NULLS LAST limit 3")
    assert(Dialect.orderByNullsLast("select * from t order by a nulls first, b") ==
      "select * from t order by a nulls first, b NULLS LAST")
    assert(Dialect.orderByNullsLast("select f(a, b) from t order by f(a, b), c") ==
      "select f(a, b) from t order by f(a, b) NULLS LAST, c NULLS LAST")
  }

  test("orderByNullsLast ignores ORDER BY inside windows and subqueries") {
    val q = "select row_number() over (partition by k order by v) rn from t"
    assert(Dialect.orderByNullsLast(q) == q)
    val q2 = "select * from (select a from t order by a) s"
    assert(Dialect.orderByNullsLast(q2) == q2)
  }

  test("orderByNullsLast no-op without ORDER BY or with 'order' in a name") {
    assert(Dialect.orderByNullsLast("select o_orderkey from orders") ==
      "select o_orderkey from orders")
  }

  test("firstFromTable finds the bound view name") {
    assert(Dialect.firstFromTable("select * from lineitem where x='from y'")
      .contains("lineitem"))
    assert(Dialect.firstFromTable("select 1").isEmpty)
  }

  test("rewrite leaves # and np. inside comments untouched") {
    val line = "select a -- np.sin(x) # comment\nfrom t"
    assert(Dialect.rewrite(line) == line)
    val block = "select a /* np.sin(x) # note */ , b # c from t"
    assert(Dialect.rewrite(block) ==
      "select a /* np.sin(x) # note */ , b ^ c from t")
  }

  test("aliasesIntoWhere inlines a select alias into WHERE") {
    assert(Dialect.aliasesIntoWhere(
      "select a*2 as d from t where d > 3 order by d") ==
      "select a*2 as d from t where (a*2) > 3 order by d")
  }

  test("aliasesIntoWhere: alias shadows a same-named input column") {
    // reference semantics (binder alias map wins over the input column)
    assert(Dialect.aliasesIntoWhere(
      "select l_quantity * 2 as l_tax from t where l_tax > 90") ==
      "select l_quantity * 2 as l_tax from t where (l_quantity * 2) > 90")
  }

  test("aliasesIntoWhere leaves quoted strings and qualified names alone") {
    val q = "select a as d from t where x = 'd' and t.d > 1 and \"d\" > 2"
    assert(Dialect.aliasesIntoWhere(q) == q)
  }

  test("aliasesIntoWhere never rewrites calls or GROUP BY/ORDER BY") {
    val q = "select sum(x) as d from t where d(1) > 0 group by d"
    assert(Dialect.aliasesIntoWhere(q) == q)
  }

  test("aliasesIntoWhere stops at the clause end and handles DISTINCT") {
    assert(Dialect.aliasesIntoWhere(
      "select distinct a+1 as d from t where d=1 order by d limit 3") ==
      "select distinct a+1 as d from t where (a+1)=1 order by d limit 3")
  }

  test("splitQualify: predicate column appended, tail preserved") {
    val Some((inner, tail)) = Dialect.splitQualify(
      "select k, row_number() over (order by v) as rn from t " +
        "qualify rn <= 2 order by k limit 5"): @unchecked
    assert(inner == "select k, row_number() over (order by v) as rn " +
      ", ((row_number() over (order by v)) <= 2) AS __qualify__ from t ")
    assert(tail == "order by k limit 5")
  }

  test("splitQualify: no QUALIFY, subquery QUALIFY, quoted word → None") {
    assert(Dialect.splitQualify("select a from t order by a").isEmpty)
    assert(Dialect.splitQualify(
      "select * from (select a from t qualify rn = 1) s").isEmpty)
    assert(Dialect.splitQualify("select 'qualify rn' as a from t").isEmpty)
  }

  test("expandStarExclude: expands against the schema, errors on typos") {
    val cols = Seq("doc_id", "text", "lang")
    assert(Dialect.expandStarExclude(
      "select * exclude (text) from documents order by doc_id", cols) ==
      "select `doc_id`, `lang` from documents order by doc_id")
    assert(Dialect.expandStarExclude(
      "select * EXCLUDE lang from t", cols) ==
      "select `doc_id`, `text` from t")
    intercept[IllegalArgumentException] {
      Dialect.expandStarExclude("select * exclude (nope) from t", cols)
    }
    intercept[IllegalArgumentException] {
      Dialect.expandStarExclude(
        "select * exclude (doc_id, text, lang) from t", cols)
    }
  }

  test("expandStarExclude: untouched without the modifier or inside literals") {
    val cols = Seq("a", "b")
    assert(Dialect.expandStarExclude("select count(*) from t", cols) ==
      "select count(*) from t")
    assert(Dialect.expandStarExclude("select '* exclude (a)' s from t", cols) ==
      "select '* exclude (a)' s from t")
  }

  test("splitQualify: direct window predicate, empty tail, DISTINCT rejected") {
    val Some((inner, tail)) = Dialect.splitQualify(
      "select k from t qualify rank() over (order by k) = 1"): @unchecked
    assert(inner ==
      "select k , (rank() over (order by k) = 1) AS __qualify__ from t ")
    assert(tail.isEmpty)
    intercept[IllegalArgumentException] {
      Dialect.splitQualify("select distinct k from t qualify rn = 1")
    }
  }

  test("splitQualify / keyword scan: comments and backticks never split") {
    // a -- comment containing 'qualify' must not trigger a split
    assert(Dialect.splitQualify(
      "select k from t -- no qualify here\nwhere k > 1").isEmpty)
    assert(Dialect.splitQualify(
      "select k from t /* qualify rn = 1 */ where k > 1").isEmpty)
    // a backticked identifier named `qualify` is data, not a keyword
    assert(Dialect.splitQualify("select `qualify` from t").isEmpty)
    // a real QUALIFY with a comment containing 'order' after it: the
    // tail split must key on the real ORDER BY, not the comment text
    val Some((inner, tail)) = Dialect.splitQualify(
      "select k from t qualify rank() over (order by k) = 1 " +
        "/* order nothing */ order by k"): @unchecked
    assert(tail.trim == "order by k")
    assert(inner.contains("__qualify__"))
  }

  test("stripLiterals: backslash escapes and nested block comments (documented contract)") {
    def mask(s: String): String = Dialect.stripLiterals(s)
    // `'it\'s'` is ONE literal (Spark's default escaped-string parsing);
    // the escaped quote must not end the mask early and expose ` from`
    val src = "select 'it\\'s from x' as s from t"
    val esc = mask(src)
    assert(esc.length == src.length, "mask must be length-preserving")
    assert(esc.contains(" as s from t"))
    assert(!esc.contains("from x"))
    // the keyword scanner consequently sees only the REAL from
    assert(Dialect.firstFromTable("select 'it\\'s from x' as s from t")
      .contains("t"))
    // '' doubling stays inside the literal content-wise
    assert(Dialect.firstFromTable("select 'a''b from x' from t2").contains("t2"))
    // backslash escape inside double quotes too
    assert(Dialect.firstFromTable("select \"a\\\" from x\" from t3").contains("t3"))
    // nested block comments: /* /* */ */ is ONE comment on both engines;
    // the inner close must not drop the scanner back into code state
    val nested = "select k from t4 /* outer /* inner */ still comment from x */ where k > 0"
    assert(Dialect.firstFromTable(nested).contains("t4"))
    assert(mask(nested).contains("where k > 0"))
    assert(!mask(nested).contains("still"))
    // and the QUALIFY scanner ignores keyword-laden nested comments
    assert(Dialect.splitQualify(
      "select k from t /* a /* qualify rn=1 */ b */ where k > 1").isEmpty)
  }

  test("expandStarExclude: all occurrences, backticked and quoted names") {
    val cols = Seq("doc_id", "text", "lang")
    // every occurrence is rewritten, not just the first (UNION arms)
    val u = Dialect.expandStarExclude(
      "select * EXCLUDE (lang) from a union all select * EXCLUDE (text) from b",
      cols)
    assert(u ==
      "select `doc_id`, `text` from a union all select `doc_id`, `lang` from b")
    // backtick- and double-quote-quoted excluded names resolve
    assert(Dialect.expandStarExclude(
      "select * exclude (`lang`, \"text\") from t", cols) ==
      "select `doc_id` from t")
    // a double-quoted identifier CONTAINING the pattern is not rewritten
    assert(Dialect.expandStarExclude(
      "select \"* exclude (a)\" from t", cols) ==
      "select \"* exclude (a)\" from t")
  }

  test("expandStarReplace: swaps named columns, nested parens, all occurrences") {
    val cols = Seq("doc_id", "text", "lang")
    assert(Dialect.expandStarReplace(
      "select * replace (upper(lang) as lang) from t", cols) ==
      "select `doc_id`, `text`, (upper(lang)) AS `lang` from t")
    // nested parens + commas inside the replacement expression
    assert(Dialect.expandStarReplace(
      "select * REPLACE (round(substr(text, 1, 3), 2) AS text) from t", cols) ==
      "select `doc_id`, (round(substr(text, 1, 3), 2)) AS `text`, `lang` from t")
    // every occurrence (UNION arms)
    val u = Dialect.expandStarReplace(
      "select * replace (1 as doc_id) from a union all " +
        "select * replace (2 as lang) from b", cols)
    assert(u.contains("(1) AS `doc_id`") && u.contains("(2) AS `lang`"))
    // unknown name and malformed item are loud errors
    intercept[IllegalArgumentException] {
      Dialect.expandStarReplace("select * replace (1 as nope) from t", cols)
    }
    intercept[IllegalArgumentException] {
      Dialect.expandStarReplace("select * replace (doc_id + 1) from t", cols)
    }
    // untouched without the modifier or inside literals
    assert(Dialect.expandStarReplace("select count(*) from t", cols) ==
      "select count(*) from t")
    assert(Dialect.expandStarReplace("select '* replace (x as y)' s from t", cols) ==
      "select '* replace (x as y)' s from t")
  }

  test("expandStarRename: renames in place, all occurrences, loud errors") {
    val cols = Seq("doc_id", "text", "lang")
    assert(Dialect.expandStarRename(
      "select * rename (lang as language) from t", cols) ==
      "select `doc_id`, `text`, `lang` AS `language` from t")
    assert(Dialect.expandStarRename(
      "select * RENAME (doc_id AS id, text AS body) from t", cols) ==
      "select `doc_id` AS `id`, `text` AS `body`, `lang` from t")
    // every occurrence (UNION arms)
    val u = Dialect.expandStarRename(
      "select * rename (text as a) from x union all " +
        "select * rename (lang as b) from y", cols)
    assert(u.contains("`text` AS `a`") && u.contains("`lang` AS `b`"))
    // unknown name, expression on the left, malformed item: loud errors
    intercept[IllegalArgumentException] {
      Dialect.expandStarRename("select * rename (nope as x) from t", cols)
    }
    intercept[IllegalArgumentException] {
      Dialect.expandStarRename("select * rename (upper(lang) as x) from t", cols)
    }
    // untouched without the modifier or inside literals
    assert(Dialect.expandStarRename("select count(*) from t", cols) ==
      "select count(*) from t")
    assert(Dialect.expandStarRename("select '* rename (x as y)' s from t", cols) ==
      "select '* rename (x as y)' s from t")
  }

  test("distinctOn: golden lowering, WITH prefix, LIMIT tail") {
    val got = Dialect.distinctOn(
      "SELECT DISTINCT ON (k) k, v FROM t WHERE v > 0 ORDER BY k, ts DESC")
    assert(got === Some("SELECT k, v FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY k ORDER BY k, ts DESC) AS __don__ FROM t WHERE v > 0 ) " +
      "WHERE __don__ = 1 ORDER BY k, ts DESC "))
    // CTE prefix stays in front of the outer query; LIMIT tail survives
    val cte = Dialect.distinctOn("WITH x AS (SELECT 1 AS k) " +
      "SELECT DISTINCT ON (k) k FROM x ORDER BY k LIMIT 3").get
    assert(cte.startsWith("WITH x AS (SELECT 1 AS k) SELECT k FROM ("))
    assert(cte.endsWith("ORDER BY k LIMIT 3"))
    // composite keys pass through verbatim
    val comp = Dialect.distinctOn(
      "SELECT DISTINCT ON (a, b % 2) a, b FROM t ORDER BY a, b").get
    assert(comp.contains("PARTITION BY a, b % 2"))
  }

  test("distinctOn: non-triggering forms and loud requirements") {
    // plain DISTINCT, literals, and subquery heads never trigger
    assert(Dialect.distinctOn("SELECT DISTINCT k FROM t ORDER BY k").isEmpty)
    assert(Dialect.distinctOn("SELECT 'distinct on (k)' AS s FROM t").isEmpty)
    assert(Dialect.distinctOn(
      "SELECT n FROM (SELECT DISTINCT ON (k) k AS n FROM t ORDER BY k) q")
      .isEmpty)
    // missing ORDER BY is an error, not a silent arbitrary pick
    val e = intercept[IllegalArgumentException] {
      Dialect.distinctOn("SELECT DISTINCT ON (k) k, v FROM t")
    }
    assert(e.getMessage.contains("ORDER BY"))
    intercept[IllegalArgumentException] {
      Dialect.distinctOn(
        "SELECT DISTINCT ON (k) k FROM t GROUP BY k ORDER BY k")
    }
    intercept[IllegalArgumentException] {
      Dialect.distinctOn("SELECT DISTINCT ON (k) k FROM t " +
        "QUALIFY row_number() OVER (ORDER BY k) = 1 ORDER BY k")
    }
    // ordinal sorts resolve as CONSTANTS inside a window spec — rejected
    val ord = intercept[IllegalArgumentException] {
      Dialect.distinctOn("SELECT DISTINCT ON (k) k, v FROM t ORDER BY 1, 2")
    }
    assert(ord.getMessage.contains("ordinal"))
    // set operations would get the __don__ column on one branch only
    intercept[IllegalArgumentException] {
      Dialect.distinctOn("SELECT DISTINCT ON (k) k FROM a " +
        "UNION ALL SELECT k FROM b ORDER BY k")
    }
  }

  test("aliasesIntoWhere strips a DISTINCT ON head from the alias expression") {
    val got = Dialect.aliasesIntoWhere(
      "SELECT DISTINCT ON (k) v AS dv FROM t WHERE dv > 0 ORDER BY k")
    assert(got.contains("WHERE (v) > 0"), got)
    assert(!got.toLowerCase.contains("(on"), got)
  }

  test("fromFirst: bare FROM, FROM..SELECT..WHERE reorder, WITH and SELECT-first untouched") {
    assert(Dialect.fromFirst("FROM t").contains("SELECT * FROM t"))
    assert(Dialect.fromFirst("FROM t WHERE a > 1 ORDER BY a")
      .contains("SELECT * FROM t WHERE a > 1 ORDER BY a"))
    assert(Dialect.fromFirst("FROM t SELECT a, b WHERE a > 1 LIMIT 3")
      .contains("SELECT a, b FROM t WHERE a > 1 LIMIT 3"))
    assert(Dialect.fromFirst("FROM t SELECT DISTINCT a ORDER BY a")
      .contains("SELECT DISTINCT a FROM t ORDER BY a"))
    // joins stay inside the from-part
    assert(Dialect.fromFirst("FROM a JOIN b ON a.k = b.k SELECT a.k WHERE b.v > 0")
      .contains("SELECT a.k FROM a JOIN b ON a.k = b.k WHERE b.v > 0"))
    assert(Dialect.fromFirst("SELECT a FROM t").isEmpty)
    assert(Dialect.fromFirst("WITH c AS (SELECT 1) FROM c").isEmpty)
    // 'from' inside a literal at statement head cannot trigger
    assert(Dialect.fromFirst("  'FROM t' ").isEmpty)
    // a SELECT inside a subquery is not the top-level select list
    assert(Dialect.fromFirst("FROM (SELECT a FROM t) s WHERE a > 0")
      .contains("SELECT * FROM (SELECT a FROM t) s WHERE a > 0"))
    // a later union arm's SELECT must NOT be pulled to the head: the
    // head gets SELECT * and the arm stays in place (review-caught)
    assert(Dialect.fromFirst("FROM t UNION ALL SELECT 1 AS x")
      .contains("SELECT * FROM t UNION ALL SELECT 1 AS x"))
    assert(Dialect.fromFirst(
      "FROM t WHERE a > 0 UNION ALL SELECT b FROM u WHERE c > 0")
      .contains("SELECT * FROM t WHERE a > 0 UNION ALL SELECT b FROM u WHERE c > 0"))
  }

  test("expandColumns: bare regex, wrapped aggregate, partial match, loud no-match") {
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    assert(Dialect.expandColumns("SELECT COLUMNS('_id') FROM t", cols) ==
      "SELECT `event_id`, `user_id` FROM t")
    assert(Dialect.expandColumns("SELECT min(COLUMNS('^user')) FROM t", cols) ==
      "SELECT min(`user_id`) AS `user_id` FROM t")
    // inside a string literal → untouched
    val lit = "SELECT 'COLUMNS(''x'')' AS s FROM t"
    assert(Dialect.expandColumns(lit, cols) == lit)
    // a column merely NAMED like the call → untouched (ident boundary)
    val ident = "SELECT my_columns FROM t"
    assert(Dialect.expandColumns(ident, cols) == ident)
    val e = intercept[IllegalArgumentException] {
      Dialect.expandColumns("SELECT COLUMNS('zzz') FROM t", cols)
    }
    assert(e.getMessage.contains("zzz"))
    // a parenthesized BARE call after a keyword is NOT a wrapped
    // aggregate: the keyword must never be captured as the function
    assert(Dialect.expandColumns("SELECT (COLUMNS('_id')) FROM t", cols) ==
      "SELECT (`event_id`, `user_id`) FROM t")
    assert(Dialect.expandColumns(
      "SELECT a FROM t WHERE a IN (COLUMNS('^user')) ", cols) ==
      "SELECT a FROM t WHERE a IN (`user_id`) ")
    // star-modifier form (r18): COLUMNS(*) and COLUMNS(* EXCLUDE (…))
    assert(Dialect.expandColumns("SELECT COLUMNS(*) FROM t", cols) ==
      "SELECT `event_id`, `ts`, `user_id`, `event_type` FROM t")
    assert(Dialect.expandColumns(
      "SELECT COLUMNS(* EXCLUDE (ts, event_type)) FROM t", cols) ==
      "SELECT `event_id`, `user_id` FROM t")
    assert(intercept[IllegalArgumentException](Dialect.expandColumns(
      "SELECT COLUMNS(* EXCLUDE (nope)) FROM t", cols)).getMessage
      .contains("not in the table"))
    // lambda form without a bound session refuses with a pointer
    assert(intercept[IllegalArgumentException](Dialect.expandColumns(
      "SELECT COLUMNS(c -> c LIKE '%id') FROM t", cols)).getMessage
      .contains("bound session"))
    assert(!Dialect.hasDynamicColumns(lit))
    assert(Dialect.hasDynamicColumns("SELECT COLUMNS('a') FROM t"))
    // an outer alias on a WRAPPED call has no well-defined meaning (the
    // expansion names outputs by source column) — rejected loudly, both
    // the AS form and the bare-identifier form; clause keywords after
    // the wrapper are NOT aliases
    val ea = intercept[IllegalArgumentException] {
      Dialect.expandColumns("SELECT min(COLUMNS('^user')) AS x FROM t", cols)
    }
    assert(ea.getMessage.contains("outer alias"))
    val eb = intercept[IllegalArgumentException] {
      Dialect.expandColumns("SELECT min(COLUMNS('^user')) x FROM t", cols)
    }
    assert(eb.getMessage.contains("outer alias"))
    assert(Dialect.expandColumns(
      "SELECT min(COLUMNS('^user')) FROM t ORDER BY 1", cols) ==
      "SELECT min(`user_id`) AS `user_id` FROM t ORDER BY 1")
  }

  test("splitUnionByName: operands, ALL flags, union-level trailing clause") {
    val (ops, flags, tail) = Dialect.splitUnionByName(
      """SELECT a, b FROM t1
        |UNION ALL BY NAME
        |(SELECT c, a FROM t2)
        |UNION BY NAME
        |SELECT b FROM t3
        |ORDER BY a LIMIT 5""".stripMargin).get
    assert(ops.map(_.trim) == Seq("SELECT a, b FROM t1",
      "SELECT c, a FROM t2", "SELECT b FROM t3"))
    assert(flags == Seq(true, false))
    assert(tail == "ORDER BY a LIMIT 5")
    // no BY NAME anywhere → None, statement untouched
    assert(Dialect.splitUnionByName(
      "SELECT a FROM t1 UNION ALL SELECT a FROM t2").isEmpty)
    // positional arm parenthesized → its inner union is NOT top level
    val (ops2, _, _) = Dialect.splitUnionByName(
      "(SELECT a FROM t1 UNION ALL SELECT a FROM t2) UNION ALL BY NAME SELECT a FROM t3").get
    assert(ops2.head.trim.startsWith("SELECT a FROM t1 UNION ALL"))
  }

  test("splitUnionByName guardrails: mixed positional set ops and WITH reject") {
    intercept[IllegalArgumentException] {
      Dialect.splitUnionByName(
        "SELECT a FROM t1 UNION ALL BY NAME SELECT a FROM t2 UNION ALL SELECT a FROM t3")
    }
    intercept[IllegalArgumentException] {
      Dialect.splitUnionByName(
        "SELECT a FROM t1 UNION ALL BY NAME SELECT a FROM t2 EXCEPT SELECT a FROM t3")
    }
    intercept[IllegalArgumentException] {
      Dialect.splitUnionByName(
        "WITH c AS (SELECT 1 AS a) SELECT a FROM c UNION ALL BY NAME SELECT a FROM c")
    }
    // BY NAME text inside a literal never triggers the split
    assert(Dialect.splitUnionByName(
      "SELECT 'UNION ALL BY NAME' AS s FROM t1").isEmpty)
  }

  test("ordered aggregates (q67): WITHIN GROUP / struct-sort lowering, " +
    "refusals, non-aggregate ORDER BY untouched") {
    // string_agg with inline ORDER BY (any direction) -> native listagg
    assert(Dialect.rewriteOrderedAggs(
      "SELECT string_agg(s, '|' ORDER BY s DESC) FROM t GROUP BY k") ==
      "SELECT listagg(s, '|') WITHIN GROUP (ORDER BY s DESC) FROM t " +
        "GROUP BY k")
    // separator defaults to ',' (DuckDB's)
    assert(Dialect.rewriteOrderedAggs(
      "SELECT listagg(s ORDER BY o) FROM t") ==
      "SELECT listagg(s, ',') WITHIN GROUP (ORDER BY o) FROM t")
    // array_agg -> struct sort; a trailing ASC strips
    assert(Dialect.rewriteOrderedAggs(
      "SELECT array_agg(s ORDER BY o ASC, s) FROM t") ==
      "SELECT transform(array_sort(collect_list(struct((o) AS __o0, " +
        "(s) AS __o1, (s) AS __ov))), __oa -> __oa.__ov) FROM t")
    // refusals: DESC / NULLS on the struct path
    assert(intercept[IllegalArgumentException](Dialect.rewriteOrderedAggs(
      "SELECT array_agg(s ORDER BY o DESC) FROM t")).getMessage
      .contains("ASC keys only"))
    assert(intercept[IllegalArgumentException](Dialect.rewriteOrderedAggs(
      "SELECT list(s ORDER BY o NULLS LAST) FROM t")).getMessage
      .contains("ASC keys only"))
    // an ORDER BY outside the aggregate parens never triggers
    val plain = "SELECT array_agg(s) FROM t GROUP BY k ORDER BY k"
    assert(Dialect.rewriteOrderedAggs(plain) == plain)
    // ORDER not followed by BY inside the args is content, not a sort
    val noBy = "SELECT string_agg(s, order_col) FROM t"
    assert(Dialect.rewriteOrderedAggs(noBy) == noBy)
    // DISTINCT inside an ordered aggregate (r18): sort key = argument
    // lowers onto the sorted set; DESC is legal HERE (keys are values)
    assert(Dialect.rewriteOrderedAggs(
      "SELECT array_agg(DISTINCT s ORDER BY s) FROM t") ==
      "SELECT array_sort(collect_set(s)) FROM t")
    assert(Dialect.rewriteOrderedAggs(
      "SELECT list(DISTINCT s ORDER BY s DESC) FROM t") ==
      "SELECT reverse(array_sort(collect_set(s))) FROM t")
    assert(Dialect.rewriteOrderedAggs(
      "SELECT string_agg(DISTINCT s, '|' ORDER BY s) FROM t") ==
      "SELECT (CASE WHEN size(collect_set(s)) = 0 THEN " +
        "CAST(NULL AS STRING) ELSE array_join(array_sort(collect_set(s))" +
        ", '|') END) FROM t")
    // … and the Postgres/DuckDB rule pins the refusal matrix: a
    // non-argument sort key has no defined value per dedup'd element
    assert(intercept[IllegalArgumentException](Dialect.rewriteOrderedAggs(
      "SELECT array_agg(DISTINCT s ORDER BY o) FROM t")).getMessage
      .contains("must be the DISTINCT argument"))
    assert(intercept[IllegalArgumentException](Dialect.rewriteOrderedAggs(
      "SELECT string_agg(DISTINCT s, ',' ORDER BY s, o) FROM t"))
      .getMessage.contains("ONE sort key"))
    assert(intercept[IllegalArgumentException](Dialect.rewriteOrderedAggs(
      "SELECT list(DISTINCT s ORDER BY s NULLS LAST) FROM t")).getMessage
      .contains("no NULLs to place"))
  }

  test("pattern operators (q68): SIMILAR TO / GLOB lower onto anchored " +
    "RLIKE; NOT rides; identifiers never trigger") {
    assert(Dialect.rewriteSimilarGlob(
      "SELECT s SIMILAR TO '(a|b)c' FROM t") ==
      "SELECT s RLIKE '^(?:(a|b)c)$' FROM t")
    // backslashes double for Spark's literal-escape layer
    assert(Dialect.rewriteSimilarGlob(
      "SELECT s SIMILAR TO '\\d+' FROM t") ==
      "SELECT s RLIKE '^(?:\\\\d+)$' FROM t")
    // NOT stays in place (Spark accepts NOT RLIKE)
    assert(Dialect.rewriteSimilarGlob(
      "SELECT s NOT SIMILAR TO 'x.*' FROM t") ==
      "SELECT s NOT RLIKE '^(?:x.*)$' FROM t")
    // glob translation: * ? [..] [!..] + regex-special escaping
    assert(Dialect.rewriteSimilarGlob(
      "SELECT s GLOB 'f*.t?t' FROM t") ==
      "SELECT s RLIKE '^(?:f.*\\\\.t.t)$' FROM t")
    assert(Dialect.rewriteSimilarGlob(
      "SELECT s GLOB 'a[!xy]c' FROM t") ==
      "SELECT s RLIKE '^(?:a[^xy]c)$' FROM t")
    // a column named glob / an alias named similar never trigger
    val g = "SELECT glob FROM t WHERE glob = 1"
    assert(Dialect.rewriteSimilarGlob(g) == g)
    val sAlias = "SELECT x AS similar FROM t"
    assert(Dialect.rewriteSimilarGlob(sAlias) == sAlias)
    // SIMILAR TO with a non-literal pattern refuses loudly
    assert(intercept[IllegalArgumentException](Dialect.rewriteSimilarGlob(
      "SELECT s SIMILAR TO p FROM t")).getMessage
      .contains("quoted literal"))
    // pattern text inside an unrelated literal never triggers
    val lit = "SELECT 'x SIMILAR TO y' AS s FROM t"
    assert(Dialect.rewriteSimilarGlob(lit) == lit)
    // SQL doubled-quote escape inside the pattern: the scan must not
    // truncate at the inner quote and splice leftovers back in
    assert(Dialect.rewriteSimilarGlob(
      "SELECT s SIMILAR TO 'it''s' FROM t") ==
      "SELECT s RLIKE '^(?:it''s)$' FROM t")
    assert(Dialect.rewriteSimilarGlob(
      "SELECT s GLOB 'it''s*' FROM t") ==
      "SELECT s RLIKE '^(?:it''s.*)$' FROM t")
  }

  test("subscripts (q69): bracket access lowers onto 1-based " +
    "try_element_at; slices refuse; literals/array-literals untouched") {
    assert(Dialect.rewriteSubscripts("SELECT l[1] FROM t") ==
      "SELECT try_element_at(l, CAST(1 AS INT)) FROM t")
    // qualified receiver, expression index (Spark needs INT, DuckDB
    // types integer arithmetic BIGINT — hence the cast), negative index
    assert(Dialect.rewriteSubscripts("SELECT t.arr[i + 1] FROM t") ==
      "SELECT try_element_at(t.arr, CAST(i + 1 AS INT)) FROM t")
    assert(Dialect.rewriteSubscripts("SELECT l[-1] FROM t") ==
      "SELECT try_element_at(l, CAST(-1 AS INT)) FROM t")
    // function-call and parenthesized receivers
    assert(Dialect.rewriteSubscripts(
      "SELECT string_split(s, ' ')[2] FROM t") ==
      "SELECT try_element_at(string_split(s, ' '), CAST(2 AS INT)) FROM t")
    assert(Dialect.rewriteSubscripts("SELECT (l)[1] FROM t") ==
      "SELECT try_element_at((l), CAST(1 AS INT)) FROM t")
    // chained subscripts nest
    assert(Dialect.rewriteSubscripts("SELECT ll[1][2] FROM t") ==
      "SELECT try_element_at(try_element_at(ll, CAST(1 AS INT)), " +
        "CAST(2 AS INT)) FROM t")
    // map key subscript rides the same lowering
    assert(Dialect.rewriteSubscripts("SELECT m['k'] FROM t") ==
      "SELECT try_element_at(m, 'k') FROM t")
    // literal 0 index: DuckDB yields NULL, Spark throws — NULL index
    assert(Dialect.rewriteSubscripts("SELECT l[0] FROM t") ==
      "SELECT try_element_at(l, CAST(NULL AS INTEGER)) FROM t")
    // slices lower onto slice() with normalize/clamp arithmetic
    assert(Dialect.rewriteSubscripts("SELECT l[2:3] FROM t") ==
      "SELECT slice(l, CAST(greatest((CASE WHEN (2) < 0 THEN size(l) + " +
        "(2) + 1 ELSE (2) END), 1) AS INT), CAST(greatest(least((CASE " +
        "WHEN (3) < 0 THEN size(l) + (3) + 1 ELSE (3) END), size(l)) - " +
        "greatest((CASE WHEN (2) < 0 THEN size(l) + (2) + 1 ELSE (2) " +
        "END), 1) + 1, 0) AS INT)) FROM t")
    // omitted bounds default to 1 / size(l)
    assert(Dialect.rewriteSubscripts("SELECT l[:2] FROM t")
      .contains("slice(l, CAST(greatest(1, 1) AS INT)"))
    assert(Dialect.rewriteSubscripts("SELECT l[2:] FROM t")
      .contains("least(size(l), size(l))"))
    // a '::' cast inside the index is NOT a slice separator
    assert(Dialect.rewriteSubscripts("SELECT l[i::INT] FROM t") ==
      "SELECT try_element_at(l, CAST(i::INT AS INT)) FROM t")
    // brackets inside string literals are data (GLOB patterns etc.)
    val g = "SELECT s GLOB '*g[ei]*' FROM t"
    assert(Dialect.rewriteSubscripts(g) == g)
    // list literals (r18): bare and ARRAY-keyword spellings → array();
    // nested groups re-enter; a chained subscript applies on top
    assert(Dialect.rewriteSubscripts("SELECT [1, 2, 3] FROM t") ==
      "SELECT array(1, 2, 3) FROM t")
    assert(Dialect.rewriteSubscripts("SELECT ARRAY[1, 2, 3] FROM t") ==
      "SELECT array(1, 2, 3) FROM t")
    assert(Dialect.rewriteSubscripts("SELECT [[1, 2], [3]] FROM t") ==
      "SELECT array(array(1, 2), array(3)) FROM t")
    assert(Dialect.rewriteSubscripts("SELECT ['a', 'b'][2] FROM t") ==
      "SELECT try_element_at(array('a', 'b'), CAST(2 AS INT)) FROM t")
    // a keyword is never a subscript receiver: `IN [..]` is a literal
    assert(Dialect.rewriteSubscripts("SELECT [1] FROM t WHERE x = 1") ==
      "SELECT array(1) FROM t WHERE x = 1")
    // a bracket group with a top-level comma after a REAL receiver is
    // not a subscript (x[1,2] has no meaning — left for loud refusal)
    val al = "SELECT x[1, 2] FROM t"
    assert(Dialect.rewriteSubscripts(al) == al)
    // no brackets → untouched text identity
    val plain = "SELECT a FROM t"
    assert(Dialect.rewriteSubscripts(plain) eq plain)
  }

  test("struct/map literals and list comprehensions (q70/q71) lower " +
    "onto named_struct/map/transform") {
    // struct literal → named_struct; nested values re-enter
    assert(Dialect.rewriteStructLiterals("SELECT {'a': 1, 'b': x} FROM t")
      == "SELECT named_struct('a', 1, 'b', x) FROM t")
    assert(Dialect.rewriteStructLiterals("SELECT {'a': {'b': 2}} FROM t")
      == "SELECT named_struct('a', named_struct('b', 2)) FROM t")
    // MAP literal → map(); arbitrary expression keys; empty map legal
    assert(Dialect.rewriteStructLiterals(
      "SELECT MAP {'a': 1, 'b': 2} FROM t")
      == "SELECT map('a', 1, 'b', 2) FROM t")
    assert(Dialect.rewriteStructLiterals(
      "SELECT MAP {upper(k): v + 1} FROM t")
      == "SELECT map(upper(k), v + 1) FROM t")
    assert(Dialect.rewriteStructLiterals("SELECT cardinality(MAP {}) AS n")
      == "SELECT cardinality(map()) AS n")
    // a QUALIFIED a.map name is not the keyword; bare {} refuses
    assert(intercept[IllegalArgumentException](
      Dialect.rewriteStructLiterals("SELECT {} FROM t")).getMessage
      .contains("empty struct literal"))
    // struct keys must be quoted; '::' casts in values survive
    assert(intercept[IllegalArgumentException](
      Dialect.rewriteStructLiterals("SELECT {a: 1} FROM t")).getMessage
      .contains("quoted literals"))
    assert(Dialect.rewriteStructLiterals("SELECT {'a': x::INT} FROM t")
      == "SELECT named_struct('a', x::INT) FROM t")
    // braces inside string literals are data
    val lit = "SELECT '{not: a struct}' FROM t"
    assert(Dialect.rewriteStructLiterals(lit) == lit)
    // list comprehensions (q71): map / filter+map; nested literals
    // re-enter; FOR/IN/IF inside strings or nested brackets inert
    assert(Dialect.rewriteSubscripts("SELECT [x + 1 FOR x IN l] FROM t")
      == "SELECT transform(l, x -> x + 1) FROM t")
    assert(Dialect.rewriteSubscripts(
      "SELECT [x * 2 FOR x IN [1, 2, 3] IF x % 2 = 0] FROM t")
      == "SELECT transform(filter(array(1, 2, 3), x -> x % 2 = 0), " +
        "x -> x * 2) FROM t")
    assert(Dialect.rewriteSubscripts(
      "SELECT [f(y, ',') FOR y IN string_split(s, ' ')] FROM t")
      == "SELECT transform(string_split(s, ' '), y -> f(y, ',')) FROM t")
    // a subscript composes on top of a comprehension
    assert(Dialect.rewriteSubscripts("SELECT [x FOR x IN l][1] FROM t")
      == "SELECT try_element_at(transform(l, x -> x), CAST(1 AS INT)) " +
        "FROM t")
  }

  test("power operator (q76): a ** b lowers onto power(a, b) with " +
    "DuckDB's associativity and unary-minus binding") {
    assert(Dialect.rewritePowerOp("SELECT 2 ** 10 FROM t") ==
      "SELECT power(2, 10) FROM t")
    // LEFT-associative: 2 ** 3 ** 2 = (2**3)**2 = 64 (probed)
    assert(Dialect.rewritePowerOp("SELECT 2 ** 3 ** 2 FROM t") ==
      "SELECT power(power(2, 3), 2) FROM t")
    // unary minus absorbs into the LEFT operand: -2 ** 2 = 4 (probed)
    assert(Dialect.rewritePowerOp("SELECT -2 ** 2 FROM t") ==
      "SELECT power(-2, 2) FROM t")
    // a BINARY minus stays outside: a - 2 ** 2 subtracts the power
    assert(Dialect.rewritePowerOp("SELECT a - 2 ** 2 FROM t") ==
      "SELECT a - power(2, 2) FROM t")
    // paren groups and function calls as operands
    assert(Dialect.rewritePowerOp("SELECT (x + 1) ** abs(y) FROM t") ==
      "SELECT power((x + 1), abs(y)) FROM t")
    // `*` and `**` never confuse; literals are data
    val mul = "SELECT a * b FROM t"
    assert(Dialect.rewritePowerOp(mul) == mul)
    val lit = "SELECT '2 ** 3' AS s FROM t"
    assert(Dialect.rewritePowerOp(lit) == lit)
    // // maps onto div in the token pass
    assert(Dialect.rewrite("SELECT 7 // 2 FROM t") ==
      "SELECT 7  div  2 FROM t")
  }

  test("series table functions (q75): FROM range / generate_series " +
    "lower onto derived tables; scalar calls stay") {
    assert(Dialect.rewriteSeriesTvf("SELECT sum(range) FROM range(100)")
      == "SELECT sum(range) FROM (SELECT id AS range FROM range(100))")
    assert(Dialect.rewriteSeriesTvf("SELECT * FROM generate_series(1, 5) g")
      == "SELECT * FROM (SELECT explode(generate_series(1, 5)) " +
        "AS generate_series) g")
    assert(Dialect.rewriteSeriesTvf(
      "SELECT * FROM t JOIN range(3) r ON r.range = t.x")
      == "SELECT * FROM t JOIN (SELECT id AS range FROM range(3)) r " +
        "ON r.range = t.x")
    // scalar generate_series in SELECT position: untouched
    val sc = "SELECT generate_series(1, 5) FROM t"
    assert(Dialect.rewriteSeriesTvf(sc) == sc)
    // inside a string literal: data
    val lit = "SELECT 'FROM range(3)' AS s FROM t"
    assert(Dialect.rewriteSeriesTvf(lit) == lit)
  }

  test("dot-call chaining (q73): recv.fn(args) lowers onto " +
    "fn(recv, args); qualified columns stay") {
    assert(Dialect.rewriteDotCalls("SELECT s.upper() FROM t") ==
      "SELECT upper(s) FROM t")
    assert(Dialect.rewriteDotCalls("SELECT (s).string_split(' ').len() FROM t")
      == "SELECT len(string_split((s), ' ')) FROM t")
    assert(Dialect.rewriteDotCalls("SELECT array(1, 2).size() FROM t") ==
      "SELECT size(array(1, 2)) FROM t")
    // qualified column WITHOUT a call: untouched
    val q = "SELECT t.col FROM t"
    assert(Dialect.rewriteDotCalls(q) == q)
    // qualified receiver chains through the qualifier
    assert(Dialect.rewriteDotCalls("SELECT t.s.lower() FROM t") ==
      "SELECT lower(t.s) FROM t")
    // decimal literals never chain; spaced parens stay qualified
    val d = "SELECT 1.5 FROM t"
    assert(Dialect.rewriteDotCalls(d) == d)
    val sp = "SELECT a.b (1) FROM t"
    assert(Dialect.rewriteDotCalls(sp) == sp)
    // inside a string literal: data
    val lit = "SELECT 'x.upper()' FROM t"
    assert(Dialect.rewriteDotCalls(lit) == lit)
  }

  test("IGNORE/RESPECT NULLS (w23): the in-parens DuckDB spelling " +
    "moves outside for Spark") {
    assert(Dialect.rewriteIgnoreNulls(
      "SELECT lag(b IGNORE NULLS) OVER (ORDER BY a) FROM t") ==
      "SELECT lag(b) IGNORE NULLS OVER (ORDER BY a) FROM t")
    assert(Dialect.rewriteIgnoreNulls(
      "SELECT nth_value(b, 2 RESPECT NULLS) OVER w FROM t") ==
      "SELECT nth_value(b, 2) RESPECT NULLS OVER w FROM t")
    // already-outside spelling and plain text ride through
    val out = "SELECT last_value(b) IGNORE NULLS OVER (ORDER BY a) FROM t"
    assert(Dialect.rewriteIgnoreNulls(out) == out)
    // inside a string literal: data
    val lit = "SELECT 'x IGNORE NULLS)' FROM t"
    assert(Dialect.rewriteIgnoreNulls(lit) == lit)
    // not directly before ')': untouched (the parser refuses)
    val mid = "SELECT f(a IGNORE NULLS, b) FROM t"
    assert(Dialect.rewriteIgnoreNulls(mid) == mid)
  }

  test("trailing commas (r18): DuckDB's tolerance matrix cell by cell") {
    // legal cells drop the comma
    assert(Dialect.stripTrailingCommas("SELECT a, b, FROM t") ==
      "SELECT a, b FROM t")
    assert(Dialect.stripTrailingCommas("SELECT a FROM t GROUP BY a, ORDER BY a")
      == "SELECT a FROM t GROUP BY a ORDER BY a")
    assert(Dialect.stripTrailingCommas("SELECT [1, 2, 3,] AS l") ==
      "SELECT [1, 2, 3] AS l")
    assert(Dialect.stripTrailingCommas("SELECT {'a': 1,} AS s") ==
      "SELECT {'a': 1} AS s")
    assert(Dialect.stripTrailingCommas("SELECT a FROM t WHERE a IN (1, 2,)")
      == "SELECT a FROM t WHERE a IN (1, 2)")
    // illegal cells keep the comma for the parser's own refusal
    val fn = "SELECT concat(a, b,) FROM t"
    assert(Dialect.stripTrailingCommas(fn) == fn)
    val eoi = "SELECT a FROM t ORDER BY a,"
    assert(Dialect.stripTrailingCommas(eoi) == eoi)
    // commas inside string literals are data
    val lit = "SELECT 'a, FROM' AS s FROM t"
    assert(Dialect.stripTrailingCommas(lit) == lit)
    // an IN-list close nested inside fn args resolves to ITS paren
    val nested = "SELECT f(x IN (1, 2,), y,) FROM t"
    assert(Dialect.stripTrailingCommas(nested) ==
      "SELECT f(x IN (1, 2), y,) FROM t")
  }

  test("splitStatements: paren-enclosed semicolons never split NOR " +
    "return the input unchanged (re-entry guard)") {
    // malformed text whose only ';' sits inside parens: None, not
    // Some(Seq(input)) — the latter makes sessionSql re-enter forever
    assert(Dialect.splitStatements("SELECT f(1;2)").isEmpty)
    assert(Dialect.splitStatements("SELECT 1").isEmpty)
    // real scripts still split; lone trailing ';' yields one statement
    assert(Dialect.splitStatements("SELECT 1; SELECT 2") ==
      Some(Seq("SELECT 1", "SELECT 2")))
    assert(Dialect.splitStatements("SELECT 1;") == Some(Seq("SELECT 1")))
    // a ';' inside a literal is content, not a separator
    assert(Dialect.splitStatements("SELECT ';' AS s").isEmpty)
  }
}
