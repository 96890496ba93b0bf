package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.api.Table

/** Registry function surface: every datetime unit, constants, casts —
  * ports of the reference's function goldens
  * (reference test_query_results.py:748-1181).
  */
class FunctionsSpec extends GraftSuite {
  import spark.implicits._

  private def one(sqlExpr: String) =
    Table(Seq(1).toDF("x")).sql(s"select $sqlExpr as r from t").toDF.collect()(0)

  test("pi() and e() constants") {
    assert(one("pi()").getDouble(0) == math.Pi)
    assert(one("e()").getDouble(0) == math.E)
  }

  test("np.* on-demand extensions: clip/where/round/rint/trunc/exp2/hypot") {
    assert(one("np.clip(7, 0, 5)").getInt(0) == 5)
    assert(one("np.clip(-3, 0, 5)").getInt(0) == 0)
    assert(one("np.where(x > 0, 'pos', 'neg')").getString(0) == "pos")
    // double casts: bare 2.345 parses as DECIMAL and Round/BRound would
    // answer in decimal (numpy semantics are float)
    assert(one("np.round(cast(2.345 as double), 2)").getDouble(0) == 2.35)
    // rint is half-to-even like numpy: 0.5 -> 0, 1.5 -> 2
    assert(one("np.rint(cast(0.5 as double))").getDouble(0) == 0.0)
    assert(one("np.rint(cast(1.5 as double))").getDouble(0) == 2.0)
    assert(one("np.trunc(2.9)").getDouble(0) == 2.0)
    assert(one("np.trunc(-2.9)").getDouble(0) == -2.0)
    assert(one("np.exp2(10)").getDouble(0) == 1024.0)
    assert(one("np.hypot(3, 4)").getDouble(0) == 5.0)
  }

  test("np.* round-9 extensions: arithmetic / bitwise / predicates, numpy semantics") {
    assert(one("np.add(2, 3)").getInt(0) == 5)
    assert(one("np.subtract(2, 3)").getInt(0) == -1)
    assert(one("np.multiply(4, 3)").getInt(0) == 12)
    // true_divide is ALWAYS float division, even on ints (numpy)
    assert(one("np.true_divide(7, 2)").getDouble(0) == 3.5)
    assert(one("np.divide(7, 2)").getDouble(0) == 3.5)
    // floor_divide FLOORS (numpy), where SQL div truncates toward zero
    assert(one("np.floor_divide(7, 2)").getLong(0) == 3L)
    assert(one("np.floor_divide(-7, 2)").getLong(0) == -4L)
    assert(one("np.copysign(3, -1)").getDouble(0) == -3.0)
    assert(one("np.copysign(-3, 1)").getDouble(0) == 3.0)
    // the sign BIT transfers: negative zero is negative (numpy/IEEE-754)
    assert(one("np.copysign(3, -0.0d)").getDouble(0) == -3.0)
    assert(one("np.copysign(3, 0.0d)").getDouble(0) == 3.0)
    // floor_divide output type follows numpy: int//int long, float in → double
    assert(one("np.floor_divide(-7.0d, 2)").getDouble(0) == -4.0)
    assert(one("np.floor_divide(7, 2.0d)").getDouble(0) == 3.0)
    assert(one("np.floor_divide(1, 0)").isNullAt(0)) // SQL-null div-by-zero
    // int//int is EXACT long arithmetic — a double round-trip would be
    // off by one above 2^53 (9007199254740995 rounds to ...996 as double)
    assert(one("np.floor_divide(9007199254740995L, 2)").getLong(0)
      == 4503599627370497L)
    assert(one("np.floor_divide(-9007199254740995L, 2)").getLong(0)
      == -4503599627370498L) // floors, not truncates, at full precision
    assert(math.abs(one("np.logaddexp(cast(0 as double), cast(0 as double))")
      .getDouble(0) - math.log(2.0)) < 1e-12)
    // stable form: the naive log(exp(a)+exp(b)) overflows past ~709 and
    // underflows to max(a,b) exactly for separated operands
    assert(math.abs(one("np.logaddexp(1000.0d, 1000.0d)").getDouble(0)
      - (1000.0 + math.log(2.0))) < 1e-9)
    assert(math.abs(one("np.logaddexp(-1000.0d, -1001.0d)").getDouble(0)
      - (-1000.0 + math.log1p(math.exp(-1.0)))) < 1e-9)
    assert(math.abs(one("np.logaddexp(0.0d, 710.0d)").getDouble(0) - 710.0)
      < 1e-9)
    assert(one("np.logaddexp(cast('-Infinity' as double), cast('-Infinity' as double))")
      .getDouble(0).isNegInfinity)
    assert(one("np.logaddexp(cast('Infinity' as double), 3.0d)")
      .getDouble(0).isPosInfinity)
    assert(one("np.bitwise_and(12, 10)").getInt(0) == 8)
    assert(one("np.bitwise_or(12, 10)").getInt(0) == 14)
    assert(one("np.bitwise_xor(12, 10)").getInt(0) == 6)
    assert(one("np.invert(0)").getInt(0) == -1)
    assert(one("np.left_shift(1, 10)").getInt(0) == 1024)
    assert(one("np.right_shift(1024, 3)").getInt(0) == 128)
    assert(one("np.positive(-5)").getInt(0) == -5)
    assert(one("np.isinf(cast('Infinity' as double))").getBoolean(0))
    assert(!one("np.isinf(cast(1 as double))").getBoolean(0))
    assert(one("np.isfinite(cast(1 as double))").getBoolean(0))
    assert(!one("np.isfinite(cast('NaN' as double))").getBoolean(0))
    assert(!one("np.isfinite(cast('-Infinity' as double))").getBoolean(0))
  }

  test("np.percentile (0-100) and np.quantile (0-1) interpolate like numpy 'linear'") {
    val r = spark.sql(
      """SELECT np_percentile(x, 25) p25, np_quantile(x, 0.5) q50,
                np_percentile(x, 90) p90
         FROM VALUES (1.0), (2.0), (3.0), (4.0) AS t(x)""").head
    // numpy.percentile([1,2,3,4], 25) = 1.75 (linear), 50 -> 2.5, 90 -> 3.7
    assert(r.getDouble(0) == 1.75)
    assert(r.getDouble(1) == 2.5)
    assert(math.abs(r.getDouble(2) - 3.7) < 1e-12)
  }

  test("np.std/np.var are POPULATION moments (ddof=0) and np.median is exact") {
    val r = spark.sql(
      """SELECT np_std(x) s, np_var(x) v, np_median(x) m
         FROM VALUES (1.0), (2.0), (3.0), (4.0) AS t(x)""").head
    assert(math.abs(r.getDouble(1) - 1.25) < 1e-12,     // sample var would be 5/3
      s"population variance expected 1.25, got ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(0) - math.sqrt(1.25)) < 1e-12)
    assert(r.getDouble(2) == 2.5)
  }

  test("now() is within tolerance of the JVM clock (reference :1568-1582)") {
    val got = one("cast(now() as long)").getLong(0)
    assert(math.abs(got - System.currentTimeMillis() / 1000) < 60)
  }

  test("now() truncates to whole seconds (reference :25-33)") {
    // micros of the truncated now() must be an exact multiple of 1e6
    val micros = one("unix_micros(now())").getLong(0)
    assert(micros % 1000000L == 0L)
  }

  test("datetime epoch units s/ms/us/ns/m/h/D agree") {
    val r = Table(Seq(1).toDF("x")).sql(
      """select datetime(1500000000, 's') s, datetime(1500000000000, 'ms') ms,
                datetime(1500000000000000, 'us') us,
                datetime(1500000000000000000, 'ns') ns,
                datetime(25000000, 'm') m, datetime(416666, 'h') h,
                datetime(17361, 'D') d from t""").toDF.collect()(0)
    val exp = Timestamp.valueOf("2017-07-14 02:40:00")
    assert(r.getTimestamp(0) == exp)
    assert(r.getTimestamp(1) == exp)
    assert(r.getTimestamp(2) == exp)
    assert(r.getTimestamp(3) == exp)
    assert(r.getTimestamp(4) == exp) // 25e6 min == 1.5e9 s exactly
    assert(r.getTimestamp(5) == Timestamp.valueOf("2017-07-14 02:00:00"))
    // unit 'D' yields a DATE: datetime64[D] maps to date32 in the reference
    assert(r.getDate(6) == java.sql.Date.valueOf("2017-07-14"))
  }

  test("datetime(str, unit) parses then truncates to the unit (reference :34-120)") {
    assert(one("datetime('2020-10-24 18:30:45.123456', 'D')").getDate(0) ==
      java.sql.Date.valueOf("2020-10-24"))
    assert(one("datetime('2020-10', 'D')").getDate(0) ==
      java.sql.Date.valueOf("2020-10-01"))
    assert(one("datetime('2020-10-24 18:30:45.123456', 's')").getTimestamp(0) ==
      Timestamp.valueOf("2020-10-24 18:30:45"))
    assert(one("datetime('2020-10-24 18:30:45.123456', 'ms')").getTimestamp(0) ==
      Timestamp.valueOf("2020-10-24 18:30:45.123"))
    assert(one("datetime('2020-10-24 18:30:45.123456', 'us')").getTimestamp(0) ==
      Timestamp.valueOf("2020-10-24 18:30:45.123456"))
    // 'ns' caps at Spark's native microsecond resolution
    assert(one("datetime('2020-10-24 18:30:45.123456', 'ns')").getTimestamp(0) ==
      Timestamp.valueOf("2020-10-24 18:30:45.123456"))
    // date-typed input truncates the same way
    assert(one("datetime(timestamp'2021-03-04 05:06:07', 'D')").getDate(0) ==
      java.sql.Date.valueOf("2021-03-04"))
  }

  test("datetime parses full and partial ISO8601 strings (reference :999-1070)") {
    assert(one("datetime('2020-10-08T03:26:54')").getTimestamp(0) ==
      Timestamp.valueOf("2020-10-08 03:26:54"))
    assert(one("datetime('2020-10')").getTimestamp(0) ==
      Timestamp.valueOf("2020-10-01 00:00:00"))
    assert(one("datetime('2020')").getTimestamp(0) ==
      Timestamp.valueOf("2020-01-01 00:00:00"))
  }

  test("timedelta all units shift a timestamp correctly") {
    val base = "timestamp'2020-01-31 12:00:00'"
    def shifted(unit: String, n: Long) =
      one(s"$base + timedelta($n, '$unit')").getTimestamp(0)
    assert(shifted("Y", 1) == Timestamp.valueOf("2021-01-31 12:00:00"))
    assert(shifted("M", 1) == Timestamp.valueOf("2020-02-29 12:00:00")) // month-end clamp
    assert(shifted("W", 2) == Timestamp.valueOf("2020-02-14 12:00:00"))
    assert(shifted("D", 3) == Timestamp.valueOf("2020-02-03 12:00:00"))
    assert(shifted("h", 5) == Timestamp.valueOf("2020-01-31 17:00:00"))
    assert(shifted("m", 30) == Timestamp.valueOf("2020-01-31 12:30:00"))
    assert(shifted("s", 90) == Timestamp.valueOf("2020-01-31 12:01:30"))
    assert(shifted("ms", 1500) == Timestamp.valueOf("2020-01-31 12:00:01.5"))
    assert(shifted("us", 250) == Timestamp.valueOf("2020-01-31 12:00:00.00025"))
  }

  test("is_busday across a known week") {
    // 2026-08-10 is a Monday
    val days = (0 to 6).map(i => one(s"is_busday(date'2026-08-10' + $i)").getBoolean(0))
    assert(days == Seq(true, true, true, true, true, false, false))
  }

  test("date('now') equals current_date") {
    assert(one("date('now') = current_date()").getBoolean(0))
  }

  test("registerColumnFn: z-score whole-column UDF (reference README.rst:189-207)") {
    graft.functions.Registry.registerColumnFn(spark, "score", { case Seq(x) =>
      (x - graft.functions.Registry.wholeColumn(avg(x))) /
        graft.functions.Registry.wholeColumn(stddev_pop(x))
    })
    val got = Table(Seq(1.0, 2.0, 3.0).toDF("x"))
      .sql("select x, score(x) as z from t order by x").toDF
      .collect().map(_.getDouble(1))
    val exp = Seq(-1.224744871391589, 0.0, 1.224744871391589)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
    // two-column variant, invoked twice in one query like the reference doc
    val both = Table(Seq((1.0, 7.0), (2.0, 13.0), (3.0, 17.0)).toDF("x", "y"))
      .sql("select score(x) as zx, score(y) as zy from t order by zx").toDF.collect()
    assert(math.abs(both(0).getDouble(0) + 1.224744871391589) < 1e-12)
    assert(math.abs(both(0).getDouble(1) + 1.2977713690461004) < 1e-9)
  }

  test("registerColumnFn is case-insensitive and re-registration replaces") {
    graft.functions.Registry.registerColumnFn(spark, "cubeit",
      { case Seq(x) => x * x * x })
    assert(one("CUBEIT(cast(3.0 as double))").getDouble(0) == 27.0)
    graft.functions.Registry.registerColumnFn(spark, "CubeIt",
      { case Seq(x) => x * x })
    assert(one("cubeit(cast(3.0 as double))").getDouble(0) == 9.0)
  }

  test("round-5 function error paths surface as analysis-time failures") {
    graft.functions.Registry.registerAll(spark)
    val bogusForm = intercept[Exception] {
      spark.sql("select unicode_normalize('x', 'BOGUS')").collect()
    }
    assert(bogusForm.getMessage.contains("BOGUS") ||
      bogusForm.getMessage.toLowerCase.contains("enum"))
    val badArity = intercept[Exception] {
      spark.sql("select vec_sum(array(1.0d), 2)").collect()
    }
    assert(badArity.getMessage.contains("vec_sum"))
    val bloomArity = intercept[Exception] {
      spark.sql("select bloom_agg(xxhash64('x'))").collect()
    }
    assert(bloomArity.getMessage.contains("bloom_agg"))
  }

  test("BPE tokenizer: standard lowest-rank merge semantics, hand-checked") {
    import graft.functions.{Bpe, BpeVocab}
    val v = new BpeVocab(Bpe.EnglishMerges.toArray)
    // hand-derived under GPT-2-style BPE (all occurrences of the current
    // lowest-rank pair merge per round):
    //   the:  t,h,e -> th,e (r0) -> the (r1)
    //   and:  a,n,d -> an,d (r3) -> and (r4)
    //   standing: s,t,a,n,d,i,n,g -> in (r2) -> an (r3) -> and (r4)
    //             -> ing (r13) => s,t,and,ing
    //   order: o,r,d,e,r -> er (r5) -> or (r12) => or,d,er
    assert(v.tokenizeWord("the").toSeq == Seq("the"))
    assert(v.tokenizeWord("and").toSeq == Seq("and"))
    assert(v.tokenizeWord("standing").toSeq == Seq("s", "t", "and", "ing"))
    assert(v.tokenizeWord("order").toSeq == Seq("or", "d", "er"))
    assert(v.tokenizeWord("data").toSeq == Seq("d", "at", "a"))
    // all-occurrence merge in one round: "thth" merges BOTH (t,h) pairs
    assert(v.tokenizeWord("thth").toSeq == Seq("th", "th"))
    // self-overlapping pair merges left-to-right non-overlapping
    val vv = new BpeVocab(Array(("a", "a")))
    assert(vv.tokenizeWord("aaa").toSeq == Seq("aa", "a"))
    assert(vv.tokenizeWord("aaaa").toSeq == Seq("aa", "aa"))

    // column surface: count == tokens length, non-alnum separates,
    // uppercase folds, null -> null
    graft.functions.Registry.registerAll(spark)
    val df = Seq((1L, "The QUICK order, standing by."), (2L, null))
      .toDF("id", "t")
      .select(col("id"),
        graft.ops.TextAnalysis.bpeTokenCount(col("t")).as("n"),
        graft.ops.TextAnalysis.bpeTokens(col("t")).as("toks"))
      .orderBy(col("id")).collect()
    assert(df(0).getLong(1) == df(0).getSeq[String](2).length)
    assert(df(0).getSeq[String](2).startsWith(Seq("the", "q", "u", "i", "c", "k")))
    assert(df(1).isNullAt(1) && df(1).isNullAt(2))
  }

  test("minRollingFingerprint stable under distant edits, changed by near ones") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a + " omega"                 // append far from the minimum window (may or may not change)
    val c = "CHANGED beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1, a), (2, a), (3, c)).toDF("id", "t")
    val fps = df.select(graft.ops.TextAnalysis.minRollingFingerprint(col("t"), 3))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1)) // deterministic
    val short = Seq("one two").toDF("t")
      .select(graft.ops.TextAnalysis.minRollingFingerprint(col("t"), 8)).collect()(0)
    assert(!short.isNullAt(0)) // shorter-than-window documents hash wholesale
  }

  test("cms_estimate: never underestimates, overestimate within eps*N") {
    graft.functions.Registry.registerAll(spark)
    // 50 keys, counts 1..5 -> total 150; eps=0.2 gives width 10 << 50
    // keys, so collisions are real and the min-across-depth must save us
    (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(i.toLong)).toDF("k")
      .createOrReplaceTempView("cms_in")
    val r = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(k, CAST(0.2 AS DOUBLE),
                            CAST(0.9 AS DOUBLE), 7) AS s FROM cms_in),
              t AS (SELECT k, count(*) AS n FROM cms_in GROUP BY k)
         SELECT min(CAST(cms_estimate(s, k) >= n AS INT)) AS lo,
                max(cms_estimate(s, k) - n) AS maxover
         FROM t CROSS JOIN sk""").collect()(0)
    assert(r.getInt(0) == 1, "CMS underestimated a key")
    assert(r.getLong(1) <= 30L, s"overestimate ${r.getLong(1)} > eps*N = 30")
  }

  test("DuckDB list-surface aliases resolve onto native builtins (q65)") {
    assert(one("list_max(list_transform(generate_series(1, 4), v -> v * v))")
      .getInt(0) == 16)
    assert(one("list_min(list_filter(generate_series(1, 5), v -> v % 2 = 0))")
      .getInt(0) == 2)
    // guarded lowering (advice r16): DuckDB returns [] when the step's
    // direction cannot reach stop (incl. step 0), where a bare sequence
    // alias DESCENDED for (1, 0) and THREW for sign mismatches; NULL
    // bounds stay NULL (probed against DuckDB 1.x)
    assert(one("array_length(generate_series(1, 0))").getInt(0) == 0)
    assert(one("array_length(generate_series(1, 5, -1))").getInt(0) == 0)
    assert(one("array_length(generate_series(1, 5, 0))").getInt(0) == 0)
    assert(one("generate_series(5, 1, -2)").getList[Int](0)
      .toArray.toSeq == Seq(5, 3, 1))
    assert(one("generate_series(2, 2, -3)").getList[Int](0)
      .toArray.toSeq == Seq(2))
    assert(one("generate_series(1, NULL) IS NULL").getBoolean(0))
    assert(one("generate_series(NULL, 5, 1) IS NULL").getBoolean(0))
    assert(one("array_length(list_distinct(array(1, 2, 2, 3)))").getInt(0) == 3)
    assert(one("list_unique(array(1, 2, 2, 3))").getInt(0) == 3)
    // bracket subscripts are DuckDB 1-based since the q69 rewrite
    assert(one("list_sort(array(3, 1, 2))[1]").getInt(0) == 1)
    assert(one("list_reverse_sort(array(3, 1, 2))[1]").getInt(0) == 3)
    assert(one("list_contains(array('a', 'b'), 'b')").getBoolean(0))
    assert(one("list_append(array(1), 2)[2]").getInt(0) == 2)
    assert(one("list_prepend(0, array(1))[1]").getInt(0) == 0)
    assert(one("array_length(list_concat(array(1), array(2, 3)))")
      .getInt(0) == 3)
    assert(one("len('abcd')").getInt(0) == 4)
    // list_extract: 1-based, NULL (not an error) out of bounds — the
    // DuckDB rule, riding try_element_at under ANSI mode
    assert(one("list_extract(array(10, 20), 2)").getInt(0) == 20)
    assert(one("list_extract(array(10, 20), 9)").isNullAt(0))
    // string_split quotes its LITERAL separator — regex metachars split
    // literally; string_split_regex stays a pattern split
    assert(one("array_length(string_split('a|b|c', '|'))").getInt(0) == 3)
    assert(one("string_split('a.b', '.')[1]").getString(0) == "a")
    assert(one("array_length(string_split_regex('a1b22c', '[0-9]+'))")
      .getInt(0) == 3)
    assert(intercept[Exception](one("string_split('a|b', x)"))
      .getMessage.contains("literal separator"))
    // unnest is explode: generator in the select list
    val u = Table(Seq(1).toDF("x"))
      .sql("select unnest(array(7, 8)) as v from t").toDF
      .collect().map(_.getInt(0))
    assert(u.toSeq == Seq(7, 8))
  }
  test("strftime/strptime (q77): %-directives translate to Java patterns") {
    assert(one("strftime(TIMESTAMP '2024-03-05 14:07:09', " +
      "'%Y-%m-%d %H:%M:%S')").getString(0) == "2024-03-05 14:07:09")
    assert(one("strftime(TIMESTAMP '2024-03-05 14:07:09', " +
      "'%d/%m/%y %I %p')").getString(0) == "05/03/24 02 PM")
    assert(one("strftime(DATE '2024-03-05', '%a %b %j')")
      .getString(0) == "Tue Mar 065")
    // literal text with letters survives via Java-pattern quoting
    assert(one("strftime(DATE '2024-03-05', '%-d and %%')")
      .getString(0) == "5 and %")
    assert(one("CAST(strptime('2024-03-05 14:07', '%Y-%m-%d %H:%M') " +
      "AS STRING)").getString(0) == "2024-03-05 14:07:00")
    // unmapped directive and non-literal format refuse loudly
    assert(intercept[Exception](one("strftime(DATE '2024-03-05', '%V')"))
      .getMessage.contains("no Spark datetime pattern"))
    assert(intercept[Exception](
      one("strftime(DATE '2024-03-05', to_str(1))"))
      .getMessage.contains("LITERAL"))
  }
}
