package graft.api

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.functions.Registry
import graft.sql.Dialect

/** The engine's user-facing table abstraction — "same abstraction as a table
  * in the relational databases world" (reference: vinum/api/table.py:15-93).
  *
  * Wraps a [[DataFrame]]; `sql` binds the receiver as the queried table
  * (the reference ignores the FROM name and always queries the receiver,
  * vinum/api/table.py:219-220) and runs the query through Spark SQL after
  * the [[Dialect]] pre-pass. Unlike the reference — SELECT-only, single
  * threaded — the full Spark SQL surface (joins, subqueries, windows, set
  * ops) is available and executes distributed.
  */
final class Table private (val df: DataFrame) {

  def spark: SparkSession = df.sparkSession

  /** Run a SQL query against this table. The first FROM identifier is bound
    * to this table's data; dialect rewrites (np.*, `#` xor, select-alias
    * substitution into WHERE) are applied and output columns are renamed
    * to the reference's naming policy (function name / col_N / _1-dedup —
    * [[graft.sql.OutputNames]]).
    *
    * The receiver is bound via a session temp view named after the FROM
    * identifier (reference semantics: the FROM name is notional,
    * vinum/api/table.py:219-220). Concurrent `sql` calls are safe: the
    * view bind + analysis run under a lock and the plan is resolved
    * eagerly inside it, so a concurrent call re-binding the same FROM
    * name can never leak its data into this query.
    */
  def sql(query: String): Table = {
    Registry.registerAll(spark)
    // SUMMARIZE/DESCRIBE are whole-statement forms: route before every
    // other pass (a query target re-enters this method and gets them all)
    Dialect.summarizeTarget(query) match {
      case Some(target) => return new Table(summarizeFrame(target))
      case None =>
    }
    Dialect.describeTarget(query) match {
      case Some(target) => return new Table(describeFrame(target))
      case None =>
    }
    // UNION [ALL] BY NAME splits FIRST, on the token-local rewrite only:
    // the clause-scoped passes (alias-into-WHERE, nulls-last) treat each
    // OPERAND as its own statement — run on the whole text they would
    // leak the first operand's alias map across the operator (a WHERE
    // clause scan does not stop at UNION). The trailing ORDER BY binds
    // to the whole union and gets its nulls-last pass at fold time.
    val qr = Dialect.rewrite(query)
    Dialect.splitUnionByName(qr) match {
      case Some((ops, flags, tail)) =>
        return new Table(Table.runUnionByName(spark, ops, flags, tail)(
          o => sqlOne(prep(o)).df))
      case None =>
    }
    sqlOne(prep(qr))
  }

  /** `SUMMARIZE` execution: a bare-identifier target profiles the
    * receiver (the FROM-name-is-notional rule — `SUMMARIZE anything`
    * summarizes this table), a query target runs through the full
    * dialect pipeline first.
    */
  private def summarizeFrame(target: String): DataFrame =
    graft.ops.Profile.summarizeFull(
      if (Dialect.isBareIdentifier(target)) df else sql(target).df)

  /** `DESCRIBE` execution — same bare-identifier-is-the-receiver rule
    * as [[summarizeFrame]], DuckDB's output shape.
    */
  private def describeFrame(target: String): DataFrame =
    graft.ops.Profile.describeDuck(
      if (Dialect.isBareIdentifier(target)) df else sql(target).df)

  /** The clause-scoped single-statement rewrites ([[sql]] applies them
    * per UNION BY NAME operand; [[Dialect.rewrite]] has already run).
    */
  private def prep(q: String): String = {
    val q0 = Dialect.fromFirst(q).getOrElse(q)
    // frame-EXCLUDE algebra (w12) runs before the alias passes: it only
    // rewrites inside OVER(...) spans, and its output introduces no new
    // aliases for them to chase. GROUPS lowering (w14) runs after
    // alias-into-WHERE (the WHERE moves inside its wrap) and before
    // nulls-last (the wrap's outer ORDER BY is still top-level there).
    // DISTINCT window aggregates (w18) lower after the EXCLUDE algebra:
    // EXCLUDE-carrying DISTINCT forms split there and re-enter
    // DISTINCT-free; the bare forms collect-and-dedup here
    val q1 = Dialect.rewriteDistinctWindow(Dialect.rewriteWindowFilter(
      Dialect.rewriteWindowExclude(Dialect.inlineChainedWindows(
        Dialect.rewriteOrderedAggs(Dialect.rewriteSimilarGlob(
          Dialect.rewriteIgnoreNulls(Dialect.rewriteDotCalls(
            Dialect.rewriteSubscripts(Dialect.rewriteStructLiterals(
              Dialect.rewritePowerOp(Dialect.rewriteSeriesTvf(
                Dialect.stripTrailingCommas(q0)))))))))))))
    Dialect.orderByNullsLast(
      Dialect.rewriteGroupsFrames(Dialect.aliasesIntoWhere(q1)))
  }

  private def sqlOne(q0: String): Table = {
    // `… USING SAMPLE <spec>` (q64) splits first: the inner statement
    // re-enters this pipeline whole, the deterministic md5 gate applies
    // to its result, and the trailing ORDER BY/LIMIT runs over the
    // sampled frame ([[graft.sql.SampleSql]] documents the divergence
    // from DuckDB's PRNG sampling)
    graft.sql.SampleSql.splitUsingSample(q0) match {
      case Some((inner, spec, tail)) =>
        val sampled = graft.sql.SampleSql.applySample(sqlOne(inner).df, spec)
        return new Table(Table.runStmtTail(spark, sampled, tail))
      case None =>
    }
    // table-level TABLESAMPLE lowers onto the same gate as a textual
    // subquery; every FROM name is notionally the receiver here, so the
    // gate's first column is the receiver's
    val qTs =
      if (!graft.sql.SampleSql.hasTablesample(q0)) q0
      else graft.sql.SampleSql.rewriteTablesample(q0, { ref =>
        // derived-table targets need the session surface's resolution
        // (the receiver's columns would silently mis-key the gate here)
        require(Dialect.isBareIdentifier(ref),
          "TABLESAMPLE on a derived table is supported at the session " +
            "surface (sessionSql) — or sample at the query level with " +
            "USING SAMPLE")
        df.columns.toSeq
      })
    // DISTINCT ON lowers AFTER the nulls-last pass (the sort items move
    // into a window spec, where the later top-level scan can't see them)
    // COLUMNS expands FIRST: its star-modifier arm owns `* EXCLUDE`
    // INSIDE a COLUMNS(...) argument — the bare-star passes below
    // would otherwise rewrite that inner star and leave a mangled
    // argument (r18, caught by the q55-extension probe)
    val q = Dialect.expandStarRename(
      Dialect.expandStarReplace(
        Dialect.expandStarExclude(
          Dialect.expandColumns(
            Dialect.distinctOn(qTs).getOrElse(qTs),
            df.columns.toSeq, Some(df.sparkSession)),
          df.columns.toSeq),
        df.columns.toSeq),
      df.columns.toSeq)
    // ASOF JOIN has no Spark grammar; route the statement to the AsOf
    // translator. Both table references bind to the receiver (the same
    // FROM-name-is-notional rule as below), which covers the natural
    // self-as-of; distinct-table ASOF goes through [[Table.sessionSql]].
    if (graft.sql.AsOfSql.detect(q)) {
      // table refs bind to the receiver; a derived-table operand's
      // subquery binds the receiver to ITS FROM name first (same
      // notional-name rule), then runs on Spark SQL — recursing back
      // into the translator when the subquery is itself ASOF, matching
      // the session entry point's default
      lazy val subResolver: String => DataFrame = sub =>
        if (graft.sql.AsOfSql.detect(sub))
          graft.sql.AsOfSql.run(spark, sub, _ => df, Some(subResolver))
        else {
          val v = Dialect.firstFromTable(sub).getOrElse("t")
          Table.bindLock.synchronized {
            df.createOrReplaceTempView(v)
            val o = spark.sql(sub)
            o.queryExecution.assertAnalyzed()
            o
          }
        }
      return new Table(graft.sql.AsOfSql.run(spark, q, _ => df,
        Some(subResolver)))
    }
    Dialect.splitQualify(q) match {
      case Some((inner, tail)) => qualifiedSql(inner, tail)
      case None =>
        val view = Dialect.firstFromTable(q).getOrElse("t")
        val out = Table.bindLock.synchronized {
          df.createOrReplaceTempView(view)
          val o = spark.sql(q)
          o.queryExecution.assertAnalyzed() // snapshot the view NOW, inside the lock
          o
        }
        graft.sql.OutputNames.vinumNames(spark.sessionState.sqlParser.parsePlan(q)) match {
          case Some(names) if names.length == out.columns.length =>
            new Table(out.toDF(names: _*))
          case _ => new Table(out)
        }
    }
  }

  /** `sql_pd` analog (vinum/api/table.py:276-330: run `sql`, hand back
    * the materialized frame for display). The JVM has no pandas; the
    * equivalent "ready to look at" form is the rendered table string
    * `show()` would print — returned, not printed, so callers can log or
    * embed it. Driver-side by nature; `numRows` bounds the render.
    */
  def sqlPd(query: String, numRows: Int = 20, truncate: Int = 20): String =
    org.apache.spark.sql.GraftColumnBridge.renderedTable(
      sql(query).df, numRows, truncate)

  /** QUALIFY execution: run the [[Dialect.splitQualify]] inner query
    * (select list + `(pred) AS __qualify__`), filter on the predicate
    * column, drop it, then apply the trailing ORDER BY / LIMIT over the
    * filtered rows — the clause order QUALIFY defines. The predicate
    * filter runs BEFORE the tail's LIMIT, so `QUALIFY rn <= k LIMIT n`
    * limits the qualified rows, not the raw ones.
    */
  private def qualifiedSql(inner: String, tail: String): Table = {
    val view = Dialect.firstFromTable(inner).getOrElse("t")
    val out = Table.bindLock.synchronized {
      df.createOrReplaceTempView(view)
      val o = spark.sql(inner)
      o.queryExecution.assertAnalyzed()
      o
    }
    val filtered = out.filter(out.col("__qualify__")).drop("__qualify__")
    val fin =
      if (tail.isEmpty) filtered
      else Table.bindLock.synchronized {
        filtered.createOrReplaceTempView("__qualified__")
        val o = spark.sql(s"SELECT * FROM __qualified__ $tail")
        o.queryExecution.assertAnalyzed()
        o
      }
    graft.sql.OutputNames.vinumNames(
      spark.sessionState.sqlParser.parsePlan(inner)) match {
      case Some(names) if names.length == fin.columns.length + 1 =>
        new Table(fin.toDF(names.dropRight(1): _*))
      case _ => new Table(fin)
    }
  }

  /** Query plan for a SQL statement against this table
    * (reference: vinum/api/table.py:358-410 `explain`).
    */
  def explainSql(query: String, extended: Boolean = false): String = {
    Registry.registerAll(spark)
    // dialect parity: every sql() form must explain through the same
    // entry point (round-13 lesson — fromFirst; now SUMMARIZE too)
    Dialect.summarizeTarget(query).foreach { t =>
      val qe = summarizeFrame(t).queryExecution
      return if (extended) qe.toString
        else qe.explainString(org.apache.spark.sql.execution.SimpleMode)
    }
    Dialect.describeTarget(query).foreach { t =>
      val qe = describeFrame(t).queryExecution
      return if (extended) qe.toString
        else qe.explainString(org.apache.spark.sql.execution.SimpleMode)
    }
    val q0 = Dialect.rewrite(query)
    // sampling clauses have no Spark grammar: explain the constructed
    // frame (lazy — the gate is a filter/limit, nothing executes)
    if (graft.sql.SampleSql.hasTablesample(q0) ||
        graft.sql.SampleSql.splitUsingSample(q0).isDefined) {
      val qe = sql(query).df.queryExecution
      return if (extended) qe.toString
        else qe.explainString(org.apache.spark.sql.execution.SimpleMode)
    }
    val q = Dialect.fromFirst(q0).getOrElse(q0)
    val view = Dialect.firstFromTable(q).getOrElse("t")
    df.createOrReplaceTempView(view)
    val qe = spark.sql(q).queryExecution
    if (extended) qe.toString else qe.explainString(org.apache.spark.sql.execution.SimpleMode)
  }

  /** Parsed-query-tree dump — the analog of the reference's
    * `explain(print_query_tree=True)` (vinum/api/table.py:358-410), which
    * prints the parser's AST rather than the execution plan: the
    * UNRESOLVED logical plan for the dialect-rewritten query, before any
    * binding or optimization. Pair with [[explainSql]] for the
    * optimizer's view.
    */
  def explainTree(query: String): String =
    Dialect.summarizeTarget(query) match {
      // SUMMARIZE/DESCRIBE have no Spark grammar to parse; the closest
      // "query tree" is the constructed frame's unoptimized logical plan
      case Some(t) => summarizeFrame(t).queryExecution.logical.treeString
      case None => Dialect.describeTarget(query) match {
        case Some(t) => describeFrame(t).queryExecution.logical.treeString
        case None =>
          val qr = Dialect.rewrite(query)
          if (graft.sql.SampleSql.hasTablesample(qr) ||
              graft.sql.SampleSql.splitUsingSample(qr).isDefined)
            sql(query).df.queryExecution.logical.treeString
          else spark.sessionState.sqlParser.parsePlan(prep(qr)).treeString
      }
    }

  /** The fully materialized result as an Arrow IPC stream — the analog
    * of the reference's `to_arrow`/`to_pandas`
    * (vinum/api/table.py:439-457). Readable by any Arrow consumer
    * (pyarrow/pandas/polars/DuckDB). Scalar columns only.
    */
  def toArrowIpc: Array[Byte] = ArrowExport.toArrowIpc(df)

  /** Bounded-lineage iteration — the recursive-CTE substitute for
    * fixed-point algorithms (PageRank, BFS, label propagation). Runs
    * `step` for rounds 1..n, truncating lineage every `checkpointEvery`
    * rounds so plan depth and fault-recovery cost stay O(one round)
    * regardless of n. See [[graft.ops.Iterate]] for the scale rationale
    * and the convergence-predicate variant.
    */
  def iterate(n: Int, checkpointEvery: Int = 1)
             (step: (Table, Int) => Table): Table =
    Table(graft.ops.Iterate.loop(df, n, checkpointEvery)(
      (d, i) => step(Table(d), i).df))

  /** One-pass column profile (null/distinct counts per column) — the
    * `describe()` ergonomic every notebook expects, backed by the same
    * single-aggregation [[graft.ops.Profile.summarize]] the pr-family
    * gates; defaults to every column.
    */
  def describe(cols: String*): Table =
    Table(graft.ops.Profile.summarize(df,
      if (cols.nonEmpty) cols else df.columns.toSeq))

  /** Changelog against a newer snapshot — [[graft.ops.Cdc.diff]] at the
    * Table surface: `base.diff(after, keys, compared)` returns the
    * insert/update/delete rows that turn this table into `after`.
    */
  def diff(after: Table, keyCols: Seq[String],
           compareCols: Seq[String]): Table =
    Table(graft.ops.Cdc.diff(df, after.df, keyCols, compareCols))

  def schema: StructType = df.schema
  def columnNames: Seq[String] = df.schema.fieldNames.toSeq
  def head(n: Int = 5): Array[Row] = df.head(n)
  def count(): Long = df.count()
  def toDF: DataFrame = df
  def show(n: Int = 20, truncate: Boolean = true): Unit = df.show(n, truncate)
}

object Table {

  /** `set_batch_size` parity shim (vinum/__init__.py:52-62). The
    * reference's global batch size throttles its pull-based Arrow
    * executor; Spark's analog is partition/batch sizing owned by the
    * engine (`spark.sql.files.maxPartitionBytes` for scan splits,
    * `spark.sql.execution.arrow.maxRecordsPerBatch` for Arrow batch
    * width, `spark.sql.shuffle.partitions` for shuffle width), so this
    * intentionally does NOT plumb a row count into execution — it sets
    * the Arrow batch conf, the closest semantic match, and returns the
    * previous value. Present so reference callers have a one-line
    * migration target rather than a missing symbol.
    */
  def setBatchSize(spark: SparkSession, rows: Int): Int = {
    require(rows > 0, s"batch size must be positive, got $rows")
    val key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    val prev = spark.conf.get(key, "10000").toInt
    spark.conf.set(key, rows)
    prev
  }

  /** Serializes temp-view bind + analysis in [[Table.sql]]. Analysis
    * resolves the FROM name to a snapshot of the receiver's plan, so once
    * a query is analyzed the view may be re-bound freely; the lock only
    * covers that short resolution window.
    */
  private[graft] val bindLock = new Object

  /** QUALIFY lowering shared by [[sessionSql]] and the ASOF
    * translator's remainder statement: split a top-level QUALIFY,
    * run the inner query through `runInner`, filter on the appended
    * predicate column, then apply the trailing ORDER BY / LIMIT over
    * the filtered rows. Statements without QUALIFY pass through to
    * `runInner` unchanged. One owner for the lowering contract so the
    * two dialect surfaces cannot drift.
    */
  private[graft] def qualifyAware(spark: SparkSession, stmt: String)
                                 (runInner: String => DataFrame): DataFrame =
    Dialect.splitQualify(stmt) match {
      case Some((inner, tail)) =>
        val out = runInner(inner)
        val filtered = out.filter(out.col("__qualify__")).drop("__qualify__")
        if (tail.isEmpty) filtered
        else bindLock.synchronized {
          filtered.createOrReplaceTempView("__qualified__")
          val o = spark.sql(s"SELECT * FROM __qualified__ $tail")
          o.queryExecution.assertAnalyzed()
          o
        }
      case None => runInner(stmt)
    }

  def apply(df: DataFrame): Table = new Table(df)

  /** Parquet reader (reference: vinum/io/arrow.py:151-248 `read_parquet`).
    * Column selection becomes a projection that Catalyst pushes into the
    * scan; filters/partition-pruning are automatic.
    */
  def fromParquet(spark: SparkSession, path: String, columns: Seq[String] = Nil): Table = {
    val df = spark.read.parquet(path)
    apply(if (columns.nonEmpty) df.select(columns.map(df.col): _*) else df)
  }

  /** CSV reader with header + schema inference, compressed files auto-detected
    * (reference: vinum/io/arrow.py:64-108 `read_csv`).
    */
  def fromCsv(spark: SparkSession, path: String,
              header: Boolean = true, inferSchema: Boolean = true): Table =
    apply(spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path))

  /** Line-delimited JSON reader (reference: vinum/io/arrow.py:111-148). */
  def fromJson(spark: SparkSession, path: String): Table =
    apply(spark.read.json(path))

  /** In-memory ingestion from rows + schema
    * (reference: vinum/api/table.py:95-180 `from_pydict`/`from_arrow`).
    */
  def fromRows(spark: SparkSession, schema: StructType, rows: Seq[Row]): Table =
    apply(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), schema))

  /** Ingest an Arrow IPC stream (reference `from_arrow`,
    * vinum/api/table.py:95-180) — inverse of [[Table.toArrowIpc]].
    */
  def fromArrowIpc(spark: SparkSession, bytes: Array[Byte]): Table =
    apply(ArrowExport.fromArrowIpc(spark, bytes))

  /** The reference's StreamReader is out-of-core batch input with a fully
    * materialized result (vinum/api/stream_reader.py:12-31) — on Spark the
    * ordinary reader already partitions and streams input, so this is an
    * alias kept for API parity.
    */
  def streamCsv(spark: SparkSession, path: String): Table = fromCsv(spark, path)

  /** Session-level SQL over already-registered temp views — the
    * multi-table counterpart of the single-receiver [[Table.sql]].
    * Applies the dialect rewrites that need no receiver schema (np.* /
    * `#`, alias-into-WHERE, nulls-last ordering) and routes top-level
    * ASOF JOIN statements to [[graft.sql.AsOfSql]], resolving each table
    * reference with `spark.table`. Everything else runs on Spark SQL
    * unchanged.
    */
  def sessionSql(spark: SparkSession, query: String): Table = {
    Registry.registerAll(spark)
    // multi-statement scripts (u20): top-level semicolons run as a
    // sequential script (DuckDB's execute shape) — each statement
    // re-enters this method; a statement that MUTATES a bare-named
    // session table re-binds the name to its post-image, so later
    // statements see the script's own writes (our DML returns the
    // post-statement table without re-binding — outside scripts the
    // caller chooses). RETURNING only on the FINAL statement: its
    // projected rows are not the post-image the rest must read.
    //
    // Transactions (u22): `BEGIN; …; COMMIT|ROLLBACK;` — the engine's
    // tables are immutable lazy frames bound by name, so a transaction
    // IS a catalog snapshot: BEGIN captures every session temp-view
    // binding (name → analyzed plan, zero execution), ROLLBACK restores
    // the captured bindings and drops views created since, COMMIT
    // discards the snapshot. Statement errors inside an open
    // transaction roll back before rethrowing (statement atomicity —
    // the Postgres abort-on-error shape). No durability dimension:
    // binding is the only state these statements govern (durable
    // publish stays with the WAP writer, which has its own atomicity).
    Dialect.splitStatements(query) match {
      case Some(stmts) =>
        var out: Table = null
        var snapshot: Option[Map[String, DataFrame]] = None
        def rollback(): Unit = {
          val snap = snapshot.get
          bindLock.synchronized {
            val now = spark.catalog.listTables().collect()
              .filter(_.isTemporary).map(_.name)
            now.filterNot(snap.contains)
              .foreach(spark.catalog.dropTempView(_))
            snap.foreach { case (n, df) => df.createOrReplaceTempView(n) }
          }
          snapshot = None
        }
        stmts.zipWithIndex.foreach { case (st, ix) =>
          Dialect.txnKind(st) match {
            case Some("begin") =>
              require(snapshot.isEmpty,
                "BEGIN inside an open transaction — transactions do " +
                  "not nest")
              snapshot = Some(bindLock.synchronized {
                spark.catalog.listTables().collect()
                  .filter(_.isTemporary).map(_.name)
                  .map(n => n -> spark.table(n)).toMap
              })
              out = Table(spark.sql("SELECT 'begin' AS statement"))
            case Some("commit") =>
              require(snapshot.nonEmpty, "COMMIT without BEGIN")
              snapshot = None
              out = Table(spark.sql("SELECT 'commit' AS statement"))
            case Some("rollback") =>
              require(snapshot.nonEmpty, "ROLLBACK without BEGIN")
              rollback()
              out = Table(spark.sql("SELECT 'rollback' AS statement"))
            case _ =>
              try out = sessionSql(spark, st)
              catch {
                case e: Throwable if snapshot.nonEmpty =>
                  rollback(); throw e
              }
              mutationTarget(st) match {
                case Some((t, isReturning)) if ix < stmts.size - 1 =>
                  require(!isReturning,
                    "RETURNING is supported only on a script's FINAL " +
                      "statement — an earlier statement must leave the " +
                      "post-image for the rest of the script to read")
                  bindLock.synchronized {
                    out.df.createOrReplaceTempView(t)
                  }
                case _ =>
              }
          }
        }
        require(snapshot.isEmpty,
          "the script ended inside an open transaction — add COMMIT " +
            "or ROLLBACK")
        return out
      case None =>
    }
    // a lone transaction statement has no script to scope it
    Dialect.txnKind(query).foreach { k =>
      throw new IllegalArgumentException(
        s"${k.toUpperCase} is supported inside multi-statement scripts " +
          "(u22) — run `BEGIN; …; COMMIT|ROLLBACK;` as one sessionSql " +
          "call")
    }
    // SUMMARIZE/DESCRIBE first (dialect parity with Table.sql); here a
    // bare identifier resolves against the session catalog
    Dialect.summarizeTarget(query) match {
      case Some(t) =>
        return apply(graft.ops.Profile.summarizeFull(
          if (Dialect.isBareIdentifier(t)) spark.table(t)
          else sessionSql(spark, t).df))
      case None =>
    }
    Dialect.describeTarget(query) match {
      case Some(t) =>
        return apply(graft.ops.Profile.describeDuck(
          if (Dialect.isBareIdentifier(t)) spark.table(t)
          else sessionSql(spark, t).df))
      case None =>
    }
    // SQL macros (u23): CREATE/DROP MACRO manage the session-scoped
    // registry; every other statement expands macro calls FIRST, so the
    // body text flows through the whole dialect pipeline below (and a
    // macro referencing another macro late-binds at call time, DuckDB's
    // rule)
    graft.sql.MacroSql.parseCreate(query) match {
      case Some(c) => return apply(graft.sql.MacroSql.runCreate(spark, c))
      case None =>
    }
    graft.sql.MacroSql.parseDrop(query) match {
      case Some((n, ifEx)) =>
        return apply(graft.sql.MacroSql.runDrop(spark, n, ifEx))
      case None =>
    }
    // prepared statements (u24): PREPARE stores text (placeholders
    // validate at EXECUTE — DuckDB's shape), EXECUTE substitutes and
    // re-enters this method, DEALLOCATE drops the entry
    graft.sql.PrepareSql.parsePrepare(query) match {
      case Some((n, body)) =>
        graft.sql.PrepareSql.prepare(spark, n, body)
        return apply(spark.sql(
          s"SELECT 'prepare' AS statement, '$n' AS name"))
      case None =>
    }
    graft.sql.PrepareSql.parseExecute(query) match {
      case Some((n, args)) =>
        return sessionSql(spark, graft.sql.PrepareSql.bind(spark, n, args))
      case None =>
    }
    graft.sql.PrepareSql.parseDeallocate(query) match {
      case Some(n) =>
        graft.sql.PrepareSql.deallocate(spark, n)
        return apply(spark.sql(
          s"SELECT 'deallocate' AS statement, '$n' AS name"))
      case None =>
    }
    val qx = graft.sql.MacroSql.expand(spark, query)
    // same pass ordering as [[Table.sql]]: split UNION BY NAME on the
    // token-local rewrite, then run the clause-scoped passes per operand
    val qr = Dialect.rewrite(qx)
    // MERGE INTO is a whole-statement form (u09): parse AFTER the
    // token-local rewrite so np.*/# sugar works inside arm expressions;
    // bare refs resolve against the session catalog, subquery refs
    // re-enter the full pipeline
    // shared ref-resolution rule of all table-ref statement forms
    // (MERGE / PIVOT / UNPIVOT): bare identifier → session catalog,
    // subquery → re-enter the full pipeline
    def resolveRef(ref: String): DataFrame =
      if (Dialect.isBareIdentifier(ref)) spark.table(ref)
      else sessionSql(spark, ref).df
    // CTE-headed DML (u16): `WITH c AS (…) INSERT/UPDATE/DELETE/MERGE …`
    // (Postgres/DuckDB, probed) — the CTEs bind as statement-scoped
    // views (unique internal names, textual order, each may read
    // earlier ones) and the rewritten DML re-enters this method to hit
    // the normal statement dispatch below. WITH RECURSIVE heads stay
    // with the recursion lowering / native path.
    graft.sql.RecursiveUnion.tokenizeWith(qr) match {
      case Some((false, ctes, restStart)) =>
        val rest = qr.substring(restStart)
        val firstWord = Dialect.stripLiterals(rest).trim
          .takeWhile(c => c.isLetter || c == '_').toLowerCase
        if (Set("insert", "update", "delete", "merge")(firstWord))
          return cteHeadedDml(spark, ctes, rest)
      case _ =>
    }
    graft.sql.MergeSql.parse(qr) match {
      case Some(st) =>
        return apply(graft.sql.MergeSql.run(spark, st, resolveRef))
      case None =>
    }
    // INSERT / UPDATE / DELETE (u10) — the simpler DML siblings, same
    // returns-the-post-statement-table convention; a SELECT source
    // re-enters the full pipeline
    graft.sql.DmlSql.parse(qr) match {
      case Some(st) =>
        return apply(graft.sql.DmlSql.run(spark, st, resolveRef,
          s => sessionSql(spark, s).df))
      case None =>
    }
    // CREATE [OR REPLACE] [TEMP] TABLE/VIEW … AS … (u11) — binds a
    // session view (TABLE = materialized snapshot, VIEW = lazy binding)
    // and returns the defined table; other CREATE forms stay native
    graft.sql.DdlSql.parse(qr) match {
      case Some(st) =>
        return apply(graft.sql.DdlSql.run(spark, st,
          s => sessionSql(spark, s).df))
      case None =>
    }
    // DROP TABLE|VIEW and ALTER TABLE (u18) — session-binding surgery;
    // other DROP/ALTER forms keep Spark's native path
    graft.sql.DdlSql.parseDrop(qr) match {
      case Some(st) => return apply(graft.sql.DdlSql.runDrop(spark, st))
      case None =>
    }
    graft.sql.DdlSql.parseAlter(qr) match {
      case Some(st) => return apply(graft.sql.DdlSql.runAlter(spark, st))
      case None =>
    }
    // COPY … TO '<path>' (io21) — export + read-back (the returned
    // frame is the written dataset, proving the round-trip) — and
    // COPY … FROM '<path>' (io22) — import appended into the target
    graft.sql.CopySql.parse(qr) match {
      case Some(st) =>
        return apply(graft.sql.CopySql.run(spark, st, resolveRef))
      case None =>
    }
    // EXPORT/IMPORT DATABASE (io25) — whole-catalog transfer over the
    // session temp views; same overwrite gate as COPY TO
    graft.sql.ExportSql.parse(qr) match {
      case Some(st) => return apply(graft.sql.ExportSql.run(spark, st))
      case None =>
    }
    // DuckDB's file-reading FROM forms (io24): read_parquet('p') /
    // read_csv('p', …) / read_json('p') table functions and bare
    // FROM '<path>' literals bind as statement-scoped views (unique
    // names, dropped after — the analyzed plan inlines the lazy reader,
    // so pruning/pushdown reach the file scan). Runs AFTER the COPY
    // dispatch: COPY's own path literals never reach this pass. DML /
    // CTE / DDL sources compose for free — their SELECT texts re-enter
    // this method through their resolver callbacks.
    graft.sql.FileReadSql.rewrite(qr) match {
      case Some((rewritten, binds)) =>
        try {
          binds.foreach { b =>
            val df = b.kind match {
              case "parquet" => spark.read.parquet(b.path)
              case "csv" => spark.read.option("header", b.header.toString)
                .option("sep", b.delim).option("inferSchema", "true")
                .csv(b.path)
              case _ => spark.read.json(b.path)
            }
            bindLock.synchronized { df.createOrReplaceTempView(b.view) }
          }
          return sessionSql(spark, rewritten)
        } finally binds.foreach(b => spark.catalog.dropTempView(b.view))
      case None =>
    }
    graft.sql.PivotSql.parsePivot(qr) match {
      case Some(p) => return apply(graft.sql.PivotSql.runPivot(spark, p,
        resolveRef, runStmtTail(spark, _, _)))
      case None =>
    }
    graft.sql.PivotSql.parseUnpivot(qr) match {
      case Some(u) => return apply(graft.sql.PivotSql.runUnpivot(spark, u,
        resolveRef, runStmtTail(spark, _, _)))
      case None =>
    }
    Dialect.splitUnionByName(qr) match {
      case Some((ops, flags, tail)) =>
        apply(runUnionByName(spark, ops, flags, tail)(
          o => sessionSqlOne(spark, o)))
      case None => apply(sessionSqlOne(spark, qr))
    }
  }

  private def sessionSqlOne(spark: SparkSession, qIn: String): DataFrame = {
    // `… USING SAMPLE` splits first (q64 — same contract as Table.sql:
    // inner re-enters whole, md5 gate on the result, tail over the
    // sampled frame); a sampled recursive-CTE outer statement works
    // because the inner statement re-enters and parses the recursion
    graft.sql.SampleSql.splitUsingSample(qIn) match {
      case Some((inner, spec, tail)) =>
        return runStmtTail(spark, graft.sql.SampleSql.applySample(
          sessionSqlOne(spark, inner), spec), tail)
      case None =>
    }
    // UNION-distinct recursion (gr09) lowers onto frontier-minus-seen
    // BEFORE the clause passes (its seed/step/outer each re-enter this
    // method and get them individually); UNION ALL recursion stays on
    // Spark's native UnionLoop path (parse returns None for it)
    graft.sql.RecursiveUnion.parse(qIn) match {
      case Some(st) => return runRecursiveUnion(spark, st)
      case None =>
    }
    // table-level TABLESAMPLE: the gate's first column resolves from
    // the session catalog; a derived-table target (q64 ext) resolves by
    // running its subquery text back through this pipeline lazily —
    // analysis only, nothing executes for the column list
    val qSampled =
      if (!graft.sql.SampleSql.hasTablesample(qIn)) qIn
      else graft.sql.SampleSql.rewriteTablesample(qIn, ref =>
        if (Dialect.isBareIdentifier(ref)) spark.table(ref).columns.toSeq
        else sessionSqlOne(spark, ref).columns.toSeq)
    val q0 = Dialect.rewriteDistinctWindow(Dialect.rewriteWindowFilter(
      Dialect.rewriteWindowExclude(Dialect.inlineChainedWindows(
        Dialect.rewriteOrderedAggs(Dialect.rewriteSimilarGlob(
          Dialect.rewriteIgnoreNulls(Dialect.rewriteDotCalls(
            Dialect.rewriteSubscripts(Dialect.rewriteStructLiterals(
              Dialect.rewritePowerOp(
                Dialect.rewriteSeriesTvf(Dialect.stripTrailingCommas(
                  Dialect.fromFirst(qSampled).getOrElse(qSampled))))))))))))))
    val q1 = Dialect.orderByNullsLast(
      Dialect.rewriteGroupsFrames(Dialect.aliasesIntoWhere(q0)))
    // dynamic star: schema comes from the first FROM table's session
    // view (the table COLUMNS binds to); resolution is attempted only
    // when the statement actually carries a COLUMNS( call
    val q2 =
      if (!Dialect.hasDynamicColumns(q1)) q1
      else Dialect.firstFromTable(q1)
        .flatMap(t => scala.util.Try(spark.table(t).columns.toSeq).toOption)
        .map(cols => Dialect.expandColumns(q1, cols, Some(spark)))
        .getOrElse(q1)
    val q = Dialect.distinctOn(q2).getOrElse(q2)
    if (graft.sql.AsOfSql.detect(q))
      graft.sql.AsOfSql.run(spark, q, spark.table)
    // POSITIONAL JOIN (j12): zip-by-position lowering — derived-table
    // operands re-enter this method (so an ordered subquery keeps its
    // order behind the zip's RDD boundary)
    else if (graft.sql.PositionalSql.detect(q))
      graft.sql.PositionalSql.run(spark, q, spark.table,
        s => sessionSqlOne(spark, s))
    // same QUALIFY lowering as Table.sql — the rewrite needs no receiver
    // schema, and the FROM names are session views already
    else qualifyAware(spark, q)(spark.sql)
  }

  /** Trailing ORDER BY / LIMIT / OFFSET of a statement form (PIVOT /
    * UNPIVOT), run over the lowered frame through a temp view — the
    * runUnionByName tail pattern, nulls-last applied like any single
    * statement's ORDER BY.
    */
  private def runStmtTail(spark: SparkSession, df: DataFrame,
                          tail: String): DataFrame =
    if (tail.isEmpty) df
    else bindLock.synchronized {
      df.createOrReplaceTempView("__stmt_out__")
      val out = spark.sql(
        Dialect.orderByNullsLast(s"SELECT * FROM __stmt_out__ $tail"))
      out.queryExecution.assertAnalyzed()
      out
    }

  /** UNION-distinct recursive CTE execution
    * ([[graft.sql.RecursiveUnion]], gr09): frontier-minus-seen rounds
    * with per-round lineage cuts (the Iterate discipline — the plan and
    * recovery cost stay O(one round) however deep the recursion). The
    * step's output is aligned to the seed's schema (names positional,
    * types cast — the anchor-defines-schema rule Spark's native
    * recursion also applies). Each round: one distinct-EXCEPT against
    * the accumulated set (the cycle guard) and one emptiness probe —
    * data-dependent termination costs one small job per round. A
    * non-draining recursion refuses loudly at `maxRounds` instead of
    * looping forever. SEVERAL recursions (gr11/gr12) drain by SCC
    * group, dependencies first: singleton groups sequentially, each
    * closure binding before later groups — a dependent seed/step
    * consumes an earlier closure like any bound view — and a cyclic
    * group (TRUE mutual recursion) via [[drainMutualGroup]]'s
    * simultaneous loop.
    */
  private def runRecursiveUnion(spark: SparkSession,
                                st: graft.sql.RecursiveUnion.Stmt,
                                maxRounds: Int = 512): DataFrame = {
    // every statement-scoped name (the recursive CTEs and the gr10
    // helper CTEs) binds under a per-invocation UNIQUE internal view
    // name; all statement texts are rewritten consistently
    val suffix = java.util.UUID.randomUUID.toString.take(8)
    val names = st.helpers.map(_.name) ++ st.recs.map(_.name)
    val rename = names.map(n => n -> s"__rec_${n}_$suffix").toMap
    def rewriteAll(text: String): String =
      names.foldLeft(text)((t, n) => Dialect.replaceIdent(t, n, rename(n)))
    (st.helpers.map(h => s"helper ${h.name}" -> h.body) ++
      st.recs.flatMap(r => Seq(s"seed of ${r.name}" -> r.seed,
        s"step of ${r.name}" -> r.step)) ++
      Seq("outer statement" -> st.outer)).foreach { case (what, text) =>
      names.foreach { n =>
        require(!Dialect.containsBacktickedIdent(text, n),
          s"backquoted reference to the CTE '$n' in the $what is not " +
            "supported — drop the backticks")
      }
    }
    // every checkpoint is wrapped in a fresh aliasing projection: a
    // localCheckpoint's LogicalRDD can carry origin constraints that
    // reference attributes outside its own output, and the LAZY
    // accumulation union below computes Union constraints over its
    // children (Spark's rewrite then dies with `key not found: k#N`
    // — surfaced by a recursion over an ON CONFLICT result). A
    // Project keeps only output-expressible constraints.
    def freshCols(df: DataFrame): DataFrame =
      df.select(df.columns.map(c =>
        org.apache.spark.sql.functions.col(s"`$c`").as(c)): _*)
    // helpers bind ONCE, in textual order (gr10): each may reference
    // earlier helpers; references to recursive CTEs were refused at
    // parse. A helper ANY step references is MATERIALIZED (eager
    // localCheckpoint): steps re-execute once per recursion round, and
    // re-scanning the helper's source plan every round costs
    // O(rounds × helper) where one checkpoint pass suffices (measured:
    // gr10's edge helper halved the closure runtime). A helper only the
    // outer statement (or later helpers) reads stays a lazy view — no
    // wasted materialization.
    val stepMasks = st.recs.map(r => Dialect.stripLiterals(r.step))
    try {
      st.helpers.foreach { h =>
        val df0 = bindLock.synchronized {
          val d = sessionSqlOne(spark, rewriteAll(h.body))
          d.queryExecution.assertAnalyzed()
          d
        }
        val df = h.cols.map { cs =>
          require(cs.size == df0.columns.length,
            s"helper CTE ${h.name}(${cs.mkString(", ")}) declares " +
              s"${cs.size} columns, its body produces ${df0.columns.length}")
          df0.toDF(cs: _*)
        }.getOrElse(df0)
        val bound =
          if (stepMasks.exists(
            graft.sql.RecursiveUnion.containsWord(_, h.name)))
            // same constraint-pruning projection as the recursion loop's
            // checkpoints (a step may union/except over this view)
            freshCols(df.localCheckpoint(true))
          else df
        bindLock.synchronized {
          bound.createOrReplaceTempView(rename(h.name))
        }
      }
      // drain the SCC groups dependencies-first (gr11/gr12), binding
      // each closure as a plain view before later groups (or the outer
      // statement) run. A singleton group is the sequential case; a
      // multi-member group is TRUE mutual recursion — one simultaneous
      // loop over all members.
      st.drainGroups.foreach { group =>
        val closures =
          if (group.size == 1)
            Seq(drainRecursion(spark, group.head, rename(group.head.name),
              rewriteAll, freshCols, maxRounds))
          else drainMutualGroup(spark, group, r => rename(r.name),
            rewriteAll, freshCols, maxRounds)
        bindLock.synchronized {
          group.zip(closures).foreach { case (rec, closure) =>
            closure.createOrReplaceTempView(rename(rec.name))
          }
        }
      }
      bindLock.synchronized {
        sessionSqlOne(spark, rewriteAll(st.outer))
      }
    } finally rename.values.foreach(spark.catalog.dropTempView)
  }

  /** CTE-headed DML execution (u16): bind each CTE as a
    * statement-scoped view (unique internal name — the recursion
    * lowering's scoping rule — in textual order, each body may read
    * earlier CTEs), then re-enter [[sessionSql]] with the rewritten DML
    * text so it hits the normal statement dispatch. Binding is LAZY (a
    * CTE is typically read once; the analyzed plan inlines the view, so
    * dropping the names afterwards is safe). The DML target must be a
    * real table: Postgres scopes the target OUTSIDE the WITH, so a CTE
    * sharing its name refuses loudly rather than silently receiving
    * the rows.
    */
  /** The session name a statement MUTATES (DML / MERGE / COPY FROM
    * with a bare target) plus whether a RETURNING clause makes the
    * returned frame differ from the post-image. None for non-mutating
    * statements and subquery targets. Parse failures are None — the
    * caller's normal dispatch reports malformed statements.
    */
  private def mutationTarget(stmt: String): Option[(String, Boolean)] = {
    def dmlTarget(st: graft.sql.DmlSql.Stmt): (String, Boolean) = st match {
      case graft.sql.DmlSql.Insert(r, _, _, _, _, _) => (r, false)
      case graft.sql.DmlSql.Update(r, _, _, _, _) => (r, false)
      case graft.sql.DmlSql.Delete(r, _, _, _) => (r, false)
      case graft.sql.DmlSql.Truncate(r) => (r, false)
      case graft.sql.DmlSql.Returning(inner, _) => (dmlTarget(inner)._1, true)
    }
    scala.util.Try(graft.sql.DmlSql.parse(stmt)).toOption.flatten
      .map(dmlTarget)
      .orElse(scala.util.Try(graft.sql.MergeSql.parse(stmt)).toOption
        .flatten.map(m => (m.targetRef, false)))
      .orElse(scala.util.Try(graft.sql.CopySql.parse(stmt)).toOption
        .flatten.collect {
          case c if !c.toTarget && !c.isSubquery => (c.ref, false)
        })
      .filter(t => Dialect.isBareIdentifier(t._1))
  }

  private def cteHeadedDml(spark: SparkSession,
                           ctes: Seq[graft.sql.RecursiveUnion.RawCte],
                           rest: String): Table = {
    val suffix = java.util.UUID.randomUUID.toString.take(8)
    val names = ctes.map(_.name)
    val rename = names.map(n => n -> s"__cte_${n}_$suffix").toMap
    def rewriteAll(text: String): String =
      names.foldLeft(text)((t, n) => Dialect.replaceIdent(t, n, rename(n)))
    (ctes.map(c => s"CTE ${c.name}" -> c.body) :+
      ("statement" -> rest)).foreach { case (what, text) =>
      names.foreach { n =>
        require(!Dialect.containsBacktickedIdent(text, n),
          s"backquoted reference to the CTE '$n' in the $what is not " +
            "supported — drop the backticks")
      }
    }
    val targetRef: Option[String] = mutationTarget(rest).map(_._1)
    targetRef.foreach { t =>
      require(!names.exists(_.equalsIgnoreCase(t)),
        s"the CTE '$t' shares the DML target's name — the target is a " +
          "real table outside the WITH scope (Postgres rule); rename " +
          "the CTE")
    }
    try {
      ctes.foreach { c =>
        val df0 = bindLock.synchronized {
          val d = sessionSqlOne(spark, rewriteAll(c.body))
          d.queryExecution.assertAnalyzed()
          d
        }
        val df = c.cols.map { cs =>
          require(cs.size == df0.columns.length,
            s"CTE ${c.name}(${cs.mkString(", ")}) declares ${cs.size} " +
              s"columns, its body produces ${df0.columns.length}")
          df0.toDF(cs: _*)
        }.getOrElse(df0)
        bindLock.synchronized { df.createOrReplaceTempView(rename(c.name)) }
      }
      sessionSql(spark, rewriteAll(rest))
    } finally rename.values.foreach(spark.catalog.dropTempView)
  }

  /** The recursion loops broadcast-hint their frontier / seen frames
    * under [[FrameStats]]' measured-size gate: a localCheckpoint's
    * LogicalRDD reports plan-derived statistics, so without the hint
    * every per-round step join and EXCEPT plans as a full
    * exchange-both-sides join of frames that are typically a few
    * thousand rows — O(rounds) shuffles of the corpus-sized edge
    * tables where O(0) suffices (guide §2.4/§3.1). Oversized state
    * keeps the shuffle plan, so scale safety is unconditional.
    */
  private def checkpointedBytes(df: DataFrame): Long =
    FrameStats.checkpointedBytes(df)

  private def maybeBroadcastHint(df: DataFrame, bytes: Long): DataFrame =
    FrameStats.broadcastIfSmall(df, bytes)

  /** `left EXCEPT DISTINCT right` spelled as the identical
    * Distinct-over-null-safe-anti-join Spark's own
    * ReplaceExceptWithAntiJoin produces — written out so the SEEN side
    * can carry a broadcast hint (a hint on a Dataset.except operand is
    * eliminated before the optimizer rewrites Except into the join, so
    * it can never attach there). Columns pair positionally with `<=>`,
    * matching Except's null-safe set semantics bit for bit.
    */
  private def exceptDistinctVia(left: DataFrame, right: DataFrame,
                                rightBytes: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val names = left.columns.toSeq
    val tmp = names.indices.map(i => s"__ed$i")
    val l = left.toDF(tmp: _*).as("__edl")
    val r = maybeBroadcastHint(right.toDF(tmp: _*), rightBytes).as("__edr")
    val cond = tmp.map(c => col(s"__edl.$c") <=> col(s"__edr.$c"))
      .reduce(_ && _)
    l.join(r, cond, "left_anti").toDF(names: _*).distinct()
  }

  /** One frontier-minus-seen drain loop (see [[runRecursiveUnion]]);
    * returns the checkpointed closure. The rec's internal view name is
    * rebound to the frontier each round while the loop runs.
    */
  private def drainRecursion(spark: SparkSession,
                             rec: graft.sql.RecursiveUnion.Rec,
                             internal: String,
                             rewriteAll: String => String,
                             freshCols: DataFrame => DataFrame,
                             maxRounds: Int): DataFrame = {
    val seedDf = sessionSqlOne(spark, rewriteAll(rec.seed))
    val cols = rec.cols.getOrElse(seedDf.columns.toSeq)
    require(cols.size == seedDf.columns.length,
      s"recursive CTE ${rec.name}(${cols.mkString(", ")}) declares " +
        s"${cols.size} columns, the seed produces ${seedDf.columns.length}")
    val seed = seedDf.toDF(cols: _*)
    val schema = seed.schema
    def align(df: DataFrame): DataFrame = {
      require(df.columns.length == cols.size,
        s"recursive step of ${rec.name} produces ${df.columns.length} " +
          s"columns, expected ${cols.size}")
      df.toDF(cols: _*).select(schema.fields.toSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name)
          .cast(f.dataType).as(f.name)): _*)
    }
    // the CTE names are STATEMENT-scoped: binding rec.name directly
    // would permanently clobber a same-named session view, and a
    // deterministic internal name would race concurrent same-named
    // recursions (review-caught, twice). replaceIdent rewrites table
    // references only — qualified columns `e.name`, `AS name` aliases
    // and column-land clause references stay; a backquoted reference is
    // invisible to the masked rewrite and would silently read the
    // session catalog — refused loudly by the caller.
    val step = rewriteAll(rec.step)
    var seen = freshCols(seed.distinct().localCheckpoint(true))
    // measured state sizes drive the broadcast gates: the frontier hint
    // rides the bound view into the step (its join keeps the edge side
    // map-local), the seen bytes gate the EXCEPT's anti-join build side
    var seenBytes = checkpointedBytes(seen)
    var frontier = seen
    var frontierBytes = seenBytes
    var drained = frontier.isEmpty
    var round = 0
    // `seen` accumulates as a UNION of already-checkpointed per-round
    // increments — re-materializing the whole accumulation every round
    // would write O(rounds × |closure|) where O(|closure|) suffices
    // (review-caught, r15). The union tree still deepens the plan one
    // leaf per round, so collapse it with a checkpoint every
    // `collapseEvery` rounds: write volume O(|closure| · rounds / 16),
    // plan depth ≤ 16 leaves — deep recursions pay neither full
    // re-writes per round nor an unbounded analysis tree.
    val collapseEvery = 16
    var sinceCollapse = 0
    while (!drained && round < maxRounds) {
      // bind + analyze under the lock (the sql() concurrency
      // contract); the analyzed plan holds the resolved frontier, so
      // a concurrent rebind can't leak into this round's EXCEPT
      val stepped = bindLock.synchronized {
        maybeBroadcastHint(frontier, frontierBytes)
          .createOrReplaceTempView(internal)
        align(sessionSqlOne(spark, step))
      }
      val increment = exceptDistinctVia(stepped, seen, seenBytes)
      // evidence hook: the per-round plan is invisible from the outer
      // statement's explain, so optimization rounds can dump it here
      if (sys.env.get("SPARK_GRAFT_REC_EXPLAIN")
            .exists(_.split(",").contains(round.toString)))
        // scalastyle:off println
        println(increment.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        // scalastyle:on println
      val next = freshCols(increment.localCheckpoint(true))
      val nBytes = checkpointedBytes(next)
      if (next.isEmpty) drained = true
      else {
        seen = seen.union(next)
        seenBytes += nBytes // increments are disjoint by construction
        sinceCollapse += 1
        if (sinceCollapse >= collapseEvery) {
          seen = freshCols(seen.localCheckpoint(true))
          sinceCollapse = 0
        }
        frontier = next
        frontierBytes = nBytes
      }
      round += 1
    }
    require(drained,
      s"UNION-distinct recursion '${rec.name}' did not drain within " +
        s"$maxRounds rounds — the step keeps producing new rows; " +
        "check the recursion or split the query")
    seen
  }

  /** TRUE mutual recursion (gr12): one simultaneous drain loop over a
    * strongly-connected group of recursive CTEs. DuckDB-probed
    * semantics (see [[graft.sql.RecursiveUnion]]): each round every
    * member's step evaluates against the round-start state — the
    * member's OWN view bound to its frontier (last round's new rows,
    * the standard working table), every SIBLING's view bound to that
    * sibling's closure-so-far — and new rows land simultaneously after
    * all members step, so in-round evaluation order cannot leak (the
    * analyzed plan pins the bindings). The loop stops when a full
    * round adds no row to any member; a member whose frontier drains
    * keeps stepping — a sibling's growing closure can still feed it
    * (probed: an empty-seed member fed purely by its sibling).
    *
    * Scale shape: per round each member pays one step + one
    * distinct-EXCEPT against its own closure plus one emptiness probe
    * (all frontier/closure-sized, never path-count-sized — the
    * UNION-distinct cycle guard); closures accumulate as unions of
    * checkpointed per-round increments collapsed every 16 rounds, the
    * [[drainRecursion]] discipline. Cross-references scan the sibling
    * CLOSURE each round — inherent to the probed semantics, O(rounds ×
    * closure) like DuckDB's own evaluation.
    */
  private def drainMutualGroup(spark: SparkSession,
                               group: Seq[graft.sql.RecursiveUnion.Rec],
                               internal: graft.sql.RecursiveUnion.Rec => String,
                               rewriteAll: String => String,
                               freshCols: DataFrame => DataFrame,
                               maxRounds: Int): Seq[DataFrame] = {
    final class Member(val rec: graft.sql.RecursiveUnion.Rec) {
      // seeds bind with NO sibling in scope (a seed referencing a
      // sibling was refused at parse — DuckDB's circular-ref error)
      private val seedDf = sessionSqlOne(spark, rewriteAll(rec.seed))
      val cols: Seq[String] = rec.cols.getOrElse(seedDf.columns.toSeq)
      require(cols.size == seedDf.columns.length,
        s"recursive CTE ${rec.name}(${cols.mkString(", ")}) declares " +
          s"${cols.size} columns, the seed produces " +
          s"${seedDf.columns.length}")
      private val schema = seedDf.toDF(cols: _*).schema
      val step: String = rewriteAll(rec.step)
      var seen: DataFrame =
        freshCols(seedDf.toDF(cols: _*).distinct().localCheckpoint(true))
      var frontier: DataFrame = seen
      // measured sizes drive the broadcast gates (see [[drainRecursion]]):
      // both the member's own frontier binding and the sibling-closure
      // bindings hint when small, and seenBytes gates the EXCEPT build
      var seenBytes: Long = checkpointedBytes(seen)
      var frontierBytes: Long = seenBytes
      var sinceCollapse: Int = 0
      def align(df: DataFrame): DataFrame = {
        require(df.columns.length == cols.size,
          s"recursive step of ${rec.name} produces ${df.columns.length} " +
            s"columns, expected ${cols.size}")
        df.toDF(cols: _*).select(schema.fields.toSeq.map(f =>
          org.apache.spark.sql.functions.col(f.name)
            .cast(f.dataType).as(f.name)): _*)
      }
    }
    val members = group.map(new Member(_))
    var drained = false
    var round = 0
    while (!drained && round < maxRounds) {
      // one member at a time under the lock: siblings bound to their
      // round-start closures, the member itself to its frontier; the
      // eager analysis freezes the resolved frontier/closure into the
      // plan, so later rebinds (the next member, the next round) can't
      // leak into this step's EXCEPT
      val next = members.map { mb =>
        val stepped = bindLock.synchronized {
          members.foreach { o =>
            (if (o eq mb) maybeBroadcastHint(o.frontier, o.frontierBytes)
             else maybeBroadcastHint(o.seen, o.seenBytes))
              .createOrReplaceTempView(internal(o.rec))
          }
          mb.align(sessionSqlOne(spark, mb.step))
        }
        val nf = freshCols(exceptDistinctVia(stepped, mb.seen, mb.seenBytes)
          .localCheckpoint(true))
        (nf, nf.isEmpty, checkpointedBytes(nf))
      }
      drained = next.forall(_._2)
      if (!drained) members.zip(next).foreach {
        case (mb, (nf, empty, nBytes)) =>
          // an empty increment leaves the closure untouched but still
          // empties the frontier (the member keeps stepping off siblings)
          if (!empty) {
            mb.seen = mb.seen.union(nf)
            mb.seenBytes += nBytes
            mb.sinceCollapse += 1
            if (mb.sinceCollapse >= 16) {
              mb.seen = freshCols(mb.seen.localCheckpoint(true))
              mb.sinceCollapse = 0
            }
          }
          mb.frontier = nf
          mb.frontierBytes = nBytes
      }
      round += 1
    }
    require(drained,
      s"mutual recursion over ${group.map(_.name).mkString(", ")} did " +
        s"not drain within $maxRounds rounds — the steps keep producing " +
        "new rows; check the recursion or split the query")
    members.map(_.seen)
  }

  /** Fold of a [[Dialect.splitUnionByName]] split: operands run through
    * `runOne` (the caller's full single-statement pipeline, so QUALIFY /
    * DISTINCT ON / ASOF arms compose), the frames combine with
    * `unionByName(allowMissingColumns = true)` — DuckDB BY NAME column
    * semantics exactly — a bare (non-ALL) BY NAME dedups the
    * accumulated result (left-associative set-op semantics), and the
    * trailing ORDER BY / LIMIT / OFFSET clause runs over the combined
    * frame through a temp view.
    */
  private[graft] def runUnionByName(spark: SparkSession, operands: Seq[String],
                                    allFlags: Seq[Boolean], tail: String)
                                   (runOne: String => DataFrame): DataFrame = {
    var acc = runOne(operands.head)
    operands.tail.zip(allFlags).foreach { case (o, all) =>
      acc = acc.unionByName(runOne(o), allowMissingColumns = true)
      if (!all) acc = acc.distinct()
    }
    if (tail.isEmpty) acc
    else bindLock.synchronized {
      acc.createOrReplaceTempView("__unioned__")
      // the union-level ORDER BY gets the same nulls-last treatment a
      // single statement's would (operands were rewritten individually)
      val out = spark.sql(
        Dialect.orderByNullsLast(s"SELECT * FROM __unioned__ $tail"))
      out.queryExecution.assertAnalyzed()
      out
    }
  }
}
