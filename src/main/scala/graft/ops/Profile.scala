package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Column-level data profiling — the corpus QA pass run before and after
  * every curation stage (did dedup drop nulls? did a join explode
  * cardinality?).
  *
  * One aggregation job over the data produces every metric (Spark plans
  * the multi-column exact distinct via one Expand — rows×columns
  * map-side, still a single pass and one shuffle); the single result row
  * is then unpivoted driver-free into one row per column. Output:
  * (column STRING, n BIGINT, n_null BIGINT, n_distinct BIGINT).
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n"),
        col(s"__nn_$c").cast("long").as("n_null"),
        col(s"__nd_$c").as("n_distinct")))
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.column"), col("p.n"), col("p.n_null"), col("p.n_distinct"))
  }

  /** DuckDB-`SUMMARIZE`-shaped full column profile (q59): one row per
    * column with DuckDB's exact output columns and naming —
    * (column_name, column_type, min, max, approx_unique, avg, std, q25,
    * q50, q75, count, null_percentage) in table column order. Backs the
    * dialect's `SUMMARIZE t` / `SUMMARIZE SELECT …` statement form.
    *
    * Deliberate, documented divergences from DuckDB's VALUES (names and
    * shape match exactly):
    *  - `approx_unique` is the EXACT distinct count (DuckDB uses HLL —
    *    approximate and engine-specific; exactness is the curated-map
    *    discipline every other gate here follows);
    *  - `q25/q50/q75` are exact interpolated percentiles
    *    (≡ `quantile_cont`; DuckDB SUMMARIZE uses approximate quantiles);
    *  - `avg`/`std`/quantiles stay typed DOUBLE and min/max render via
    *    Spark's CAST TO STRING (DuckDB stringifies every stat so mixed
    *    column types share one table; only min/max actually need that).
    *
    * Determinism: integral/decimal columns take the exact-moment path —
    * sums widen to Decimal(38,0) BEFORE multiplying (the e21/g19
    * discipline), and mean/std derive from those exact sums with one
    * pinned double-arithmetic chain, so an external engine re-derives
    * identical bits. Float/double columns use streaming avg/stddev
    * (order-dependent merge noise — document-scale QA only).
    *
    * Scale shape: ONE aggregation pass over the data (the multi-column
    * exact distinct plans as one Expand — rows × columns map-side, one
    * shuffle, same as [[summarize]]), then the single result row
    * unpivots driver-free. Non-orderable columns (maps) profile as
    * count-only rows.
    */
  /** DuckDB's spelling of a Spark type — the `column_type` column of
    * both the SUMMARIZE (q59) and DESCRIBE (q60) dialect forms.
    */
  private[graft] def duckTypeName(
      dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case StringType => "VARCHAR"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case _: TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case BinaryType => "BLOB"
      case ArrayType(e, _) => duckTypeName(e) + "[]"
      case other => other.sql
    }
  }

  /** DuckDB-`DESCRIBE`-shaped schema listing (q60): one row per column,
    * (column_name, column_type, null, key, default, extra) — all
    * VARCHAR, `null` = YES/NO from schema nullability, the last three
    * NULL (no constraint catalog), rows in schema order. Driver-side by
    * nature (schemas are); backs the dialect's `DESCRIBE t` /
    * `DESCRIBE SELECT …` statement form same-text.
    */
  def describeDuck(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq("column_name", "column_type", "null",
      "key", "default", "extra").map(StructField(_, StringType)))
    val rows = df.schema.fields.toSeq.map { f =>
      org.apache.spark.sql.Row(f.name, duckTypeName(f.dataType),
        if (f.nullable) "YES" else "NO", null, null, null)
    }
    df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  def summarizeFull(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    require(df.columns.nonEmpty, "SUMMARIZE needs at least one column")
    def duckType(dt: DataType): String = duckTypeName(dt)
    def orderable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(e, _) => orderable(e)
      case s: StructType => s.fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val n = count(lit(1))
    val fields = df.schema.fields.toSeq
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      // backtick-quote: a bare col("a.b") would parse as struct-field
      // access and crash SUMMARIZE on dotted column names
      val c = col("`" + f.name.replace("`", "``") + "`")
      val ord = orderable(f.dataType)
      val base = Seq(
        (if (ord) min(c).cast("string") else lit(null).cast("string"))
          .as(s"__mn_$i"),
        (if (ord) max(c).cast("string") else lit(null).cast("string"))
          .as(s"__mx_$i"),
        (if (ord) count_distinct(c) else lit(null).cast("long"))
          .as(s"__nd_$i"),
        count(c).as(s"__cnt_$i"), n.as(s"__n_$i"))
      val nullD = lit(null).cast("double")
      val moments = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          // widen BEFORE multiplying: LONG x*x wraps silently near 3e9
          val d = c.cast("decimal(38,0)")
          Seq(sum(d).cast("double").as(s"__s1_$i"),
            sum(d * d).cast("double").as(s"__s2_$i"),
            percentile(c, array(lit(0.25), lit(0.5), lit(0.75)))
              .as(s"__q_$i"))
        case FloatType | DoubleType | _: DecimalType =>
          Seq(avg(c).cast("double").as(s"__s1_$i"),
            stddev_samp(c.cast("double")).as(s"__s2_$i"),
            percentile(c, array(lit(0.25), lit(0.5), lit(0.75)))
              .as(s"__q_$i"))
        case _ =>
          Seq(nullD.as(s"__s1_$i"), nullD.as(s"__s2_$i"),
            lit(null).cast("array<double>").as(s"__q_$i"))
      }
      base ++ moments
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      val cnt = col(s"__cnt_$i").cast("double")
      val isExactMoment = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      val isFloat = f.dataType match {
        case FloatType | DoubleType | _: DecimalType => true
        case _ => false
      }
      val mean =
        if (isExactMoment) col(s"__s1_$i") / cnt
        else if (isFloat) col(s"__s1_$i")
        else lit(null).cast("double")
      val std =
        if (isExactMoment) when(col(s"__cnt_$i") >= 2,
          sqrt((col(s"__s2_$i") - col(s"__s1_$i") * col(s"__s1_$i") / cnt)
            / (cnt - 1)))
        else if (isFloat) col(s"__s2_$i")
        else lit(null).cast("double")
      val q = col(s"__q_$i")
      struct(lit(f.name).as("column_name"),
        lit(duckType(f.dataType)).as("column_type"),
        col(s"__mn_$i").as("min"), col(s"__mx_$i").as("max"),
        col(s"__nd_$i").as("approx_unique"), mean.as("avg"), std.as("std"),
        (if (isExactMoment || isFloat) q(0) else lit(null).cast("double"))
          .as("q25"),
        (if (isExactMoment || isFloat) q(1) else lit(null).cast("double"))
          .as("q50"),
        (if (isExactMoment || isFloat) q(2) else lit(null).cast("double"))
          .as("q75"),
        col(s"__n_$i").as("count"),
        when(col(s"__n_$i") > 0,
          round((col(s"__n_$i") - col(s"__cnt_$i")).cast("double") * 100 /
            col(s"__n_$i").cast("double"), 2)).as("null_percentage"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Per-dimension embedding statistics — the QA card run before ANN
    * index builds (a dead dimension, a scale blow-up, or NaN poisoning
    * shows up here first). One posexplode + one keyed aggregation with
    * map-side combine; output is dims rows, independent of corpus size.
    * round(,6) absorbs merge-order float noise (the g05 discipline).
    */
  def embeddingStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("__p", "__x")))
      .groupBy((col("__p") + 1).cast("long").as("dim"))
      .agg(round(avg(col("__x")), 6).as("mean"),
        round(stddev_samp(col("__x")), 6).as("std"),
        round(min(col("__x")), 6).as("mn"),
        round(max(col("__x")), 6).as("mx"))
      .orderBy(col("dim"))

  /** Pairwise Pearson correlation matrix (upper triangle) over numeric
    * columns — the feature-redundancy screen. All n·(n−1)/2 pairs ride
    * ONE aggregation pass (corr is a streaming aggregate), then the
    * single result row unpivots driver-free, same as [[summarize]].
    * round(,6) absorbs merge-order float noise.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"__c_${a}_$b")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__c_${a}_$b").as("corr"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.corr"))
  }

  /** Robust outlier counts per group: median + MAD (median absolute
    * deviation), flag |v − med| > k·1.4826·MAD (1.4826 scales MAD to σ
    * under normality — the standard robust z-score). Exact medians ride
    * sort-based aggregations; the per-group (med, mad) pair broadcasts
    * back onto the stream, so the data-volume cost is two passes and
    * zero wide shuffles. Both stats are rounded to 6 places BEFORE the
    * threshold compare so an external re-derivation lands on identical
    * flags.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    val mad = df.join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(round(expr(s"percentile(abs($valueCol - med), 0.5)"), 6).as("mad"),
        first(col("med")).as("med2"))
      .select(col(groupCol), col("med2").as("med"), col("mad"))
    df.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("median"),
        first(col("mad")).as("mad"),
        sum(when(abs(col(valueCol) - col("med")) >
          lit(k) * lit(1.4826) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Population Stability Index — the standard drift monitor between a
    * reference and a current segment of the same stream (week-over-week
    * feature drift, train/serve skew). Values are histogrammed into
    * `bins` fixed-width buckets over [lo, hi) (outliers clamped to the
    * edge buckets), and per group
    * PSI = Σ_buckets (p_ref − p_cur) · ln(p_ref / p_cur), with empty-side
    * proportions floored at 1e-6 so observed-on-one-side-only buckets
    * contribute a finite penalty instead of ±∞.
    *
    * Rule of thumb downstream: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * investigate.
    *
    * Scale shape: one keyed aggregation on (group, bucket) with map-side
    * combine — the histogram — collapses the corpus to (groups × bins)
    * rows; the group-total window and final per-group aggregation run
    * over that tiny set, so nothing after the first shuffle touches the
    * data volume. No collect anywhere.
    *
    * @param refCol boolean column: true = reference segment, false =
    *               current segment
    * @return (groupCol, n_ref BIGINT, n_cur BIGINT, psi DOUBLE
    *         rounded to 6 places)
    */
  def psi(df: DataFrame, groupCol: String, valueCol: String, refCol: String,
          bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, "hi must exceed lo")
    val width = (hi - lo) / bins
    val bucket = least(greatest(
      floor((col(valueCol) - lo) / width).cast("long"), lit(0L)),
      lit(bins - 1L))
    val hist = df
      .select(col(groupCol), col(refCol).as("__ref"), bucket.as("__b"))
      .groupBy(col(groupCol), col("__b"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("__na"),
        sum(when(col("__ref"), 0L).otherwise(1L)).as("__nb"))
    val eps = 1e-6
    hist
      .withColumn("__ta", sum(col("__na")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
      .withColumn("__tb", sum(col("__nb")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
      .withColumn("__pa", greatest(col("__na") / col("__ta"), lit(eps)))
      .withColumn("__pb", greatest(col("__nb") / col("__tb"), lit(eps)))
      .groupBy(col(groupCol))
      .agg(sum(col("__na")).as("n_ref"), sum(col("__nb")).as("n_cur"),
        round(sum((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb"))),
          6).as("psi"))
  }

  /** k-anonymity audit (pr21): how re-identifiable is a dataset on a
    * set of quasi-identifier columns? Every row whose quasi-identifier
    * combination is shared by fewer than k rows is "at risk" (an
    * attacker who knows those attributes pins the row to a < k-person
    * crowd). Output is ONE summary row: the threshold, the dataset's
    * actual k (the smallest group), group counts, and the violating
    * rows' count and fraction — the release-gate numbers a privacy
    * review asks for before data leaves the pipeline.
    *
    * Scale shape: one keyed rollup with map-side combine (shuffle ∝
    * DISTINCT quasi-identifier combinations, never rows) folded into an
    * O(groups) global summary. Nulls form their own group, standard SQL
    * GROUP BY semantics — a null attribute is still an attribute an
    * attacker can match on.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k > 0, "k must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(lit(k).as("k_threshold"),
        min(col("__n")).as("k_actual"),
        count(lit(1)).as("n_groups"),
        sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L)).as("rows_at_risk"),
        round(sum(when(col("__n") < k, col("__n")).otherwise(0L))
          .cast("double") / sum(col("__n")), 6).as("risk_fraction"))
  }

  /** Shuffle-key skew profile: would partitioning on `keyCol` distribute
    * evenly? One row of summary statistics over the PER-KEY row counts —
    * key cardinality, the heaviest key's share of all rows, the combined
    * share of the `topK` heaviest keys, and the Gini coefficient of the
    * count distribution (0 = perfectly even, →1 = one key owns
    * everything). The pre-shot diagnostic before committing a join or
    * aggregation to a key at 100 TB — a max_share near 1/partitions
    * means one straggler task; the fix is salting ([[Skew]]) or a
    * different key.
    *
    * Scale shape: ONE keyed count with map-side combine (the same
    * shuffle the diagnosed job would pay) collapses the corpus to
    * #keys rows, then a SECOND rollup to count-of-counts — one row per
    * DISTINCT per-key count, a relation small enough to window globally
    * even when keys number in the billions (counts repeat heavily). The
    * Gini rank-sum Σ i·c_i is exact anyway: keys tied at count c occupy
    * a contiguous rank run [lo, hi] and contribute c·Σ_{lo..hi} i
    * regardless of their order within the run, so no per-key ranking is
    * ever materialized. Null keys count as a key (they hash to one
    * partition like any value).
    *
    * Gini = (2·Σ_i i·c_i) / (n·Σ c_i) − (n+1)/n over counts c_1 ≤ … ≤
    * c_n, exact, not sampled. Shares and gini round to 6 places.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    require(topK > 0, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1L)).as("__c"))
    val cc = counts.groupBy(col("__c")).agg(count(lit(1L)).as("__f"))
    // ascending cumulative key-frequency = the rank run's upper end;
    // descending cumulative = how many keys are at-or-above this count
    // (for the topK share, greedily filled from the heaviest run down)
    val asc = Window.orderBy(col("__c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col("__c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cc
      .withColumn("__hi", sum(col("__f")).over(asc))
      .withColumn("__dcum", sum(col("__f")).over(desc))
      .select(col("__c"), col("__f"), col("__hi"), col("__dcum"))
      .agg(
        sum(col("__f")).as("n_keys"),
        sum(col("__c") * col("__f")).as("n_rows"),
        max(col("__c")).as("__maxc"),
        // rank run for count __c is [__hi-__f+1, __hi]; Σ_{run} i in the
        // cancellation-free closed form f·(2·hi − f + 1)/2, in doubles
        // (exact to 2^53 — far past any real key cardinality)
        sum(col("__c").cast("double") * col("__f").cast("double")
          * (lit(2.0) * col("__hi") - col("__f") + lit(1.0)) / lit(2.0))
          .as("__ric"),
        sum(col("__c") * greatest(lit(0L),
          least(col("__f"), lit(topK.toLong) - (col("__dcum") - col("__f")))))
          .as("__topn"))
      .select(col("n_keys"), col("n_rows"),
        round(col("__maxc").cast("double") / col("n_rows"), 6).as("max_share"),
        round(col("__topn").cast("double") / col("n_rows"), 6).as("top_share"),
        round(lit(2.0) * col("__ric")
            / (col("n_keys").cast("double") * col("n_rows"))
          - (col("n_keys") + lit(1.0)) / col("n_keys"), 6).as("gini"))
  }

  /** Data-quality expectation checks (pr22) — the dbt-test /
    * Great-Expectations contract surface every production pipeline
    * gates loads on, run as ONE relational pass where the checks allow:
    * all ROW-LEVEL checks (not-null, accepted-values, between, regex)
    * fuse into a single aggregation of conditional sums over one scan;
    * each UNIQUE check is its own keyed aggregation (it needs per-key
    * counts). Nothing collects; the result is one row per check:
    * (check, target, n_violations, passed) — feed it to a WAP audit
    * ([[graft.ops.Wap.writeAuditPublish]]) to make the gate block a
    * publish.
    */
  sealed trait Check
  final case class NotNull(column: String) extends Check
  final case class AcceptedValues(column: String,
                                  values: Seq[String]) extends Check
  /** Closed interval on a numeric column; NULL never violates (pair
    * with [[NotNull]] for that).
    */
  final case class Between(column: String, lo: Double,
                           hi: Double) extends Check
  final case class MatchesRegex(column: String, regex: String) extends Check
  final case class Unique(columns: Seq[String]) extends Check

  def expectations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one expectation")
    val cols = df.columns.map(_.toLowerCase).toSet
    def known(c: String): String = {
      require(cols.contains(c.toLowerCase),
        s"expectation references unknown column '$c'")
      c
    }
    val rowLevel: Seq[(String, String, Column)] = checks.collect {
      case NotNull(c) =>
        ("not_null", c, col(known(c)).isNull)
      case AcceptedValues(c, vs) =>
        require(vs.nonEmpty, s"accepted_values($c) needs values")
        ("accepted_values", c,
          col(known(c)).isNotNull && !col(c).isin(vs: _*))
      case Between(c, lo, hi) =>
        ("between", c, col(known(c)).isNotNull &&
          (col(c) < lo || col(c) > hi))
      case MatchesRegex(c, re) =>
        ("matches_regex", c,
          col(known(c)).isNotNull && !col(c).rlike(re))
    }
    val rowFrame: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else Some {
        val agg = df.agg(
          sum(when(rowLevel.head._3, 1L).otherwise(0L)).as("__v0"),
          rowLevel.tail.zipWithIndex.map { case ((_, _, bad), i) =>
            sum(when(bad, 1L).otherwise(0L)).as(s"__v${i + 1}")
          }: _*)
        // unpivot the one aggregate row to one row per check — driver-free
        agg.select(explode(array(rowLevel.zipWithIndex.map {
          case ((kind, c, _), i) => struct(lit(kind).as("check"),
            lit(c).as("target"), col(s"__v$i").as("n_violations"))
        }: _*)).as("__e")).select(col("__e.*"))
      }
    val uniqueFrames = checks.collect { case Unique(ucols) =>
      require(ucols.nonEmpty, "unique() needs columns")
      ucols.foreach(known)
      df.groupBy(ucols.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        // violations = surplus rows beyond the first of each key (the
        // dbt convention counts duplicated rows, not duplicate keys)
        .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
        .select(lit("unique").as("check"),
          lit(ucols.mkString(",")).as("target"), col("n_violations"))
    }
    val all = (rowFrame.toSeq ++ uniqueFrames).reduce(_.unionByName(_))
    all.withColumn("passed", col("n_violations") === 0L)
  }
}
