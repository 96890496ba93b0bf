package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Max, Min, Sum}
import org.apache.spark.sql.types._

/** SQL function surface of the graft engine.
  *
  * Covers the reference's scalar-function library (casts, math, datetime,
  * string — reference: vinum/core/functions.py:353-387) and its NumPy-style
  * `np.*` namespace (reference: vinum/core/udf.py:48-55 resolves arbitrary
  * `np.` names via eval; here that unbounded surface is bounded to a curated
  * mapping table onto Catalyst expressions, per SURVEY §7 "what's hard").
  *
  * Every function builds a *native* Catalyst expression — no Scala UDFs —
  * so the whole surface stays inside whole-stage codegen and pushes down
  * like any built-in.
  *
  * `Dialect.rewrite` turns `np.name(...)` into `np_name(...)` before
  * parsing, which resolves against the `np_*` entries registered here.
  */
object Registry {

  /** Default seed for all hashing operators; fixed for reproducibility. */
  val DefaultSeed = 42L

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def f(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")

    // ---- casts (reference: vinum/core/functions.py:148-193) ----
    // numpy astype semantics: float->int truncates (matches Spark cast);
    // the variadic form packs all args into one array column
    // (reference: vinum/tests/test_query_results.py:792-796).
    def castFn(t: DataType): Seq[Expression] => Expression = {
      case Seq(e)  => Cast(e, t)
      case many    => Cast(CreateArray(many), ArrayType(t))
    }
    f("to_int")(castFn(LongType))
    f("to_long")(castFn(LongType))
    f("to_float")(castFn(DoubleType))
    f("to_double")(castFn(DoubleType))
    f("to_str")(castFn(StringType))
    f("to_bool")(castFn(BooleanType))

    // ---- datetime (reference: vinum/core/functions.py:25-145) ----
    // date(str|'now'): 'now' -> current date, else cast.
    f("date") {
      case Seq(Literal(v, StringType))
          if v != null && v.toString.equalsIgnoreCase("now") =>
        CurrentDate()
      case Seq(e) => Cast(e, DateType)
      case other  => throw new IllegalArgumentException(
        s"date() takes 1 argument, got ${other.length}")
    }
    // datetime(str) / datetime(int[, unit]): numeric input is epoch in
    // `unit` (default seconds). Cast(numeric -> timestamp) already means
    // epoch seconds in Spark, so the 1-arg form handles both strings
    // (ISO8601, incl. partials like '2020-10') and numerics.
    def epochToTs(e: Expression, unit: String): Expression = unit match {
      case "D"  => SecondsToTimestamp(Multiply(Cast(e, LongType), Literal(86400L)))
      case "h"  => SecondsToTimestamp(Multiply(Cast(e, LongType), Literal(3600L)))
      case "m"  => SecondsToTimestamp(Multiply(Cast(e, LongType), Literal(60L)))
      case "s"  => SecondsToTimestamp(Cast(e, LongType))
      case "ms" => MillisToTimestamp(Cast(e, LongType))
      case "us" => MicrosToTimestamp(Cast(e, LongType))
      case "ns" => MicrosToTimestamp(IntegralDivide(Cast(e, LongType), Literal(1000L)))
      case u    => throw new IllegalArgumentException(s"unsupported datetime unit '$u'")
    }
    def unitOf(e: Expression, dflt: String): String = e match {
      case Literal(v, StringType) if v != null => v.toString
      case _ => dflt
    }
    f("datetime") {
      case Seq(e)    => Cast(e, TimestampType)
      case Seq(e, u) => epochToTs(e, unitOf(u, "s"))
      case other     => throw new IllegalArgumentException(
        s"datetime() takes 1-2 arguments, got ${other.length}")
    }
    f("from_timestamp") {
      case Seq(e)    => SecondsToTimestamp(Cast(e, LongType))
      case Seq(e, u) => epochToTs(e, unitOf(u, "s"))
      case other     => throw new IllegalArgumentException(
        s"from_timestamp() takes 1-2 arguments, got ${other.length}")
    }
    // timedelta(n, unit), units Y/M/W/D/h/m/s/ms/us/ns
    // (reference: vinum/core/functions.py:106-126)
    f("timedelta") {
      case Seq(e, u) =>
        val zero = Literal(0)
        // MakeDTInterval asserts the seconds decimal has scale exactly 6
        val zeroSec = Literal.create(
          Decimal(new java.math.BigDecimal("0.000000")), DecimalType(18, 6))
        unitOf(u, "D") match {
          case "Y" => MakeYMInterval(Cast(e, IntegerType), zero)
          case "M" => MakeYMInterval(zero, Cast(e, IntegerType))
          case "W" => MakeDTInterval(Multiply(Cast(e, IntegerType), Literal(7)), zero, zero, zeroSec)
          case "D" => MakeDTInterval(Cast(e, IntegerType), zero, zero, zeroSec)
          case "h" => MakeDTInterval(zero, Cast(e, IntegerType), zero, zeroSec)
          case "m" => MakeDTInterval(zero, zero, Cast(e, IntegerType), zeroSec)
          case "s" => MakeDTInterval(zero, zero, zero, Cast(e, DecimalType(18, 6)))
          case "ms" => MakeDTInterval(zero, zero, zero, Cast(Divide(Cast(e, DoubleType), Literal(1e3)), DecimalType(18, 6)))
          case "us" => MakeDTInterval(zero, zero, zero, Cast(Divide(Cast(e, DoubleType), Literal(1e6)), DecimalType(18, 6)))
          case "ns" => MakeDTInterval(zero, zero, zero, Cast(Divide(Cast(e, DoubleType), Literal(1e9)), DecimalType(18, 6)))
          case u0  => throw new IllegalArgumentException(s"unsupported timedelta unit '$u0'")
        }
      case other => throw new IllegalArgumentException(
        s"timedelta() takes 2 arguments, got ${other.length}")
    }
    // is_busday(date): Mon..Fri (reference: vinum/core/functions.py:129-138,
    // numpy busday semantics). WeekDay: Monday=0 .. Sunday=6.
    f("is_busday") {
      case Seq(e) => LessThan(WeekDay(Cast(e, DateType)), Literal(5))
      case other  => throw new IllegalArgumentException(
        s"is_busday() takes 1 argument, got ${other.length}")
    }

    // ---- overflow-safe big sum (SURVEY §2.4: reference promotes int64
    // sums to hugeint/Decimal128 on overflow; we fix the type statically) --
    f("sum_big") {
      case Seq(e) => Sum(Cast(e, DecimalType(38, 0)))
      case other  => throw new IllegalArgumentException(
        s"sum_big() takes 1 argument, got ${other.length}")
    }

    // ---- np.* namespace (bounded mapping; SURVEY §2.8) ----
    def unary(name: String)(mk: Expression => Expression): Unit =
      f(name) {
        case Seq(e) => mk(e)
        case other  => throw new IllegalArgumentException(
          s"$name() takes 1 argument, got ${other.length}")
      }
    def binary(name: String)(mk: (Expression, Expression) => Expression): Unit =
      f(name) {
        case Seq(a, b) => mk(a, b)
        case other     => throw new IllegalArgumentException(
          s"$name() takes 2 arguments, got ${other.length}")
      }
    unary("np_log")(Log(_))
    unary("np_log2")(Log2(_))
    unary("np_log10")(Log10(_))
    unary("np_log1p")(Log1p(_))
    unary("np_sqrt")(Sqrt(_))
    unary("np_cbrt")(Cbrt(_))
    unary("np_exp")(Exp(_))
    unary("np_expm1")(Expm1(_))
    unary("np_abs")(Abs(_))
    unary("np_negative")(UnaryMinus(_))
    unary("np_sin")(Sin(_))
    unary("np_cos")(Cos(_))
    unary("np_tan")(Tan(_))
    unary("np_arcsin")(Asin(_))
    unary("np_arccos")(Acos(_))
    unary("np_arctan")(Atan(_))
    unary("np_sinh")(Sinh(_))
    unary("np_cosh")(Cosh(_))
    unary("np_tanh")(Tanh(_))
    unary("np_floor")(Floor(_))
    unary("np_ceil")(Ceil(_))
    unary("np_sign")(Signum(_))
    unary("np_degrees")(ToDegrees(_))
    unary("np_radians")(ToRadians(_))
    unary("np_isnan")(IsNaN(_))
    unary("np_square")(e => Pow(e, Literal(2.0)))
    unary("np_reciprocal")(e => Divide(Literal(1.0), e))
    binary("np_power")(Pow(_, _))
    binary("np_arctan2")(Atan2(_, _))
    binary("np_mod")(Remainder(_, _))
    binary("np_fmod")(Remainder(_, _))
    binary("np_minimum")((a, b) => Least(Seq(a, b)))
    binary("np_maximum")((a, b) => Greatest(Seq(a, b)))
    // np aggregates, usable anywhere an aggregate is legal
    // (reference: vinum/core/functions.py:402-406 aliases np.min/max/sum)
    unary("np_min")(Min(_))
    unary("np_max")(Max(_))
    unary("np_sum")(Sum(_))
    unary("np_mean")(Average(_))

    // ---- hashing / vector operators (engine extensions) ----
    def isIntegral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v, dt) if v != null && isIntegral(dt) => v.toString.toInt
      case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
    }
    def longLit(e: Expression, what: String): Long = e match {
      case Literal(v, dt) if v != null && isIntegral(dt) => v.toString.toLong
      case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
    }
    // the custom expressions skip Catalyst's implicit-cast machinery
    // (private[sql]); builders insert the casts explicitly instead
    def darr(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
    def larr(e: Expression): Expression = Cast(e, ArrayType(LongType))
    f("cosine_sim") {
      case Seq(a, b) => CosineSim(darr(a), darr(b))
      case other     => throw new IllegalArgumentException(
        s"cosine_sim() takes 2 arguments, got ${other.length}")
    }
    f("minhash_sig") {
      case Seq(a, n)    => MinHashSig(larr(a), intLit(n, "numHashes"), DefaultSeed)
      case Seq(a, n, s) => MinHashSig(larr(a), intLit(n, "numHashes"), longLit(s, "seed"))
      case other        => throw new IllegalArgumentException(
        s"minhash_sig() takes 2-3 arguments, got ${other.length}")
    }
    f("simhash64") {
      case Seq(a)    => SimHash64(larr(a), DefaultSeed)
      case Seq(a, s) => SimHash64(larr(a), longLit(s, "seed"))
      case other     => throw new IllegalArgumentException(
        s"simhash64() takes 1-2 arguments, got ${other.length}")
    }
    f("window_hashes") {
      case Seq(a, kk)    => WindowHashes(larr(a), intLit(kk, "k"), DefaultSeed)
      case Seq(a, kk, s) => WindowHashes(larr(a), intLit(kk, "k"), longLit(s, "seed"))
      case other         => throw new IllegalArgumentException(
        s"window_hashes() takes 2-3 arguments, got ${other.length}")
    }
    f("topk_by") {
      case Seq(score, id, kk) =>
        TopKByScore(Cast(score, DoubleType), Cast(id, LongType), intLit(kk, "k"))
      case other => throw new IllegalArgumentException(
        s"topk_by() takes 3 arguments, got ${other.length}")
    }
    f("sign_bits") {
      case Seq(a, n)    => SignBits(darr(a), intLit(n, "bits"), DefaultSeed)
      case Seq(a, n, s) => SignBits(darr(a), intLit(n, "bits"), longLit(s, "seed"))
      case other        => throw new IllegalArgumentException(
        s"sign_bits() takes 2-3 arguments, got ${other.length}")
    }
  }
}
