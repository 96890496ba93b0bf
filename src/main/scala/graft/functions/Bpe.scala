package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer state for a FIXED merges table.
  *
  * Standard BPE semantics (the sentencepiece/GPT-2 formulation): start
  * from single characters, then repeatedly find the LOWEST-RANK adjacent
  * pair present in the token sequence and merge ALL its occurrences
  * left-to-right non-overlapping, until no listed pair remains. The
  * merges table must satisfy the natural training invariant — each
  * pair's constituents are single characters or products of LOWER-rank
  * merges — which every real BPE vocabulary satisfies by construction
  * (a token must exist before it can participate in a later merge).
  * Under that invariant the per-round and per-occurrence formulations
  * converge to the same tokenization, which is what makes the driver
  * oracle's iterative re-derivation exact.
  *
  * The instance rides into tasks as a codegen reference object; the
  * rank map and the word→tokens memo cache are rebuilt lazily per
  * deserialized copy (corpora repeat words heavily — the cache turns
  * tokenization into a hash lookup after first sight of a word).
  */
final class BpeVocab(val merges: Array[(String, String)]) extends Serializable {

  @transient private lazy val rankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + "\u0001" + merges(i)._2, i)
      i += 1
    }
    m
  }

  @transient private lazy val cache = new ConcurrentHashMap[String, Array[String]]()

  def tokenizeWord(word: String): Array[String] =
    cache.computeIfAbsent(word, w => tokenizeUncached(w))

  private def tokenizeUncached(word: String): Array[String] = {
    var toks = new Array[String](word.length)
    var c = 0
    while (c < word.length) { toks(c) = String.valueOf(word.charAt(c)); c += 1 }
    var done = toks.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rankOf.get(toks(i) + "\u0001" + toks(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val l = merges(best)._1
        val r = merges(best)._2
        val out = Array.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
            out += l + r; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
        if (toks.length < 2) done = true
      }
    }
    toks
  }
}

/** Static BPE kernels — called from both the interpreted eval path and
  * the generated code (same [[Kernels]] discipline: whole-stage codegen
  * spans stay unbroken, the loops run as ordinary compiled JVM code).
  *
  * Pre-tokenization: lowercase (root locale), words are maximal
  * `[a-z0-9]+` runs — everything else separates. This matches the
  * DuckDB-side `string_split_regex(lower(text), '[^a-z0-9]+')` the
  * oracle uses, so token counts re-derive exactly.
  */
object Bpe {

  @inline private def isAlnum(ch: Char): Boolean =
    (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')

  /** Total BPE token count over all words of `text`. */
  def countTokens(text: UTF8String, vocab: BpeVocab): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !isAlnum(s.charAt(i))) i += 1
      val start = i
      while (i < n && isAlnum(s.charAt(i))) i += 1
      if (i > start) total += vocab.tokenizeWord(s.substring(start, i)).length
    }
    total
  }

  /** The concatenated BPE token sequence over all words of `text`. */
  def tokens(text: UTF8String, vocab: BpeVocab): GenericArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val out = Array.newBuilder[Any]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !isAlnum(s.charAt(i))) i += 1
      val start = i
      while (i < n && isAlnum(s.charAt(i))) i += 1
      if (i > start) {
        val toks = vocab.tokenizeWord(s.substring(start, i))
        var t = 0
        while (t < toks.length) { out += UTF8String.fromString(toks(t)); t += 1 }
      }
    }
    new GenericArrayData(out.result())
  }

  /** A small fixed English-ish merges list used by the driver queries and
    * specs — ordered so every pair's constituents come from lower ranks
    * (the real-vocabulary invariant the scaladoc above relies on). The
    * operator itself takes ANY merges table; production would broadcast a
    * trained vocabulary's full list the same way.
    */
  val EnglishMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "u"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("o", "r"), ("in", "g"), ("a", "r"),
    ("a", "l"))
}

/** `bpe_token_count(text, merges)` — BPE token count of a document under
  * a fixed merges table. The training-data budget unit: packing and
  * chunking count what the model will actually consume, not whitespace
  * words. Map-only, codegen'd; the merges table is a reference object in
  * the generated code (one deserialized copy per task, not per row).
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val vocab = new BpeVocab(merges.toArray)

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(in: Any): Any =
    Bpe.countTokens(in.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    defineCodeGen(ctx, ev, in => s"graft.functions.Bpe.countTokens($in, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_tokens(text, merges)` — the token sequence itself (array of
  * strings), for inspection/debugging and vocabulary work.
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val vocab = new BpeVocab(merges.toArray)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(in: Any): Any =
    Bpe.tokens(in.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    defineCodeGen(ctx, ev, in => s"graft.functions.Bpe.tokens($in, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
