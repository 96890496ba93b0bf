package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared tokenization / shingling column builders.
  *
  * Everything is a pure Catalyst expression tree (no UDFs): the operators
  * composed from these stay inside whole-stage codegen and distribute
  * trivially — per-row work, no state, no shuffle.
  */
object TextOps {

  /** Lowercased word tokens; empty fragments from leading/trailing
    * separators are dropped (regex split keeps them otherwise).
    */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\W+"), t => t =!= lit(""))

  /** xxhash64 of each token — the integer-domain representation all the
    * hashing operators (minhash/simhash) consume.
    */
  def tokenHashes(c: Column): Column =
    transform(tokens(c), t => xxhash64(t))

  /** Word k-shingles joined with single spaces. Documents shorter than k
    * tokens yield one shingle: the whole document.
    */
  def shingles(c: Column, k: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < k, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))
  }

  /** Integer gram identities for the hashGrams tiers (d14/d17/t22/ap04):
    * the NUMERIC shingling path — [[graft.functions.WindowHashes]] over
    * per-token xxhash64 values, constructed directly as a Catalyst
    * expression (no registry dependency, codegen'd kernel). No
    * per-shingle string is ever materialized: the old
    * `transform(shingles, xxhash64)` built every gram string and hashed
    * it through an interpreted lambda — measured 7× slower on t22's
    * posting build when ap04/t22 made this switch. Distinct hashes ≡
    * distinct string k-grams absent 64-bit collisions (every consumer's
    * strict string-gram oracle re-checks that), INCLUDING the
    * whole-document gram for sub-k-token texts (WindowHashes hashes all
    * elements when the input is shorter than k). Divergence from the
    * string tier: a ZERO-token text has no gram here (null → dropped)
    * where `shingles` yields one empty-string gram — equivalence holds
    * for any text with at least one word token (spec-pinned).
    */
  def shingleHashes(c: Column, k: Int): Column =
    shingleHashesOfTokens(tokens(c), k)

  /** [[shingleHashes]] over an already-derived token array column —
    * for operators that need the hash at a POSITION indexing that same
    * array (sharedRuns): window hash i covers tokens [i, i+k).
    */
  def shingleHashesOfTokens(toks: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      graft.functions.WindowHashes(
        org.apache.spark.sql.GraftColumnBridge.toExpression(
          transform(toks, t => xxhash64(t))),
        k, graft.functions.Registry.DefaultSeed))

  // --- URL canonicalization -------------------------------------------
  //
  // Web-corpus dedup keys on the canonical URL, not the raw crawl string:
  // the same page arrives as HTTP://Host:80/a/?utm_source=x and
  // http://host/a. Every step below is a RE2-compatible regex (no
  // lookaround, no backreferences), so the DuckDB oracle re-derives the
  // exact same strings with the exact same patterns. Pure codegen'd
  // expressions — per-row work, no shuffle, no UDF.

  /** scheme://authority prefix, lowercased, default :80/:443 stripped. */
  private def urlHead(c: Column): Column =
    regexp_replace(
      lower(regexp_extract(c, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
      ":(80|443)$", "")

  /** Everything after the authority (path + query), fragment dropped,
    * tracking params (utm_*, fbclid, gclid, ref) removed, separator
    * debris ("?&", trailing "?"/"&", trailing "/") cleaned up.
    */
  private def urlTail(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val tail = regexp_extract(noFrag,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1)
    val noAmp = regexp_replace(tail,
      "&(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*", "")
    val noFirst = regexp_replace(noAmp,
      "\\?(utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&#]*&?", "?")
    val noTrailSep = regexp_replace(noFirst, "[?&]+$", "")
    val slashQ = regexp_replace(noTrailSep, "/+\\?", "?")
    regexp_replace(slashQ, "/+$", "")
  }

  /** Canonical form of an absolute http(s) URL: lowercased scheme+host,
    * default port stripped, fragment dropped, tracking params removed,
    * trailing slashes collapsed. Path/query case is preserved (paths are
    * case-sensitive).
    */
  def normalizeUrl(c: Column): Column = concat(urlHead(c), urlTail(c))

  /** Lowercased host (no port). */
  def urlHost(c: Column): Column =
    lower(regexp_extract(c, "://([^/:?#]+)", 1))

  /** Registrable-domain heuristic: last two host labels, or last three
    * when the second-level label is a common country-code prefix
    * (example.co.uk -> example.co.uk, www.example.com -> example.com).
    * A production run swaps in the full public-suffix list as a
    * broadcast lookup; the heuristic keeps this expression-only.
    */
  def registrableDomain(c: Column): Column = {
    val parts = split(urlHost(c), "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(n <= lit(2), concat_ws(".", parts))
      .when(element_at(parts, -2).isin("co", "com", "net", "org", "ac",
        "gov", "edu") && n >= lit(3), last3)
      .otherwise(last2)
  }
}
