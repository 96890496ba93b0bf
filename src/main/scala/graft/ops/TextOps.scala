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

  def shingleHashes(c: Column, k: Int): Column =
    transform(shingles(c, k), s => xxhash64(s))
}
