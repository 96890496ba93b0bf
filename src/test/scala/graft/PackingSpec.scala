package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Concat-and-chunk packing: offsets, straddling, per-shard independence. */
class PackingSpec extends GraftSuite {
  import spark.implicits._

  test("offsets accumulate per shard and straddling docs span sequences") {
    val docs = Seq(
      ("a", 1L, 6L),  // off 0  -> seq 0, offset 0, fits (spans 1)
      ("a", 2L, 3L),  // off 6  -> seq 0, offset 6, straddles into seq 1 (spans 2)
      ("a", 3L, 0L),  // off 9  -> empty doc: spans 0
      ("a", 4L, 17L), // off 9  -> seq 1, offset 1, spans 3 (tokens 9..25)
      ("b", 9L, 5L)   // new shard: off resets to 0
    ).toDF("src", "id", "nt")
    val out = Packing.packSequences(docs, "id", "src", col("nt"), budget = 8)
      .orderBy("src", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out === Array(
      ("a", 1L, 6L, 0L, 0L, 1L),
      ("a", 2L, 3L, 0L, 6L, 2L),
      ("a", 3L, 0L, 1L, 1L, 0L),
      ("a", 4L, 17L, 1L, 1L, 3L),
      ("b", 9L, 5L, 0L, 0L, 1L)))
  }

  test("sequence capacity is exactly the budget: doc ending on a boundary") {
    val docs = Seq(("a", 1L, 8L), ("a", 2L, 1L)).toDF("src", "id", "nt")
    val out = Packing.packSequences(docs, "id", "src", col("nt"), budget = 8)
      .orderBy("id").collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    // doc 1 fills seq 0 completely (spans 1, not 2); doc 2 opens seq 1
    assert(out === Array((0L, 0L, 1L), (1L, 0L, 1L)))
  }

  test("lengthBatches: padded buckets, batch cuts on padded cost, empty docs") {
    val docs = Seq(
      ("a", 1L, 3L),  // pad -> 4
      ("a", 2L, 4L),  // pad -> 4
      ("a", 3L, 5L),  // pad -> 8 (own bucket)
      ("a", 4L, 0L),  // empty doc promoted to one width -> 4
      ("b", 5L, 3L)   // other shard: independent numbering
    ).toDF("src", "id", "nt")
    val out = Packing.lengthBatches(docs, "id", "src", col("nt"),
        widthTokens = 4, maxBatchTokens = 8)
      .orderBy("src", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(
      // bucket 4 in shard a holds ids 1,2,4: two rows fill 8 padded
      // tokens, the third opens batch 1
      ("a", 1L, 3L, 4L, 0L),
      ("a", 2L, 4L, 4L, 0L),
      ("a", 3L, 5L, 8L, 0L),
      ("a", 4L, 0L, 4L, 1L),
      ("b", 5L, 3L, 4L, 0L)))
  }

  test("packSegments: segments tile every full sequence exactly and reconstruct the docs") {
    import spark.implicits._
    // shard A: docs of 5, 3, 9, 0, 7 tokens under budget 8 —
    // doc 4 is empty (no segments), doc 3 straddles two sequences
    val docs = Seq((1L, "A", 5L), (2L, "A", 3L), (3L, "A", 9L),
      (4L, "A", 0L), (5L, "A", 7L), (10L, "B", 4L))
      .toDF("doc_id", "shard", "n")
    val segs = graft.ops.Packing.packSegments(
        docs, "doc_id", "shard", col("n"), budget = 8)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // per-doc segment lengths sum to the doc's tokens
    val byDoc = segs.groupBy(_._3).view.mapValues(_.map(s => s._5 - s._4).sum).toMap
    assert(byDoc(1L) == 5L && byDoc(2L) == 3L && byDoc(3L) == 9L &&
      byDoc(5L) == 7L && byDoc(10L) == 4L)
    assert(!byDoc.contains(4L), "empty docs contribute no segments")
    // shard A holds 24 tokens = 3 full sequences of 8; every FULL
    // sequence's segments tile [0, 8): sorted, adjacent, start 0, end 8
    for (seq <- 0L to 2L) {
      val tile = segs.filter(s => s._1 == "A" && s._2 == seq).sortBy(_._4)
      assert(tile.head._4 == 0L, s"seq $seq does not start at 0")
      assert(tile.toSeq.sliding(2).forall {
        case Seq(a, b) => a._5 == b._4
        case _ => true
      }, s"seq $seq has gaps/overlaps")
      assert(tile.last._5 == 8L, s"seq $seq does not end at the budget")
    }
    // offsets — doc1 [0,5), doc2 [5,8), doc3 [8,17), doc5 [17,24):
    // straddler doc3 -> seq1 [0,8) + seq2 [0,1); doc5 -> seq2 [1,8)
    val d3 = segs.filter(_._3 == 3L).sortBy(_._2).map(s => (s._2, s._4, s._5))
    assert(d3.toSeq == Seq((1L, 0L, 8L), (2L, 0L, 1L)))
  }
}
