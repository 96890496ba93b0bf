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
}
