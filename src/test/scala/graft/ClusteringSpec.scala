package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.ops.Clustering

/** Connected-component clustering vs a local union-find reference. */
class ClusteringSpec extends GraftSuite with TableDrivenPropertyChecks {
  import spark.implicits._

  private def unionFind(n: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress fully, then min-id per root = root itself (we always
    // attach the larger root under the smaller)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(n: Int, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = (0L until n.toLong).toDF("id")
    val p = pairs.toDF("id_a", "id_b")
    Clustering.connectedComponents(verts, "id", p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on crafted graphs (stars, chains, singletons)") {
    val cases = Seq(
      Seq.empty[(Long, Long)],                       // all singletons
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)),   // one chain
      Seq((5L, 1L), (5L, 2L), (5L, 3L)),             // star centered off-min
      Seq((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L)),   // disjoint pairs
      Seq((7L, 6L), (6L, 5L), (0L, 7L))              // chain given backwards
    )
    for (pairs <- cases) assert(run(8, pairs) == unionFind(8, pairs))
  }

  test("matches union-find on a pseudo-random graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val pairs = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    assert(run(n, pairs) == unionFind(n, pairs))
  }

  test("long chain converges within the logarithmic round budget") {
    // a 64-node path has diameter 63; path doubling must close it in
    // well under 40 rounds (plain propagation would need 63)
    val pairs = (0L until 63L).map(i => (i, i + 1))
    val got = run(64, pairs)
    assert(got.values.toSet == Set(0L))
  }

  test("keepCanonical keeps exactly one row per cluster plus singletons") {
    val df = (0L until 6L).toDF("id").withColumn("payload", col("id") * 10)
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Clustering.keepCanonical(df, "id", pairs)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 3L, 4L))
  }

  test("is_canonical marks the min member; clusters are min ids") {
    val verts = (0L until 5L).toDF("id")
    val pairs = Seq((3L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val rows = Clustering.connectedComponents(verts, "id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows == Set(
      (0L, 0L, true), (1L, 1L, true), (2L, 2L, true),
      (3L, 1L, false), (4L, 1L, false)))
  }
}
