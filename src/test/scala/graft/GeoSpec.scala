package graft

import org.apache.spark.sql.functions._

import graft.ops.Geo

/** Behavioral tests for the geospatial family. */
class GeoSpec extends GraftSuite {
  import spark.implicits._

  test("haversineKm matches known city distances and is symmetric") {
    // Paris <-> London ~343.6 km; JFK-area NYC <-> LA ~3935.7 km
    // (public great-circle values on the mean-radius sphere)
    val df = Seq(
      (48.8566, 2.3522, 51.5074, -0.1278, 343.6),
      (40.7128, -74.0060, 34.0522, -118.2437, 3935.7)
    ).toDF("la1", "lo1", "la2", "lo2", "expect")
    val got = df.select(
      Geo.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")).as("d"),
      Geo.haversineKm(col("la2"), col("lo2"), col("la1"), col("lo1")).as("dr"),
      col("expect")).collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 5.0,
        s"haversine off: ${r.getDouble(0)} vs ${r.getDouble(2)}")
      assert(r.getDouble(0) === r.getDouble(1), "haversine must be symmetric")
    }
    val zero = Seq((10.25, 20.5)).toDF("la", "lo")
      .select(Geo.haversineKm(col("la"), col("lo"), col("la"), col("lo")))
      .first().getDouble(0)
    assert(zero == 0.0)
  }

  test("nearestJoin equals the brute-force nearest within the box (seeded random)") {
    val rnd = new scala.util.Random(42)
    // coordinates snapped to the 1/16-degree dyadic grid so distance
    // comparisons are exact (same discipline as the geo driver queries)
    def snap(x: Double): Double = math.floor(x * 16.0) / 16.0
    val probes = (1 to 300).map(i =>
      (i.toLong, snap(rnd.nextDouble() * 20), snap(rnd.nextDouble() * 20)))
    val sites = (1 to 40).map(j =>
      (j.toLong, snap(rnd.nextDouble() * 20), snap(rnd.nextDouble() * 20)))
    val pDf = probes.toDF("pid", "plat", "plon")
    val sDf = sites.toDF("sid", "slat", "slon")
    val box = 2.0
    val got = Geo.nearestJoin(pDf, "pid", "plat", "plon",
        sDf, "sid", "slat", "slon", boxDeg = box, distCol = "d2",
        metric = Geo.planarSq)
      .select("pid", "sid", "d2").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = probes.flatMap { case (pid, la, lo) =>
      val cands = sites.filter { case (_, sa, so) =>
        math.abs(la - sa) < box && math.abs(lo - so) < box }
      if (cands.isEmpty) None
      else {
        val best = cands.map { case (sid, sa, so) =>
          ((la - sa) * (la - sa) + (lo - so) * (lo - so), sid) }.min
        Some(pid -> (best._2, best._1))
      }
    }.toMap
    assert(got.keySet === want.keySet, "matched probe sets differ")
    want.foreach { case (pid, (sid, d2)) =>
      assert(got(pid) === ((sid, d2)), s"probe $pid: got ${got(pid)}")
    }
    assert(want.nonEmpty && want.size < probes.size,
      "fixture must exercise both matched and unmatched probes")
  }

  test("boxJoin emits exactly the brute-force in-box pairs, each once") {
    val rnd = new scala.util.Random(7)
    def snap(x: Double): Double = math.floor(x * 16.0) / 16.0
    val probes = (1 to 120).map(i =>
      (i.toLong, snap(rnd.nextDouble() * 20), snap(rnd.nextDouble() * 20)))
    val sites = (1 to 30).map(j =>
      (j.toLong, snap(rnd.nextDouble() * 20), snap(rnd.nextDouble() * 20)))
    val box = 2.0
    val got = Geo.boxJoin(probes.toDF("pid", "plat", "plon"),
        "plat", "plon", sites.toDF("sid", "slat", "slon"),
        "slat", "slon", boxDeg = box, metric = Geo.planarSq)
      .select("pid", "sid").as[(Long, Long)].collect().toSeq
    val want = for {
      (pid, la, lo) <- probes
      (sid, sa, so) <- sites
      if math.abs(la - sa) < box && math.abs(lo - so) < box
    } yield (pid, sid)
    assert(got.size === got.distinct.size, "a pair matched twice")
    assert(got.sorted === want.sorted)
  }

  test("nearestJoin box bound is strict and ties break to the smaller site key") {
    val pDf = Seq((1L, 0.0, 0.0)).toDF("pid", "plat", "plon")
    val sDf = Seq(
      (10L, 0.0, 2.0),   // exactly boxDeg away on one axis -> excluded
      (7L, 0.0, 1.0),    // tie with site 9 at d2 = 1
      (9L, 1.0, 0.0)
    ).toDF("sid", "slat", "slon")
    val out = Geo.nearestJoin(pDf, "pid", "plat", "plon",
        sDf, "sid", "slat", "slon", boxDeg = 2.0, distCol = "d2",
        metric = Geo.planarSq)
      .select("pid", "sid", "d2").as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 7L, 1.0)))
    // with only the excluded site present, the probe drops entirely
    val none = Geo.nearestJoin(pDf, "pid", "plat", "plon",
      Seq((10L, 0.0, 2.0)).toDF("sid", "slat", "slon"),
      "sid", "slat", "slon", boxDeg = 2.0, metric = Geo.planarSq)
    assert(none.count() === 0)
  }

  test("nearestJoin nulls match nothing; reserved __g names rejected") {
    val pDf = Seq((1L, Option(0.5), Option(0.5)), (2L, None, Option(0.5)))
      .toDF("pid", "plat", "plon")
    val sDf = Seq((1L, Option(0.5), None), (2L, Option(0.5), Option(0.5)))
      .toDF("sid", "slat", "slon")
    val out = Geo.nearestJoin(pDf, "pid", "plat", "plon",
      sDf, "sid", "slat", "slon", boxDeg = 1.0, metric = Geo.planarSq)
    assert(out.select("pid", "sid").as[(Long, Long)].collect().toSeq ===
      Seq((1L, 2L)))
    val bad = Seq((1L, 0.0, 0.0, 0)).toDF("pid", "plat", "plon", "__gx")
    val e = intercept[IllegalArgumentException] {
      Geo.nearestJoin(bad, "pid", "plat", "plon",
        sDf, "sid", "slat", "slon", boxDeg = 1.0)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("nearestByCatalog equals nearestJoin on every probe (seeded random)") {
    val rnd = new scala.util.Random(23)
    def snap(x: Double): Double = math.floor(x * 16.0) / 16.0
    val probes = (1 to 250).map(i =>
      (i.toLong, snap(rnd.nextDouble() * 20), snap(rnd.nextDouble() * 20)))
      .toDF("pid", "plat", "plon")
    val sites = (1 to 35).map(j =>
      (j.toLong, snap(rnd.nextDouble() * 20), snap(rnd.nextDouble() * 20)))
      .toDF("sid", "slat", "slon")
    val viaJoin = Geo.nearestJoin(probes, "pid", "plat", "plon",
        sites, "sid", "slat", "slon", boxDeg = 2.0, distCol = "d2",
        metric = Geo.planarSq)
      .select("pid", "sid", "d2").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    val catalog = Geo.siteCatalog(sites, "sid", "slat", "slon", boxDeg = 2.0)
    val viaCat = Geo.nearestByCatalog(probes, "plat", "plon", catalog,
        boxDeg = 2.0, keyOut = "sid", distCol = "d2",
        metric = Geo.planarSq)
      .select("pid", "sid", "d2").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(viaCat.nonEmpty && viaCat === viaJoin)
    // and the probe side of the catalog plan is shuffle-free: the only
    // join is a broadcast on the cell key (the streaming-safety pin)
    val plan = Geo.nearestByCatalog(probes, "plat", "plon", catalog,
        boxDeg = 2.0, metric = Geo.planarSq)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan)
  }

  test("nearestByCatalog guards: boxDeg mismatch, output-name collision, string keys") {
    val probes = Seq((1L, 0.5, 0.5)).toDF("pid", "plat", "plon")
    val sites = Seq(("a", 0.75, 0.75), ("b", 0.5, 0.5))
      .toDF("sid", "slat", "slon")
    val cat = Geo.siteCatalog(sites, "sid", "slat", "slon", boxDeg = 2.0)
    // a catalog built at one resolution refuses probes quantized at another
    val e = intercept[IllegalArgumentException] {
      Geo.nearestByCatalog(probes, "plat", "plon", cat, boxDeg = 1.0,
        metric = Geo.planarSq)
    }
    assert(e.getMessage.contains("boxDeg"))
    intercept[IllegalArgumentException] {
      Geo.nearestByCatalog(probes, "plat", "plon", cat, boxDeg = 2.0,
        keyOut = "plat", metric = Geo.planarSq)
    }
    // non-numeric site keys survive the argmin (no long sentinel cast)
    val out = Geo.nearestByCatalog(probes, "plat", "plon", cat,
        boxDeg = 2.0, keyOut = "sid", distCol = "d2",
        metric = Geo.planarSq)
      .select("pid", "sid", "d2").collect()
    assert(out.toSeq.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      === Seq((1L, "b", 0.0)))
  }

  test("antimeridian contract: planar default never crosses ±180, wrapLon matches through the seam") {
    // probe just west of the seam; one site just east of it (0.3° away
    // across ±180, i.e. ~22 km at this latitude), one site 5° away on
    // the probe's own side
    val probe = Seq((1L, 10.0, -179.9)).toDF("pid", "plat", "plon")
    val sites = Seq((100L, 10.0, 179.8), (200L, 10.0, -174.9))
      .toDF("sid", "slat", "slon")
    // PLANAR (default): the cross-seam site is invisible — documented
    val planar = Geo.boxJoin(probe, "plat", "plon",
      sites, "slat", "slon", boxDeg = 0.5)
    assert(planar.count() == 0,
      "planar boxJoin must not match across the antimeridian")
    // wrapLon: the seam neighbor matches, with the true (short) great-
    // circle distance — haversine is 360°-periodic so no lon rotation
    val wrapped = Geo.boxJoin(probe, "plat", "plon",
        sites, "slat", "slon", boxDeg = 0.5, wrapLon = true)
      .select(col("sid"), col("dist")).collect()
    assert(wrapped.map(_.getLong(0)).toSeq == Seq(100L),
      s"wrapLon must surface exactly the cross-seam site, got " +
        wrapped.map(_.getLong(0)).mkString(","))
    val km = wrapped.head.getDouble(1)
    assert(km > 20 && km < 40, s"cross-seam distance wrong: $km km")
    // nearestJoin passes the flag through
    val nearest = Geo.nearestJoin(probe, "pid", "plat", "plon",
        sites, "sid", "slat", "slon", boxDeg = 0.5, wrapLon = true)
      .select(col("sid")).collect().map(_.getLong(0)).toSeq
    assert(nearest == Seq(100L))
    // the wrap grid needs boxDeg dividing 360 exactly
    intercept[IllegalArgumentException] {
      Geo.boxJoin(probe, "plat", "plon", sites, "slat", "slon",
        boxDeg = 0.7, wrapLon = true)
    }
    // ... and at least 3 lon cells: at 2 cells the +-1 announcements
    // collapse mod N and duplicate every cross-cell pair
    intercept[IllegalArgumentException] {
      Geo.boxJoin(probe, "plat", "plon", sites, "slat", "slon",
        boxDeg = 180.0, wrapLon = true)
    }
  }

  test("knnJoin equals brute-force top-k within the box (seeded random)") {
    val rnd = new scala.util.Random(99)
    def snap(x: Double): Double = math.floor(x * 16.0) / 16.0
    val probes = (1 to 200).map(i =>
      (i.toLong, snap(rnd.nextDouble() * 20), snap(rnd.nextDouble() * 20)))
    val sites = (1 to 50).map(j =>
      (j.toLong, snap(rnd.nextDouble() * 20), snap(rnd.nextDouble() * 20)))
    val box = 2.0
    val k = 3
    val got = Geo.knnJoin(probes.toDF("pid", "plat", "plon"), "pid",
        "plat", "plon", sites.toDF("sid", "slat", "slon"), "sid",
        "slat", "slon", boxDeg = box, k = k, distCol = "d2",
        metric = Geo.planarSq)
      .select("pid", "rank", "sid", "d2").as[(Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val want = probes.flatMap { case (pid, la, lo) =>
      sites.filter { case (_, sa, so) =>
        math.abs(la - sa) < box && math.abs(lo - so) < box }
        .map { case (sid, sa, so) =>
          ((la - sa) * (la - sa) + (lo - so) * (lo - so), sid) }
        .sorted.take(k).zipWithIndex
        .map { case ((d2, sid), r) => (pid, (r + 1).toLong, sid, d2) }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
    // probes with fewer than k in-box sites return fewer rows, not pads
    assert(want.groupBy(_._1).values.exists(_.size < k),
      "fixture must exercise a short candidate list")
    // a non-integral site key would ride topk_by as null and silently
    // return empty neighbor lists — rejected loudly instead
    val strSites = sites.map { case (j, la, lo) => (s"s$j", la, lo) }
      .toDF("sid", "slat", "slon")
    val e = intercept[IllegalArgumentException] {
      Geo.knnJoin(probes.toDF("pid", "plat", "plon"), "pid", "plat",
        "plon", strSites, "sid", "slat", "slon", boxDeg = box, k = k)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("polygonJoin: exact integer ray casting — half-open boundary " +
      "contract, vertices, concave notch, float refusal") {
    val polys = Seq(
      (1L, Seq(0L, 200L, 200L, 0L), Seq(0L, 0L, 200L, 200L)), // square
      (2L, Seq(500L, 900L, 900L, 700L, 500L),
        Seq(500L, 500L, 900L, 650L, 900L)) // concave "arrow"
    ).toDF("poly_id", "xs", "ys")
    val pts = Seq(
      (1L, 100L, 100L), // square interior          -> inside
      (2L, 100L, 0L),   // bottom edge              -> inside (half-open)
      (3L, 100L, 200L), // top edge                 -> outside
      (4L, 0L, 0L),     // bottom-left vertex       -> inside
      (5L, 200L, 200L), // top-right vertex         -> outside
      (6L, 0L, 100L),   // left edge                -> inside
      (7L, 200L, 100L), // right edge               -> outside
      (8L, 700L, 700L), // the concave notch        -> outside
      (9L, 600L, 700L), // left lobe of the arrow   -> inside
      (10L, 201L, 100L) // just past the bbox       -> outside
    ).toDF("pid", "px", "py")
    val got = Geo.polygonJoin(pts, "px", "py", polys, "poly_id", "xs", "ys")
      .select(col("pid"), col("poly_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (2L, 1L), (4L, 1L), (6L, 1L), (9L, 2L)))
    // float coordinates would truncate silently inside the long cast —
    // refused loudly instead (quantize to a grid first)
    val fpts = Seq((1L, 0.5, 0.5)).toDF("pid", "px", "py")
    val e = intercept[IllegalArgumentException] {
      Geo.polygonJoin(fpts, "px", "py", polys, "poly_id", "xs", "ys")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("wrapLon accepts decimally-exact divisors of 360 (0.1 is not " +
      "binary-exact: 3600 * 0.1 != 360.0 in doubles)") {
    val probe = Seq((1L, 0.0, 179.97)).toDF("pid", "plat", "plon")
    val sites = Seq((100L, 0.0, -179.97)).toDF("sid", "slat", "slon")
    val got = Geo.nearestJoin(probe, "pid", "plat", "plon",
        sites, "sid", "slat", "slon", boxDeg = 0.1, wrapLon = true)
      .select(col("sid")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(100L))
  }

  test("cellDensity counts per occupied cell only") {
    val df = Seq((0.5, 0.5), (0.9, 0.1), (3.5, 3.5), (-0.5, 0.5))
      .toDF("lat", "lon")
    val out = Geo.cellDensity(df, "lat", "lon", 1.0)
      .orderBy("cell_lat", "cell_lon")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((-1L, 0L, 1L), (0L, 0L, 2L), (3L, 3L, 1L)))
  }

  test("nearestJoin plans as an equi-join on the cell key — no nested loop") {
    val pDf = spark.range(100).select(col("id").as("pid"),
      (col("id") % 20).cast("double").as("plat"),
      (col("id") % 17).cast("double").as("plon"))
    val sDf = spark.range(10).select(col("id").as("sid"),
      (col("id") % 20).cast("double").as("slat"),
      (col("id") % 13).cast("double").as("slon"))
    val plan = Geo.nearestJoin(pDf, "pid", "plat", "plon",
        sDf, "sid", "slat", "slon", boxDeg = 2.0, metric = Geo.planarSq)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("__gclat"), "join must key on the cell index")
  }
}
