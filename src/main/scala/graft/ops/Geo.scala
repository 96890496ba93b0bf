package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives on plain lat/lon columns — grid-cell bucketing,
  * great-circle distance, and a bucketed nearest-neighbor join.
  *
  * The reference engine has no spatial surface; this is an extension in
  * the same spirit as [[RangeJoin]]: Spark plans a raw
  * `distance(p, s) < r … ORDER BY distance LIMIT 1` per probe as a
  * broadcast-nested-loop (or cartesian) — O(|probes| × |sites|). The
  * standard fix, packaged: quantize both sides onto a degree grid,
  * announce each site to its 3×3 neighbor cells (a map-side ×9
  * explode of the SMALL side), equi-join probes (one cell each) to
  * announcements, re-check the exact box predicate, and take the
  * per-probe argmin with one `min(struct)` aggregation.
  *
  * Scale shape (100 TB): one hash shuffle on the cell key each side
  * (or a broadcast when the site table is small — AQE decides), then
  * one keyed argmin shuffle on the probe key. No all-pairs anywhere;
  * hot cells (urban skew) split like any equi-join under AQE.
  */
object Geo {

  /** Great-circle distance in kilometers (haversine, IEEE mean-Earth
    * radius 6371.0088 km). Inputs in degrees. Public formula; accurate
    * to ~0.5% (sphere vs ellipsoid).
    */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val r = lit(6371.0088)
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    // near-antipodal inputs can round a to just above 1, where
    // asin(sqrt(a)) is NaN — clamp to the formula's mathematical range
    r * lit(2) * asin(sqrt(least(a, lit(1.0))))
  }

  /** Squared planar degree distance — the metric for small-extent
    * domains and for cross-engine exactness: on dyadic-grid
    * coordinates every subtraction, square, and sum is exact in IEEE
    * double, so an argmin over it is bitwise deterministic.
    */
  def planarSq(lat1: Column, lon1: Column,
               lat2: Column, lon2: Column): Column =
    (lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2)

  /** Grid-cell index of a coordinate at `cellDeg` resolution (floor
    * quantization; pure column expression, codegen'd).
    */
  def cellIdx(coord: Column, cellDeg: Double): Column =
    floor(coord / cellDeg).cast("long")

  /** The exact-long-key/coordinate contract shared by knnJoin,
    * polygonJoin and [[Dedup.sharedRuns]]: silent long casts of
    * non-integral columns produce nulls (empty results) or truncation,
    * so the callers refuse loudly instead.
    */
  private[ops] def integralType(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  private def reserve(df: DataFrame, side: String): Unit = {
    val bad = df.columns.filter(_.startsWith("__g"))
    require(bad.isEmpty,
      s"column names ${bad.mkString(",")} are reserved by Geo ($side input)")
  }

  /** All (probe, site) pairs with the site STRICTLY inside the
    * axis-aligned box `|Δlat| < boxDeg AND |Δlon| < boxDeg` around the
    * probe — the spatial-join primitive under [[nearestJoin]] and
    * radius analytics. Sites announce themselves to their 3×3 neighbor
    * cells (map-side ×9 explode of the SMALL side), probes equi-join
    * their single cell, and the exact box predicate runs as a codegen'd
    * residual. The box bound is what makes the announcement lossless: a
    * site within `boxDeg` on each axis is at most one cell index away
    * on each axis, so it is always announced into the probe's cell;
    * sites between `boxDeg` and `2·boxDeg` may also be announced and
    * are removed by the residual. A probe lives in exactly ONE cell, so
    * no pair can match twice — no distinct needed.
    *
    * COORDINATE CONTRACT: the default is PLANAR — cell indices and the
    * residual treat (lat, lon) as a flat plane, so coordinates across
    * the ±180° antimeridian never match (a site at lon 179.9 is
    * invisible to a probe at −179.9), which is correct for the shipped
    * derived grids and any single-hemisphere corpus. Pass
    * `wrapLon = true` for global data: lon cells then normalize
    * modulo 360° (boxDeg must divide 360 exactly) and the lon residual
    * becomes the periodic `min(|Δ|, 360 − |Δ|) < boxDeg`; pair it with
    * a periodic metric ([[haversineKm]] already is — its sin²(Δλ/2)
    * term is 360°-periodic; [[planarSq]] is NOT). Either way the box is
    * in DEGREES: a fixed boxDeg under-covers a metric (km) radius as
    * |lat| grows (lon degrees shrink by cos lat) — size boxDeg for the
    * highest latitude the data reaches, or filter on the metric value.
    *
    * Output: all probe columns, all site columns, and `metric` as
    * `distCol`. Null coordinates on either side match nothing. Column
    * names prefixed `__g` are reserved; probe and site column names
    * must be disjoint.
    */
  def boxJoin(probes: DataFrame, pLat: String, pLon: String,
              sites: DataFrame, sLat: String, sLon: String,
              boxDeg: Double, distCol: String = "dist",
              metric: (Column, Column, Column, Column) => Column =
                haversineKm, wrapLon: Boolean = false): DataFrame = {
    require(boxDeg > 0, "boxDeg must be positive")
    reserve(probes, "probes"); reserve(sites, "sites")
    require(!probes.columns.contains(distCol) &&
      !sites.columns.contains(distCol),
      s"distance column name '$distCol' already exists on an input — " +
        "pass a different distCol")
    val nLonCells = math.round(360.0 / boxDeg)
    // epsilon compare, not float equality: decimally-exact divisors like
    // 0.1 are not binary-exact (3600 * 0.1 != 360.0 in doubles) and the
    // contract is about cell-count divisibility, not bit patterns
    require(!wrapLon || math.abs(nLonCells * boxDeg - 360.0) < 1e-9,
      s"wrapLon needs boxDeg dividing 360 exactly, got $boxDeg")
    // with <= 2 lon cells the +-1 announcements collapse onto the same
    // wrapped cell and a site would announce into it TWICE, emitting
    // duplicate pairs (review-caught) — and a box that wide has no
    // meaningful lon locality anyway
    require(!wrapLon || nLonCells >= 3,
      s"wrapLon needs at least 3 lon cells (boxDeg <= 120), got $boxDeg")
    // with wrap, every lon cell index (site announcements included)
    // normalizes into [0, 360/boxDeg) so the seam cells coincide
    def lonCell(c: Column): Column =
      if (wrapLon) pmod(c, lit(nLonCells)) else c
    val off = array(lit(-1L), lit(0L), lit(1L))
    val sb = sites
      .filter(col(sLat).isNotNull && col(sLon).isNotNull)
      .withColumn("__gdla", explode(off))
      .withColumn("__gdlo", explode(off))
      .withColumn("__gclat", cellIdx(col(sLat), boxDeg) + col("__gdla"))
      .withColumn("__gclon", lonCell(cellIdx(col(sLon), boxDeg) + col("__gdlo")))
      .drop("__gdla", "__gdlo")
    val pb = probes
      .filter(col(pLat).isNotNull && col(pLon).isNotNull)
      .withColumn("__gclat", cellIdx(col(pLat), boxDeg))
      .withColumn("__gclon", lonCell(cellIdx(col(pLon), boxDeg)))
    val dLon = abs(col(pLon) - col(sLon))
    val lonOk =
      if (wrapLon) least(dLon, lit(360.0) - dLon) < boxDeg
      else dLon < boxDeg
    pb.join(sb, Seq("__gclat", "__gclon"))
      .filter(abs(col(pLat) - col(sLat)) < boxDeg && lonOk)
      .withColumn(distCol,
        metric(col(pLat), col(pLon), col(sLat), col(sLon)))
      .drop("__gclat", "__gclon")
  }

  /** For each probe row, the nearest site (by `metric`, ties broken by
    * ascending `sKey`) among sites inside the [[boxJoin]] box; probes
    * with no site in the box drop (inner semantics). Output: all probe
    * columns, then `sKey` and the metric value as `distCol`.
    *
    * `pKey` must be unique per probe row (it is the argmin group key);
    * the argmin is ONE `min(struct)` aggregation on it — no rank
    * window, no self-join.
    */
  def nearestJoin(probes: DataFrame, pKey: String, pLat: String, pLon: String,
                  sites: DataFrame, sKey: String, sLat: String, sLon: String,
                  boxDeg: Double, distCol: String = "dist",
                  metric: (Column, Column, Column, Column) => Column =
                    haversineKm, wrapLon: Boolean = false): DataFrame = {
    val probeCols = probes.columns.toSeq
    boxJoin(probes, pLat, pLon, sites, sLat, sLon, boxDeg, "__gd", metric,
        wrapLon)
      .select(col(pKey).as("__gk"),
        struct(col("__gd") +: col(sKey).as("__gs") +:
          probeCols.map(col): _*).as("__gbest"))
      .groupBy(col("__gk"))
      .agg(min(col("__gbest")).as("__gbest"))
      .select((probeCols.map(c => col(s"__gbest.$c").as(c)) :+
        col("__gbest.__gs").as(sKey) :+
        col("__gbest.__gd").as(distCol)): _*)
  }

  /** k nearest sites per probe (geo05): [[boxJoin]] candidates reduced
    * by the bounded-heap `topk_by` aggregate — the ANN discipline
    * (ops/Ivf) applied to space: only k (score, id) pairs per probe
    * survive the partial AND final aggregation buffers, so the shuffle
    * carries O(k) per probe where a rank window would shuffle every
    * in-box candidate row. Scores are the NEGATED metric (topk_by keeps
    * largest; negation of exact doubles is exact), ties break to the
    * ascending site key — the same deterministic order as
    * [[nearestJoin]], which this generalizes (k = 1 ≡ nearestJoin).
    * Probes with no in-box site drop (inner semantics). Output:
    * (`pKey`, `rank` 1..k best-first, `sKey`, `distCol`).
    */
  def knnJoin(probes: DataFrame, pKey: String, pLat: String, pLon: String,
              sites: DataFrame, sKey: String, sLat: String, sLon: String,
              boxDeg: Double, k: Int, distCol: String = "dist",
              metric: (Column, Column, Column, Column) => Column =
                haversineKm, wrapLon: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    graft.functions.Registry.registerAll(probes.sparkSession)
    // topk_by carries ids as longs and SKIPS nulls — a non-numeric site
    // key would cast to null and every probe would silently come back
    // with an empty neighbor list, so the integral-key contract is
    // enforced loudly instead (string keys: join a dense surrogate id)
    if (!integralType(sites.schema(sKey).dataType))
      throw new IllegalArgumentException(
        s"knnJoin site key '$sKey' must be an integral type (output is " +
          s"BIGINT; ids ride the bounded-heap topk_by as longs), got " +
          s"${sites.schema(sKey).dataType} — map string keys to a " +
          "surrogate id first")
    boxJoin(probes.select(col(pKey), col(pLat), col(pLon)), pLat, pLon,
        sites, sLat, sLon, boxDeg, "__gd", metric, wrapLon)
      .groupBy(col(pKey))
      .agg(call_function("topk_by",
        -col("__gd"), col(sKey).cast("long"), lit(k)).as("__gtop"))
      .select(col(pKey), posexplode(col("__gtop")).as(Seq("__grk", "__ge")))
      .select(col(pKey), (col("__grk") + 1).cast("long").as("rank"),
        col("__ge.id").as(sKey), (-col("__ge.sim")).as(distCol))
  }

  /** Per-cell candidate catalog: for every grid cell, the array of
    * sites announced into it from the 3×3 neighborhood — the
    * broadcastable static side of a MAP-ONLY nearest-site assignment.
    * PLANAR coordinates (see [[boxJoin]]'s contract): no antimeridian
    * wrap — pre-rotate longitudes for corpora spanning ±180°.
    * Output: (`__gclat`, `__gclon`, `__gsites`) where `__gsites` is an
    * array of (key, lat, lon) structs. Size ∝ sites × 9; candidates per
    * cell ∝ local site density (the same bound as [[boxJoin]]'s join
    * fan-out, materialized once instead of per probe).
    */
  def siteCatalog(sites: DataFrame, sKey: String, sLat: String,
                  sLon: String, boxDeg: Double): DataFrame = {
    require(boxDeg > 0, "boxDeg must be positive")
    reserve(sites, "sites")
    val off = array(lit(-1L), lit(0L), lit(1L))
    // the build resolution rides along as field metadata so a consumer
    // quantizing probes at a DIFFERENT resolution fails loudly instead
    // of joining against wrong cells
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putDouble("boxDeg", boxDeg).build()
    sites
      .filter(col(sLat).isNotNull && col(sLon).isNotNull)
      .withColumn("__gdla", explode(off))
      .withColumn("__gdlo", explode(off))
      .groupBy((cellIdx(col(sLat), boxDeg) + col("__gdla")).as("__gclat"),
        (cellIdx(col(sLon), boxDeg) + col("__gdlo")).as("__gclon"))
      .agg(collect_list(struct(col(sKey).as("key"), col(sLat).as("lat"),
        col(sLon).as("lon"))).as("__gsites", meta))
  }

  /** Nearest-site assignment against a (broadcast) [[siteCatalog]] —
    * the STREAMING-SAFE form of [[nearestJoin]]: the probe side stays
    * map-only (one broadcast hash join on the cell key + a codegen'd
    * higher-order argmin over the cell's candidate array), so it runs
    * inside a structured-streaming plan with ZERO per-probe state and
    * no shuffle before whatever aggregation the caller adds downstream.
    * Same semantics as [[nearestJoin]]: strict box, ties to the
    * smallest key, probes with no in-box site drop. Output: all probe
    * columns, then the site key as `keyOut` and the metric as
    * `distCol`.
    */
  def nearestByCatalog(probes: DataFrame, pLat: String, pLon: String,
                       catalog: DataFrame, boxDeg: Double,
                       keyOut: String = "nearest_site",
                       distCol: String = "dist",
                       metric: (Column, Column, Column, Column) => Column =
                         haversineKm): DataFrame = {
    require(boxDeg > 0, "boxDeg must be positive")
    reserve(probes, "probes")
    require(!probes.columns.contains(keyOut) &&
      !probes.columns.contains(distCol) && keyOut != distCol,
      s"output column names '$keyOut'/'$distCol' must not collide with " +
        "the probe columns or each other")
    val sitesField = catalog.schema.find(_.name == "__gsites")
      .getOrElse(throw new IllegalArgumentException(
        "catalog must come from Geo.siteCatalog (no __gsites column)"))
    if (sitesField.metadata.contains("boxDeg"))
      require(sitesField.metadata.getDouble("boxDeg") == boxDeg,
        s"catalog was built at boxDeg=${sitesField.metadata.getDouble("boxDeg")}" +
          s" but probes quantize at $boxDeg — the cell keys would not align")
    val keyType = sitesField.dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("key").dataType
    val probeCols = probes.columns.toSeq
    val pb = probes
      .filter(col(pLat).isNotNull && col(pLon).isNotNull)
      .withColumn("__gclat", cellIdx(col(pLat), boxDeg))
      .withColumn("__gclon", cellIdx(col(pLon), boxDeg))
      .join(broadcast(catalog), Seq("__gclat", "__gclon"))
    // found-flag accumulator (type-preserving — no sentinel key value
    // can be confused with a real one): the first IN-BOX candidate
    // always wins, after that strict (d, key) lexicographic
    // improvement. The box predicate lives INSIDE the single aggregate
    // pass (short-circuited And), not in a separate filter() — HOF
    // lambdas evaluate interpreted per element, so one pass with a
    // 2-comparison rejection of out-of-box candidates beats
    // materializing a filtered array per probe. NaN metric values
    // behave like min(struct): NaN compares greater than every double
    // and NaN === NaN, so the equivalence with [[nearestJoin]] holds
    // even on degenerate inputs.
    val init = struct(lit(false).as("found"), lit(Double.MaxValue).as("d"),
      lit(null).cast(keyType).as("key"))
    val best = aggregate(col("__gsites"), init, (acc, c) => {
      val inBox = abs(col(pLat) - c.getField("lat")) < boxDeg &&
        abs(col(pLon) - c.getField("lon")) < boxDeg
      val d = metric(col(pLat), col(pLon), c.getField("lat"), c.getField("lon"))
      when(inBox && (!acc.getField("found") || d < acc.getField("d") ||
        (d === acc.getField("d") && c.getField("key") < acc.getField("key"))),
        struct(lit(true).as("found"), d.as("d"), c.getField("key").as("key")))
        .otherwise(acc)
    })
    pb.withColumn("__gbest", best)
      .filter(col("__gbest.found"))
      .select((probeCols.map(col) :+ col("__gbest.key").as(keyOut) :+
        col("__gbest.d").as(distCol)): _*)
  }

  /** Spatial density grid: per occupied `cellDeg` cell, the row count —
    * the heat-map / hotspot primitive. One map-side quantization + one
    * grouped count; output ∝ occupied cells, never the domain.
    */
  def cellDensity(df: DataFrame, latCol: String, lonCol: String,
                  cellDeg: Double): DataFrame = {
    require(cellDeg > 0, "cellDeg must be positive")
    df.filter(col(latCol).isNotNull && col(lonCol).isNotNull)
      .groupBy(cellIdx(col(latCol), cellDeg).as("cell_lat"),
        cellIdx(col(lonCol), cellDeg).as("cell_lon"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-polygon geometry metrics (geo07) over integer vertex arrays:
    * signed double-area (shoelace Σ x_i·y_{i+1} − x_{i+1}·y_i, closing
    * edge implied — EXACT integer), area, centroid (exact integer
    * numerators Σ (x_i+x_{i+1})·cross_i over 3·2A, one double division
    * per coordinate), vertex count, and the perimeter in 1e6
    * fixed-point (per-edge lengths rounded to integers BEFORE the
    * order-free sum — the t09 bit-reproducibility discipline; a plain
    * double sum would depend on edge order under reassociation).
    * Map-only column expressions; winding may be CW or CCW (area takes
    * |2A|, centroid divides by the SIGNED 2A so it is winding-proof).
    * Degenerate polygons (2A = 0) yield null centroid.
    *
    * Output: (polyKey, n_vertices, area2_signed, area, cx, cy,
    * perimeter_fp).
    */
  def polygonMetrics(polygons: DataFrame, polyKey: String,
                     xsCol: String, ysCol: String): DataFrame = {
    val xs = col(xsCol)
    val ys = col(ysCol)
    val n = size(xs)
    // widen BEFORE every product: for ArrayType(IntegerType) inputs the
    // shoelace cross x_i*y_{i+1} would otherwise wrap silently at int32
    // (~coords > 46340) before the long-typed aggregate ever saw it —
    // the summarizeFull widen-before-multiply discipline
    def nxt(c: Column, i: Column): Column =
      element_at(c, (pmod(i + 1, n) + 1).cast("int")).cast("long")
    def cur(c: Column, i: Column): Column =
      element_at(c, (i + 1).cast("int")).cast("long")
    // long widening moves the wrap point, it doesn't remove it: the
    // centroid numerator term (x_i+x_{i+1})*cross_i reaches 4B^3 for
    // max-|coord| B, summed over n vertices. Refuse loudly (one bounded
    // collect over the catalog-sized frame — the sharedRuns cap style)
    // whenever nMax*4*B^3 could cross 2^62, instead of wrapping silently.
    val lim = polygons.agg(
      max(greatest(abs(array_max(xs)), abs(array_min(xs)),
        abs(array_max(ys)), abs(array_min(ys))).cast("long")).as("b"),
      max(size(xs)).cast("long").as("n")).collect().head
    if (!lim.isNullAt(0)) {
      val b = BigInt(lim.getLong(0)).max(1)
      val nMax = BigInt(lim.getLong(1)).max(1)
      require(nMax * 4 * b.pow(3) < (BigInt(1) << 62),
        s"polygonMetrics: max |coordinate| $b over $nMax vertices could " +
          "overflow the exact long centroid numerator (bound: " +
          "n*4*B^3 < 2^62) — rescale coordinates to a coarser grid first")
    }
    val idx = sequence(lit(0), n - 1)
    val cross = transform(idx, i => cur(xs, i) * nxt(ys, i)
      - nxt(xs, i) * cur(ys, i))
    val a2 = aggregate(cross, lit(0L), (acc, c) => acc + c)
    val cxn = aggregate(transform(idx, i =>
      (cur(xs, i) + nxt(xs, i)) *
        (cur(xs, i) * nxt(ys, i) - nxt(xs, i) * cur(ys, i))),
      lit(0L), (acc, c) => acc + c)
    val cyn = aggregate(transform(idx, i =>
      (cur(ys, i) + nxt(ys, i)) *
        (cur(xs, i) * nxt(ys, i) - nxt(xs, i) * cur(ys, i))),
      lit(0L), (acc, c) => acc + c)
    val perim = aggregate(transform(idx, i => {
      val dx = (nxt(xs, i) - cur(xs, i)).cast("double")
      val dy = (nxt(ys, i) - cur(ys, i)).cast("double")
      round(sqrt(dx * dx + dy * dy) * 1e6).cast("long")
    }), lit(0L), (acc, c) => acc + c)
    polygons.select(col(polyKey), n.cast("long").as("n_vertices"),
      a2.as("area2_signed"),
      (abs(a2).cast("double") / 2.0).as("area"),
      when(a2 =!= 0L, cxn.cast("double") / (a2 * 3L).cast("double"))
        .as("cx"),
      when(a2 =!= 0L, cyn.cast("double") / (a2 * 3L).cast("double"))
        .as("cy"),
      perim.as("perimeter_fp"))
  }

  /** Point-in-polygon containment join (geo06): every (point, polygon)
    * pair where the point lies inside — exact integer ray casting via
    * the codegen'd `point_in_polygon` expression
    * ([[graft.functions.Kernels.pointInPolygon]]; half-open edge rule,
    * cross-multiplied intersections, no float anywhere, so an external
    * engine re-derives identical verdicts). Coordinates must be
    * INTEGRAL (quantize floats to a dyadic grid first — the geo01 float
    * discipline); enforced loudly, since the expression's long cast
    * would otherwise truncate silently.
    *
    * Scale shape: the polygon catalog is broadcast with per-polygon
    * bounding boxes computed once; a point evaluates the full crossing
    * loop only for polygons whose bbox contains it — the probe side is
    * MAP-ONLY (no shuffle at all). For catalogs too large to broadcast,
    * announce polygon bboxes into grid cells and equi-join on the cell
    * key first (the [[boxJoin]] machinery).
    *
    * Output: all point columns + `polyKey`; points in no polygon drop,
    * points in k polygons appear k times.
    */
  def polygonJoin(points: DataFrame, xCol: String, yCol: String,
                  polygons: DataFrame, polyKey: String,
                  xsCol: String, ysCol: String): DataFrame = {
    graft.functions.Registry.registerAll(points.sparkSession)
    Seq(xCol -> points.schema(xCol), yCol -> points.schema(yCol)).foreach {
      case (n, f) => require(integralType(f.dataType),
        s"polygonJoin point coordinate '$n' must be an integral type " +
          s"(exact ray casting; quantize floats first), got ${f.dataType}")
    }
    Seq(xsCol, ysCol).foreach { n =>
      polygons.schema(n).dataType match {
        case org.apache.spark.sql.types.ArrayType(e, _)
          if integralType(e) => ()
        case dt => require(false,
          s"polygonJoin vertex column '$n' must be an integral array, got $dt")
      }
    }
    reserve(points, "points")
    val polys = polygons.select(col(polyKey),
      col(xsCol).as("__gxs"), col(ysCol).as("__gys"),
      array_min(col(xsCol)).as("__gx0"), array_max(col(xsCol)).as("__gx1"),
      array_min(col(ysCol)).as("__gy0"), array_max(col(ysCol)).as("__gy1"))
    // fail fast with the catalog named, before any join work: the kernel
    // enforces |coord| < 2^30 per row (it throws rather than wrap), but a
    // one-row collect over the broadcast-sized catalog gives the refusal
    // up front. Probe-side points beyond the bound are safe either way:
    // the bbox conjuncts confine px/py within checked polygon bounds
    // before the kernel runs, and the kernel re-checks them regardless.
    val lim = polys.agg(max(greatest(abs(col("__gx0")), abs(col("__gx1")),
      abs(col("__gy0")), abs(col("__gy1"))).cast("long"))).collect().head
    if (!lim.isNullAt(0)) require(lim.getLong(0) < (1L << 30),
      s"polygonJoin: max |vertex coordinate| ${lim.getLong(0)} exceeds " +
        "the exact ray-casting bound 2^30 (cross-multiplied products " +
        "would wrap) — rescale coordinates to a coarser grid first")
    points.join(broadcast(polys),
        col(xCol) >= col("__gx0") && col(xCol) <= col("__gx1") &&
          col(yCol) >= col("__gy0") && col(yCol) <= col("__gy1") &&
          call_function("point_in_polygon", col(xCol), col(yCol),
            col("__gxs"), col("__gys")))
      .drop("__gxs", "__gys", "__gx0", "__gx1", "__gy0", "__gy1")
  }
}
