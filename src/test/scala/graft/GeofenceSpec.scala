package graft

import graft.queries.GeofencePoly
import org.apache.spark.sql.functions._

/** d16's ray-cast membership predicate against hand-verified points:
  * the polygon centroid and each vertex's inward midpoint are inside;
  * points beyond every edge (and outside the bounding box) are not.
  * A plain-Scala reference ray-cast cross-checks the Column tree on a
  * probe grid so the codegen'd expression can't drift from the
  * textbook algorithm.
  */
class GeofenceSpec extends SparkSpecBase {
  import spark.implicits._

  private val poly = GeofencePoly.vertices

  private def refInside(lat: Double, lon: Double): Boolean = {
    var c = false
    var i = 0
    while (i < poly.length) {
      val (yi, xi) = poly(i)
      val (yj, xj) = poly((i + 1) % poly.length)
      if (((yi > lat) != (yj > lat)) &&
        lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) c = !c
      i += 1
    }
    c
  }

  private def sparkInside(pts: Seq[(Double, Double)]): Seq[Boolean] =
    pts.toDF("lat", "lon")
      .select(GeofencePoly.inside(col("lat"), col("lon")).as("in"))
      .as[Boolean].collect().toSeq

  test("centroid and near-vertex interior points are inside") {
    val cy = poly.map(_._1).sum / poly.length
    val cx = poly.map(_._2).sum / poly.length
    // midpoints between each vertex and the centroid stay interior
    // for this convex polygon
    val pts = (cy, cx) +: poly.map { case (y, x) =>
      ((y + cy) / 2.0, (x + cx) / 2.0)
    }
    assert(sparkInside(pts).forall(identity))
  }

  test("points beyond each vertex (and far away) are outside") {
    val cy = poly.map(_._1).sum / poly.length
    val cx = poly.map(_._2).sum / poly.length
    // push each vertex AWAY from the centroid: outside a convex hull
    val pts = poly.map { case (y, x) =>
      (y + (y - cy) * 0.2, x + (x - cx) * 0.2)
    } ++ Seq((89.0, 0.0), (-89.0, 170.0), (0.0, -179.0))
    assert(!sparkInside(pts).exists(identity))
  }

  test("Column predicate agrees with the reference ray-cast on a grid") {
    val pts = for {
      i <- 0 to 16; j <- 0 to 18
    } yield (-30.0 + i * 3.7, -50.0 + j * 4.3)
    val expect = pts.map { case (y, x) => refInside(y, x) }
    assert(sparkInside(pts.toSeq) == expect)
    // the grid exercises both classes
    assert(expect.count(identity) > 10 && expect.count(!_) > 10)
  }
}

/** d16b's multi-zone membership join: zone-count invariants, a
  * plain-Scala per-zone cross-check, overlap coverage (at least one
  * probe point belongs to ≥2 zones — the overlapping layout is real),
  * and the scale plan pins: the fact side joins the 28-row zone table
  * by BROADCAST nested loop (never a CartesianProduct, never a
  * fact-side shuffle before the join).
  */
class GeofenceManySpec extends SparkSpecBase {
  import graft.queries.GeofenceZones
  import org.apache.spark.sql.functions._

  private def refInside(vs: Seq[(Double, Double)], lat: Double,
      lon: Double): Boolean = {
    var c = false
    var i = 0
    while (i < vs.length) {
      val (yi, xi) = vs(i)
      val (yj, xj) = vs((i + 1) % vs.length)
      if (((yi > lat) != (yj > lat)) &&
        lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) c = !c
      i += 1
    }
    c
  }

  test("d16b query: zone counts match a plain-Scala ray-cast; overlaps exist") {
    val rows = SparkEntry.queries("d16b_geofence_many")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // reference counts straight off the same events derivation
    val ev = sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pts = ev.map { case (eid, _, v) =>
      ((v % 90.0) - 45.0, ((eid * 7) % 360).toDouble - 179.5)
    }
    val expected = GeofenceZones.zones.map { case (id, vs) =>
      id -> pts.count { case (la, lo) => refInside(vs, la, lo) }.toLong
    }.toMap
    val populated = expected.filter(_._2 > 0)
    assert(populated.nonEmpty)
    populated.foreach { case (id, n) =>
      assert(rows.get(id).contains(n), s"zone $id: got ${rows.get(id)}, want $n")
    }
    // overlap is real: some position belongs to >= 2 zones
    val multi = pts.exists { case (la, lo) =>
      GeofenceZones.zones.count { case (_, vs) => refInside(vs, la, lo) } >= 2
    }
    assert(multi, "no probe point fell in two zones — overlap layout broken")
  }

  test("d16b plan: join-free — zone membership is one codegen'd projection") {
    val plan = SparkEntry.queries("d16b_geofence_many")(spark, sf)
      .queryExecution.executedPlan.toString
    // r16: the 28 zones are plan-time literals, so membership needs
    // NO join at all — the strongest form of the original pin (no
    // cartesian, no fact shuffle before membership): the fact side
    // reaches the aggregation through filter/project/generate plus
    // at most the guarded ScaleOps.spread round-robin exchange (a
    // no-op whenever the scan already fills the cluster; it exists
    // only because the bench input is one file/one row group)
    assert(!plan.contains("Join"), "zone membership should be join-free")
    assert(!plan.contains("CartesianProduct"), "cartesian product in plan")
    val genIdx = plan.indexOf("Generate explode")
    assert(genIdx >= 0, plan.take(500))
    val below = plan.substring(genIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      "fact side key-shuffled below the membership projection")
  }
}
