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
