package graft

import org.apache.spark.sql.functions._
import graft.operators.Lamp
import graft.operators.Lamp.Control

/** LAMP projection invariants: control points are (near-)fixed points of
  * the map, the map is orthogonal locally (distance-preserving for a
  * rigid configuration), and the Spark column form matches the kernel.
  */
class LampSpec extends SparkSpec {

  private val controls = Array(
    Control(Array(0.0, 0.0), 0.0, 0.0),
    Control(Array(10.0, 0.0), 1.0, 0.0),
    Control(Array(0.0, 10.0), 0.0, 1.0),
    Control(Array(10.0, 10.0), 1.0, 1.0))

  test("control points project onto their own 2-D positions") {
    controls.foreach { cp =>
      val (y0, y1) = Lamp.projectPoint(cp.x, controls)
      assert(math.abs(y0 - cp.y0) < 1e-3 && math.abs(y1 - cp.y1) < 1e-3,
        s"control at (${cp.x.mkString(",")}) mapped to ($y0,$y1), expected (${cp.y0},${cp.y1})")
    }
  }

  test("projection is continuous and stays in the control hull's scale") {
    val (y0, y1) = Lamp.projectPoint(Array(5.0, 5.0), controls)
    assert(math.abs(y0 - 0.5) < 0.1 && math.abs(y1 - 0.5) < 0.1,
      s"midpoint mapped to ($y0,$y1), expected near (0.5,0.5)")
    // nearby inputs map to nearby outputs
    val (z0, z1) = Lamp.projectPoint(Array(5.1, 5.0), controls)
    assert(math.hypot(z0 - y0, z1 - y1) < 0.1)
  }

  test("Spark column form agrees with the kernel on the fixture") {
    val li = sources.Tables.open(spark, sf, "lineitem").limit(200)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val ctrls = Lamp.centroidControls(
      sources.Tables.open(spark, sf, "lineitem"), "l_returnflag",
      Seq("l_quantity", "l_extendedprice"))
    assert(ctrls.length == 3)
    val out = Lamp.project(li, Seq("l_quantity", "l_extendedprice"), ctrls).collect()
    assert(out.length == 200)
    out.foreach { r =>
      val (e0, e1) = Lamp.projectPoint(
        Array(r.getAs[Double]("l_quantity"), r.getAs[Double]("l_extendedprice")), ctrls)
      assert(math.abs(r.getAs[Double]("lamp_x") - e0) < 1e-12)
      assert(math.abs(r.getAs[Double]("lamp_y") - e1) < 1e-12)
      assert(!r.getAs[Double]("lamp_x").isNaN && !r.getAs[Double]("lamp_y").isNaN)
    }
  }
}
