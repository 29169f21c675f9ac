package graft.operators

import graft.SparkSpec

class ExtrasSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("approx_count_distinct within the configured 2% rsd (sketch surface)") {
    Extras.approxDistinct(spark, sfDir).collect().foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"flag=${r.getString(0)} exact=$exact approx=$approx")
    }
  }

  test("q52 recursive CTE: full month spine, zero-order months gap-filled") {
    val rows = Advanced.recursiveCte(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2))))
    assert(rows.length == 84) // 1992-01 .. 1998-12, recursion-generated
    assert(rows.head._1 == 199201 && rows.last._1 == 199812)
    // month arithmetic never produces an invalid yyyymm
    assert(rows.forall { case (ym, _, _) => ym % 100 >= 1 && ym % 100 <= 12 })
    // the point of the spine: months with no orders still appear (TPC-H
    // order dates stop 1998-08-02), with NULL sum
    val empty = rows.filter(_._2 == 0L)
    assert(empty.nonEmpty && empty.forall(_._3.isEmpty))
  }

  test("WeightedMean UDAF equals the decimal-exact SQL formulation") {
    val udafRes = Extras.weightedAvgPrice(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.Tables.registerAll(spark, sfDir)
    val sqlRes = spark.sql(
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(udafRes == sqlRes)
  }
}
