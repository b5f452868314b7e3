package graft.relational

import graft.SparkSuite

class QuantileSketchSpec extends SparkSuite {

  test("q68: sketch quantiles stay within 5% of exact at accuracy 100") {
    val rows = graft.queries.OlapQueries.approxQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) < 0.05, s"p50 err ${r.getDouble(3)} for ${r.getString(0)}")
      assert(r.getDouble(6) < 0.05, s"p95 err ${r.getDouble(6)} for ${r.getString(0)}")
    }
  }
}
