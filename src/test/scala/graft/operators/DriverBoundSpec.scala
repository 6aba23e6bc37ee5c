package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSpecBase

/** The §5 driver-collect guard: model-sized pulls must come back intact
  * under the bound, and a corpus-sized table must fail LOUDLY (naming the
  * table) instead of materializing on the driver.
  */
class DriverBoundSpec extends GraftSpecBase {

  test("under the bound: all rows come back") {
    import spark.implicits._
    val df   = (1 to 40).toDF("x")
    val rows = DriverBound.collectBounded(df, "test table", maxRows = 100)
    assert(rows.length === 40)
    assert(rows.map(_.getInt(0)).sorted.toSeq === (1 to 40))
  }

  test("exactly at the bound passes") {
    import spark.implicits._
    val rows = DriverBound.collectBounded((1 to 7).toDF("x"), "boundary", maxRows = 7)
    assert(rows.length === 7)
  }

  test("over the bound trips with the table's name, without collecting it all") {
    import spark.implicits._
    val big = spark.range(0, 1000).select(col("id"))
    val ex = intercept[IllegalArgumentException] {
      DriverBound.collectBounded(big, "markov transition matrix", maxRows = 50)
    }
    assert(ex.getMessage.contains("markov transition matrix"))
    assert(ex.getMessage.contains("model-sized"))
  }

  test("the guarded production pulls stay far under the default bound at sf0.001") {
    // the HITS edge list is the largest guarded pull: sources × 27 buckets
    val docs = graft.Tables.documents(spark, sf())
    val nSources = docs.select("source").distinct().count()
    assert(nSources * 27 < DriverBound.DefaultMaxRows)
  }
}
