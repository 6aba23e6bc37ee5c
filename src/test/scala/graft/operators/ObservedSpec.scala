package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSpecBase
import graft.Tables

/** observe()-based pipeline metrics: counters accumulated during the job
  * must equal a direct re-aggregation, with no second scan in the plan.
  */
class ObservedSpec extends GraftSpecBase {

  test("gate counters collected during the action match a direct aggregation") {
    val docs = Tables.documents(spark, sf())
    val (nRows, metrics) = Observed.run(
      docs,
      "curation_gate",
      Seq(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"),
        sum(col("n_chars")).as("total_chars")
      )
    )(d => d.write.format("noop").mode("overwrite").save())

    val direct = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"),
      sum(col("n_chars")).as("total_chars")
    ).head

    assert(metrics.getAs[Long]("n_docs") === direct.getAs[Long]("n_docs"))
    assert(metrics.getAs[Long]("n_short") === direct.getAs[Long]("n_short"))
    assert(metrics.getAs[Long]("total_chars") === direct.getAs[Long]("total_chars"))
    assert(nRows === ((): Unit))
  }

  test("metrics ride a transformed pipeline without forcing extra jobs") {
    val li = Tables.lineitem(spark, sf())
    val (_, m) = Observed.run(
      li.where(col("l_quantity") > 10),
      "filter_gate",
      Seq(count(lit(1)).as("n_kept"), min(col("l_quantity")).as("min_qty"))
    )(d => d.select("l_orderkey").write.format("noop").mode("overwrite").save())
    val expect = li.where(col("l_quantity") > 10).count()
    assert(m.getAs[Long]("n_kept") === expect)
    assert(m.getAs[Double]("min_qty") > 10.0)
  }
}
