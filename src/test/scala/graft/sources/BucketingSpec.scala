package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSpecBase

class BucketingSpec extends GraftSpecBase {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val li = graft.Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
    val o  = graft.Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")

    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_b", "o_orderkey", 4)

    // disable broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing
        .bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), first(col("o_totalprice")).as("p"))
      joined.collect()
      assert(Bucketing.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)

      // sanity: same answer as the unbucketed join
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), first(col("o_totalprice")).as("p"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
  }
}
