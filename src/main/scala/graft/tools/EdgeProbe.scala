package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for the co-purchase edge build — the
  * scaling diagnostic behind SCALING.md's graph-family rows. Times each
  * pipeline stage in isolation (noop sink) so a super-linear sf ratio can
  * be attributed to a stage instead of guessed at.
  * Usage: runMain graft.tools.EdgeProbe <sfDir>
  */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get("graft-edgeprobe")
    def time(name: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[edgeprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val li = graft.Tables.lineitem(spark, sfDir)
    time("scan")(li.select(col("l_orderkey"), col("l_partkey")))
    val grouped = li
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))
    time("group_collect_set")(grouped)
    val pairs = grouped.select(
      explode(
        flatten(
          transform(
            col("pks"),
            (x, i) =>
              transform(
                slice(col("pks"), i + lit(2), greatest(size(col("pks")) - i - 1, lit(0))),
                y => struct(x.as("u"), y.as("v"))
              )
          )
        )
      ).as("p")
    ).select(col("p.u").as("u"), col("p.v").as("v"))
    time("pair_explode")(pairs)
    val support = pairs.groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_orders"))
    time("pair_support_agg")(support)
    val support2 = pairs
      .repartition(256, col("u"), col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_orders"))
    time("pair_support_prepart")(support2)
    val edges = support.where(col("n_orders") >= 2).select(col("u"), col("v"))
    val deg = edges
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
    time("degree_agg")(deg)
    spark.stop()
  }
}
