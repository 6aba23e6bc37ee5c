package graft.tools

/** Fixed-cost-tail attribution (the r15 verdict's item 10): for each named
  * query, separate DRIVER-side cost (DataFrame construction + analysis +
  * optimization + physical planning, i.e. forcing `executedPlan`) from the
  * total noop-sink execution, so the ~300-query 0.2–0.6 s tail can be
  * attributed to planning vs execution before anyone "optimizes" it.
  * Usage:
  *   runMain graft.tools.PlanCost <sfDir> <q1,q2,...> [trials]
  * Prints one line per query: plan_s, exec_total_s (median of trials, a
  * warm untimed pass first), plan share.
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanCost <sfDir> <q1,q2,...> [trials]")
    val sfDir  = args(0)
    val names  = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val trials = if (args.length > 2) args(2).toInt else 3
    val spark = graft.GraftSession
      .builder("graft-plancost")
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (256L * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    println(f"${"query"}%-34s ${"plan_s"}%8s ${"total_s"}%8s ${"plan_pct"}%8s")
    names.foreach { name =>
      try {
        // warm pass (codegen, page cache, file index) — untimed
        graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val planTs = Seq.fill(trials) {
          val t0 = System.nanoTime()
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.executedPlan // forces analyze + optimize + plan
          (System.nanoTime() - t0) / 1e9
        }
        val totTs = Seq.fill(trials) {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val p = med(planTs); val t = med(totTs)
        println(f"$name%-34s $p%8.3f $t%8.3f ${100 * p / math.max(t, 1e-9)}%7.1f%%")
      } catch {
        case e: Throwable => println(s"$name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
