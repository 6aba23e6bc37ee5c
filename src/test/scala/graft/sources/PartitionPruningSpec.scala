package graft.sources

import org.apache.spark.sql.functions._

import graft.GraftSpecBase

/** Directory-level partition pruning — the 100 TB lever DISTINCT from
  * row-group predicate pushdown (PLANS.md shows `PushedFilters`; this
  * spec shows `PartitionFilters`): a corpus written hive-partitioned by
  * `lang` must answer a `lang = 'en'` query by never LISTING the other
  * languages' directories, and a lang+source query must prune on the
  * partition column while pushing the data filter to the scan.
  */
class PartitionPruningSpec extends GraftSpecBase {

  private lazy val dir = {
    val d = graft.streaming.WorkDirs.fresh(spark, "part-pruning")
    graft.Tables
      .documents(spark, sf())
      .write
      .mode("overwrite")
      .partitionBy("lang")
      .parquet(d)
    d
  }

  test("equality filter on the partition column becomes a PartitionFilter, not a data filter") {
    val q = spark.read.parquet(dir).where(col("lang") === "en")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p)
    assert(p.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("lang"), p)
    // the partition predicate must NOT appear among pushed data filters
    val pushed = p.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
    assert(!pushed.contains("lang"), p)
    // and it actually prunes: count matches the unpartitioned filter
    val expect = graft.Tables.documents(spark, sf()).where(col("lang") === "en").count()
    assert(q.count() === expect)
  }

  test("mixed predicate splits: partition column prunes, data column pushes down") {
    val q = spark.read.parquet(dir).where(col("lang") === "zh" && col("n_chars") > 500)
    val p = q.queryExecution.executedPlan.toString
    assert(p.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("lang"), p)
    assert(p.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1").contains("n_chars"), p)
    val expect = graft.Tables
      .documents(spark, sf())
      .where(col("lang") === "zh" && col("n_chars") > 500)
      .count()
    assert(q.count() === expect)
  }
}
