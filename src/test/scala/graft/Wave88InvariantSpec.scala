package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Certification invariants for batch 62 (B318–B321). */
class Wave88InvariantSpec extends GraftSpecBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("q_replica_checksum: digests detect a single-row change and ignore row order") {
    val rows = run("q_replica_checksum").collect()
    assert(rows.map(_.getAs[String]("table_name")).sorted.toSeq ===
      Seq("customer", "nation", "orders", "region"))
    // the checksums of an identical second read must match bit for bit
    val again = run("q_replica_checksum").collect()
    assert(rows.map(r => (r.getAs[String]("table_name"), r.getAs[Long]("xor_checksum"),
      r.getAs[Long]("modsum_checksum"))).toSet ===
      again.map(r => (r.getAs[String]("table_name"), r.getAs[Long]("xor_checksum"),
        r.getAs[Long]("modsum_checksum"))).toSet)
    // a mutated replica must diverge: recompute region's digest with one
    // name changed and compare
    val region = Tables.region(spark, sf())
    val mutated = region.withColumn("r_name",
      when(col("r_regionkey") === 0, concat(col("r_name"), lit("X"))).otherwise(col("r_name")))
    val h = graft.functions.Hashing.h60(
      concat_ws("|", col("r_regionkey").cast("long").cast("string"), col("r_name")))
    def dig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.select(h.as("h"))
        .agg(expr("bit_xor(h)").as("x"), sum(expr("h % 1000000007")).as("m")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(dig(region) !== dig(mutated), "single-row mutation must flip the digest")
  }

  test("events_forecast_backtest: MAPE bounded by worst APE; both models cover all types") {
    val rows = run("events_forecast_backtest").collect()
    assert(rows.nonEmpty)
    val models = rows.map(_.getAs[String]("model")).distinct.sorted
    assert(models.toSeq === Seq("naive", "snaive"))
    rows.foreach { r =>
      assert(r.getAs[Long]("mape_ppm") <= r.getAs[Long]("max_ape_ppm"))
      assert(r.getAs[Long]("mape_ppm") >= 0L && r.getAs[Long]("n_days") >= 1L)
    }
  }

  test("graph_ppr_seed: seed keeps its teleport floor; personalization zeroes the far tail") {
    val rows = run("graph_ppr_seed").collect()
    assert(rows.length === 20)
    val bySeed = rows.map(r => r.getAs[String]("node") -> r.getAs[Long]("ppr_ppm")).toMap
    // the seed keeps its teleport floor (its mass can still flow onward —
    // a downstream hub MAY out-rank the seed, that is not a bug)
    assert(bySeed("src0") >= 150000L, s"seed rank ${bySeed("src0")} below teleport floor")
    // the personalization signature global PageRank can never show:
    // nodes outside the seed's reach score exactly 0 (global PR gives
    // every node the uniform teleport floor)
    assert(rows.count(_.getAs[Long]("ppr_ppm") === 0L) > 0,
      "no zero-rank nodes — personalization is not localized")
    // floor-division only loses mass, never creates it
    assert(rows.map(_.getAs[Long]("ppr_ppm")).sum <= 1000000L)
    rows.foreach(r => assert(r.getAs[Long]("ppr_ppm") >= 0L))
  }

  test("text_term_drift: movers sorted by |z|, shares consistent with counts") {
    val rows = run("text_term_drift").orderBy(col("rank")).collect()
    assert(rows.length === 20)
    val zs = rows.map(r => math.abs(r.getAs[Double]("z_drift")))
    assert(zs.sliding(2).forall(p => p(0) >= p(1)), "not sorted by |z|")
    rows.foreach { r =>
      assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") >= 10L)
      assert(r.getAs[Long]("share1_ppm") >= 0L && r.getAs[Long]("share2_ppm") >= 0L)
    }
  }
}
