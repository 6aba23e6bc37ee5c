package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking (SURVEY.md §2 B11 at scale): exact global
  * `row_number` / `ntile` over a total order WITHOUT a single-partition
  * window (`… OVER (ORDER BY …)` moves the entire input through one task
  * — the classic scale killer this operator replaces).
  *
  * Three partition-parallel passes:
  *  1. value-range buckets from sampled quantile cuts — a pure function
  *     of the value, so the later jobs agree on bucket membership without
  *     caching (unlike `repartitionByRange`, whose sampled bounds are
  *     re-drawn per job);
  *  2. per-bucket counts → exclusive prefix offsets (nBuckets rows on the
  *     driver — thousands at most, independent of data size);
  *  3. per-bucket local `row_number` + bucket offset = exact global rank.
  *
  * The order is (valueCol asc, tieCol asc) and must be total — supply a
  * unique tie-breaker. Heavy duplicate values concentrate in one bucket
  * (value-based bucketing is what keeps the passes consistent); that
  * bucket still sorts in parallel with everything else.
  */
object Ranking {

  /** Appends `outCol` = exact global 1-based rank by (valueCol, tieCol). */
  def withGlobalRank(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      outCol: String = "rn",
      nBuckets: Int = 32
  ): DataFrame = rankWithTotal(df, valueCol, tieCol, outCol, nBuckets)._1

  private def rankWithTotal(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      outCol: String,
      nBuckets: Int
  ): (DataFrame, Long) = {
    val cuts = df.stat
      .approxQuantile(valueCol, (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.001)
      .distinct.sorted
    val bucketExpr: Column =
      if (cuts.isEmpty) lit(0)
      else size(filter(array(cuts.map(lit).toSeq: _*), c => col(valueCol) > c))
    val bucketed = df.withColumn("__bucket", bucketExpr)

    val counts = bucketed.groupBy("__bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix: Map[Int, Long] = {
      var acc = 0L
      (0 to cuts.length).map { b => val base = acc; acc += counts.getOrElse(b, 0L); b -> base }.toMap
    }
    val offsetExpr = element_at(
      map(prefix.toSeq.sortBy(_._1).flatMap { case (b, off) => Seq(lit(b), lit(off)) }: _*),
      col("__bucket")
    )
    val w = Window.partitionBy(col("__bucket")).orderBy(col(valueCol).asc, col(tieCol).asc)
    val ranked = bucketed
      .withColumn(outCol, row_number().over(w).cast("long") + offsetExpr)
      .drop("__bucket")
    (ranked, counts.values.sum)
  }

  /** Appends `outCol` = exact `ntile(n)` tile of the (valueCol, tieCol)
    * order: the first N mod n tiles take ceil(N/n) rows, the rest
    * floor(N/n) — bit-identical to SQL `ntile(n) OVER (ORDER BY …)`
    * (property-tested against it in RankingSpec, and oracle-checked
    * against DuckDB through q_ntile_deciles). The row total comes from the
    * rank pass's own count job — no extra scan.
    */
  def withNtile(
      df: DataFrame,
      n: Int,
      valueCol: String,
      tieCol: String,
      outCol: String = "tile",
      nBuckets: Int = 32
  ): DataFrame = {
    require(n >= 1, s"ntile n must be >= 1 (got $n)")
    val (ranked, total) = rankWithTotal(df, valueCol, tieCol, "__rn", nBuckets)
    val q   = total / n
    val r   = total % n
    val thr = r * (q + 1)
    ranked
      .withColumn(
        outCol,
        when(lit(q) === 0L, col("__rn"))
          .when(col("__rn") <= thr, floor((col("__rn") - 1) / (q + 1)) + 1)
          .otherwise(lit(r) + floor((col("__rn") - 1 - thr) / q) + 1)
          .cast("long")
      )
      .drop("__rn")
  }
}
