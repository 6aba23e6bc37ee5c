package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Round-10 additions, batch 48: the embedding spectrum's top component
  * by ALL-INTEGER power iteration — effective-dimensionality evidence
  * for the compression trades B217/B222 certify empirically.
  */
object QueriesExt55 {

  // --------------------------- PCA top component (B237)

  /** Top principal component of the embedding cloud via 8 fixed power
    * iterations — entirely in integer arithmetic so both engines land
    * on the SAME component bit-for-bit: values snap to kilo-units, the
    * covariance is an exact BIGINT Gram table over centered values
    * (kilo snap keeps Σ cᵢcⱼ under 10¹³ even at 10⁸ rows), the
    * iteration vector renormalizes by L∞ (integer max, no sqrt), and
    * the Rayleigh quotient / trace ratio are integer divisions. Sign
    * fixed by forcing the largest-|loading| dim positive. Emits the
    * Rayleigh eigenvalue, explained-variance ppm, and the top-8 dims
    * by |loading| — the "how much of the cloud is one direction" table
    * that says whether B217's 16-dim prefix keeps the signal or
    * truncates it.
    *
    * Scale shape: ONE corpus pass builds the covariance (posexplode
    * pair products → a 64×64 = 4096-key map-side-combined hash-agg —
    * the shuffle carries the Gram table, never rows); the 8 iterations
    * are joins between the 4096-row matrix and a 64-row vector —
    * metadata-sized, volume-independent. Means are a 64-key agg. No
    * driver-side math beyond plan construction.
    */
  private def embedPcaTopComponent(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val kilo = emb.select(
      expr("transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))").as("xs"))
    // Covariance WITHOUT shuffling the corpus: the centered scatter
    // expands exactly over integers —
    //   Σ (xᵢ−μᵢ)(xⱼ−μⱼ) = Sxyᵢⱼ − μᵢ·Sxⱼ − μⱼ·Sxᵢ + n·μᵢ·μⱼ
    // for ANY integer constants μ (here the truncated means), so the raw
    // Gram table + per-dim sums give the same BIGINTs the per-row
    // centered form would. Count, sums, and the upper-triangle Gram all
    // come from ONE corpus pass through the GramMatrixAgg custom
    // aggregate (tight long[] loop, one 17 KB partial per partition) —
    // A/B-measured at sf1 against a 64·n-row vec_id self-join (24.3 s,
    // shuffle-bound at 100 TB) and a transform/flatten outer-product
    // explode (27.5 s, CodegenFallback per element).
    val g = kilo
      .agg(graft.functions.GramAgg.gramMatrix(col("xs")).as("g"))
      .localCheckpoint(true) // 1 row: [d, n, sx(d), upper-tri gram]
    val sx = g.select(
      posexplode(expr("slice(g, 3, CAST(element_at(g, 1) AS INT))")).as(Seq("i", "sx")))
    val nRows = g.select(expr("element_at(g, 2)").as("n"))
    val dims  = g.select(expr("element_at(g, 1)").as("d"))
    // upper-triangle (i,j) → 1-based position in g: rows above i hold
    // Σ_{r<i}(d−r) = i·d − i(i−1)/2 cells, so pos = 3+d + that + (j−i)
    val idx = sx.select(col("i"))
      .crossJoin(broadcast(sx.select(col("i").as("j"))))
      .filter(col("j") >= col("i"))
      .crossJoin(broadcast(dims))
      .select(col("i"), col("j"),
        expr("CAST(3 + d + i * d - (i * (i - 1)) div 2 + (j - i) AS INT)").as("pos"))
    val pairsU = idx
      .crossJoin(broadcast(g))
      .select(col("i"), col("j"), expr("element_at(g, pos)").as("sxy"))
    // normalize the scatter by n: covariance entries stay ≤ (2·kilo)²
    // regardless of row count, so every downstream product (w = C·v,
    // vᵀCv) fits a BIGINT at ANY corpus size — the scatter form would
    // overflow w·1000 past ~10⁵ rows. Pre-division terms are bounded by
    // ~4·n·kilo², BIGINT-safe past 10¹¹ rows. Integral division truncates
    // toward zero identically in Spark (`div`) and DuckDB (`//`),
    // verified on negatives, so no positivity shift is needed.
    val stats = sx
      .crossJoin(broadcast(nRows))
      .select(col("i"), col("sx"), expr("sx div n").as("mu"), col("n"))
    val covU = pairsU
      .join(broadcast(stats.select(col("i"), col("sx").as("sxi"), col("mu").as("mui"), col("n"))), Seq("i"))
      .join(broadcast(stats.select(col("i").as("j"), col("sx").as("sxj"), col("mu").as("muj"))), Seq("j"))
      .select(col("i"), col("j"),
        expr("(sxy - mui * sxj - muj * sxi + n * mui * muj) div n").as("cij"))
    val cov = covU.union(
      covU.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cij")))
    // 8 power iterations, L∞-normalized to ±1000 each round. Each
    // iterate references the previous one TWICE (in w and in w's max),
    // so an unmaterialized loop embeds 2⁸ copies of the whole chain —
    // including the corpus-sized covariance build — into one plan tree
    // and the optimizer never returns (observed: Verify wedged for
    // minutes). localCheckpoint per round flattens the lineage exactly
    // as graph_components does; the checkpointed tables are 4096 and 64
    // rows.
    val covM = cov.localCheckpoint(true)
    var v: DataFrame = sx.select(col("i").as("j"), lit(1000L).as("v")).localCheckpoint(true)
    for (_ <- 1 to 8) {
      val w = covM
        .join(v, Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("cij") * col("v")).as("w"))
      val norm = w.agg(max(abs(col("w"))).as("m"))
      v = w
        .crossJoin(broadcast(norm))
        .select(col("i").as("j"), expr("CASE WHEN m = 0 THEN 0L ELSE w * 1000 div m END").as("v"))
        .localCheckpoint(true)
    }
    // sign convention: the largest-|loading| dim is positive
    val signRow = v
      .select(col("j"), col("v"), row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(abs(col("v")).desc, col("j").asc)
      ).as("rk"))
    val sgn = signRow.filter(col("rk") === 1)
      .select(when(col("v") < 0, lit(-1L)).otherwise(lit(1L)).as("sgn"))
    val vSigned = v.crossJoin(broadcast(sgn)).select(col("j"), (col("v") * col("sgn")).as("v"))
    // Rayleigh quotient and trace, all integer
    val quad = cov
      .join(vSigned.select(col("j"), col("v").as("vj")), Seq("j"))
      .join(vSigned.select(col("j").as("i"), col("v").as("vi")), Seq("i"))
      .agg(sum(col("cij") * col("vi") * col("vj")).as("vcv"))
    val vv    = vSigned.agg(sum(col("v") * col("v")).as("vtv"))
    val trace = cov.filter(col("i") === col("j")).agg(sum(col("cij")).as("tr"))
    val lam = quad
      .crossJoin(broadcast(vv))
      .crossJoin(broadcast(trace))
      .select(
        expr("vcv div vtv").as("eigenvalue_kilo2"),
        expr("CASE WHEN tr = 0 THEN 0L ELSE (vcv div vtv) * 1000000 div tr END").as("explained_ppm")
      )
    // top-8 loadings by |v|, with the scalar summary columns repeated
    vSigned
      .select(col("j").as("dim"), col("v").as("loading_milli"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(abs(col("loading_milli")).desc, col("dim").asc)
      ))
      .filter(col("rk") <= 8)
      .crossJoin(broadcast(lam))
      .select(
        col("rk").cast("long").as("rank"),
        col("dim").cast("long").as("dim"),
        col("loading_milli"),
        col("eigenvalue_kilo2"),
        col("explained_ppm")
      )
  }

  private val embedPcaTopComponentSql = {
    // one iteration: w = C·v, then L∞-renormalize to ±1000
    def iter(prev: String, cur: String): String =
      s"""w$cur AS MATERIALIZED (
         |  SELECT c.i, CAST(sum(c.cij * v.v) AS BIGINT) AS w
         |  FROM cov c JOIN v$prev v ON v.j = c.j GROUP BY 1),
         |v$cur AS MATERIALIZED (
         |  SELECT w.i AS j,
         |    CASE WHEN m.m = 0 THEN 0 ELSE w.w * 1000 // m.m END AS v
         |  FROM w$cur w, (SELECT max(abs(w)) AS m FROM w$cur) m)""".stripMargin
    s"""WITH vals AS MATERIALIZED (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |    CAST(round(unnest(embedding)::DOUBLE * 1000) AS BIGINT) AS xk
       |  FROM embeddings),
       |mu AS MATERIALIZED (SELECT i, CAST(sum(xk) AS BIGINT) // count(*) AS mu FROM vals GROUP BY 1),
       |rows_c AS MATERIALIZED (
       |  SELECT v.vec_id, v.i, v.xk - m.mu AS c FROM vals v JOIN mu m ON m.i = v.i),
       |nr AS (SELECT count(*) AS n FROM embeddings),
       |cov AS MATERIALIZED (
       |  SELECT a.i, b.i AS j, CAST(sum(a.c * b.c) AS BIGINT) // nr.n AS cij
       |  FROM rows_c a JOIN rows_c b ON b.vec_id = a.vec_id, nr
       |  GROUP BY 1, 2, nr.n),
       |v0 AS MATERIALIZED (SELECT i AS j, CAST(1000 AS BIGINT) AS v FROM mu),
       |${iter("0", "1")},
       |${iter("1", "2")},
       |${iter("2", "3")},
       |${iter("3", "4")},
       |${iter("4", "5")},
       |${iter("5", "6")},
       |${iter("6", "7")},
       |${iter("7", "8")},
       |sgn AS MATERIALIZED (
       |  SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sgn FROM v8
       |  ORDER BY abs(v) DESC, j ASC LIMIT 1),
       |vs AS MATERIALIZED (SELECT v8.j, v8.v * sgn.sgn AS v FROM v8, sgn),
       |quad AS (
       |  SELECT CAST(sum(c.cij * vi.v * vj.v) AS BIGINT) AS vcv
       |  FROM cov c JOIN vs vi ON vi.j = c.i JOIN vs vj ON vj.j = c.j),
       |vtv AS (SELECT CAST(sum(v * v) AS BIGINT) AS vtv FROM vs),
       |tr AS (SELECT CAST(sum(cij) AS BIGINT) AS tr FROM cov WHERE i = j),
       |lam AS (
       |  SELECT q.vcv // t.vtv AS eigenvalue_kilo2,
       |    CASE WHEN r.tr = 0 THEN 0 ELSE (q.vcv // t.vtv) * 1000000 // r.tr END AS explained_ppm
       |  FROM quad q, vtv t, tr r),
       |rk AS (
       |  SELECT j AS dim, v AS loading_milli,
       |    row_number() OVER (ORDER BY abs(v) DESC, j ASC) AS rank
       |  FROM vs)
       |SELECT CAST(rk.rank AS BIGINT) AS rank, CAST(rk.dim AS BIGINT) AS dim,
       |  rk.loading_milli, lam.eigenvalue_kilo2, lam.explained_ppm
       |FROM rk, lam WHERE rk.rank <= 8""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_pca_top_component" -> (embedPcaTopComponent _)
  )

  def oracleSql: Map[String, String] = Map(
    "embed_pca_top_component" -> embedPcaTopComponentSql
  )
}
