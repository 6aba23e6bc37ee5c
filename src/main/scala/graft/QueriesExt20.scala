package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Round-7 additions, batch 14: consistent-hash ring assignment (B128) —
  * the elasticity proof behind shard maps and distributed caches.
  */
object QueriesExt20 {

  // --------------------------- consistent-hash ring (B128)

  /** Consistent hashing with virtual nodes: documents are placed on a
    * 32-bit md5 ring and assigned to the successor vnode of 8 nodes ×
    * 32 vnodes; the same assignment is recomputed with node `n7`
    * REMOVED, and the per-node report shows load before/after plus how
    * many documents MOVED — the ~1/n movement guarantee that makes
    * consistent hashing the shard-map/cache-ring primitive (naive
    * `mod n` would move (n−1)/n of all keys). Ring positions and key
    * hashes are md5-derived, so both engines build the identical ring.
    *
    * Scale shape: the ring is a 256-row broadcast; successor lookup is
    * a broadcast join + min-aggregate (candidates ≥ h, wrap to the ring
    * minimum via a 1-row fallback) — per-key work is ring-bounded and
    * the corpus never shuffles except the final per-node count. At
    * cache-cluster scale the ring stays KB-sized however the corpus
    * grows.
    */
  private def qConsistentHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vnodes = (0 until 8).flatMap(n => (0 until 32).map(v => (s"node$n", s"node$n:$v")))
    val ringAll = vnodes.toDF("node", "vkey")
      .select(col("node"), graft.functions.Hashing.h32(col("vkey")).as("pos"))

    def assign(ring: DataFrame, tag: String): DataFrame = {
      val docs = documents(s, dir)
        .select(col("doc_id"), graft.functions.Hashing.h32(col("doc_id").cast("string")).as("h"))
      val succ = docs
        .join(broadcast(ring), col("pos") >= col("h"), "left")
        .groupBy("doc_id", "h")
        .agg(min("pos").as("succ_pos"))
      val wrap = ring.agg(min("pos").as("wrap_pos"))
      succ
        .crossJoin(broadcast(wrap))
        .select(col("doc_id"), coalesce(col("succ_pos"), col("wrap_pos")).as("pos"))
        .join(broadcast(ring), "pos")
        .select(col("doc_id"), col("node").as(s"node_$tag"))
    }

    val before = assign(ringAll, "before")
    val after  = assign(ringAll.where(col("node") =!= "node7"), "after")
    before
      .join(after, "doc_id")
      .groupBy(col("node_before").as("node"))
      .agg(
        count(lit(1)).as("load_before"),
        sum(when(col("node_before") === col("node_after"), 1L).otherwise(0L)).as("n_stable"),
        sum(when(col("node_before") =!= col("node_after"), 1L).otherwise(0L)).as("n_moved")
      )
  }

  private val qConsistentHashSql = {
    val vnodeRows = (0 until 8)
      .flatMap(n => (0 until 32).map(v => s"('node$n', 'node$n:$v')"))
      .mkString(", ")
    s"""WITH vn(node, vkey) AS (VALUES $vnodeRows),
       |ring AS (SELECT node, CAST('0x' || substr(md5(vkey), 1, 8) AS BIGINT) AS pos FROM vn),
       |docs AS (SELECT doc_id, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
       |  FROM documents),
       |b1 AS (SELECT doc_id, h, min(pos) AS succ_pos FROM docs LEFT JOIN ring ON pos >= h GROUP BY 1, 2),
       |w1 AS (SELECT min(pos) AS wrap_pos FROM ring),
       |a1 AS (SELECT doc_id, r.node AS node_before
       |  FROM b1 CROSS JOIN w1 JOIN ring r ON r.pos = coalesce(b1.succ_pos, w1.wrap_pos)),
       |ring2 AS (SELECT * FROM ring WHERE node != 'node7'),
       |b2 AS (SELECT doc_id, h, min(pos) AS succ_pos FROM docs LEFT JOIN ring2 ON pos >= h GROUP BY 1, 2),
       |w2 AS (SELECT min(pos) AS wrap_pos FROM ring2),
       |a2 AS (SELECT doc_id, r.node AS node_after
       |  FROM b2 CROSS JOIN w2 JOIN ring2 r ON r.pos = coalesce(b2.succ_pos, w2.wrap_pos))
       |SELECT node_before AS node, count(*) AS load_before,
       |  CAST(sum(CASE WHEN node_before = node_after THEN 1 ELSE 0 END) AS BIGINT) AS n_stable,
       |  CAST(sum(CASE WHEN node_before != node_after THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |FROM a1 JOIN a2 USING (doc_id) GROUP BY 1""".stripMargin
  }

  // --------------------------- largest-remainder apportionment (B129)

  /** Exact integer apportionment: 100 sample slots split across sources
    * proportionally to document counts using the LARGEST-REMAINDER
    * (Hamilton) method — floor quotas first, then one extra slot to the
    * k largest remainders so the total is EXACTLY the budget (naive
    * rounding over- or under-shoots) — the deterministic allocator
    * behind proportional sampling quotas, partition splits, and seat
    * assignment. Remainders compare as exact integers
    * (`n·budget mod total`), ties to the smaller source name.
    *
    * Scale shape: counts are one sources-sized hash-agg; quota/remainder
    * arithmetic, the remainder-rank window, and the deficit top-up all
    * run on that tiny table with the 1-row total broadcast.
    */
  private def qApportionment(s: SparkSession, dir: String): DataFrame = {
    val budget = 100L
    val counts = documents(s, dir).groupBy("source").agg(count(lit(1)).as("n"))
    val tot    = counts.agg(sum("n").as("total"), count(lit(1)).as("n_src"))
    val base = counts
      .crossJoin(broadcast(tot))
      .select(
        col("source"),
        col("n"),
        expr(s"CAST(n * $budget div total AS BIGINT)").as("floor_q"),
        expr(s"CAST(n * $budget % total AS BIGINT)").as("rem")
      )
    val deficit = base
      .groupBy(lit(1).as("g"))
      .agg((lit(budget) - sum("floor_q")).as("deficit"))
      .drop("g")
    base
      .crossJoin(broadcast(deficit))
      .withColumn(
        "rem_rank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(expr("rem % 1")).orderBy(desc("rem"), col("source"))
        ).cast("long")
      )
      .select(
        col("source"),
        col("n"),
        (col("floor_q") + when(col("rem_rank") <= col("deficit"), 1L).otherwise(0L)).as("slots")
      )
  }

  private val qApportionmentSql =
    """WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
      |base AS (SELECT source, n,
      |    CAST(n * 100 // total AS BIGINT) AS floor_q,
      |    CAST(n * 100 % total AS BIGINT) AS rem
      |  FROM counts CROSS JOIN tot),
      |d AS (SELECT 100 - CAST(sum(floor_q) AS BIGINT) AS deficit FROM base),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rem_rank FROM base)
      |SELECT source, n,
      |  floor_q + CASE WHEN rem_rank <= deficit THEN 1 ELSE 0 END AS slots
      |FROM r CROSS JOIN d""".stripMargin

  // --------------------------- Cohen's kappa agreement (B130)

  /** Inter-rater reliability: Cohen's κ between two INDEPENDENT
    * en-vs-other language classifiers — B5's full stopword vote and a
    * crude single-token detector (contains "the") — in ppm:
    * κ = (pₒ − pₑ)/(1 − pₑ) with observed and expected agreement kept
    * as exact integer cross-products over the 2×2 confusion counts
    * (κ_ppm = (N·agree − Σ rowᵢ·colᵢ)·1e6 div (N² − Σ rowᵢ·colᵢ)).
    * Chance-corrected agreement is the right way to compare two
    * heuristics (raw agreement rewards the majority class); κ ≫ 0 here
    * certifies the two signals see the same language structure.
    *
    * Scale shape: both classifications are scan-fused codegen chains;
    * the 2×2 confusion matrix is one map-side hash-agg; κ is scalar
    * arithmetic on four counts via DECIMAL(38,0).
    */
  private def textKappaAgreement(s: SparkSession, dir: String): DataFrame = {
    val toks = split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
    def votes(ws: String) = size(expr(s"filter(t, x -> x IN ($ws))"))
    val vEn = votes("'the','and','of','is'")
    val vOther = greatest(
      votes("'der','und','die','ist'"), votes("'le','et','les','est'"),
      votes("'el','y','los','es'"), votes("'的','是','了','在'")
    )
    val m = documents(s, dir)
      .select(col("doc_id"), toks.as("t"))
      .select(
        (vEn >= vOther).as("a_zh"),
        array_contains(col("t"), "the").as("b_zh")
      )
      .groupBy("a_zh", "b_zh")
      .agg(count(lit(1)).as("c"))
    m.agg(
        sum("c").as("n"),
        sum(when(col("a_zh") === col("b_zh"), col("c")).otherwise(0L)).as("agree"),
        sum(when(col("a_zh"), col("c")).otherwise(0L)).as("a_pos"),
        sum(when(col("b_zh"), col("c")).otherwise(0L)).as("b_pos")
      )
      .select(
        col("n"),
        col("agree"),
        expr(
          """CAST((CAST(n AS DECIMAL(38,0)) * agree
            |       - (CAST(a_pos AS DECIMAL(38,0)) * b_pos + (CAST(n AS DECIMAL(38,0)) - a_pos) * (n - b_pos)))
            |  * 1000000
            |  div nullif(CAST(n AS DECIMAL(38,0)) * n
            |       - (CAST(a_pos AS DECIMAL(38,0)) * b_pos + (CAST(n AS DECIMAL(38,0)) - a_pos) * (n - b_pos)), 0)
            |  AS BIGINT)""".stripMargin
        ).as("kappa_ppm")
      )
  }

  private val textKappaAgreementSql =
    """WITH t AS (SELECT doc_id, text,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |cls AS (SELECT
      |    len(list_filter(toks, x -> list_contains(['the','and','of','is'], x)))
      |      >= greatest(
      |        len(list_filter(toks, x -> list_contains(['der','und','die','ist'], x))),
      |        len(list_filter(toks, x -> list_contains(['le','et','les','est'], x))),
      |        len(list_filter(toks, x -> list_contains(['el','y','los','es'], x))),
      |        len(list_filter(toks, x -> list_contains(['的','是','了','在'], x)))) AS a_zh,
      |    list_contains(toks, 'the') AS b_zh
      |  FROM t),
      |m AS (SELECT a_zh, b_zh, count(*) AS c FROM cls GROUP BY 1, 2),
      |agg AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN a_zh = b_zh THEN c ELSE 0 END) AS BIGINT) AS agree,
      |    CAST(sum(CASE WHEN a_zh THEN c ELSE 0 END) AS BIGINT) AS a_pos,
      |    CAST(sum(CASE WHEN b_zh THEN c ELSE 0 END) AS BIGINT) AS b_pos
      |  FROM m)
      |SELECT n, agree,
      |  CAST((n * agree - (a_pos * b_pos + (n - a_pos) * (n - b_pos))) * 1000000
      |    // nullif(n * n - (a_pos * b_pos + (n - a_pos) * (n - b_pos)), 0) AS BIGINT) AS kappa_ppm
      |FROM agg""".stripMargin

  // ------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_consistent_hash"     -> (qConsistentHash _),
    "q_apportionment"       -> (qApportionment _),
    "text_kappa_agreement"  -> (textKappaAgreement _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_consistent_hash"     -> qConsistentHashSql,
    "q_apportionment"       -> qApportionmentSql,
    "text_kappa_agreement"  -> textKappaAgreementSql
  )
}
