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

  // ------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_consistent_hash" -> (qConsistentHash _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_consistent_hash" -> qConsistentHashSql
  )
}
