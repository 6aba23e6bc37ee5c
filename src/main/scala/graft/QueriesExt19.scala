package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Round-7 additions, batch 10: process-conformance checking (B104),
  * script-mismatch auditing (B105), and signed-delta incremental view
  * maintenance (B106).
  */
object QueriesExt19 {

  // --------------------------- conformance checking (B104)

  /** Process-mining conformance: flag every adjacent event-type
    * transition that violates the declared process model (here: an
    * `error` must not be directly followed by a `purchase`, and a
    * `signup` must not immediately repeat) — the NORMATIVE counterpart
    * of B61's descriptive transition matrix, the audit that catches
    * clients skipping the declared flow. Violations carry both event
    * ids for the case-investigation drill-down.
    *
    * Scale shape: one per-user lag window (bounded by a user's history)
    * + a scan-side filter against the literal rule set — no joins, no
    * aggregation; output is violations-sized.
    */
  private def eventsConformance(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    events(s, dir)
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        operators.EventAnalytics.tsMillis(col("ts")).as("ms")
      )
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .where(
        (col("prev_type") === "error" && col("event_type") === "purchase") ||
          (col("prev_type") === "signup" && col("event_type") === "signup")
      )
      .select(
        col("user_id"),
        col("prev_id"),
        col("event_id"),
        concat(col("prev_type"), lit(">"), col("event_type")).as("violation")
      )
  }

  private val eventsConformanceSql =
    """WITH l AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
      |    lag(event_type) OVER w AS prev_type,
      |    lag(event_id) OVER w AS prev_id
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id))
      |SELECT user_id, prev_id, event_id, prev_type || '>' || event_type AS violation
      |FROM l
      |WHERE (prev_type = 'error' AND event_type = 'purchase')
      |   OR (prev_type = 'signup' AND event_type = 'signup')""".stripMargin

  // --------------------------- script-mismatch audit (B105)

  /** Language/script consistency audit: count CJK codepoints per
    * document and flag documents whose declared language is NOT Chinese
    * but which contain CJK — the script-level mismatch detector that
    * catches mislabeled or concatenation-corrupted documents even when
    * B5's stopword-based langid is fooled. Mismatches are STAGED (every
    * 11th non-zh doc gets a CJK char spliced in) so both engines replay
    * wound and audit.
    *
    * Scale shape: pure codegen regexp count fused into the scan — no
    * UDF, no shuffle, no join.
    */
  private def textScriptMismatch(s: SparkSession, dir: String): DataFrame = {
    val wounded = when(
      col("doc_id") % 11 === 0 && col("lang") =!= "zh",
      concat(substring(col("text"), 1, 8), lit("中"), substring(col("text"), 9, 1000000))
    ).otherwise(col("text"))
    documents(s, dir)
      .select(col("doc_id"), col("lang"), wounded.as("t"))
      .select(
        col("doc_id"),
        col("lang"),
        size(regexp_extract_all(col("t"), lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
          .cast("long").as("n_cjk")
      )
      .withColumn("script_mismatch", col("lang") =!= "zh" && col("n_cjk") > 0)
  }

  private val textScriptMismatchSql =
    """WITH d AS (SELECT doc_id, lang,
      |    CASE WHEN doc_id % 11 = 0 AND lang != 'zh'
      |      THEN substr(text, 1, 8) || chr(20013) || substr(text, 9)
      |      ELSE text END AS t
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CAST(len(regexp_extract_all(t, '[一-鿿]')) AS BIGINT) AS n_cjk,
      |  lang != 'zh' AND len(regexp_extract_all(t, '[一-鿿]')) > 0 AS script_mismatch
      |FROM d""".stripMargin

  // --------------------------- signed-delta IVM (B106)

  /** Incremental view maintenance with RETRACTIONS: a per-type
    * (net count, net sum) aggregate view maintained as BASE PARTIALS +
    * DELTA PARTIALS, where `error` rows carry sign −1 (upstream
    * deletions) and everything else +1 — the signed-merge contract that
    * lets a materialized aggregate absorb a change batch without
    * rescanning base data. The split is staged (event_id mod 10 picks
    * the delta batch); the ORACLE aggregates the full table directly
    * with the same signs, so parity proves base⊕delta ≡ full — the IVM
    * correctness condition, with deletions in play (B69 proved the
    * insert-only case).
    *
    * Scale shape: two disjoint scans collapse to types-sized partials
    * (map-side combined); the merge joins two tiny tables. A production
    * run reads only the delta — the base partial is the stored view.
    */
  private def qIvmDelta(s: SparkSession, dir: String): DataFrame = {
    def partial(df: DataFrame): DataFrame =
      df.select(
          col("event_type"),
          when(col("event_type") === "error", lit(-1L)).otherwise(lit(1L)).as("sign"),
          col("value").cast("decimal(18,2)").as("v")
        )
        .groupBy("event_type")
        .agg(sum(col("sign")).as("n_net"), sum(col("sign") * col("v")).as("sv_net"))
    val base  = partial(events(s, dir).where(col("event_id") % 10 =!= 0))
    val delta = partial(events(s, dir).where(col("event_id") % 10 === 0))
    base
      .select(col("event_type"), col("n_net").as("n_b"), col("sv_net").as("sv_b"))
      .join(
        delta.select(col("event_type"), col("n_net").as("n_d"), col("sv_net").as("sv_d")),
        Seq("event_type"),
        "full_outer"
      )
      .select(
        col("event_type"),
        (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n_net"),
        round(coalesce(col("sv_b"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("sv_d"), lit(0).cast("decimal(18,2)")), 2).cast("double").as("sum_net")
      )
  }

  private val qIvmDeltaSql =
    """SELECT event_type,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) AS BIGINT) AS n_net,
      |  CAST(round(sum((CASE WHEN event_type = 'error' THEN -1 ELSE 1 END)
      |    * CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_net
      |FROM events GROUP BY 1""".stripMargin

  // ------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_conformance"   -> (eventsConformance _),
    "text_script_mismatch" -> (textScriptMismatch _),
    "q_ivm_delta"          -> (qIvmDelta _)
  )

  def oracleSql: Map[String, String] = Map(
    "events_conformance"   -> eventsConformanceSql,
    "text_script_mismatch" -> textScriptMismatchSql,
    "q_ivm_delta"          -> qIvmDeltaSql
  )
}
