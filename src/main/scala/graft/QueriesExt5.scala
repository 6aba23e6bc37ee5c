package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.TextAnalysis

/** Fifth query batch — round 2 coverage widening:
  *
  *  - the TPC-H shapes the fixture schema can express that were still
  *    missing (Q8 market share, Q12 ship-lag distribution, Q15 top
  *    supplier, Q16 supplier counts, Q17 small-quantity revenue, Q20
  *    part-supplier semi-join chain, Q21 waiting-supplier multi-join) —
  *    adapted where the fixtures lack partsupp/commitdate;
  *  - window-function surface: lead/lag deltas, ntile deciles, running
  *    (cumulative) totals, first/last_value frames;
  *  - GROUPING SETS with grouping_id (rollup/cube already covered);
  *  - higher-order array functions over the embeddings table;
  *  - corpus-level text ops an LLM-data pipeline runs constantly:
  *    TF-IDF top term per document and global token frequency top-k.
  *
  * Parity rules follow SparkEntry's Scaladoc (decimal money, epoch-ms
  * timestamps, BIGINT counts, round-6 ratios).
  */
object QueriesExt5 {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def tsLit(date: String)                  = to_timestamp(lit(date))
  private def revenue =
    sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
  private val revenueSql =
    "sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))"
  private val normSql = "regexp_replace(lower(trim(text)),'\\s+',' ','g')"

  // ------------------------------------------------------- TPC-H adaptations

  /** Q8 shape: per order-year, the revenue share of suppliers from one
    * nation within all ASIA-region customer revenue.
    */
  private def q8(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= tsLit("1996-01-01") && col("o_orderdate") < tsLit("1998-01-01"))
      .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(broadcast(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(
        broadcast(nation(s, dir).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk")
      )
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        round(
          sum(when(col("supp_nation") === "NATION_2", dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            revenue.cast("double"),
          6
        ).as("mkt_share")
      )

  private val q8Sql =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  round(CAST(sum(CASE WHEN sn.n_name = 'NATION_2'
       |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
       |    CAST($revenueSql AS DOUBLE), 6) AS mkt_share
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1""".stripMargin

  /** Q12 shape: order-to-ship lag distribution — 30-day bands × priority
    * class counts (the fixtures lack commitdate/receiptdate/shipmode, so
    * the lag is shipdate − orderdate and the "mode" is the priority class).
    */
  private def q12(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days", datediff(col("l_shipdate"), col("o_orderdate")))
      .groupBy(least(floor(col("lag_days") / 30), lit(6)).cast("long").as("lag_band"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).cast("long").as("high_prio"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).cast("long").as("low_prio")
      )

  private val q12Sql =
    """SELECT CAST(least(floor(datediff('day', o_orderdate, l_shipdate) / 30), 6) AS BIGINT) AS lag_band,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_prio,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_prio
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Q15: the supplier(s) with maximum revenue in 1997Q1. The scalar max
    * is a 1-row broadcast cross-joined back onto the per-supplier
    * aggregate — the plan that never degrades (a global window for the
    * same scalar moves every row to one task at scale). The oracle
    * recomputes via a scalar subquery.
    */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val rev = lineitem(s, dir)
      .filter(col("l_shipdate") >= tsLit("1997-01-01") && col("l_shipdate") < tsLit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(round(revenue, 2).cast("double").as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    rev
      .join(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .join(supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
  }

  private val q15Sql =
    s"""WITH rev AS (
       |  SELECT l_suppkey, CAST(round($revenueSql, 2) AS DOUBLE) AS total_rev
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_rev
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin

  /** Q16 shape: distinct-supplier counts per (brand, size) for non-PROMO
    * parts, derived through lineitem (the fixtures have no partsupp).
    */
  private def q16(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .join(broadcast(part(s, dir).filter(col("p_type") =!= "PROMO")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  private val q16Sql =
    """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type != 'PROMO'
      |GROUP BY 1, 2""".stripMargin

  /** Q17: revenue locked in small-quantity orders — lines with quantity
    * below half their part's average quantity. l_quantity is
    * integer-valued, so the average (exact double sum / count) is
    * bit-identical across engines and the comparison is boundary-safe.
    */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val partAvg = lineitem(s, dir)
      .groupBy(col("l_partkey").as("ap_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    lineitem(s, dir)
      .join(partAvg, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(
        round(sum(dec2(col("l_extendedprice"))), 2).cast("double").as("small_qty_revenue"),
        count(lit(1)).as("n_lines")
      )
  }

  private val q17Sql =
    """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS small_qty_revenue,
      |  count(*) AS n_lines
      |FROM lineitem l JOIN (
      |  SELECT l_partkey AS ap_partkey, sum(l_quantity) / count(*) AS avg_qty
      |  FROM lineitem GROUP BY 1) a ON l.l_partkey = a.ap_partkey
      |WHERE l_quantity < 0.5 * avg_qty""".stripMargin

  /** Q20 shape: suppliers who shipped at least 3 distinct 'red' parts in
    * 1997 — the part→lineitem→supplier semi-join chain.
    */
  private def q20(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .filter(col("l_shipdate") >= tsLit("1997-01-01") && col("l_shipdate") < tsLit("1998-01-01"))
      .join(broadcast(part(s, dir).filter(col("p_name").like("%red%"))), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_red_parts"))
      .filter(col("n_red_parts") >= 3)
      .join(supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_red_parts"))

  private val q20Sql =
    """SELECT s_suppkey, s_name, n_red_parts
      |FROM (SELECT l_suppkey, count(DISTINCT l_partkey) AS n_red_parts
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE p_name LIKE '%red%'
      |        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |      GROUP BY l_suppkey)
      |  JOIN supplier ON l_suppkey = s_suppkey
      |WHERE n_red_parts >= 3""".stripMargin

  /** Q21 shape: in finished multi-supplier orders, count per supplier the
    * orders where that supplier was the ONLY one with returned lines —
    * the exists/not-exists double-correlation expressed as two grouped
    * self-aggregations (no row explosion, two shuffles on the same key).
    */
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val fLines = lineitem(s, dir)
      .join(orders(s, dir).filter(col("o_orderstatus") === "F"), col("l_orderkey") === col("o_orderkey"))
    val perOrderSupp = fLines
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("has_r"))
    val perOrder = perOrderSupp
      .groupBy(col("l_orderkey").as("po_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_r_supp"))
    perOrderSupp
      .filter(col("has_r") === 1)
      .join(
        perOrder.filter(col("n_supp") > 1 && col("n_r_supp") === 1),
        col("l_orderkey") === col("po_orderkey")
      )
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(20)
  }

  private val q21Sql =
    """WITH f AS (
      |  SELECT l_orderkey, l_suppkey,
      |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY 1, 2),
      |o AS (SELECT l_orderkey AS po_orderkey, count(*) AS n_supp, sum(has_r) AS n_r_supp
      |      FROM f GROUP BY 1)
      |SELECT s_suppkey, s_name, numwait FROM (
      |  SELECT l_suppkey, count(*) AS numwait
      |  FROM f JOIN o ON l_orderkey = po_orderkey
      |  WHERE has_r = 1 AND n_supp > 1 AND n_r_supp = 1
      |  GROUP BY 1)
      |JOIN supplier ON l_suppkey = s_suppkey
      |ORDER BY numwait DESC, s_suppkey ASC LIMIT 20""".stripMargin

  // --------------------------------------------------------- window surface

  /** lead/lag: per user ordered by time, the gap to the previous event and
    * the next event's type (nulls at the edges stay null).
    */
  private def qLeadLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms").asc, col("event_id").asc)
    events(s, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"), col("event_type"))
      .withColumn("prev_gap_ms", col("ms") - lag(col("ms"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("ms"), col("prev_gap_ms"), col("next_type"))
  }

  private val qLeadLagSql =
    """SELECT user_id, event_id, ms,
      |  ms - lag(ms, 1) OVER w AS prev_gap_ms,
      |  lead(event_type, 1) OVER w AS next_type
      |FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ms ASC, event_id ASC)""".stripMargin

  /** ntile deciles of order value with per-decile stats — via a
    * distributed two-pass global ranking, not `ntile() OVER (ORDER BY …)`
    * (a global window moves the whole table to one task; this version
    * keeps every stage partition-parallel and survives a 100× scale-up):
    *
    *  1. value-range buckets from sampled quantile cuts — a pure function
    *     of the value, so later jobs agree without caching (unlike
    *     repartitionByRange, whose sampled bounds differ per job);
    *  2. per-bucket counts → driver (nBuckets rows) → exclusive prefix
    *     offsets;
    *  3. per-bucket local row_number + bucket offset = exact global rank,
    *     then the exact ntile size formula (first N%10 tiles get one extra
    *     row) reproduces ntile(10) bit-for-bit — the oracle runs real
    *     SQL ntile to prove it.
    */
  private def qNtileDeciles(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir).select(col("o_totalprice").as("price"), col("o_orderkey").as("okey"))
    operators.Ranking
      .withNtile(o, 10, "price", "okey", "decile")
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price")
      )
  }

  private val qNtileDecilesSql =
    """SELECT decile, count(*) AS n_orders, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM (SELECT o_totalprice, o_orderkey,
      |        CAST(ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS decile
      |      FROM orders)
      |GROUP BY decile""".stripMargin

  /** Running (cumulative) monthly revenue per market segment — the
    * cumulative sum stays in the exact DECIMAL domain until the final
    * round+cast, so partial-sum order cannot flip a rounding boundary.
    */
  private def qRunningTotal(s: SparkSession, dir: String): DataFrame = {
    val monthly = orders(s, dir)
      .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(dec2(col("o_totalprice"))).as("m_rev_dec"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("month").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("cum_rev", round(sum(col("m_rev_dec")).over(w), 2).cast("double"))
      .select(
        col("c_mktsegment"),
        unix_millis(col("month").cast("timestamp")).as("month_ms"),
        round(col("m_rev_dec"), 2).cast("double").as("month_rev"),
        col("cum_rev")
      )
  }

  private val qRunningTotalSql =
    """WITH m AS (
      |  SELECT c_mktsegment, date_trunc('month', o_orderdate) AS month,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m_rev_dec
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT c_mktsegment, epoch_ms(month) AS month_ms,
      |  CAST(round(m_rev_dec, 2) AS DOUBLE) AS month_rev,
      |  CAST(round(sum(m_rev_dec) OVER (PARTITION BY c_mktsegment ORDER BY month ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS cum_rev
      |FROM m""".stripMargin

  /** first/last_value over an unbounded frame: each customer's first and
    * last order price + the day span between them. The oracle reproduces
    * it with arg_min/arg_max over a composite (epoch, key) ordering — an
    * independent algorithm for the same semantics.
    */
  private def qFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, dir)
      .withColumn("first_price", first_value(col("o_totalprice")).over(wAll))
      .withColumn("last_price", last_value(col("o_totalprice")).over(wAll))
      .withColumn("first_date", first_value(col("o_orderdate")).over(wAll))
      .withColumn("last_date", last_value(col("o_orderdate")).over(wAll))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("first_price"),
        col("last_price"),
        datediff(col("last_date"), col("first_date")).cast("long").as("span_days")
      )
  }

  private val qFirstLastSql =
    """SELECT o_custkey,
      |  arg_min(o_totalprice, epoch_ms(o_orderdate) * 1000000 + o_orderkey) AS first_price,
      |  arg_max(o_totalprice, epoch_ms(o_orderdate) * 1000000 + o_orderkey) AS last_price,
      |  datediff('day', min(o_orderdate), max(o_orderdate)) AS span_days
      |FROM orders GROUP BY o_custkey""".stripMargin

  /** GROUPING SETS with grouping_id — the explicit-sets surface (rollup and
    * cube are covered elsewhere); g identifies which set produced each row.
    */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
        col("r_name"),
        col("n_name")
      )
      .agg(count(lit(1)).as("n_cust"), grouping_id().as("g"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_cust"),
        col("g")
      )

  private val qGroupingSetsSql =
    """SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name,
      |  count(*) AS n_cust, CAST(GROUPING(r_name, n_name) AS BIGINT) AS g
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())""".stripMargin

  // ------------------------------------------------- array / vector surface

  /** Higher-order array functions over embeddings: size, filter-count,
    * full and head-slice energy (sequential-fold dot products — the proven
    * list_dot_product parity).
    */
  private def qArrayOps(s: SparkSession, dir: String): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    embeddings(s, dir).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dims"),
      size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
      round(operators.Similarity.dot(v, v), 6).as("energy"),
      round(operators.Similarity.dot(slice(v, 1, 16), slice(v, 1, 16)), 6).as("head_energy")
    )
  }

  private val qArrayOpsSql =
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dims,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
      |  round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6) AS energy,
      |  round(list_dot_product((embedding::DOUBLE[])[1:16], (embedding::DOUBLE[])[1:16]), 6) AS head_energy
      |FROM embeddings""".stripMargin

  // ----------------------------------------------------------- text surface

  /** TF-IDF top term per document: tf × ln(N/df), ties to the
    * lexicographically smallest term. tf and df are exact integers and ln
    * runs on identical doubles in both engines, so the ranking (and the
    * rounded score) reproduce bit-for-bit.
    */
  private def qTfidfTop(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n  = docs.agg(count(lit(1)).as("n_docs"))
    val w  = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(broadcast(df), "term")
      .join(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"), round(col("tfidf"), 6).as("tfidf"))
  }

  private val qTfidfTopSql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf * ln(n_docs::DOUBLE / df) AS tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tf * ln(n_docs::DOUBLE / df) DESC, term ASC) AS rn
       |  FROM tf JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, term AS top_term, round(tfidf, 6) AS tfidf
       |FROM scored WHERE rn = 1""".stripMargin

  /** Global token frequency top-k — the corpus vocabulary profile.
    *
    * The rank comes from the distributed Ranking operator over the 20
    * post-limit rows (negated count → ascending order), not a
    * partition-less window: a constant `partitionBy` literal gets folded
    * away by Catalyst and still plans the global WindowExec, so this was
    * the last source of `No Partition Defined` warnings in the bench
    * tail — now any such warning flags a genuinely-global window.
    */
  private def qWordTopK(s: SparkSession, dir: String): DataFrame = {
    val top = documents(s, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("term").asc)
      .limit(20)
      .withColumn("__neg", negate(col("n_occurrences")))
      // 20 rows, but the lineage above them is the full corpus tokenize +
      // agg; Ranking's quantile/count passes plus the final job would
      // recompute it ~3x — checkpoint truncates that to a 20-row replay
      .localCheckpoint()
    operators.Ranking
      .withGlobalRank(top, "__neg", "term", "rank")
      .select(col("term"), col("n_occurrences"), col("rank"))
  }

  private val qWordTopKSql =
    s"""SELECT term, n_occurrences,
       |  CAST(row_number() OVER (ORDER BY n_occurrences DESC, term ASC) AS BIGINT) AS rank
       |FROM (
       |  SELECT term, count(*) AS n_occurrences
       |  FROM (SELECT unnest(string_split($normSql, ' ')) AS term FROM documents)
       |  GROUP BY 1)
       |ORDER BY n_occurrences DESC, term ASC LIMIT 20""".stripMargin

  // --------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q8_market_share"    -> (q8 _),
    "q12_ship_lag"       -> (q12 _),
    "q15_top_supplier"   -> (q15 _),
    "q16_supplier_cnt"   -> (q16 _),
    "q17_small_qty"      -> (q17 _),
    "q20_red_parts"      -> (q20 _),
    "q21_waiting_supp"   -> (q21 _),
    "q_lead_lag"         -> (qLeadLag _),
    "q_ntile_deciles"    -> (qNtileDeciles _),
    "q_running_total"    -> (qRunningTotal _),
    "q_first_last"       -> (qFirstLast _),
    "q_grouping_sets"    -> (qGroupingSets _),
    "q_array_ops"        -> (qArrayOps _),
    "text_tfidf_top"     -> (qTfidfTop _),
    "text_word_topk"     -> (qWordTopK _)
  )

  def oracleSql: Map[String, String] = Map(
    "q8_market_share"    -> q8Sql,
    "q12_ship_lag"       -> q12Sql,
    "q15_top_supplier"   -> q15Sql,
    "q16_supplier_cnt"   -> q16Sql,
    "q17_small_qty"      -> q17Sql,
    "q20_red_parts"      -> q20Sql,
    "q21_waiting_supp"   -> q21Sql,
    "q_lead_lag"         -> qLeadLagSql,
    "q_ntile_deciles"    -> qNtileDecilesSql,
    "q_running_total"    -> qRunningTotalSql,
    "q_first_last"       -> qFirstLastSql,
    "q_grouping_sets"    -> qGroupingSetsSql,
    "q_array_ops"        -> qArrayOpsSql,
    "text_tfidf_top"     -> qTfidfTopSql,
    "text_word_topk"     -> qWordTopKSql
  )
}
