package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Hashing
import graft.operators.TextAnalysis

/** Ninth query batch — training-data curation operators a large-scale LLM
  * pipeline runs on every corpus refresh:
  *
  *  - eval-set decontamination: n-gram overlap of every corpus document
  *    against a benchmark document set (the contamination check run before
  *    any training shard ships);
  *  - repetition-based quality signals (Gopher/RefinedWeb-style duplicate
  *    word/bigram and top-word fractions);
  *  - per-source stratified deterministic sampling (different keep-rates
  *    per provenance bucket, reproducible across engines and runs).
  *
  * Same parity rules as SparkEntry (round-6 ratios, BIGINT counts, md5
  * hash buckets).
  */
object QueriesExt9 {

  private val normSql = "regexp_replace(lower(trim(text)),'\\s+',' ','g')"

  /** k-word shingle list comprehension with the short-doc fallback used by
    * the codegen'd WordKGrams expression ([norm] when fewer than k words).
    */
  private def shinglesSql(k: Int) =
    s"CASE WHEN len(toks)>=$k THEN [array_to_string(toks[i:i+${k - 1}],' ') for i in range(1,len(toks)-${k - 2})] ELSE [norm] END"

  // ------------------------------------------------- eval decontamination

  /** 5-word-shingle overlap of every document against the eval set
    * (doc_id < 10 stands in for the benchmark corpus). Scale shape: the
    * eval shingle set is tiny and broadcast; the corpus side explodes its
    * DISTINCT shingles once and hash-aggregates per document — no
    * all-pairs document comparison anywhere. Flagging threshold on the
    * rounded fraction so both engines compare identical doubles.
    */
  private def textDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val sh = documents(s, dir).select(
      col("doc_id"),
      explode(array_distinct(TextAnalysis.wordShingles(col("text"), 5))).as("shingle")
    )
    val evalSet = sh.filter(col("doc_id") < 10).select(col("shingle")).distinct()
      .withColumn("hit", lit(1L))
    sh.join(broadcast(evalSet), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_matched")
      )
      .withColumn(
        "overlap_frac",
        round(col("n_matched").cast("double") / col("n_shingles"), 6)
      )
      .select(
        col("doc_id"), col("n_shingles"), col("n_matched"), col("overlap_frac"),
        (col("overlap_frac") >= 0.2).as("contaminated")
      )
  }

  private val textDecontaminateSql =
    s"""WITH t AS (SELECT doc_id, $normSql AS norm, string_split($normSql,' ') AS toks FROM documents),
       |sh AS (SELECT doc_id, list_distinct(${shinglesSql(5)}) AS sset FROM t),
       |ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
       |ev AS (SELECT DISTINCT shingle FROM ex WHERE doc_id < 10),
       |m AS (SELECT e.doc_id, count(*) AS n_shingles, count(ev.shingle) AS n_matched
       |      FROM ex e LEFT JOIN ev ON e.shingle = ev.shingle GROUP BY 1)
       |SELECT doc_id, n_shingles, n_matched,
       |  round(n_matched::DOUBLE / n_shingles, 6) AS overlap_frac,
       |  round(n_matched::DOUBLE / n_shingles, 6) >= 0.2 AS contaminated
       |FROM m""".stripMargin

  // --------------------------------------------- repetition quality signals

  /** Duplicate-content fractions per document: duplicate word fraction,
    * most-frequent-word fraction, duplicate bigram fraction — the
    * Gopher-style repetition filters. Array-local metrics stay row-local
    * (no shuffle); only the top-word count needs an explode + two-level
    * hash aggregation.
    */
  private def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val toks = TextAnalysis.tokens(col("text"))
    val bg   = TextAnalysis.wordShingles(col("text"), 2)
    val base = docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_words"),
      size(array_distinct(toks)).cast("long").as("d_words"),
      size(bg).cast("long").as("n_bigrams"),
      size(array_distinct(bg)).cast("long").as("d_bigrams")
    )
    val top = docs
      .select(col("doc_id"), explode(toks).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
    base.join(top, "doc_id")
      .select(
        col("doc_id"),
        col("n_words"),
        round(lit(1.0) - col("d_words").cast("double") / col("n_words"), 6).as("dup_word_frac"),
        round(col("top_cnt").cast("double") / col("n_words"), 6).as("top_word_frac"),
        round(lit(1.0) - col("d_bigrams").cast("double") / col("n_bigrams"), 6).as("dup_bigram_frac")
      )
  }

  private val textRepetitionSql =
    s"""WITH t AS (SELECT doc_id, $normSql AS norm, string_split($normSql,' ') AS toks FROM documents),
       |b AS (SELECT doc_id, toks, ${shinglesSql(2)} AS bg FROM t),
       |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
       |  len(list_distinct(toks)) AS d_words, len(bg) AS n_bigrams,
       |  len(list_distinct(bg)) AS d_bigrams FROM b),
       |w AS (SELECT doc_id, unnest(toks) AS w FROM t),
       |wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
       |top AS (SELECT doc_id, max(c) AS top_cnt FROM wc GROUP BY 1)
       |SELECT doc_id, n_words,
       |  round(1.0 - d_words::DOUBLE / n_words, 6) AS dup_word_frac,
       |  round(top_cnt::DOUBLE / n_words, 6) AS top_word_frac,
       |  round(1.0 - d_bigrams::DOUBLE / n_bigrams, 6) AS dup_bigram_frac
       |FROM base JOIN top USING (doc_id)""".stripMargin

  // ------------------------------------------------- stratified sampling

  /** Per-source stratified deterministic sampling (B16 generalized):
    * provenance buckets keep different rates (50% / 25% / 10%), membership
    * decided by an md5 hash bucket of the key — scan-fused, reproducible
    * across engines, partitions and reruns, and any source's sample is a
    * superset of the same source's sample at a lower rate.
    */
  private def qStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 50L)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 25L)
      .otherwise(10L)
    documents(s, dir)
      .withColumn("bucket", Hashing.h32(col("doc_id").cast("string")) % 100)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("source"), col("bucket"))
  }

  private val qStratifiedSampleSql =
    """SELECT doc_id, source,
      |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
      |FROM documents
      |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 <
      |  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 50
      |       WHEN source IN ('src5','src6','src7','src8','src9') THEN 25
      |       ELSE 10 END""".stripMargin

  // ------------------------------------------------- heap-aggregate top-k

  /** Per-group top-k via the custom bounded-heap AGGREGATE (TopKByLong):
    * only k rows per group cross the shuffle (map-side partial heaps),
    * versus the window form's full shuffle+sort of every row. The oracle
    * runs the window form — both must produce identical ranked rows.
    */
  private def qTopkPerGroup(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(graft.functions.TopKBy.topKByLong(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")))
      .select(
        col("c_mktsegment"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("o_totalprice"),
        col("col.id").as("o_orderkey")
      )

  private val qTopkPerGroupSql =
    """SELECT c_mktsegment, CAST(rn AS BIGINT) AS rank, o_totalprice, o_orderkey
      |FROM (SELECT c_mktsegment, o_totalprice, o_orderkey,
      |        row_number() OVER (PARTITION BY c_mktsegment
      |                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |      FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------- incremental dedup

  /** Incremental MinHash dedup: the top-fifth id range is the "daily
    * increment" matched against the standing corpus (the lower four
    * fifths) — fresh-vs-corpus and fresh-vs-fresh pairs only,
    * corpus-vs-corpus never recomputed. The proportional split keeps the
    * increment at 20% of the corpus at every scale factor (the realistic
    * refresh shape). The oracle recomputes the FULL pair set and keeps
    * pairs with a fresh member (fresh ids are the high range, so that is
    * exactly id_b >= threshold): the incremental path must land on the
    * identical pairs.
    */
  private def dedupMinhashIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    // the split threshold is ONE bounded driver scalar (a map-side-combined
    // max over a single long column). Keeping it a literal lets the
    // doc_id split predicates push down to both parquet scans; the lazy
    // broadcast-one-row-join alternative lost that pushdown and re-ran the
    // max scan per side (measured +60%: 3.9s -> 6.4s at sf0.1 in round 5)
    val thr = docs.agg(expr("max(doc_id) * 4 div 5").cast("long")).head.getLong(0)
    operators.Dedup.minhashPairsIncremental(
      docs.filter(col("doc_id") < thr),
      docs.filter(col("doc_id") >= thr),
      "doc_id", "text", shingleWords = 3, tau = 0.5
    )
  }

  private val dedupMinhashIncrementalSql =
    s"""SELECT id_a, id_b, jaccard FROM (${QueriesExt.minhashPairsSql})
       |WHERE id_b >= (SELECT max(doc_id) * 4 // 5 FROM documents)""".stripMargin

  // -------------------------------------------------- shards & projection

  /** Length-sorted shard assignment — the "write N roughly-equal shards
    * ordered by document length" packing step before tokenization. The
    * global order comes from the distributed Ranking operator (no
    * single-partition window); shard = rank div shardSize.
    */
  private def qShardAssign(s: SparkSession, dir: String): DataFrame =
    operators.Ranking
      .withGlobalRank(
        documents(s, dir).select(col("doc_id"), col("n_chars")),
        "n_chars", "doc_id", "rn"
      )
      .select(
        col("doc_id"), col("n_chars"), col("rn"),
        floor((col("rn") - 1) / 100).cast("long").as("shard_id")
      )

  private val qShardAssignSql =
    """SELECT doc_id, n_chars, rn, (rn - 1) // 100 AS shard_id
      |FROM (SELECT doc_id, n_chars,
      |        row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rn
      |      FROM documents)""".stripMargin

  /** Sparse random projection (Achlioptas ±1) of the 64-dim embeddings to
    * 8 dims: component j = <v, s_j> with a fixed md5-derived sign matrix.
    * Each output component is one codegen'd sequential-fold dot product
    * against a literal sign vector — scan-fused, no shuffle, no model.
    * The oracle replays the identical fold over the same literal matrix.
    */
  private val projDims  = 8
  private val inDims    = 64
  private val signMatrix: Array[Array[Double]] =
    Array.tabulate(projDims, inDims) { (j, i) =>
      // same recipe as the engine's h32: first 8 md5 hex chars as a long
      val md  = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$j,$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0) 1.0 else -1.0
    }

  private def qEmbedProject(s: SparkSession, dir: String): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val comps = signMatrix.zipWithIndex.map { case (row, j) =>
      round(
        graft.operators.Similarity.dot(v, array(row.map(lit).toIndexedSeq: _*)),
        6
      ).as(s"p$j")
    }
    embeddings(s, dir).select(col("vec_id") +: comps.toIndexedSeq: _*)
  }

  private val qEmbedProjectSql = {
    val comps = signMatrix.zipWithIndex.map { case (row, j) =>
      val arr = row.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"round(list_dot_product(embedding::DOUBLE[], $arr::DOUBLE[]), 6) AS p$j"
    }
    s"SELECT vec_id, ${comps.mkString(", ")} FROM embeddings"
  }

  // ------------------------------------------------------ event analytics

  /** Funnel detection: does the ordered (non-contiguous) subsequence
    * view → click → purchase occur in each user's event stream? One hash
    * aggregation builds the ordered type sequence per user (total order
    * (ms, event_id) makes the string deterministic); the subsequence test
    * is a codegen'd regexp. No self-joins, no window over the raw stream.
    */
  private def eventsFunnel(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ms"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")
          ),
          ","
        ).as("seq")
      )
      .select(
        col("user_id"), col("n_events"),
        col("seq").rlike("view.*click.*purchase").as("has_funnel")
      )

  private val eventsFunnelSql =
    """SELECT user_id, count(*) AS n_events,
      |  regexp_matches(string_agg(event_type, ',' ORDER BY epoch_ms(ts), event_id),
      |                 'view.*click.*purchase') AS has_funnel
      |FROM events GROUP BY user_id""".stripMargin

  /** Cohort retention: users bucketed by first-active day; for each
    * (cohort day, day offset) the distinct users still active — two hash
    * aggregations and one equi-join on user_id, every stage
    * partition-parallel.
    */
  private def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    val d = events(s, dir)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
      .distinct()
    val c = d.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    d.join(c, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  private val eventsRetentionSql =
    """WITH d AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
      |SELECT cohort_day, day - cohort_day AS offset_days, count(DISTINCT d.user_id) AS n_users
      |FROM d JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_decontaminate"  -> (textDecontaminate _),
    "text_repetition"     -> (textRepetition _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "events_funnel"       -> (eventsFunnel _),
    "events_retention"    -> (eventsRetention _),
    "q_shard_assign"      -> (qShardAssign _),
    "q_embed_project"     -> (qEmbedProject _),
    "dedup_minhash_incremental" -> (dedupMinhashIncremental _),
    "q_topk_per_group"    -> (qTopkPerGroup _)
  )

  def oracleSql: Map[String, String] = Map(
    "text_decontaminate"  -> textDecontaminateSql,
    "text_repetition"     -> textRepetitionSql,
    "q_stratified_sample" -> qStratifiedSampleSql,
    "events_funnel"       -> eventsFunnelSql,
    "events_retention"    -> eventsRetentionSql,
    "q_shard_assign"      -> qShardAssignSql,
    "q_embed_project"     -> qEmbedProjectSql,
    "dedup_minhash_incremental" -> dedupMinhashIncrementalSql,
    "q_topk_per_group"    -> qTopkPerGroupSql
  )
}
