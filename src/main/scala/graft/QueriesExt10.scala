package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Hashing
import graft.operators.{Similarity, TextAnalysis}

/** Tenth query batch — four more training-data curation operators
  * (SURVEY.md §2 B3/B4/B5/B16 extensions):
  *
  *  - PII redaction: count + scrub emails/phones/IPs with regex syntax
  *    both Java regex and RE2 accept, so engine and auditor agree
  *    byte-for-byte (the corpus has no organic PII, so the query stages
  *    deterministic PII from doc_id first — the operator is generic);
  *  - C4-style boilerplate scoring: fraction of a document's distinct
  *    word 3-grams occurring in >= 5 documents;
  *  - per-domain quota sampling: keep the 15 md5-first documents of each
  *    source via the bounded-heap top-k aggregate (k·groups rows cross
  *    the shuffle — no per-group full sort, skew-immune);
  *  - random-hyperplane LSH (Charikar sign sketches): banded candidate
  *    generation over embeddings + exact cosine verification.
  *
  * Same parity rules as SparkEntry (round 6 ratios, BIGINT counts, md5
  * hash ordering, 'g' flag on DuckDB regexp_replace to match Spark's
  * replace-all default).
  */
object QueriesExt10 {

  // ------------------------------------------------------------ PII scrub

  /** Deterministic PII staged from doc_id, appended to the text. */
  private def stagedPii(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" tel +555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit("-99"),
        lit(" host 10."), (col("doc_id") % 256).cast("string"), lit(".0.1")
      ).as("staged")
    )

  private def textPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val scrubbed = TextAnalysis.scrubPii(col("staged"))
    stagedPii(documents(s, dir)).select(
      col("doc_id"),
      TextAnalysis.piiCount(col("staged"), TextAnalysis.EmailPattern).as("n_emails"),
      TextAnalysis.piiCount(col("staged"), TextAnalysis.PhonePattern).as("n_phones"),
      TextAnalysis.piiCount(col("staged"), TextAnalysis.Ipv4Pattern).as("n_ips"),
      length(scrubbed).cast("long").as("scrub_len"),
      md5(scrubbed).as("scrub_hash")
    )
  }

  private val textPiiScrubSql = {
    // DuckDB single-quoted strings keep backslashes literal, so the Java
    // pattern strings embed unchanged (they contain no single quotes)
    val email = TextAnalysis.EmailPattern
    val phone = TextAnalysis.PhonePattern
    val ip    = TextAnalysis.Ipv4Pattern
    s"""WITH staged AS (SELECT doc_id,
       |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |       || ' tel +555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-99'
       |       || ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS staged
       |  FROM documents),
       |s2 AS (SELECT doc_id, staged,
       |  regexp_replace(regexp_replace(regexp_replace(staged,
       |    '$email', '[EMAIL]', 'g'),
       |    '$phone', '[PHONE]', 'g'),
       |    '$ip', '[IP]', 'g') AS scrubbed
       |  FROM staged)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(staged, '$email')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(staged, '$phone')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(staged, '$ip')) AS BIGINT) AS n_ips,
       |  CAST(length(scrubbed) AS BIGINT) AS scrub_len,
       |  md5(scrubbed) AS scrub_hash
       |FROM s2""".stripMargin
  }

  // -------------------------------------------------- boilerplate scoring

  private def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.boilerplateScore(documents(s, dir), "doc_id", "text", shingleWords = 3, minDocFreq = 5)

  private val normSql = "regexp_replace(lower(trim(text)),'\\s+',' ','g')"

  /** Same k-word shingle comprehension as the codegen WordKGrams fallback
    * contract (QueriesExt9 / parity rules).
    */
  private def shinglesSql(k: Int) =
    s"CASE WHEN len(toks)>=$k THEN [array_to_string(toks[i:i+${k - 1}],' ') for i in range(1,len(toks)-${k - 2})] ELSE [norm] END"

  private val textBoilerplateSql =
    s"""WITH t AS (SELECT doc_id, $normSql AS norm, string_split($normSql,' ') AS toks FROM documents),
       |sh AS (SELECT doc_id, list_distinct(${shinglesSql(3)}) AS sset FROM t),
       |ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
       |bl AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM ex GROUP BY 1) WHERE df >= 5),
       |m AS (SELECT e.doc_id, count(*) AS n_shingles, count(bl.shingle) AS n_boiler
       |      FROM ex e LEFT JOIN bl ON e.shingle = bl.shingle GROUP BY 1)
       |SELECT doc_id, n_shingles, n_boiler,
       |  round(n_boiler::DOUBLE / n_shingles, 6) AS boiler_frac
       |FROM m""".stripMargin

  // --------------------------------------------------- per-domain quotas

  /** Quota sampling: at most 15 documents per source, picked by md5 hash
    * order (reproducible across engines/runs). Uses the bounded-heap
    * TopKBy aggregate, so only k rows per source survive the partial
    * aggregation — a skewed mega-domain never materializes a full
    * per-group sort the way a row_number window would.
    */
  private def qDomainQuota(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(
        col("source"),
        col("doc_id"),
        // TopKBy ranks by score DESC; negate the 32-bit hash (exact in a
        // double) to get hash-ascending picks with id-asc tie-break
        negate(Hashing.h32(col("doc_id").cast("string")).cast("double")).as("neg_hash")
      )
      .groupBy(col("source"))
      .agg(graft.functions.TopKBy.topKByLong(col("neg_hash"), col("doc_id"), 15).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(
        col("source"),
        (col("pos") + 1).cast("long").as("pick_rank"),
        col("col.id").as("doc_id")
      )

  private val qDomainQuotaSql =
    """WITH h AS (SELECT source, doc_id,
      |    CAST('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS BIGINT) AS hv
      |  FROM documents)
      |SELECT source, CAST(rn AS BIGINT) AS pick_rank, doc_id FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
      |  FROM h)
      |WHERE rn <= 15""".stripMargin

  // ------------------------------------------- random-hyperplane LSH (B4)

  private def simRpLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.randomHyperplanePairs(embeddings(s, dir), "vec_id", "embedding", tau = 0.3)

  private val simRpLshSql = {
    val planes = Similarity.signPlanes(16, 64)
    def arr(row: Array[Double]) =
      row.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
    val buckets = (0 until 2).map { bd =>
      (0 until 8).map { b =>
        s"(CASE WHEN list_dot_product(e, ${arr(planes(bd * 8 + b))}::DOUBLE[]) > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
    }
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |b AS (SELECT vec_id, e, ${buckets.zipWithIndex.map { case (ex, i) => s"($ex) AS b$i" }.mkString(", ")} FROM v),
       |x AS (SELECT vec_id, unnest([b0, b1]) AS bucket, unnest([0, 1]) AS band FROM b),
       |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |         FROM x JOIN x AS y ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT c.id_a, c.id_b, round(list_cosine_similarity(a.e, z.e), 6) AS cosine
       |  FROM cand c JOIN v a ON c.id_a = a.vec_id JOIN v z ON c.id_b = z.vec_id)
       |WHERE cosine >= 0.3""".stripMargin
  }

  // ---------------------------------------------------------- registration

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_scrub"   -> (textPiiScrub _),
    "text_boilerplate" -> (textBoilerplate _),
    "q_domain_quota"   -> (qDomainQuota _),
    "sim_rp_lsh"       -> (simRpLsh _)
  )

  def oracleSql: Map[String, String] = Map(
    "text_pii_scrub"   -> textPiiScrubSql,
    "text_boilerplate" -> textBoilerplateSql,
    "q_domain_quota"   -> qDomainQuotaSql,
    "sim_rp_lsh"       -> simRpLshSql
  )
}
