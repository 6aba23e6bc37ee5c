package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables._

/** Round-7 additions, batch 2: the watermarked stream-stream interval join
  * (B47) — the one Structured Streaming join shape the surface was still
  * missing — and staged-markup main-content extraction (B48), the
  * WET-style HTML→text step that precedes every text-quality operator in a
  * web-scale corpus build.
  */
object QueriesExt14 {

  // ------------------------------ stream-stream interval join (B47)

  /** View→purchase attribution as a REAL watermarked stream-stream inner
    * join: every `view` a user made in the 6 hours before each of their
    * `purchase`s, computed by joining two independent event streams on
    * user plus a time-interval predicate. This is the Kafka-Streams
    * KStream-KStream windowed-join shape (the reference's framework
    * supports it even though its topology never uses one), re-expressed as
    * Structured Streaming's interval join.
    *
    * Both sides carry watermarks sized to the join bound: the purchase
    * side tolerates 1 hour of lateness, and the view side must be retained
    * 6 hours longer than that (7 hours total) because a purchase may still
    * match a view up to 6 hours old — the watermark asymmetry IS the state
    * eviction contract. Spark derives per-side state watermarks from the
    * interval condition, so view state is dropped exactly when no future
    * purchase can reach it: O(users × 7h of events) state, independent of
    * stream length. Inner join emits each match exactly once regardless of
    * micro-batch boundaries, so the AvailableNow drain is deterministic
    * and the oracle can restate the semantics as a batch self-join.
    */
  private def eventsStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val srcDir = graft.streaming.WorkDirs.fresh(s, "ssjoin-src")
    val outDir = graft.streaming.WorkDirs.fresh(s, "ssjoin-out")
    val ckpt   = graft.streaming.WorkDirs.fresh(s, "ssjoin-ckpt")
    events(s, dir).write.mode("overwrite").parquet(srcDir)

    val schema = s.read.parquet(srcDir).schema
    def stream = s.readStream.schema(schema).parquet(srcDir)

    val views = stream
      .filter(col("event_type") === "view")
      .select(
        col("event_id").as("view_id"),
        col("user_id").as("v_user"),
        col("ts").as("view_ts")
      )
      .withWatermark("view_ts", "7 hours")
    val purchases = stream
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id").as("p_user"),
        col("ts").as("purchase_ts")
      )
      .withWatermark("purchase_ts", "1 hour")

    val joined = views.join(
      purchases,
      expr(
        """v_user = p_user
          |AND view_ts >= purchase_ts - INTERVAL 6 HOURS
          |AND view_ts <= purchase_ts""".stripMargin
      )
    )

    val q = joined.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    s.read
      .parquet(outDir)
      .select(
        col("purchase_id"),
        col("view_id"),
        col("p_user").as("user_id"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("view_ts"))).as("gap_ms")
      )
  }

  private val eventsStreamJoinSql =
    """WITH v AS (SELECT event_id AS view_id, user_id, ts AS vts
      |  FROM events WHERE event_type = 'view'),
      |p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT purchase_id, view_id, p.user_id AS user_id,
      |  epoch_ms(pts) - epoch_ms(vts) AS gap_ms
      |FROM p JOIN v ON p.user_id = v.user_id
      |  AND v.vts >= p.pts - INTERVAL 6 HOUR AND v.vts <= p.pts""".stripMargin

  // ------------------------------ markup main-content extraction (B48)

  /** WET-style main-content extraction: strip markup down to the text a
    * training pipeline would keep. The corpus fixture is plain text, so
    * the markup is STAGED deterministically first — each document is
    * wrapped in a single-line HTML shell (head/title, style and script
    * blocks, a nav bar, the body split into two paragraphs, a footer with
    * an HTML entity) — and then extracted: script/style/nav/footer
    * subtrees dropped wholesale, remaining tags stripped, the five
    * standard entities plus `&copy;` decoded, whitespace collapsed. Both
    * engines replay the wrap AND the strip, so parity proves the
    * extraction pipeline, not the fixture.
    *
    * Scale shape: pure codegen string/regex column chain fused into the
    * scan — no UDF, no shuffle, no join; the per-doc output rides the same
    * task that read the row. Patterns are RE2-safe (non-greedy dot, no
    * lookaround/backreference), the same portability contract as the PII
    * scrubber (B18).
    */
  private def textHtmlExtract(s: SparkSession, dir: String): DataFrame = {
    val half = (length(col("text")) / 2).cast("int")
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit(" - "), col("source"),
      lit("</title><style>body{margin:0} p{font-size:14px}</style></head>"),
      lit("<body><nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a>"),
      lit(" | <a href=\"/contact\">Contact</a></nav><h1>Doc "),
      col("doc_id").cast("string"),
      lit("</h1><p>"), substring(col("text"), lit(1), half),
      lit("</p><p>"), substring(col("text"), half + 1, length(col("text"))),
      lit("</p><script>var tracked = 1 &amp;&amp; 2;</script>"),
      lit("<footer>&copy; 2024 Example &amp; Co.</footer></body></html>")
    )
    val noBlocks = regexp_replace(
      html,
      "<(script|style|nav|footer)[^>]*>.*?</(script|style|nav|footer)>",
      " "
    )
    val title   = regexp_extract(html, "<title>(.*?)</title>", 1)
    val nLinks  = size(regexp_extract_all(html, lit("<a href"), lit(0)))
    val noTags  = regexp_replace(noBlocks, "<[^>]+>", " ")
    // `&amp;` decodes LAST: decoding it first would turn a literal
    // "&amp;copy;" into "&copy;" and then double-decode it.
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&lt;", "<"),
              "&gt;", ">"
            ),
            "&quot;", "\""
          ),
          "&#39;", "'"
        ),
        "&copy;", "(c)"
      ),
      "&amp;", "&"
    )
    val content = trim(regexp_replace(decoded, "\\s+", " "))
    documents(s, dir).select(
      col("doc_id"),
      title.as("title"),
      nLinks.cast("long").as("n_links"),
      content.as("content"),
      length(content).cast("long").as("content_len")
    )
  }

  private val textHtmlExtractSql =
    """WITH staged AS (SELECT doc_id,
      |  '<html><head><title>Doc ' || doc_id || ' - ' || source ||
      |  '</title><style>body{margin:0} p{font-size:14px}</style></head>' ||
      |  '<body><nav><a href="/">Home</a> | <a href="/about">About</a>' ||
      |  ' | <a href="/contact">Contact</a></nav><h1>Doc ' || doc_id ||
      |  '</h1><p>' || substr(text, 1, CAST(length(text) // 2 AS INT)) ||
      |  '</p><p>' || substr(text, CAST(length(text) // 2 AS INT) + 1) ||
      |  '</p><script>var tracked = 1 &amp;&amp; 2;</script>' ||
      |  '<footer>&copy; 2024 Example &amp; Co.</footer></body></html>' AS html
      |  FROM documents),
      |stripped AS (SELECT doc_id,
      |  regexp_extract(html, '<title>(.*?)</title>', 1) AS title,
      |  CAST(len(regexp_extract_all(html, '<a href')) AS BIGINT) AS n_links,
      |  regexp_replace(regexp_replace(html,
      |    '<(script|style|nav|footer)[^>]*>.*?</(script|style|nav|footer)>',
      |    ' ', 'g'), '<[^>]+>', ' ', 'g') AS notags
      |  FROM staged),
      |decoded AS (SELECT doc_id, title, n_links,
      |  trim(regexp_replace(
      |    replace(replace(replace(replace(replace(replace(notags,
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |      '&copy;', '(c)'), '&amp;', '&'),
      |    '\s+', ' ', 'g')) AS content
      |  FROM stripped)
      |SELECT doc_id, title, n_links, content,
      |  CAST(length(content) AS BIGINT) AS content_len
      |FROM decoded""".stripMargin

  // ------------------------------------------------------------ registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_stream_join" -> (eventsStreamJoin _),
    "text_html_extract"  -> (textHtmlExtract _)
  )

  def oracleSql: Map[String, String] = Map(
    "events_stream_join" -> eventsStreamJoinSql,
    "text_html_extract"  -> textHtmlExtractSql
  )
}
