package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Text-analysis operators for an LLM training-data pipeline: tokenization,
  * quality scoring, language ID, fingerprinting (SURVEY.md §2 B5).
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions` —
  * no UDFs — so the whole stage fuses into one pass over the text column
  * and scales linearly with input splits (no shuffle except the final
  * aggregations callers add).
  */
object TextAnalysis {

  /** Whitespace-normalized lowercase text. */
  def normalize(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column =
    split(normalize(c), " ")


  /** Word k-gram shingles (joined with a single space); short docs fall back
    * to the whole normalized text (= all tokens re-joined). Implemented as
    * a native expression (functions.WordKGrams) — the composable
    * transform/slice/array_join form costs an interpreted lambda per
    * shingle and dominated the dedup pipeline.
    */
  def wordShingles(c: Column, k: Int): Column =
    graft.functions.VectorExpressions.wordKGrams(tokens(c), k)

  /** Per-document token/char statistics appended as columns:
    * n_tokens, n_chars_norm, avg_token_len, n_distinct_tokens.
    */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_chars_norm", length(normalize(col(textCol))).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)).cast("long"))
      .withColumn(
        "avg_token_len",
        round(
          (length(normalize(col(textCol))) - (size(toks) - 1)).cast("double") / size(toks),
          6
        )
      )
  }

  /** Heuristic quality signals (length, punctuation density, stopword ratio,
    * uppercase ratio) plus a composite 0..1 score. All ratios are exact
    * integer-count divisions so an independent SQL oracle reproduces them
    * bit-for-bit (after round()).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t       = col(textCol)
    val norm    = normalize(t)
    val toks    = tokens(t)
    val nPunct  = length(t) - length(regexp_replace(t, "[\\.,;:!\\?]", ""))
    val nUpper  = length(t) - length(regexp_replace(t, "[A-Z]", ""))
    val nStop   = size(filter(toks, tk => tk.isInCollection(Stopwords)))
    df.withColumn("punct_ratio", round(nPunct.cast("double") / greatest(length(t), lit(1)), 6))
      .withColumn("upper_ratio", round(nUpper.cast("double") / greatest(length(t), lit(1)), 6))
      .withColumn("stopword_ratio", round(nStop.cast("double") / greatest(size(toks), lit(1)), 6))
      .withColumn("len_score", when(length(norm).between(100, 5000), lit(1.0)).otherwise(lit(0.0)))
      .withColumn(
        "quality_score",
        round(
          (col("len_score") + least(col("stopword_ratio") * 4, lit(1.0)) +
            (lit(1.0) - least(col("punct_ratio") * 10, lit(1.0)))) / 3.0,
          6
        )
      )
  }

  /** N-gram-frequency language ID heuristic: votes by language-marker tokens,
    * ties broken by fixed language order. Deterministic and oracle-checkable;
    * marker lists are tiny and act like a compiled-in model.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "fr" -> Seq("le", "et", "les", "est"),
    "es" -> Seq("el", "y", "los", "es"),
    "zh" -> Seq("的", "是", "了", "在")
  )

  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val toks  = tokens(col(textCol))
    val langs = LangMarkers.map(_._1)
    val withVotes = LangMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"votes_$lang", size(filter(toks, tk => tk.isInCollection(markers))))
    }
    // First-match-wins CASE chain: lang L wins if its votes are >= every
    // later language's votes (earlier languages already failed their guard).
    // Mirrors a plain SQL CASE so an oracle reproduces ties identically.
    val best = langs.zipWithIndex.init.foldRight(lit(langs.last)) { case ((lang, i), acc) =>
      val laterMax = langs.drop(i + 1).map(l => col(s"votes_$l")).reduceLeft(greatest(_, _))
      when(col(s"votes_$lang") >= laterMax, lit(lang)).otherwise(acc)
    }
    withVotes
      .withColumn("lang_pred", best)
      .drop(langs.map(l => s"votes_$l"): _*)
  }

  /** Canonicalize a URL for dedup: lowercase the scheme+host, strip a
    * leading `www.`, drop the fragment, and remove tracking query params
    * (`utm_*`, `ref`) while preserving the rest of the query string in
    * order. Pure string/regex column arithmetic — codegen-friendly, and
    * replayable by any engine with the same regex semantics.
    */
  def canonicalizeUrl(u: Column): Column = {
    val base   = regexp_extract(u, "^([^?#]*)", 1)
    val qs     = regexp_extract(u, "\\?([^#]*)", 1)
    val kept   = filter(split(qs, "&"), p => !p.rlike("^(utm_[a-z]+|ref)=") && p =!= lit(""))
    val canonQ = array_join(kept, "&")
    val prefix = regexp_replace(
      lower(regexp_extract(base, "^(https?://[^/]+)", 1)),
      "://www\\.",
      "://"
    )
    val path = regexp_replace(base, "^https?://[^/]+", "")
    concat(prefix, path, when(canonQ =!= "", concat(lit("?"), canonQ)).otherwise(lit("")))
  }

  /** 60-bit content fingerprint of the normalized text (md5-based — see
    * Hashing). Two docs with equal normalized text share a fingerprint.
    */
  def fingerprint(c: Column): Column = Hashing.h60(normalize(c))

  // ------------------------------------------------------------ PII scrub

  /** PII patterns a training-data pipeline redacts before any shard ships.
    * Deliberately restricted to syntax both Java regex and RE2 support
    * (no lookaround, no backreferences) so the same pattern string drives
    * the engine and any RE2-based auditor bit-identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?\\d{3}-\\d{4}-\\d{2,4}"
  val Ipv4Pattern  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Count matches of `pattern` in `c` — codegen regexp, no UDF. */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Redact every occurrence of the three PII shapes, innermost first so a
    * phone inside an email-like token cannot resurface after the outer
    * replacement. Pure regexp_replace chain: scan-fused, linear, and the
    * replacement tokens are greppable in downstream audits.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "[EMAIL]"),
        PhonePattern,
        "[PHONE]"
      ),
      Ipv4Pattern,
      "[IP]"
    )

  // -------------------------------------------------- boilerplate removal

  /** C4-style boilerplate scoring: a word k-gram occurring in at least
    * `minDocFreq` DISTINCT documents is boilerplate (navigation chrome,
    * licence footers, templated text); each document is scored by the
    * fraction of its distinct k-grams that are boilerplate.
    *
    * Scale shape: one explode of per-doc DISTINCT shingles (no dup
    * inflation), one hash-agg for document frequency, one shuffle join
    * back on the shingle key, one final per-doc agg — all partitioned by
    * hash keys, nothing all-pairs, nothing collected. The doc-frequency
    * table is NOT broadcast: at 100 TB the distinct-shingle table is
    * itself huge, so the join must shuffle both sides on the shingle key.
    *
    * Returns (doc_id, n_shingles, n_boiler, boiler_frac).
    */
  def boilerplateScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int,
      minDocFreq: Long
  ): DataFrame = {
    val ex = docs
      .select(col(idCol).as("doc_id"), array_distinct(wordShingles(col(textCol), shingleWords)).as("sset"))
      .select(col("doc_id"), explode(col("sset")).as("shingle"))
    val boiler = ex
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("shingle"), lit(1L).as("is_boiler"))
    ex.join(boiler, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(col("is_boiler")).as("n_boiler")
      )
      .select(
        col("doc_id"),
        col("n_shingles"),
        col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_shingles"), 6).as("boiler_frac")
      )
  }
}
