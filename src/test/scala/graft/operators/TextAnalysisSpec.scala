package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSpecBase

class TextAnalysisSpec extends GraftSpecBase {
  import spark.implicits._

  test("normalize collapses whitespace and lowercases") {
    val out = Seq("  Hello   WORLD  ").toDF("t")
      .select(TextAnalysis.normalize(col("t"))).as[String].head()
    assert(out === "hello world")
  }

  test("token stats") {
    val df = TextAnalysis.withTokenStats(Seq((1L, "a bb ccc a")).toDF("doc_id", "text"), "text")
    val r = df.select("n_tokens", "n_chars_norm", "n_distinct_tokens").as[(Long, Long, Long)].head()
    assert(r === ((4L, 10L, 3L)))
  }

  test("language id votes with deterministic tie-break") {
    val df = Seq(
      (1L, "the cat is on the mat"),         // en markers
      (2L, "der hund ist gross und laut"),   // de markers
      (3L, "xyz qqq zzz")                    // no markers anywhere -> first lang wins
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(df, "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "en")
  }

  test("fingerprint equal iff normalized text equal") {
    val fps = Seq("A  b", "a b", "a c").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("confluent wire round-trip and malformed frames") {
    import graft.sources.ConfluentWire
    val df = Seq(Array[Byte](10, 20, 30)).toDF("body")
      .withColumn("framed", ConfluentWire.frame(col("body"), schemaId = 42))
    val r = df.select(
      ConfluentWire.payload(col("framed")).as("p"),
      ConfluentWire.schemaId(col("framed")).as("sid"),
      ConfluentWire.isWellFormed(col("body")).as("raw_ok")
    ).head()
    assert(r.getAs[Array[Byte]]("p").toSeq === Seq[Byte](10, 20, 30))
    assert(r.getAs[Int]("sid") === 42)
    assert(!r.getAs[Boolean]("raw_ok"))   // bare body: wrong magic
  }

  test("custom expressions are callable from SQL via GraftExtensions") {
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head().getDouble(0) === 11.0)
    val grams = spark.sql("SELECT graft_word_kgrams(array('a','b','c','d'), 3) AS g")
      .head().getSeq[String](0)
    assert(grams === Seq("a b c", "b c d"))
    val sig = spark.sql("SELECT graft_minhash_sig(array(1L, 2L, 3L)) AS s").head().getSeq[Long](0)
    assert(sig.length === 16 && sig.forall(_ >= 0))
  }

  test("multimodal decode stub emits deterministic features partition-parallel") {
    val docs = graft.Tables.documents(spark, sf())
    val feats = Multimodal.decode(Multimodal.fromDocuments(spark, docs.limit(10)))
    val rows = feats.collect()
    assert(rows.length === 10)
    assert(rows.forall(f => f.n_bytes > 0 && f.checksum > 0 && f.width >= 16))
  }
}
