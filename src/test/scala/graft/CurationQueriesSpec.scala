package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the QueriesExt11 curation batch. Value-level
  * correctness is the DuckDB oracle's job (scripts/check.py / the driver
  * gate); these assert the structural properties the oracle's hash compare
  * can't articulate — conservation, bounds, ordering.
  */
class CurationQueriesSpec extends GraftSpecBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf())

  test("q_pack_sequences conserves documents and tokens") {
    import spark.implicits._
    val packed = run("q_pack_sequences").cache()
    val docs = Tables.documents(spark, sf())
      .select(size(operators.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n").as("tok"), count(lit(1)).as("docs"))
      .as[(Long, Long)].head()
    val got = packed.agg(sum("bin_tokens"), sum("n_docs")).as[(Long, Long)].head()
    assert(got === docs)
    // bins are numbered contiguously from 0 within each source
    val holes = packed.groupBy("source")
      .agg(min("bin_id").as("lo"), max("bin_id").as("hi"), count(lit(1)).as("n"))
      .where(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(holes.count() === 0)
    packed.unpersist()
  }

  test("text_chunk_overlap emits ceil(len/stride) bounded chunks per doc") {
    import spark.implicits._
    val chunks = run("text_chunk_overlap").cache()
    assert(chunks.where(col("chunk_len") > 200 || col("chunk_len") < 1).count() === 0)
    val perDoc = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val expect = Tables.documents(spark, sf())
      .select(col("doc_id"), (floor((length(col("text")) - 1) / 150) + 1).as("want"))
    val bad = perDoc.join(expect, "doc_id").where(col("n_chunks") =!= col("want"))
    assert(bad.count() === 0)
    chunks.unpersist()
  }

  test("text_bpe_pairs returns 20 pairs in descending count order") {
    import spark.implicits._
    val rows = run("text_bpe_pairs").as[(String, Long)].collect()
    assert(rows.length === 20)
    assert(rows.map(_._2).sliding(2).forall(w => w.head >= w.last))
    assert(rows.forall { case (p, _) => p.length === 3 && p(1) === ' ' })
  }

  test("q_mixture_weights shares sum to 1 and weights invert shares") {
    import spark.implicits._
    val rows = run("q_mixture_weights")
      .select(col("token_share"), col("mix_weight")).as[(Double, Double)].collect()
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-4)
    val n = rows.length.toDouble
    rows.foreach { case (share, w) => assert(math.abs(w * share - 1.0 / n) < 1e-4) }
  }

  test("bloom prefilter changes no rows vs the plain semi-join") {
    import spark.implicits._
    val dir = sf()
    val plain = spark.sql(
      s"""SELECT l_returnflag, count(*) AS n_items,
         |  round(sum(l_quantity), 2) AS sum_qty,
         |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
         |FROM parquet.`$dir/lineitem.parquet`
         |WHERE l_orderkey IN (SELECT o_orderkey
         |                     FROM parquet.`$dir/orders.parquet` WHERE o_totalprice > 450000)
         |GROUP BY l_returnflag""".stripMargin
    ).as[(String, Long, Double, Double)].collect().sortBy(_._1)
    val bloomed = run("q_bloom_semi_join")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    assert(bloomed.toSeq === plain.toSeq)
    assert(bloomed.nonEmpty)
  }

  test("curate_pipeline_e2e only shrinks the corpus and packs within it") {
    import spark.implicits._
    val bins = run("curate_pipeline_e2e")
      .agg(sum("n_docs"), sum("bin_tokens")).as[(Long, Long)].head()
    val corpus = Tables.documents(spark, sf())
      .select(size(operators.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .agg(count(lit(1)), sum("n")).as[(Long, Long)].head()
    assert(bins._1 <= corpus._1 && bins._1 > 0)   // gated+deduped subset
    assert(bins._2 <= corpus._2)
  }

  test("q_skew_profile ranks heaviest keys with shares that sum under 1") {
    import spark.implicits._
    val rows = run("q_skew_profile")
      .select("rank", "cnt", "key_share").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq)
    assert(rows.map(_._2).sliding(2).forall(w => w.head >= w.last))
    assert(rows.map(_._3).sum <= 1.0 + 1e-9)
  }

  test("dedup_lines keeps counts within bounds and is deterministic") {
    import spark.implicits._
    val a = run("dedup_lines").orderBy("doc_id").collect()
    val b = run("dedup_lines").orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val bad = run("dedup_lines").where(col("n_dup_lines") > col("n_lines"))
    assert(bad.count() === 0)
  }
}
