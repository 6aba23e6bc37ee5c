package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-10 corpus-health batch, checked
  * through independent paths the row-hash oracle can't express:
  *  - the per-dimension profile's integer-snapped sums agree with a
  *    direct double summation (the snap changes the arithmetic, not the
  *    value) and cover every dimension exactly once;
  *  - the language matrix partitions the verified pair list (its counts
  *    sum to the pair count, cells are canonically ordered);
  *  - the length-bucket audit's membership column equals an independent
  *    recount of distinct pair members, and its buckets partition the
  *    corpus;
  *  - cross-modal rows are exactly the pairs whose BOTH ends carry an
  *    embedding, with cosine in [-1, 1];
  *  - source entropy is bounded by ln(#sources) per language.
  */
class CorpusHealthInvariantSpec extends GraftSpecBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf())

  private lazy val pairs =
    operators.Dedup.minhashPairs(Tables.documents(spark, sf()), "doc_id", "text", 3, 0.5)

  test("embed_dim_stats: snap-sums track direct double sums; dims partition the matrix") {
    val got = run("embed_dim_stats").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    val emb = Tables.embeddings(spark, sf())
    val nVecs = emb.count()
    val dims  = emb.select(size(col("embedding"))).head().getInt(0)
    assert(got.keySet === (0L until dims.toLong).toSet)
    assert(got.values.forall(_._1 == nVecs), "every dim sees every vector")
    // independent reference: plain double aggregation per dim (different
    // arithmetic: no snap). micro-snap error is <= 0.5 per value.
    val ref = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(sum(col("x").cast("double")).as("s"), stddev_pop(col("x").cast("double")).as("sd"))
      .collect()
      .map(r => r.getInt(0).toLong -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    (0L until dims.toLong).foreach { d =>
      val (_, sumMicro, sdMilli) = got(d)
      assert(math.abs(sumMicro / 1e6 - ref(d)._1) <= nVecs * 0.5 / 1e6 + 1e-6,
        s"dim $d snap-sum ${sumMicro / 1e6} vs direct ${ref(d)._1}")
      // sd is in milli-units of x: compare at 1e-3 granularity + snap error
      assert(math.abs(sdMilli / 1000.0 - ref(d)._2) < 2e-3,
        s"dim $d sd ${sdMilli / 1000.0} vs direct ${ref(d)._2}")
    }
  }

  test("dedup_lang_pair_matrix: cells partition the verified pair list") {
    val rows = run("dedup_lang_pair_matrix").collect()
    assert(rows.forall(r => r.getString(0) <= r.getString(1)), "canonical (lang_1 <= lang_2) order")
    assert(rows.map(_.getLong(2)).sum === pairs.count(), "cell counts sum to the pair count")
  }

  test("dedup_rate_by_length: buckets partition the corpus; membership matches a recount") {
    val rows  = run("dedup_rate_by_length").collect()
    val docs  = Tables.documents(spark, sf())
    assert(rows.map(_.getLong(1)).sum === docs.count(), "bucket doc counts partition the corpus")
    val memberCount = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
      .count()
    assert(rows.map(_.getLong(2)).sum === memberCount, "in-pair docs equal distinct pair members")
    rows.foreach { r =>
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1), "rate_ppm arithmetic")
    }
  }

  test("dedup_cross_modal_agree: exactly the embeddable pairs, cosine bounded") {
    val rows = run("dedup_cross_modal_agree").collect()
    val vecIds = Tables.embeddings(spark, sf()).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val expected = pairs.select("id_a", "id_b").collect()
      .count(r => vecIds(r.getLong(0)) && vecIds(r.getLong(1)))
    assert(rows.length === expected)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.5, "only verified pairs (jaccard >= tau)")
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, s"cosine out of range: ${r.getDouble(3)}")
    }
  }

  test("corpus_source_entropy: 0 <= H <= ln(n_sources), docs partition the corpus") {
    val rows = run("corpus_source_entropy").collect()
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf()).count())
    rows.foreach { r =>
      val h = r.getLong(3) / 1e6
      val hMax = math.log(r.getLong(2).toDouble)
      assert(h >= -1e-3 && h <= hMax + 1e-3, s"lang ${r.getString(0)}: H=$h outside [0, ln ${r.getLong(2)}]")
    }
  }
}
