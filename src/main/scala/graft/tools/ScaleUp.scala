package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver-generated fixture tables
  * (TESTDATA.md): reads `srcDir` (normally sf0.1) and writes `dstDir` with
  * every fact/entity table replicated `factor`× under new key ranges, so the
  * full query suite can be benchmarked at sf1 without touching the read-only
  * driver data.
  *
  * Replication is NOT naive row copying — copied rows would distort the
  * workload shape, not scale it:
  *
  *  - **Keys/FKs**: replica `i` offsets every entity key by `i · stride`
  *    (strides comfortably above each table's max key), and offsets foreign
  *    keys by the referenced table's stride, so referential integrity and
  *    join fan-outs are preserved exactly — each replica is a disjoint,
  *    self-consistent star.
  *  - **documents.text**: replica `i>0` suffixes every word with a
  *    replica-specific letter pair. Within a replica, pairwise shingle
  *    similarity is untouched (both sides of any near-dup pair get the same
  *    rewrite), so the LSH/SimHash/Jaccard dedup workload scales linearly
  *    (10 independent corpora) instead of every doc gaining 9 artificial
  *    exact-shingle twins — which would inflate candidate pairs ~O(factor²)
  *    and make scaling look super-linear for reasons the 100 TB design
  *    would never see. `n_chars` is recomputed to stay consistent.
  *  - **embeddings.embedding**: replica `i>0` flips the sign of each
  *    dimension by `hash(vec_id, dim, i)` parity — norm and per-dim
  *    magnitude distribution are preserved bit-exactly while cross-replica
  *    cosine collapses to ≈0, so ANN/cosine-dedup candidate counts scale
  *    linearly for the same reason.
  *  - **names** (`c_name`/`s_name`/`p_name`): replica-tagged at the end of
  *    the string, so contains-style predicates (`%green%`) keep their
  *    selectivity but cross-replica string-equality/fuzzy blocks don't
  *    merge.
  *  - **timestamps** are left unchanged: sf1 models 10× the rows in the
  *    same time window (densification), so windowed/session queries see 10×
  *    rows per window — the honest scaling mode for an analytics suite.
  *  - `region`/`nation` stay as-is: dimensions don't grow with sf.
  *
  * Usage: `ScaleUp srcDir dstDir [factor] [strideMult] [tables...]`
  * (defaults: sf0.1 → testdata/sf1, 10×, strideMult 1, all tables).
  * `strideMult` widens the key strides for SECOND-level scaling — replicas
  * of an already-scaled dir (e.g. sf1 → sf10) occupy `factor` stride slots
  * per level, so reusing the level-1 strides would collide keys; pass the
  * previous level's factor (10 for sf1 → sf10). `tables` restricts output
  * to a subset (e.g. `documents embeddings` for a dedup/ANN-only probe)
  * so a 100×-scale corpus doesn't drag 60 M lineitem rows along with it.
  * Output row groups are capped at 4 MB so a `local[32]` scan of the
  * 10-file tables still parallelizes well past 10 tasks.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src        = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst        = if (args.length > 1) args(1) else "testdata/sf1"
    val factor     = if (args.length > 2) args(2).toInt else 10
    val strideMult = if (args.length > 3) args(3).toLong else 1L
    val tables     = if (args.length > 4) Some(args.drop(4).toSet) else None
    val spark      = graft.GraftSession.get("graft-scaleup")
    try run(spark, src, dst, factor, strideMult, tables)
    finally spark.stop()
  }

  // Strides sit far above each table's sf1 max key so replicas can never
  // collide, while staying small enough that key columns remain dense-ish
  // longs (hash distributions unaffected).
  private val CUST = 1000000L
  private val SUPP = 1000000L
  private val PART = 1000000L
  private val ORD  = 10000000L
  private val EVT  = 10000000L
  private val DOC  = 1000000L
  private val VEC  = 1000000L

  def run(
      spark: SparkSession,
      src: String,
      dst: String,
      factor: Int,
      strideMult: Long = 1L,
      tables: Option[Set[String]] = None
  ): Unit = {
    val CUST = this.CUST * strideMult
    val SUPP = this.SUPP * strideMult
    val PART = this.PART * strideMult
    val ORD  = this.ORD * strideMult
    val EVT  = this.EVT * strideMult
    val DOC  = this.DOC * strideMult
    val VEC  = this.VEC * strideMult

    def wanted(name: String): Boolean = tables.forall(_.contains(name))
    def tbl(name: String): DataFrame  = spark.read.parquet(s"$src/$name.parquet")

    def write(df: => DataFrame, name: String): Unit = if (wanted(name)) {
      df.write
        .mode("overwrite")
        .option("parquet.block.size", (4L * 1024 * 1024).toString)
        .parquet(s"$dst/$name.parquet")
      println(s"[scaleup] wrote $name")
    }

    // Replicate by unioning `factor` shifted copies; replica 0 is the
    // original rows unchanged (so sf1 strictly contains sf0.1's data).
    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => if (i == 0) df else shift(df, i)).reduce(_ unionAll _)

    def tag(c: Column, i: Int): Column = concat(c, lit(s"~$i"))

    // dimensions: fixed size at every sf
    write(tbl("region"), "region")
    write(tbl("nation"), "nation")

    write(replicate(tbl("customer")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * CUST))
        .withColumn("c_name", tag(col("c_name"), i))
    }, "customer")

    write(replicate(tbl("supplier")) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * SUPP))
        .withColumn("s_name", tag(col("s_name"), i))
    }, "supplier")

    write(replicate(tbl("part")) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * PART))
        .withColumn("p_name", tag(col("p_name"), i))
    }, "part")

    write(replicate(tbl("orders")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ORD))
        .withColumn("o_custkey", col("o_custkey") + lit(i * CUST))
    }, "orders")

    write(replicate(tbl("lineitem")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ORD))
        .withColumn("l_partkey", col("l_partkey") + lit(i * PART))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * SUPP))
    }, "lineitem")

    // events.ts round-trips in whichever encoding the fixture generation
    // uses — raw epoch-nanos long (nanosAsLong) written back as BIGINT, or
    // TIMESTAMP(MICROS) written back as a timestamp — and Tables.events
    // dispatches on the observed schema, so either replica loads identically.
    write(replicate(tbl("events")) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * EVT))
        .withColumn("user_id", col("user_id") + lit(i * EVT))
    }, "events")

    write(replicate(tbl("documents")) { (df, i) =>
      // The salt must be level-distinguishable for second-level scaling:
      // suffixing level-1-replica-0 text with a LEVEL-1 salt would exactly
      // reproduce a level-1 salted replica ("word"+"qb" == "wordqb"),
      // handing every doc a cross-replica exact twin and re-creating the
      // O(factor²) candidate blowup the salting exists to prevent. Level-2
      // salts append a strideMult-derived letter, making every
      // (level-1, level-2) replica-pair suffix distinct by construction.
      val salt =
        if (strideMult > 1) s"q${('a' + (i % 26)).toChar}${('a' + (strideMult % 26)).toChar}"
        else s"q${('a' + (i % 26)).toChar}"
      df.withColumn("text", regexp_replace(col("text"), "(\\w+)", "$1" + salt))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("doc_id", col("doc_id") + lit(i * DOC))
    }, "documents")

    write(replicate(tbl("embeddings")) { (df, i) =>
      df.withColumn(
          "embedding",
          transform(
            col("embedding"),
            (x, j) => when(pmod(hash(col("vec_id"), j, lit(i)), lit(2)) === 0, x).otherwise(-x)
          )
        )
        .withColumn("vec_id", col("vec_id") + lit(i * VEC))
    }, "embeddings")

    println(s"[scaleup] done: $src × $factor → $dst")
  }
}
