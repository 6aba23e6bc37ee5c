package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.functions.{ChunkCuts, DotProduct, GramHashes, GramMatrixAgg, Hashing, MinHashSig, MisraGriesLong, TopKByLong, WordKGrams}

/** Session extension registering graft's custom expressions as SQL
  * functions, so the SQL front door has the same surface as the DataFrame
  * API:
  *
  *   SELECT graft_dot(a.embedding, b.embedding)          -- codegen dot
  *   SELECT graft_minhash_sig(graft_hashes)              -- 16-wide minima
  *   SELECT graft_word_kgrams(tokens, 3)                 -- shingles
  *
  * Installed by GraftSession via builder.withExtensions — the standard
  * extension point (no registry hacking, survives session cloning).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator extension: the native as-of join (logical node →
    // AsOfJoinStrategy → merge exec); see graft.plans
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(args(0), args(1))
      }
    ))
    e.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_minhash_sig(hashedShingles)")
        MinHashSig(args.head, Hashing.Perms.map(_._1), Hashing.Perms.map(_._2), Hashing.MinhashP)
      }
    ))
    e.injectFunction((
      new FunctionIdentifier("graft_word_kgrams"),
      new ExpressionInfo(classOf[WordKGrams].getName, "graft_word_kgrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_word_kgrams(tokens, k)")
        val k = args(1).eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other   => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
        }
        WordKGrams(args.head, k)
      }
    ))
    e.injectFunction((
      new FunctionIdentifier("graft_topk_by"),
      new ExpressionInfo(classOf[TopKByLong].getName, "graft_topk_by"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_topk_by(score, id, k)")
        val k = args(2).eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other   => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
        }
        // a bare AggregateFunction: the analyzer wraps it in the
        // AggregateExpression for the enclosing Aggregate
        TopKByLong(args(0), args(1), k)
      }
    ))
    e.injectFunction((
      new FunctionIdentifier("graft_mg_sketch"),
      new ExpressionInfo(classOf[MisraGriesLong].getName, "graft_mg_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_mg_sketch(item, k)")
        val k = args(1).eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other   => throw new IllegalArgumentException(s"k must be an integer literal, got $other")
        }
        MisraGriesLong(args.head, k)
      }
    ))
    e.injectFunction((
      new FunctionIdentifier("graft_chunk_cuts"),
      new ExpressionInfo(classOf[ChunkCuts].getName, "graft_chunk_cuts"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_chunk_cuts(text, g, modulus)")
        def lit(i: Int) = args(i).eval() match {
          case x: Int  => x
          case l: Long => l.toInt
          case other   => throw new IllegalArgumentException(s"expected integer literal, got $other")
        }
        ChunkCuts(args.head, lit(1), lit(2))
      }
    ))
    e.injectFunction((
      new FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "graft_gram_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_gram_hashes(text, g)")
        val g = args(1).eval() match {
          case x: Int  => x
          case l: Long => l.toInt
          case other   => throw new IllegalArgumentException(s"g must be an integer literal, got $other")
        }
        GramHashes(args.head, g)
      }
    ))
    // Spark's internal runtime-filter pair (what InjectRuntimeFilter plans
    // under the hood), exposed as SQL functions so a query can stage an
    // EXPLICIT bloom prefilter: build a bloom over the dim keys in a
    // scalar subquery, drop non-matching fact rows before the shuffle,
    // then let the exact semi-join remove the false positives.
    e.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2, "graft_bloom_agg(xxhash64Col[, estimatedItems])")
        if (args.length == 1) new BloomFilterAggregate(args.head)
        else new BloomFilterAggregate(args(0), args(1))
      }
    ))
    e.injectFunction((
      new FunctionIdentifier("graft_gram_matrix"),
      new ExpressionInfo(classOf[GramMatrixAgg].getName, "graft_gram_matrix"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_gram_matrix(array<bigint>)")
        GramMatrixAgg(args.head)
      }
    ))
    e.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_might_contain(bloom, xxhash64Value)")
        BloomFilterMightContain(args(0), args(1))
      }
    ))
  }
}
