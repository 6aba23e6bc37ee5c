package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each probe row, attach the most recent
  * build-side values with build_ts <= probe_ts for the same key — the
  * "what did the dimension look like when this event happened" join that a
  * CDC history table enables (the reference's REST lookup always reads
  * current state; this is its point-in-time generalization).
  *
  * Spark has no native as-of join; rather than a custom SparkPlan, this
  * composes built-ins: tag + union both sides, one shuffle+sort per key,
  * then a running `last(value, ignoreNulls)` window fills build values
  * forward into probe rows. O(n log n) in the partition like a sort-merge
  * join, no candidate explosion, AQE-compatible.
  *
  * Requirements: (key, build_ts) unique on the build side (pre-compact
  * with Dedup.latestWins), build value columns non-null (each value column
  * fills independently).
  */
object AsOfJoin {

  def asOf(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      probeTsCol: String,
      buildTsCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val probeCols = probe.columns.toSeq
    val buildSchema = build.schema

    // withColumn(v, lit(null)) below would silently null out probe data if a
    // probe column shared a name with a build value column (or the internal
    // tag columns) — refuse loudly instead of producing wrong output.
    val collisions = (valueCols ++ Seq("__ts", "__is_build")).filter(probeCols.contains)
    require(
      collisions.isEmpty,
      s"asOf: probe columns collide with build valueCols/internal names: ${collisions.mkString(", ")} — " +
        "alias the probe (or build) columns before joining"
    )

    val pTagged = valueCols
      .foldLeft(probe) { (df, v) =>
        df.withColumn(v, lit(null).cast(buildSchema(v).dataType))
      }
      .withColumn("__ts", col(probeTsCol))
      .withColumn("__is_build", lit(0))

    val bTagged = probeCols
      .filterNot(c => c == keyCol)
      .foldLeft(build.withColumnRenamed(buildTsCol, "__bts")) { (df, c) =>
        df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
      }
      .withColumn("__ts", col("__bts"))
      .drop("__bts")
      .withColumn("__is_build", lit(1))
      .select((probeCols ++ valueCols ++ Seq("__ts", "__is_build")).map(col): _*)

    val unioned = pTagged
      .select((probeCols ++ valueCols ++ Seq("__ts", "__is_build")).map(col): _*)
      .unionByName(bTagged)

    // build rows sort before probe rows at equal ts (inclusive <=); the
    // running last() carries each build value forward to later probe rows
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("__ts").asc, col("__is_build").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    valueCols
      .foldLeft(unioned) { (df, v) =>
        df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
      }
      .filter(col("__is_build") === 0)
      .select((probeCols ++ valueCols).map(col): _*)
  }

  /** Native form: same contract as [[asOf]], planned as the custom
    * AsOfJoinPlan → AsOfJoinExec merge operator (one partition-local
    * forward pass over each sorted side) instead of the union+window
    * composition. Requires LongType key and timestamp columns and the
    * GraftExtensions-enabled session (GraftSession installs it).
    *
    * `direction="forward"` matches the earliest build row at-or-after the
    * probe instead of the latest at-or-before; `tolerance` (same units as
    * the timestamps) nulls out matches farther than the bound.
    */
  def asOfNative(
      probe: DataFrame,
      build: DataFrame,
      keyCol: String,
      probeTsCol: String,
      buildTsCol: String,
      valueCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None
  ): DataFrame = {
    import org.apache.spark.sql.graft.PlanBridge
    import org.apache.spark.sql.types.LongType

    val collisions = valueCols.filter(probe.columns.contains)
    require(
      collisions.isEmpty,
      s"asOfNative: probe columns collide with build valueCols: ${collisions.mkString(", ")}"
    )
    require(
      direction == "backward" || direction == "forward",
      s"asOfNative: direction must be backward|forward (got $direction)"
    )
    val lp = PlanBridge.analyzed(probe)
    // Re-alias every build column through a fresh Alias: probe and build
    // often derive from the same source DataFrame, so their plans share
    // exprIds — the analyzer's DeduplicateRelations would renumber the
    // right child and leave this node's right-side attribute fields
    // pointing at the left. Fresh ids on the build side make the tree
    // unambiguous before analysis sees it.
    val rp0 = PlanBridge.analyzed(build)
    val freshAliases = rp0.output.map(a =>
      org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()
    )
    val rp = org.apache.spark.sql.catalyst.plans.logical.Project(freshAliases, rp0)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asOfNative: column $name not found in ${plan.output.map(_.name)}")
      )
    val lk = attr(lp, keyCol); val lt = attr(lp, probeTsCol)
    val rk = attr(rp, keyCol); val rt = attr(rp, buildTsCol)
    Seq(lk, lt, rk, rt).foreach { a =>
      require(a.dataType == LongType, s"asOfNative: ${a.name} must be LongType (got ${a.dataType})")
    }
    PlanBridge.ofRows(
      probe.sparkSession,
      graft.plans.AsOfJoinPlan(
        lp, rp, lk, lt, rk, rt, valueCols.map(attr(rp, _)),
        forward = direction == "forward", tolerance = tolerance
      )
    )
  }
}
