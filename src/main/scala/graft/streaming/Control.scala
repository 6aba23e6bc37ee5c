package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** A18 reset target — where a restarted stream should begin, mirroring
  * the reference's REST contract (StreamControlService.java:100-178 /
  * AnimalStreamController.java:100-111: earliest | latest | explicit
  * per-partition offsets).
  */
sealed trait ResetSpec
object ResetSpec {
  /** Re-read everything the source still retains. */
  case object Earliest extends ResetSpec

  /** Skip the existing backlog; consume only data arriving after reset. */
  case object Latest extends ResetSpec

  /** Explicit per-partition offsets (the Kafka AdminClient shape). */
  final case class Offsets(byPartition: Map[Int, Long]) extends ResetSpec

  /** The `startingOffsets` option value a Kafka source factory should
    * pass for this spec (option semantics per the spark-sql-kafka docs).
    */
  def kafkaStartingOffsets(spec: ResetSpec, topic: String): String = spec match {
    case Earliest => "earliest"
    case Latest   => "latest"
    case Offsets(m) =>
      val parts = m.toSeq.sortBy(_._1).map { case (p, o) => s""""$p":$o""" }.mkString(",")
      s"""{"$topic":{$parts}}"""
  }
}

/** File-source analogue of seeking a consumer group to its end offsets
  * (A18 `Latest` for the directory stand-in): pre-commit the current
  * listing into a fresh checkpoint as an already-committed batch 0, so
  * the restarted query's first real batch picks up only files that
  * arrive later. Writes exactly the three logs a drained single-batch
  * run leaves behind (offsets/0 + commits/0 + sources/0/0 — the
  * HDFSMetadataLog v1 formats).
  */
object FileSourceReset {

  /** Seed `checkpointDir` so a file-stream over `srcDir` starts after the
    * files currently present. Call before launching the query with this
    * (fresh) checkpoint location.
    */
  import org.apache.hadoop.fs.{FileSystem, Path}

  // all paths go through the Hadoop FileSystem API, so checkpoints and
  // sources on HDFS/S3A work the same as local directories
  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeFile(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  def seedLatest(spark: SparkSession, checkpointDir: String, srcDir: String): Unit = {
    val fs = fsFor(spark, checkpointDir)

    // idempotent: once any offsets log exists (this seed, or a batch the
    // restarted query has since run), re-seeding would corrupt the log
    if (fs.exists(new Path(checkpointDir, "offsets/0"))) return

    val srcFs = fsFor(spark, srcDir)
    val dataFiles = srcFs.listStatus(new Path(srcDir)).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)

    // the same URI strings the source's own listing produces, so the
    // restarted source's seen-set hits
    val entries = dataFiles
      .map(s => s"""{"path":"${s.getPath.toUri.toString}","timestamp":${s.getModificationTime},"batchId":0}""")
      .mkString("\n")
    writeFile(fs, new Path(checkpointDir, "sources/0/0"),
      if (entries.isEmpty) "v1" else s"v1\n$entries")

    // minimal OffsetSeq metadata: absent conf keys fall back to the
    // session's values on restart (Spark logs, then proceeds)
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
    writeFile(
      fs,
      new Path(checkpointDir, "offsets/0"),
      s"""v1
         |{"batchWatermarkMs":0,"batchTimestampMs":${System.currentTimeMillis()},"conf":{"spark.sql.shuffle.partitions":"$shufflePartitions"}}
         |{"logOffset":0}""".stripMargin
    )
    writeFile(fs, new Path(checkpointDir, "commits/0"), "v1\n{\"nextBatchWatermarkMs\":0}")
  }

  /** Companion for file sinks: a query restarted over a seeded checkpoint
    * runs its first real batch as batch 1, but a parquet/file sink's own
    * `_spark_metadata` log must be contiguous from 0 for readers. Seed the
    * sink log with an empty batch 0 ("the skipped backlog produced
    * nothing") before starting the query.
    */
  def seedSinkLog(sinkDir: String): Unit = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val p    = new Path(sinkDir, "_spark_metadata/0")
    val fs   = p.getFileSystem(conf)
    if (!fs.exists(p)) writeFile(fs, p, "v1")
  }
}

/** A17 lag for the file-source stand-in: the directory's current data
  * files minus the files recorded in committed batches of the query's
  * source log — "committed vs end offsets per partition"
  * (KafkaOffsetService.java:31-56) translated to a directory listing.
  * (File sources report no `latestOffset` in progress events, so lag must
  * come from the checkpoint + listing, exactly like the reference reads
  * the consumer group's committed offsets + AdminClient end offsets.)
  */
object FileSourceLag {
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.{FileSystem, Path}
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def canonical(p: String): String =
    p.replaceFirst("^file:/+", "/")

  /** Number of data files in `srcDir` not yet processed by a committed
    * micro-batch of the query checkpointed at `checkpointDir`. Paths go
    * through the Hadoop FileSystem API (HDFS/S3A checkpoints included);
    * `conf` defaults to the active session's Hadoop configuration.
    */
  def unprocessedFiles(
      checkpointDir: String,
      srcDir: String,
      conf: Configuration = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
  ): Long = {
    val ckptFs = new Path(checkpointDir).getFileSystem(conf)

    def batchFiles(sub: String): Seq[(Long, Path)] = {
      val dir = new Path(checkpointDir, sub)
      if (!ckptFs.exists(dir)) Seq.empty
      else ckptFs.listStatus(dir).toSeq.flatMap { s =>
        val name = s.getPath.getName.stripSuffix(".compact")
        if (name.matches("\\d+")) Some(name.toLong -> s.getPath) else None
      }
    }

    val committedMax = batchFiles("commits").map(_._1).reduceOption(_ max _).getOrElse(-1L)
    val processed: Set[String] = batchFiles("sources/0")
      .filter(_._1 <= committedMax)
      .flatMap { case (_, p) =>
        val in = ckptFs.open(p)
        val content =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        content.linesIterator.filter(_.startsWith("{")).flatMap { line =>
          try {
            JsonMethods.parse(line) \ "path" match {
              case JString(path) => Some(canonical(path))
              case _             => None
            }
          } catch { case _: Throwable => None }
        }
      }
      .toSet

    val srcFs = new Path(srcDir).getFileSystem(conf)
    srcFs.listStatus(new Path(srcDir)).toSeq
      .count(s =>
        s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".") &&
          !processed.contains(canonical(s.getPath.toUri.toString))
      )
      .toLong
  }
}

/** A17 lag arithmetic: distance between two streaming source offsets as
  * rendered in StreamingQueryProgress (endOffset vs latestOffset). Handles
  * the three public shapes: scalar offsets, file-source `{"logOffset":n}`,
  * and Kafka `{"topic":{"partition":offset}}` maps (summed across
  * partitions — the reference's per-group total lag,
  * KafkaOffsetService.java:31-56).
  */
object OffsetLag {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def parse(s: String): Option[JValue] =
    try Some(JsonMethods.parse(s))
    catch { case _: Throwable => None }

  private def asLong(j: JValue): Option[Long] = j match {
    case JInt(n)     => Some(n.toLong)
    case JLong(n)    => Some(n)
    case JDecimal(n) => Some(n.toLong)
    case _           => None
  }

  def distance(endOffset: String, latestOffset: String): Option[Long] =
    (parse(endOffset), parse(latestOffset)) match {
      case (Some(e), Some(l)) => dist(e, l)
      case _                  => None
    }

  private def dist(end: JValue, latest: JValue): Option[Long] = (end, latest) match {
    case (e, l) if asLong(e).isDefined && asLong(l).isDefined =>
      Some(math.max(0L, asLong(l).get - asLong(e).get))
    case (JObject(List(("logOffset", e))), JObject(List(("logOffset", l)))) =>
      for (ev <- asLong(e); lv <- asLong(l)) yield math.max(0L, lv - ev)
    case (JObject(eTopics), JObject(lTopics)) =>
      // kafka shape: per-topic partition→offset maps; lag = Σ max(0, l-e)
      val endMap = (for {
        (t, JObject(parts)) <- eTopics
        (p, off)            <- parts
        o                   <- asLong(off)
      } yield (t, p) -> o).toMap
      val diffs = for {
        (t, JObject(parts)) <- lTopics
        (p, off)            <- parts
        o                   <- asLong(off)
      } yield math.max(0L, o - endMap.getOrElse((t, p), 0L))
      if (diffs.isEmpty) None else Some(diffs.sum)
    case _ => None
  }
}

/** Stream lifecycle + offset control plane (SURVEY.md §2 A16–A19),
  * replacing the reference's BindingsLifecycleController / AdminClient
  * machinery (StreamControlService.java, KafkaOffsetService.java).
  *
  * Queries register as *factories* so stop→start cycles (A16) and offset
  * resets (A18) can relaunch with fresh options. In Spark the consumer
  * group's committed offsets live in the checkpoint, so:
  *  - offsets (A17) come from `lastProgress` (sources' start/end offsets
  *    and input row counts) and lag is endOffset vs the source-reported
  *    latestOffset;
  *  - reset (A18) = stop → relaunch the factory pointed at a NEW
  *    checkpoint dir positioned per [[ResetSpec]] (Kafka sources map it
  *    to `startingOffsets`; file sources seed the checkpoint via
  *    [[FileSourceReset]]) — Spark checkpoints are append-only, never
  *    edited in place.
  */
final class StreamRegistry(spark: SparkSession) {

  /** reset epoch per query: factories receive it (plus the requested
    * [[ResetSpec]]) to derive a fresh checkpoint location and starting
    * position on reset, mirroring the reference's
    * stop → alter offsets → restart cycle.
    */
  final case class Registration(
      factory: (Int, ResetSpec) => StreamingQuery,
      var epoch: Int,
      var spec: ResetSpec,
      lagProbe: Option[() => Long]
  )

  private val registered = TrieMap.empty[String, Registration]
  private val active     = TrieMap.empty[String, StreamingQuery]

  def register(name: String, factory: Int => StreamingQuery, autoStart: Boolean = true): Unit =
    registerResettable(name, (epoch, _) => factory(epoch), autoStart)

  /** Full-contract registration: the factory decides how to honor the
    * requested reset position for its source type; `lagProbe` supplies
    * the committed-vs-end lag for sources that don't report a
    * `latestOffset` in progress events (file sources —
    * [[FileSourceLag.unprocessedFiles]] is the standard probe).
    */
  def registerResettable(
      name: String,
      factory: (Int, ResetSpec) => StreamingQuery,
      autoStart: Boolean = true,
      lagProbe: Option[() => Long] = None
  ): Unit = {
    registered.put(name, Registration(factory, 0, ResetSpec.Earliest, lagProbe))
    if (autoStart) start(name)
  }

  /** A16 — start (idempotent: no-op if already running). */
  def start(name: String): Boolean = registered.get(name) match {
    case Some(reg) if !isRunning(name) =>
      active.put(name, reg.factory(reg.epoch, reg.spec)); true
    case _ => false
  }

  /** A16 — stop, waiting for termination like the reference's 5s
    * stream-stop wait (StreamControlService.java:180-197).
    */
  def stop(name: String, timeoutMs: Long = 5000): Boolean =
    active.remove(name) match {
      case Some(q) =>
        // A query that already terminated with an error rethrows its
        // StreamingQueryException from stop()/awaitTermination(); teardown
        // must still complete (and stopAll must reach the remaining
        // queries), so report failure instead of propagating mid-loop.
        scala.util.Try {
          q.stop()
          q.awaitTermination(timeoutMs)
          true
        }.recover {
          // stop() marks the query TERMINATED immediately, so isActive is
          // no witness of the execution thread's death. The thread failing
          // to die within spark.sql.streaming.stopTimeout surfaces as a
          // TimeoutException — that (and only that) means a micro-batch
          // may still be in flight.
          case _: java.util.concurrent.TimeoutException => false
          // terminated-with-error still means terminated: the group-
          // inactive contract only cares that nothing more can commit
          case _ => !q.isActive
        }.getOrElse(false)
      case None => false
    }

  def isRunning(name: String): Boolean = active.get(name).exists(_.isActive)

  /** A19 — status probe: (id, runId, isActive, status message). */
  def status(name: String): Option[(String, String, Boolean, String)] =
    active.get(name).map(q => (q.id.toString, q.runId.toString, q.isActive, q.status.message))

  /** A17 — per-source offset/progress info from the last micro-batch:
    * (source description, startOffset, endOffset, numInputRows).
    */
  def offsets(name: String): Seq[(String, String, String, Long)] =
    active.get(name).toSeq.flatMap { q =>
      Option(q.lastProgress).toSeq.flatMap(_.sources.toSeq.map { s =>
        (s.description, String.valueOf(s.startOffset), String.valueOf(s.endOffset), s.numInputRows)
      })
    }

  /** A17 — lag: how far the committed position trails the source's latest
    * available data ("how far behind am I", the number the reference's
    * AnimalStreamControlIT asserts). Sources that report `latestOffset`
    * in progress events (Kafka) are measured from progress via
    * [[OffsetLag.distance]]; otherwise the registration's `lagProbe`
    * (file stand-in: unprocessed-file count) answers. None when neither
    * can tell.
    */
  def lag(name: String): Option[Long] = {
    val fromProgress: Seq[Long] = active.get(name).toSeq.flatMap { q =>
      Option(q.lastProgress).toSeq.flatMap(_.sources.toSeq.flatMap { s =>
        for {
          e   <- Option(s.endOffset)
          l   <- Option(s.latestOffset)
          out <- OffsetLag.distance(e, l)
        } yield out
      })
    }
    if (fromProgress.nonEmpty) Some(fromProgress.sum)
    else registered.get(name).flatMap(_.lagProbe.map(_.apply()))
  }

  /** A18 — offset reset: stop, remember the requested position, bump the
    * epoch (factories derive a fresh checkpoint + starting position from
    * both), restart. Returns the previous offsets for the reference's
    * response contract (AnimalStreamController reset response).
    *
    * Sequencing guard (the reference's consumer-group-inactive wait,
    * StreamControlService.java:199-219): the relaunch happens ONLY after
    * the previous run's termination is confirmed. If the old query is
    * still active when the stop wait expires, reset throws instead of
    * starting a second run — otherwise two queries could commit
    * micro-batches concurrently between stop and checkpoint reseed.
    */
  def reset(
      name: String,
      spec: ResetSpec = ResetSpec.Earliest,
      stopTimeoutMs: Long = 60000
  ): Seq[(String, String, String, Long)] = {
    val prev       = offsets(name)
    val wasRunning = isRunning(name)
    val stopped    = stop(name, stopTimeoutMs)
    if (wasRunning && !stopped)
      throw new IllegalStateException(
        s"reset($name): previous run still active after ${stopTimeoutMs} ms stop wait; " +
          "refusing to relaunch while the old query can still commit"
      )
    registered.get(name).foreach { reg => reg.epoch += 1; reg.spec = spec }
    start(name)
    prev
  }

  /** Stop everything (test teardown / shutdown hook). */
  def stopAll(): Unit = active.keys.foreach(stop(_))
}
