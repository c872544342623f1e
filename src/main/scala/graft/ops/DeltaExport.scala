package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Open-table-format interop (r11 verdict "what's missing" item 4): emit
  * the table as a Delta Lake transaction log — the PUBLIC, dependency-free
  * half of the format (the log is JSON lines of `protocol` / `metaData` /
  * `add` / `remove` actions over plain parquet data files; spec:
  * github.com/delta-io/delta PROTOCOL.md). Any Delta-capable engine
  * (Spark+delta, DuckDB delta, Trino, polars) can read the emitted
  * directory as-is; no delta jar exists offline (SURVEY §0), so the
  * round-trip proof here is [[readDeltaLog]] — an independent reader that
  * reconstructs the file set purely from the log, exactly as external
  * tooling would.
  *
  * Mapping from the Acid seam: version n's manifest = the set of `add`
  * actions alive after replaying log versions 0..n; a new commit's removed
  * files become `remove` actions (Delta's tombstones = the vacuum
  * candidates). One JSON file per version is the same atomic-pointer
  * contract — readers take max committed version; writers put-if-absent
  * `<v>.json` (here: O_EXCL create, the [[Acid]] claim primitive).
  *
  * Deterministic: metaData id derives from the directory name, timestamps
  * from file mtimes — re-exports are byte-stable modulo mtime.
  */
object DeltaExport {

  private def logDir(dir: String) = Paths.get(dir, "_delta_log")

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Commit `df` as the next Delta version of `dir`: data files land under
    * the table root first, then the version's log entry is published with
    * put-if-absent (concurrent committers to the same version: exactly one
    * wins). `overwrite = true` emits `remove` tombstones for every
    * previously-live file. Returns the committed version. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
      overwrite: Boolean = false): Long = {
    Files.createDirectories(logDir(dir))
    val v = currentVersion(dir).map(_ + 1).getOrElse(0L)
    // data lands in a per-version subdir (Delta permits subdirectory data
    // paths; this keeps concurrent writers' files disjoint)
    val dataSub = f"v$v%020d"
    df.write.mode("overwrite").parquet(s"$dir/$dataSub")
    val root = Paths.get(dir)
    val walk = Files.walk(root.resolve(dataSub))
    val files =
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .map[String](p => root.relativize(p).toString)
        .sorted().toArray.map(_.toString).toSeq
      finally walk.close()
    val actions = Seq.newBuilder[String]
    if (v == 0L) {
      val id = java.util.UUID.nameUUIDFromBytes(
        dir.getBytes(StandardCharsets.UTF_8)).toString
      val schemaJson = jsonEscape(df.schema.json)
      actions += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      actions += s"""{"metaData":{"id":"$id","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":${Files.getLastModifiedTime(root).toMillis}}}"""
    }
    if (overwrite && v > 0L) liveFiles(dir, v - 1).foreach { f =>
      actions += s"""{"remove":{"path":"${jsonEscape(f)}","deletionTimestamp":${Files.getLastModifiedTime(root).toMillis},"dataChange":true}}"""
    }
    files.foreach { f =>
      val p = root.resolve(f)
      actions += s"""{"add":{"path":"${jsonEscape(f)}","partitionValues":{},"size":${Files.size(p)},"modificationTime":${Files.getLastModifiedTime(p).toMillis},"dataChange":true}}"""
    }
    val entry = logDir(dir).resolve(f"$v%020d.json")
    // put-if-absent: the Delta commit CAS
    Files.write(entry, actions.result().mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    v
  }

  /** Highest committed log version, if any. */
  def currentVersion(dir: String): Option[Long] = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) return None
    val listing = Files.list(ld)
    val vs =
      try listing.toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong)
      finally listing.close()
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Replay log versions 0..v: the live file set = adds minus removes —
    * exactly the reconstruction every external Delta reader performs. */
  def liveFiles(dir: String, v: Long): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    (0L to v).foreach { i =>
      val entry = logDir(dir).resolve(f"$i%020d.json")
      val lines = new String(Files.readAllBytes(entry), StandardCharsets.UTF_8)
        .split('\n').filter(_.nonEmpty)
      lines.foreach { l =>
        // the two path-bearing actions; a full reader JSON-parses — the
        // paths here are repo-generated (escaped, no quotes inside)
        val add = """"add":\{"path":"([^"]+)"""".r
        val rem = """"remove":\{"path":"([^"]+)"""".r
        add.findFirstMatchIn(l).foreach(m => live += m.group(1))
        rem.findFirstMatchIn(l).foreach(m => live -= m.group(1))
      }
    }
    live.toSeq
  }

  /** Independent log-driven read: resolve the live file set from the
    * transaction log alone (never a directory listing) and scan exactly
    * those files — what Trino/DuckDB/polars do with the same directory. */
  def readDeltaLog(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(dir).getOrElse(
      sys.error(s"DeltaExport.readDeltaLog: no committed version at $dir"))
    val files = liveFiles(dir, v)
    require(files.nonEmpty, s"DeltaExport: empty live set at $dir v$v")
    spark.read.parquet(files.map(f => s"$dir/$f"): _*)
  }
}
