package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Minimal ACID commit protocol for directory tables (r10 verdict item 5)
  * — the seam Delta/Iceberg add on top of parquet at 100 TB, reduced to
  * its two load-bearing pieces:
  *
  *  1. **Immutable versioned data**: every commit writes a fresh
  *     `v=<n>/` directory plus a `manifest-<n>.txt` naming exactly the
  *     files that belong to version n. Neither is ever mutated after the
  *     pointer flip, so any reader holding version n reads an immutable
  *     snapshot no matter what writers do next.
  *  2. **Atomic version pointer**: `_current` holds the committed version
  *     number and is replaced via write-temp-then-ATOMIC_MOVE rename —
  *     the one primitive the underlying store must supply (POSIX rename
  *     here; object stores use put-if-absent on a monotonically named
  *     log entry, same contract). A reader sees the old pointer or the
  *     new pointer, never a torn one — so a read started mid-rewrite is
  *     entirely version n or entirely n+1, never a mix.
  *
  * Crash safety: a writer dying before the pointer flip leaves an
  * uncommitted `v=<n>/` + manifest that no pointer references — garbage
  * to be re-written by the next commit attempt (writes use overwrite
  * mode), invisible to every reader. Readers never list the table
  * directory; they resolve pointer → manifest → files, which is also
  * what makes the protocol object-store-safe (no reliance on listing
  * consistency).
  *
  * Scale: the manifest lists file names, not data — O(files) bytes. At
  * real scale manifests shard and the pointer names a manifest list
  * (exactly Iceberg's snapshot layout); one level is enough to prove the
  * isolation contract here. OperatorSpec pins reader isolation under a
  * concurrent writer; `sink_upsert`/`sink_compact` commit through this
  * seam so their oracles prove the read-back path end to end.
  */
object Acid {

  private def pointer(table: String): Path = Paths.get(table, "_current")

  /** The committed version, or None for an empty/uninitialized table. */
  def currentVersion(table: String): Option[Long] = {
    val p = pointer(table)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim.toLong)
    else None
  }

  private def manifestLines(table: String, v: Long): Seq[String] = {
    val lines = Files.readAllLines(Paths.get(table, s"manifest-$v.txt"))
    val it = lines.iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) { val l = it.next().trim; if (l.nonEmpty) b += l }
    b.result()
  }

  /** Read the committed snapshot: pointer → manifest → exactly those
    * files. `basePath` keeps hive-style partition columns (`d=...`)
    * derivable from the explicit file list. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, currentVersion(table).getOrElse(
      sys.error(s"Acid.read: no committed version at $table")))

  /** Time travel: read version `v` AS OF its commit. Every version's data
    * and manifest are immutable after the pointer flip (the [[commit]]
    * contract), so a historical read is byte-identical to what a reader
    * at that version saw — no matter how many commits landed since. At
    * 100 TB this is the audit/reproduce-a-training-run primitive Delta's
    * `VERSION AS OF` provides; retention GC (dropping versions older than
    * a horizon) is the only extra piece, deliberately out of scope.
    *
    * Manifest lines are `v=<n>/`-relative for snapshot commits
    * ([[commit]]) and table-root-relative (`# base:.` header) for
    * append-transaction tables ([[appendTxn]]), whose manifests reference
    * files across many `txn=<id>/` dirs. */
  def readVersion(spark: SparkSession, table: String, v: Long): DataFrame = {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.readVersion: no committed version at $table"))
    require(v >= 0 && v <= cur, s"version $v not committed (current is $cur)")
    val lines = manifestLines(table, v)
    val rootRel = lines.contains("# base:.")
    val files = lines.filterNot(_.startsWith("#"))
    if (rootRel) spark.read.parquet(files.map(f => s"$table/$f"): _*)
    else spark.read
      .option("basePath", s"$table/v=$v")
      .parquet(files.map(f => s"$table/v=$v/$f"): _*)
  }

  /** Commit `df` as the next version of `table`: write data, write the
    * manifest, then atomically flip the pointer. Returns the committed
    * version. `partitionCols` hive-partitions the data dir. */
  def commit(spark: SparkSession, table: String, df: DataFrame,
      partitionCols: Seq[String] = Nil): Long = {
    Files.createDirectories(Paths.get(table))
    val v = currentVersion(table).map(_ + 1).getOrElse(0L)
    val dataDir = Paths.get(table, s"v=$v")
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dataDir.toString)
    // manifest: every parquet file of this version, relative to v=<n>/
    val walk = Files.walk(dataDir)
    val files =
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .map[String](p => dataDir.relativize(p).toString)
        .sorted().toArray.map(_.toString)
      finally walk.close()
    require(files.nonEmpty, s"Acid.commit: empty version $v at $table")
    Files.write(Paths.get(table, s"manifest-$v.txt"),
      files.mkString("", "\n", "\n").getBytes("UTF-8"))
    // the commit point: readers see the old version until this rename
    // lands, the new one after — never anything in between
    val tmp = Paths.get(table, s"_current.tmp.$v")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, pointer(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Transaction ids already committed to an append table — the replay
    * ledger. Carried as `# txn:<id>` header lines in each manifest, so the
    * ledger rides the same immutable-manifest + atomic-pointer machinery
    * as the data (no second source of truth to keep consistent). */
  def committedTxns(table: String): Set[Long] = currentVersion(table) match {
    case None => Set.empty
    case Some(v) => manifestLines(table, v)
      .filter(_.startsWith("# txn:"))
      .map(_.stripPrefix("# txn:").trim.toLong).toSet
  }

  /** Idempotent append transaction — the exactly-once streaming-sink
    * primitive. Appends `df`'s rows as a new version whose manifest is
    * (previous files) + (this txn's files), tagged `# txn:<txnId>`. A
    * replayed transaction (micro-batch re-run after task retry or
    * checkpoint restart) finds its id in the committed ledger and
    * NO-OPS — at-least-once delivery from the engine becomes exactly-once
    * on the table. Data lands in `txn=<txnId>/` with overwrite BEFORE the
    * manifest references it, so a half-written replay never corrupts a
    * committed version (same ordering argument as [[commit]]).
    *
    * Single-writer per table, like [[commit]] — multi-writer needs
    * optimistic pointer CAS (Delta's protocol), out of scope. An empty
    * batch still commits a (data-less) version so its txn id enters the
    * ledger: replay of an empty batch must also be a no-op. */
  def appendTxn(spark: SparkSession, table: String, df: DataFrame,
      txnId: Long): Long = {
    Files.createDirectories(Paths.get(table))
    val cur = currentVersion(table)
    val prev = cur.map(manifestLines(table, _)).getOrElse(Seq.empty)
    require(cur.isEmpty || prev.contains("# base:."),
      s"appendTxn on snapshot-mode table $table")
    if (prev.contains(s"# txn:$txnId")) return cur.get // replay → no-op
    val root = Paths.get(table)
    val dataDir = root.resolve(s"txn=$txnId")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val walk = Files.walk(dataDir)
    val newFiles =
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .map[String](p => root.relativize(p).toString)
        .sorted().toArray.map(_.toString)
      finally walk.close()
    val v = cur.map(_ + 1).getOrElse(0L)
    val manifest = ("# base:." +:
      (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
      prev.filterNot(_.startsWith("#")) ++ newFiles
    Files.write(Paths.get(table, s"manifest-$v.txt"),
      manifest.mkString("", "\n", "\n").getBytes("UTF-8"))
    val tmp = Paths.get(table, s"_current.tmp.$v")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, pointer(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Drop the table directory (staging determinism for re-runnable keys:
    * each invocation rebuilds v=0/v=1 from scratch). */
  def reset(table: String): Unit = {
    val root = Paths.get(table)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
