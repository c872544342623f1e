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

  /** Read the committed snapshot: pointer → manifest → exactly those
    * files. `basePath` keeps hive-style partition columns (`d=...`)
    * derivable from the explicit file list. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      sys.error(s"Acid.read: no committed version at $table"))
    val lines = Files.readAllLines(Paths.get(table, s"manifest-$v.txt"))
    val files = {
      val it = lines.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) { val l = it.next().trim; if (l.nonEmpty) b += l }
      b.result()
    }
    spark.read
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
