package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{array, coalesce, col, concat, count, explode, expr, input_file_name, lit, max, min, struct, when}
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}

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

  /** Single-writer mutual exclusion per table, via atomic O_EXCL lock-file
    * creation — the POSIX stand-in for the optimistic pointer-CAS a real
    * table format runs against its log store (Delta: put-if-absent on
    * `<v>.json`; Iceberg: atomic swap on the catalog pointer). Two writers
    * that race an append serialize here, so version numbers never collide
    * and a manifest is never built against a stale predecessor. A crashed
    * holder leaves a stale lock; real implementations lease/CAS instead —
    * the bounded spin turns that into a loud error rather than a hang. */
  private def withWriterLock[T](table: String)(body: => T): T = {
    Files.createDirectories(Paths.get(table))
    val lock = Paths.get(table, "_lock")
    var spins = 0
    var acquired = false
    while (!acquired) {
      try { Files.createFile(lock); acquired = true }
      catch { case _: FileAlreadyExistsException =>
        spins += 1
        require(spins < 12000, s"Acid: writer-lock timeout on $table")
        Thread.sleep(5)
      }
    }
    try body finally Files.deleteIfExists(lock)
  }

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

  /** Current head's manifest lines — read-only view for sibling modules
    * (the bucketed DSv2 scan derives its partition map from these). */
  private[graft] def headLines(table: String): Seq[String] =
    manifestLines(table, currentVersion(table).getOrElse(
      sys.error(s"Acid.headLines: no committed version at $table")))

  /** Read the committed snapshot: pointer → manifest → exactly those
    * files. `basePath` keeps hive-style partition columns (`d=...`)
    * derivable from the explicit file list. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, currentVersion(table).getOrElse(
      sys.error(s"Acid.read: no committed version at $table")))

  /** Schema-evolution read: like [[read]] but unions the per-file schemas
    * (`mergeSchema`) so files written before a column existed surface it
    * as NULL — additive evolution without rewriting a byte of old data
    * (the Delta `mergeSchema` / Iceberg add-column contract; renames/type
    * changes need column-id mapping, out of scope). At 100 TB the merged
    * schema comes from the table's metadata, not a footer sweep — the
    * manifest seam is where that metadata would live; mergeSchema over
    * the manifest's explicit file list models the same read semantics. */
  def readEvolved(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      sys.error(s"Acid.readEvolved: no committed version at $table"))
    val lines = manifestLines(table, v)
    require(lines.contains("# base:."), s"readEvolved on snapshot-mode table $table")
    val files = lines.filterNot(_.startsWith("#"))
    // merge-on-read applies to evolved reads too (ADVICE r11: skipping the
    // subtraction here silently resurrected deleted rows)
    subtractDeletes(spark, table, lines,
      applyColumnDefaults(lines, applyColumnMapping(lines,
        readMergedSchema(spark, files.map(f => s"$table/$f")))))
  }

  /** Per-file parquet footer schemas, cached per (absolute path, size,
    * mtime) — data files behind a committed manifest are IMMUTABLE, so
    * their footer schema is manifest-grade metadata: at 100 TB the
    * manifest itself carries the schema (Delta's metaData action, Iceberg
    * field-ids) and a reader never sweeps footers. Caching the per-file
    * footer read models exactly that; it caches no query RESULT and no
    * row ever enters it. */
  private val fileSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Exact row count of an immutable parquet file, from its footer's
    * block metadata — the per-file `count(1)` every manifest writer needs,
    * without a Spark job (r20; the same immutable-file-metadata argument
    * as [[fileSchemaCache]]: at 100 TB writers harvest counts from the
    * footers they just produced). Cached per (path, size, mtime). */
  private val fileRowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def footerRowCount(spark: SparkSession, path: String): Long = {
    val abs = Paths.get(path).toAbsolutePath.normalize
    val key = s"$abs|${Files.size(abs)}|${Files.getLastModifiedTime(abs).toMillis}"
    fileRowCountCache.computeIfAbsent(key, _ => {
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        spark.sessionState.newHadoopConf(),
        new org.apache.hadoop.fs.Path(abs.toString),
        org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      java.lang.Long.valueOf(
        footer.getBlocks.stream.mapToLong(_.getRowCount).sum)
    }).longValue
  }

  /** The union-schema read every evolved/mixed-generation path uses, with
    * the footer sweep done once per file per JVM instead of one
    * DISTRIBUTED inference job per read (r20, opt guide §1.2/§5): each
    * file's schema comes from the cache (single driver-side footer read on
    * miss), the driver merges them with mergeSchema's field rules (first
    * file's field order, later-only fields appended, nullable OR-ed), and
    * the scan gets the merged schema EXPLICITLY. Files missing a column
    * surface NULL exactly as under mergeSchema. Any type conflict the
    * driver merge cannot reproduce falls back to the genuine mergeSchema
    * read (which would fail or widen per Spark's own rules). */
  private[graft] def readMergedSchema(spark: SparkSession,
      paths: Seq[String]): DataFrame = {
    def fileSchema(p: String): org.apache.spark.sql.types.StructType = {
      val abs = Paths.get(p).toAbsolutePath.normalize
      val key = s"$abs|${Files.size(abs)}|${Files.getLastModifiedTime(abs).toMillis}"
      fileSchemaCache.computeIfAbsent(key, _ => {
        // direct footer read + Spark's own parquet→Catalyst converter —
        // milliseconds per footer, no DataFrameReader resolution and no job
        val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          spark.sessionState.newHadoopConf(),
          new org.apache.hadoop.fs.Path(abs.toString),
          org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
        // Spark's own inference prefers the serialized Spark schema in the
        // footer's key-value metadata (ParquetFileFormat.readSchemaFromFooter)
        // — match it exactly; fall back to the parquet→Catalyst converter
        // for files Spark did not write
        val meta = footer.getFileMetaData
        Option(meta.getKeyValueMetaData.get("org.apache.spark.sql.parquet.row.metadata"))
          .flatMap(j => scala.util.Try(
            org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
          .getOrElse(new org.apache.spark.sql.execution.datasources.parquet
            .ParquetToSparkSchemaConverter(spark.sessionState.conf)
            .convert(meta.getSchema))
      })
    }
    def mergeTwo(a: org.apache.spark.sql.types.StructType,
        b: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
      val aNames = a.fieldNames.toSet
      val merged = a.fields.map { fa =>
        b.fields.find(_.name == fa.name) match {
          case Some(fb) =>
            require(fa.dataType == fb.dataType,
              s"readMergedSchema: type conflict on ${fa.name}")
            fa.copy(nullable = fa.nullable || fb.nullable)
          case None => fa
        }
      } ++ b.fields.filterNot(f => aNames(f.name))
      org.apache.spark.sql.types.StructType(merged)
    }
    try {
      val merged = paths.map(fileSchema).reduce(mergeTwo)
      spark.read.schema(merged).parquet(paths: _*)
    } catch { case _: IllegalArgumentException =>
      spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }
  }

  /** Resolve DEFAULT COLUMN VALUES over a merged-schema read — Delta's
    * `ALTER TABLE ... ADD COLUMN ... DEFAULT` for rows that PREDATE the
    * column: files written before the add lack the column entirely, so
    * the merged frame surfaces NULL there and `coalesce(col, default)`
    * fills it. Exactness contract: [[addColumnDefault]] auto-installs a
    * NOT NULL CHECK constraint on the column, so checked writers can
    * never store a real NULL that the fill would masquerade — NULL in the
    * merged frame always MEANS "row predates the column". */
  private def applyColumnDefaults(lines: Seq[String], df: DataFrame): DataFrame = {
    val defs = lines.filter(_.startsWith("# coldefault:")).map { l =>
      val body = l.stripPrefix("# coldefault:")
      val (c, e) = body.span(_ != '|')
      (c.trim, e.drop(1))
    }
    defs.foldLeft(df) { case (d, (c, e)) =>
      if (!d.columns.contains(c)) d.withColumn(c, expr(e))
      else d.withColumn(c, coalesce(col(c), expr(e)))
    }
  }

  /** ALTER TABLE ... ADD COLUMN ... DEFAULT — metadata-only (one
    * `# coldefault:` line): existing rows read the default via
    * [[readEvolved]] without a byte rewritten, and a NOT NULL CHECK
    * constraint on the column rides along so future checked appends
    * cannot store the ambiguous NULL. Idempotent per txnId; refuses a
    * second default for the same column (drop-and-re-add is the explicit
    * operator action, like tags). */
  def addColumnDefault(spark: SparkSession, table: String, colName: String,
      defaultSql: String, txnId: Long): Long = withWriterLock(table) {
    spark.range(1).select(expr(defaultSql)).collect() // must compile + evaluate
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isDefined, s"Acid.addColumnDefault: no committed version at $table")
      require(prev.contains("# base:."),
        s"addColumnDefault on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) // replay no-ops FIRST
      else {
        // the exactness contract (NULL always MEANS "row predates the
        // column") only holds for a NEW column — a default on an existing
        // column would masquerade genuinely stored NULLs as the default.
        // Checked after the replay guard so per-txnId idempotency holds
        // once the column exists BECAUSE of this very txn.
        require(!readEvolved(spark, table).columns.contains(colName),
          s"addColumnDefault: $colName already exists on $table — defaults " +
            "attach to NEW columns only (backfill stored NULLs explicitly)")
        None
      }
    } { (_, prev) =>
      require(!prev.exists(_.startsWith(s"# coldefault:$colName|")),
        s"addColumnDefault: $colName already has a default on $table")
      (("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:")) ++
        Seq(s"# coldefault:$colName|$defaultSql",
          s"# constraint:${colName}_default_notnull|$colName IS NOT NULL")) ++
        prev.filterNot(_.startsWith("#"))
    }
  }

  /** Evolution-metadata lines of version `v` (colmap/coldrop/coldefault) —
    * the schema-resolution state a streaming source pins at creation: a
    * live query compares the batch-end version's lines against its pinned
    * copy and fails loudly on any delta (Delta's streaming contract — a
    * schema change under a running stream is a restart, never a silent
    * re-shape). Order-preserving, so chained renames compare faithfully. */
  private[graft] def evolutionLines(table: String, v: Long): Seq[String] =
    manifestLines(table, v).filter(l => l.startsWith("# colmap:") ||
      l.startsWith("# coldrop:") || l.startsWith("# coldefault:"))

  /** True iff the CURRENT manifest carries any evolution metadata — the
    * switch that routes a streaming source's creation schema (and its
    * batch reads) through the logical-frame resolution. */
  private[graft] def hasEvolution(table: String): Boolean =
    currentVersion(table).exists(v => evolutionLines(table, v).nonEmpty)

  /** Apply the given evolution lines (colmap then defaults) to a
    * merged-schema frame — the shared resolution step of [[readEvolved]],
    * exposed for the acid streaming source's restart path (old-generation
    * files delivered after an evolution commit must surface renamed /
    * defaulted columns exactly as batch reads do). */
  private[graft] def resolveEvolution(lines: Seq[String], df: DataFrame): DataFrame =
    applyColumnDefaults(lines, applyColumnMapping(lines, df))

  /** Resolve the manifest's COLUMN MAPPING over a merged-schema read —
    * the Delta column-mapping / Iceberg field-id contract scoped to the
    * manifest seam: `# colmap:<old>|<new>` lines record renames (applied
    * in recorded order, so chained renames compose), `# coldrop:<name>`
    * lines record drops. Files written BEFORE a rename carry the old
    * physical name, files written after carry the new one — the merged
    * frame has both columns, and `coalesce(new, old) AS new` stitches
    * them; a table where every old-named file has since been rewritten
    * degrades to a plain rename. Zero data bytes move for either
    * operation. */
  private def applyColumnMapping(lines: Seq[String], df: DataFrame): DataFrame = {
    val steps = lines.filter(_.startsWith("# colmap:")).map { l =>
      val Array(o, n) = l.stripPrefix("# colmap:").split('|'); (o.trim, n.trim)
    }
    val drops = lines.filter(_.startsWith("# coldrop:"))
      .map(_.stripPrefix("# coldrop:").trim)
    if (steps.isEmpty && drops.isEmpty) return df
    val renamed = steps.foldLeft(df) { case (d, (o, n)) =>
      if (!d.columns.contains(o)) d // every old-named file since rewritten
      else if (!d.columns.contains(n)) d.withColumnRenamed(o, n)
      else d.withColumn(n, coalesce(col(n), col(o))).drop(o)
    }
    drops.foldLeft(renamed)((d, c) => if (d.columns.contains(c)) d.drop(c) else d)
  }

  /** Resolve a wall-clock instant to the table version committed AT OR
    * BEFORE it — Delta's `TIMESTAMP AS OF` resolution rule (greatest
    * version whose commit time ≤ the asked instant; commit time = the
    * manifest file's mtime, which the atomic CREATE_NEW write stamps).
    * Fails loudly when the instant predates the first readable version
    * (Delta does too) or when it has been vacuumed past. O(readable
    * versions) file stats — control plane. */
  def versionAsOf(table: String, millis: Long): Long = {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.versionAsOf: no committed version at $table"))
    val cands = (horizon(table) to cur).filter { v =>
      Files.getLastModifiedTime(
        Paths.get(table, s"manifest-$v.txt")).toMillis <= millis
    }
    require(cands.nonEmpty,
      s"versionAsOf: no readable version of $table committed at or before " +
        s"$millis (first readable is ${horizon(table)})")
    cands.max
  }

  /** True iff the current manifest carries column-mapping lines — the
    * switch SQL reads use to route through [[readEvolved]] (the mapping-
    * aware path) instead of the plain scan. */
  def hasColumnMapping(table: String): Boolean =
    currentVersion(table).exists(v => manifestLines(table, v).exists(l =>
      l.startsWith("# colmap:") || l.startsWith("# coldrop:")))

  /** RENAME a column metadata-only — Delta `ALTER TABLE ... RENAME
    * COLUMN` under column mapping: one `# colmap:` manifest line, zero
    * data files touched (old files keep their bytes and their physical
    * name; [[readEvolved]] resolves them under the new logical name).
    * Appends after the rename simply write the new name — the mapping
    * stitches the generations. Refuses to rename the standing
    * delete-vector key (the vector files carry the physical name; remap
    * would silently stop hiding rows) — [[compactDeletes]] first.
    * Idempotent per txnId. */
  def renameColumn(table: String, from: String, to: String,
      txnId: Long): Long = withWriterLock(table) {
    require(from.nonEmpty && to.nonEmpty && from != to,
      s"renameColumn: bad rename $from -> $to")
    require(!from.contains("|") && !to.contains("|"),
      "renameColumn: '|' is the colmap separator")
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isDefined, s"Acid.renameColumn: no committed version at $table")
      require(prev.contains("# base:."),
        s"renameColumn on snapshot-mode table $table")
      require(!prev.contains(s"# delkey:$from"),
        s"renameColumn: $from is the standing delete-vector key — " +
          s"compactDeletes before renaming it")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (_, prev) =>
      // column defaults (and their auto NOT NULL constraint) follow the
      // rename — a stale name would materialize a phantom all-default
      // column and leave the real one unfilled
      def renamed(l: String): String =
        if (l.startsWith(s"# coldefault:$from|"))
          "# coldefault:" + to + l.stripPrefix(s"# coldefault:$from")
        else if (l == s"# constraint:${from}_default_notnull|$from IS NOT NULL")
          s"# constraint:${to}_default_notnull|$to IS NOT NULL"
        else l
      ("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:")).map(renamed) ++
        Seq(s"# colmap:$from|$to") ++
        prev.filterNot(_.startsWith("#"))
    }
  }

  /** DROP a column metadata-only — one `# coldrop:` manifest line; the
    * bytes stay in the files (like Delta's mapping-mode drop, the data
    * is unreadable, not erased — GDPR-grade removal is [[eraseKeys]]'
    * territory), reads through [[readEvolved]] no longer surface it.
    * Idempotent per txnId. */
  def dropColumn(table: String, name: String, txnId: Long): Long =
    withWriterLock(table) {
      require(!name.contains("|"), "dropColumn: '|' is the colmap separator")
      commitNextVersion(table) { (cur, prev) =>
        require(cur.isDefined, s"Acid.dropColumn: no committed version at $table")
        require(prev.contains("# base:."),
          s"dropColumn on snapshot-mode table $table")
        require(!prev.contains(s"# delkey:$name"),
          s"dropColumn: $name is the standing delete-vector key")
        if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
      } { (_, prev) =>
        ("# base:." +:
          (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
          prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
            !l.startsWith("# base:") && !l.startsWith("# op:") &&
            // a dropped column takes its default and the default's auto
            // NOT NULL constraint with it — otherwise the drop resurrects
            // the column fully populated with the default
            !l.startsWith(s"# coldefault:$name|") &&
            l != s"# constraint:${name}_default_notnull|$name IS NOT NULL") ++
          Seq(s"# coldrop:$name") ++
          prev.filterNot(_.startsWith("#"))
      }
    }

  /** Merge-on-read: subtract the manifest's standing equality-delete
    * vectors from `base`. The delete set is tiny relative to the data, so
    * AQE broadcasts it and the data side never shuffles — the read-path
    * cost deleteTxn's O(keys) commit defers to here. Shared by every read
    * path that resolves a manifest ([[readVersion]], [[readEvolved]]). */
  /** SQL-side path normalization (fold `..`/`.`/empty segments) so a
    * vector row's `<root>/<f>` concat compares equal to the driver-side
    * `Paths.normalize` string even across shallow-clone generations
    * (where `f` itself carries `../` hops). HOF-only — stays in codegen. */
  private def normPathExpr(inner: String): String =
    s"concat('/', array_join(aggregate(split($inner, '/'), " +
      "cast(array() as array<string>), " +
      "(acc, x) -> case when x = '..' then slice(acc, 1, size(acc) - 1) " +
      "when x = '.' or x = '' then acc " +
      "else concat(acc, array(x)) end), '/'))"

  private def subtractDeletes(spark: SparkSession, table: String,
      lines: Seq[String], base0: DataFrame): DataFrame = {
    // POSITIONAL vectors first (Iceberg v2 positional deletes / Delta
    // deletion vectors): (file, row-position) pairs anti-join against the
    // scan's own provenance (`_metadata.row_index` + a broadcast O(files)
    // uri→relpath map). Must run BEFORE the equality anti-join — provenance
    // columns only resolve on the raw file scan.
    val pdelFiles = lines.filter(_.startsWith("# pdel:"))
      .map(_.stripPrefix("# pdel:").trim)
    val base = if (pdelFiles.isEmpty) base0 else {
      val cols = base0.columns.toSeq
      val files = lines.filterNot(_.startsWith("#"))
      // join on NORMALIZED ABSOLUTE paths: vector rows store paths relative
      // to the root of the table that WROTE the vector, which after a
      // shallow clone is not this table's root — each vector file's own
      // location (…/<root>/pdel=<txn>/…) names that root, so resolving
      // against it keeps zero-copy clones honoring inherited vectors
      val uriMap = spark.createDataFrame(files.map { f =>
        val p = Paths.get(table, f).toAbsolutePath.normalize
        (p.toUri.toString, p.toString)
      }).toDF("__uri", "__abs")
      val pd = pdelFiles.map { pf =>
        val root = Paths.get(table, pf).toAbsolutePath.normalize
          .getParent.getParent
        spark.read.parquet(s"$table/$pf")
          .select(expr(normPathExpr(s"concat('$root/', f)")).as("__abs"),
            col("pos").as("__pp"))
      }.reduce(_ unionByName _).distinct()
      val tagged = try base0
        .withColumn("__uri", input_file_name())
        .withColumn("__pp", col("_metadata.row_index"))
      catch { case e: org.apache.spark.sql.AnalysisException => sys.error(
        s"positional delete vectors on $table need file provenance this " +
          s"read path cannot carry — compactDeletes first (${e.getMessage})") }
      tagged
        .join(org.apache.spark.sql.functions.broadcast(uriMap), Seq("__uri"), "left")
        .join(pd, Seq("__abs", "__pp"), "left_anti")
        .select(cols.map(col): _*)
    }
    val delFiles = lines.filter(_.startsWith("# delete:"))
      .map(_.stripPrefix("# delete:").trim)
    lines.find(_.startsWith("# delkey:")).map(_.stripPrefix("# delkey:").trim) match {
      case Some(k) if delFiles.nonEmpty =>
        val dels = spark.read.parquet(delFiles.map(f => s"$table/$f"): _*)
          .select(col(k)).distinct()
        base.join(dels, Seq(k), "left_anti")
      case _ => base
    }
  }

  /** The raw snapshot WITH row provenance — each visible row tagged with
    * its data file (`_file`, table-relative) and row position (`_pos`).
    * This is how a caller BUILDS a positional delete vector: compute the
    * doomed rows' (file, pos) pairs here, hand them to
    * [[deletePositionsTxn]] — e.g. exact dedup materialized as O(dups)
    * metadata instead of an O(table) rewrite. Standing vectors (both
    * kinds) already subtracted, so survivors-of-record are what you see. */
  def readPositions(spark: SparkSession, table: String): DataFrame = {
    val lines = headLines(table)
    val files = lines.filterNot(_.startsWith("#"))
    val base = spark.read.parquet(files.map(f => s"$table/$f"): _*)
    val cols = base.columns.toSeq
    val uriMap = spark.createDataFrame(files.map { f =>
      val p = Paths.get(table, f).toAbsolutePath.normalize
      (p.toUri.toString, f, p.toString)
    }).toDF("__uri", "_file", "__abs")
    val tagged = base
      .withColumn("__uri", input_file_name())
      .withColumn("_pos", col("_metadata.row_index"))
      .join(org.apache.spark.sql.functions.broadcast(uriMap), Seq("__uri"))
      .select((cols.map(col) :+ col("_file") :+ col("_pos") :+ col("__abs")): _*)
    // subtract standing vectors by hand (the helper would re-tag); vector
    // rows resolve against the root that WROTE them (clone-safe, same
    // rule as subtractDeletes)
    val pdelFiles = lines.filter(_.startsWith("# pdel:"))
      .map(_.stripPrefix("# pdel:").trim)
    val p1 = if (pdelFiles.isEmpty) tagged else {
      val pd = pdelFiles.map { pf =>
        val root = Paths.get(table, pf).toAbsolutePath.normalize
          .getParent.getParent
        spark.read.parquet(s"$table/$pf")
          .select(expr(normPathExpr(s"concat('$root/', f)")).as("__abs"),
            col("pos").as("_pos"))
      }.reduce(_ unionByName _).distinct()
      tagged.join(pd, Seq("__abs", "_pos"), "left_anti")
    }
    val delFiles = lines.filter(_.startsWith("# delete:"))
      .map(_.stripPrefix("# delete:").trim)
    val p2 = lines.find(_.startsWith("# delkey:"))
      .map(_.stripPrefix("# delkey:").trim) match {
      case Some(k) if delFiles.nonEmpty =>
        val dels = spark.read.parquet(delFiles.map(f => s"$table/$f"): _*)
          .select(col(k)).distinct()
        p1.join(dels, Seq(k), "left_anti")
      case _ => p1
    }
    p2.drop("__abs")
  }

  /** List a just-written directory's parquet files, table-relative,
    * sorted — the shape every vector/branch/cdc writer needs. */
  private def listParquet(table: String, dir: Path): Seq[String] = {
    val walk = Files.walk(dir)
    try walk.filter(p => p.toString.endsWith(".parquet"))
      .map[String](p => Paths.get(table).relativize(p).toString)
      .sorted().toArray.map(_.toString).toSeq
    finally walk.close()
  }

  /** MoR POSITIONAL delete — hide specific row OCCURRENCES by (file,
    * position), the operation equality vectors structurally cannot
    * express (an equality key hides EVERY copy; a position hides exactly
    * one). `positions` carries (`f`: table-relative file, `pos`: row
    * index) — typically computed from [[readPositions]]. One O(positions)
    * metadata commit (`# pdel:` vector files), zero data files touched;
    * vectors accumulate across commits and fold away at the next
    * rewrite/compaction (which reads the subtracted state). Change feeds
    * refuse windows crossing a positional-delete commit (like Delta DVs,
    * row-level feeds need CDC materialization for this commit class).
    * Idempotent per txnId. */
  def deletePositionsTxn(spark: SparkSession, table: String,
      positions: DataFrame, txnId: Long, cdc: Boolean = false): Long =
    withWriterLock(table) {
    lazy val delFiles: Seq[String] = { // at most once
      // land the vector FIRST, then validate from the WRITTEN file: the
      // old order ran the caller's `positions` plan twice (a distinct-file
      // collect probe, then the write) — and `positions` is typically a
      // full window/anti-join chain over the table (r20, opt guide §1.2).
      // A failed validation leaves only an uncommitted pdel= dir that
      // vacuum GCs — the same contract as writeTxnDataChecked's
      // constraint-violation path.
      val delDir = Paths.get(table).resolve(s"pdel=$txnId")
      positions.select(col("f").cast("string").as("f"),
          col("pos").cast("long").as("pos")).distinct()
        .coalesce(1).write.mode("overwrite").parquet(delDir.toString)
      val written = listParquet(table, delDir)
      // a position naming a file outside the manifest would silently hide
      // NOTHING — for a delete primitive that is the dangerous failure
      // mode (the caller believes rows are gone), so refuse loudly
      val known = headLines(table).filterNot(_.startsWith("#")).toSet
      val badRows = spark.read.parquet(written.map(f => s"$table/$f"): _*)
        .select(col("f")).distinct()
        .collect().map(_.getString(0)).filterNot(known) // O(distinct files)
      require(badRows.isEmpty,
        s"deletePositionsTxn: position(s) name files not in $table's " +
          s"manifest: ${badRows.take(3).mkString(", ")}")
      written
    }
    // CDC materialization (Delta's change-data-feed files for DV commits):
    // the doomed rows' FULL PREIMAGES land as a change file, so row-level
    // feeds can cross this commit instead of refusing. Cost is O(files
    // containing a doomed position) — the same files the delete touched.
    // The semi-join probe side reads the WRITTEN vector (forcing delFiles
    // first), never re-running the caller's positions plan (r20).
    lazy val cdcFiles: Seq[String] = { // at most once
      val cdcDir = Paths.get(table).resolve(s"cdc=$txnId")
      val vec = spark.read.parquet(delFiles.map(f => s"$table/$f"): _*)
        .select(col("f").as("_file"), col("pos").as("_pos"))
      readPositions(spark, table)
        .join(vec, Seq("_file", "_pos"), "left_semi")
        .drop("_file", "_pos")
        .coalesce(1).write.mode("overwrite").parquet(cdcDir.toString)
      listParquet(table, cdcDir)
    }
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isDefined,
        s"Acid.deletePositionsTxn: no committed version at $table")
      require(prev.contains("# base:."),
        s"deletePositionsTxn on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (v, prev) =>
      (("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:")) ++
        delFiles.map(f => s"# pdel:$f") ++
        (if (cdc) cdcFiles.map(f => s"# cdc:$v|$f") else Seq.empty)) ++
        prev.filterNot(_.startsWith("#"))
    }
  }

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
    require(v >= horizon(table),
      s"version $v vacuumed (retention horizon is ${horizon(table)})")
    val lines = manifestLines(table, v)
    val rootRel = lines.contains("# base:.")
    val files = lines.filterNot(_.startsWith("#"))
    // Time travel is LOGICAL-frame (r19, lifting the documented-raw
    // caveat): version v resolves through v's OWN colmap/coldefault lines
    // — an evolved snapshot surfaces post-rename names and default-filled
    // values exactly as a live read of that version did, while a
    // PRE-evolution version carries no evolution lines and reads its own
    // raw schema (the table as it then was — Delta's rule). The pre-r19
    // plain scan let an arbitrary footer win inference on
    // mixed-generation versions.
    val base =
      if (rootRel) readLogical(spark, table, lines, files)
      else spark.read
        .option("basePath", s"$table/v=$v")
        .parquet(files.map(f => s"$table/v=$v/$f"): _*)
    subtractDeletes(spark, table, lines, base)
  }

  /** Commit `df` as the next version of `table`: write data, write the
    * manifest, then atomically flip the pointer. Returns the committed
    * version. `partitionCols` hive-partitions the data dir.
    *
    * `stats` optionally records a per-file zone map in the manifest:
    * `(name, expr)` computes min/max of the long-valued `expr` for each
    * written file (`# minmax:<file>|<name>|<min>|<max>` header lines), the
    * same footer statistics Delta/Iceberg carry per data file. Here they
    * cost one narrow re-read of the just-written version (fixture scale);
    * at 100 TB writers harvest them from the parquet footers they just
    * produced — zero extra reads. [[readSkipping]] is the consumer. */
  // ---- file-level bloom filters (point-lookup skipping) ----
  // m = 4096 bits (64 int64 words), k = 2 positions per key. The position
  // arithmetic pre-mods the key to ≤ 10^6 so every product stays far below
  // int64 under ANSI, and is duplicated EXACTLY in [[bloomPositions]]
  // (driver side) and [[commit]]'s column expressions (executor side) —
  // the bit a writer sets is provably the bit a reader probes. The mixer
  // is two Lehmer steps mod the Mersenne prime 2³¹−1: reducing by a PRIME
  // before the power-of-two bit-mod matters — an affine map straight into
  // mod 4096 stays affine, so bucket-clustered keys (k ≡ c mod 8) would
  // concentrate into a gcd-coset and saturate it (measured: absent-key
  // false positives on every file before this).
  private[ops] val BloomBits = 4096 // floor width; real width adapts to NDV
  /** Per-file bloom lines over a long-valued expr, one pass of bit_or
    * aggregates (fully distributed — no per-file driver collect of keys).
    * The filter WIDTH is ADAPTIVE (r16 sf10 lesson: a fixed 4096-bit
    * filter saturates at ~19k keys/file and prunes nothing — parquet
    * sizes its blooms by NDV for the same reason): a first O(files)
    * approx-NDV pass picks the smallest power of two ≥ 16 bits/key for
    * the densest file (k = 2 probes → ~12.5% fill → ~1.5% FPR at any
    * scale), floored at 4096 and capped at 2²⁰ (16 KiB of words per file
    * line — manifest text, not data). Readers derive the width from the
    * stored word count, so mixed-width generations coexist in one
    * manifest. Shared by [[commit]] (snapshot mode, `v=<n>`-relative
    * paths) and [[optimize]] (append mode, root-relative): the `relTo`
    * prefix is what keeps the stat key identical to the manifest's
    * data-file line. */
  private def bloomLines(spark: SparkSession, paths: Seq[String],
      relTo: Path, name: String, expr0: Column): Seq[String] = {
    // O(files) control plane. Degenerate inputs must behave like the old
    // fixed-width path (ADVICE r16): an all-empty file set groups to zero
    // rows, so max(ndv) is NULL — fall back to 1 key (floor width) instead
    // of NPEing; optimize-after-delete-all is a legal maintenance call.
    val maxNdv = Option(spark.read.parquet(paths: _*)
      .groupBy(input_file_name())
      .agg(org.apache.spark.sql.functions.approx_count_distinct(expr0).as("ndv"))
      .agg(max(col("ndv"))).head.get(0)).fold(1L)(_.asInstanceOf[Long])
    val bits = math.min(1L << 20,
      math.max(BloomBits.toLong, java.lang.Long.highestOneBit(
        math.max(1L, 16L * maxNdv - 1)) << 1)).toInt
    val words = bits / 64
    // aggregate per (file, word) GROUP, not per-word agg columns: a wide
    // filter as thousands of bit_or columns blows codegen and the hash
    // map (OOM observed at 2²⁰ bits); as groups the shuffle carries at
    // most min(2·ndv, words) rows per file
    // pre-mod domain 2^31-1 (r19): the old 10^6 pre-mod collapsed keys
    // beyond a million into shared residues — at sf1 the orders domain
    // (6M keys) covered every residue ~6x, so every file's bloom matched
    // every probe and pruning silently degraded to "rewrite everything".
    // 2^31-1 keeps y*48271 ≤ 1.04e14, far under Long/ANSI overflow, and
    // restores discriminative power to any practical key domain. The
    // hash generation is VERSIONED in the stat line (`|h2|` token,
    // ADVICE r19): readers probe versioned blooms with the new position
    // pair only, and keep the dual-generation probe solely for
    // unversioned legacy lines — without the marker every bloom paid the
    // legacy pair's chance matches forever (~double the FPR).
    val positions = spark.read.parquet(paths: _*)
      .withColumn("__y", org.apache.spark.sql.functions.pmod(expr0, org.apache.spark.sql.functions.lit(2147483647L)))
      .withColumn("__h1", org.apache.spark.sql.functions.expr("(__y * 48271) % 2147483647"))
      .withColumn("__p1", org.apache.spark.sql.functions.expr(s"__h1 % $bits"))
      .withColumn("__p2", org.apache.spark.sql.functions.expr(s"(__h1 * 48271) % 2147483647 % $bits"))
    val wordRows = positions
      .select(input_file_name().as("f"), col("__p1").as("p"))
      .unionAll(positions.select(input_file_name().as("f"), col("__p2").as("p")))
      // NULL keys hash to NULL positions: drop them (ADVICE r16 — a null
      // word index NPEd below). A null key is simply not representable in
      // the filter; readers never probe null, so pruning stays sound.
      .filter(col("p").isNotNull)
      .groupBy(col("f"), org.apache.spark.sql.functions.expr("p div 64").as("w"))
      .agg(org.apache.spark.sql.functions.bit_or(
        org.apache.spark.sql.functions.expr(
          "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")).as("bits"))
      .collect() // O(files × set words) rows — manifest control plane
    wordRows.groupBy(r => r.getString(0)).map { case (file, rs) =>
      val arr = new Array[Long](words)
      rs.foreach(r => arr(r.getLong(1).toInt) = r.getLong(2))
      val rel = relTo.relativize(Paths.get(java.net.URI.create(file))).toString
      s"# bloom:$rel|$name|h2|${arr.mkString(",")}"
    }.toSeq.sorted
  }

  /** Probe positions for a `bits`-wide filter — duplicated EXACTLY from
    * the column expressions in [[bloomLines]]; `bits` comes from the
    * stored word count at read time. */
  private[ops] def bloomPositions(key: Long, bits: Int = BloomBits): (Int, Int) = {
    val y = Math.floorMod(key, 2147483647L) // domain 2^31-1, see bloomLines
    val h1 = (y * 48271L) % 2147483647L
    val h2 = (h1 * 48271L) % 2147483647L
    ((h1 % bits).toInt, (h2 % bits).toInt)
  }

  /** Atomic O_EXCL create of `claim-<v>` — the single version-coordination
    * point shared by EVERY writer, lock-path and CAS alike: exactly one
    * claimant ever builds `manifest-<v>` (ADVICE r11: with claims only on
    * the CAS path, a lock-path writer racing a CAS writer could both build
    * the same version and the later pointer flip silently discarded the
    * other's committed transaction). Returns true iff this caller owns v. */
  private def claimVersion(table: String, v: Long): Boolean =
    try { Files.createFile(Paths.get(table, s"claim-$v")); true }
    catch { case _: FileAlreadyExistsException => false }

  /** Staleness horizon for claim expiry (ms). Generous on purpose: a live
    * claimant slower than this that later commits would race its
    * reclaimer — production protocols lease claims instead (Delta's LogStore
    * put-if-absent entries are owned by a finished request by construction).
    * Mutable only so the expiry path is testable without a 2-minute sleep. */
  @volatile private[graft] var ClaimStaleMs = 120000L

  /** Expire a wedged claim (ADVICE r12: a claimant that crashed after the
    * O_EXCL create but before the pointer flip otherwise blocks every later
    * writer forever — vacuum only GCs claims BELOW the horizon, which can
    * never advance past the wedge). A claim is reclaimable iff it is older
    * than [[ClaimStaleMs]] and `manifest-<v>` never appeared (the crash
    * window is entirely before the manifest write). Reclaim is an atomic
    * rename of the stale claim aside — exactly one racer wins the move, so
    * at most one writer retries into the freed slot. Returns true if a
    * stale claim was cleared. Manual recovery (documented escape hatch):
    * delete `claim-<v>` by hand after verifying no writer is live. */
  private def expireStaleClaim(table: String, v: Long): Boolean = {
    val claim = Paths.get(table, s"claim-$v")
    try {
      if (Files.exists(claim) && !Files.exists(Paths.get(table, s"manifest-$v.txt")) &&
          System.currentTimeMillis() - Files.getLastModifiedTime(claim).toMillis > ClaimStaleMs) {
        Files.move(claim, Paths.get(table, s"claim-$v.stale.${System.nanoTime()}"),
          StandardCopyOption.ATOMIC_MOVE)
        true
      } else false
    } catch { case _: java.io.IOException => false } // lost the reclaim race
  }

  /** The shared optimistic-commit loop: read the current table state, let
    * `precheck(cur, prev)` short-circuit (Some(result) = return without
    * claiming — replay no-ops and stale-snapshot aborts), claim the next
    * version, and commit `build(v, prev)`'s manifest. A lost claim means a
    * concurrent writer owns v: spin until its pointer flip is visible (or
    * its crash surfaces as a loud timeout), then rebase against the
    * advanced state. Lock-path writers call this while holding `_lock`
    * (serializing against each other); CAS writers call it bare — the
    * claim is what serializes the two populations against each other. */
  private def commitNextVersion(table: String)(
      precheck: (Option[Long], Seq[String]) => Option[Long])(
      build: (Long, Seq[String]) => Seq[String]): Long = {
    var spins = 0
    var out = -1L
    var done = false
    while (!done) {
      val cur = currentVersion(table)
      val prev = cur.map(manifestLines(table, _)).getOrElse(Seq.empty)
      precheck(cur, prev) match {
        case Some(short) => out = short; done = true
        case None =>
          val v = cur.map(_ + 1).getOrElse(0L)
          if (claimVersion(table, v)) {
            // manifest-<v> is opened CREATE_NEW: if our claim was expired as
            // stale by a reclaimer whose winner already committed v, the
            // write fails here (never silently overwriting the other
            // writer's manifest — ADVICE r13) and we rebase against the
            // advanced state like any other lost race. A manifest present
            // with the pointer still BELOW v is an orphan from a crashed
            // run — unrecoverable without operator action, so fail loudly.
            try { out = commitManifest(table, v, build(v, prev)); done = true }
            catch { case e: FileAlreadyExistsException =>
              // brief wait for a racing winner's pointer flip before calling
              // the manifest an orphan
              var waits = 0
              while (!currentVersion(table).exists(_ >= v) && waits < 400) {
                waits += 1; Thread.sleep(5)
              }
              if (!currentVersion(table).exists(_ >= v)) throw new IllegalStateException(
                s"Acid: orphan manifest-$v.txt at $table (crashed writer left " +
                  s"a manifest without flipping the pointer) — remove it and " +
                  s"claim-$v to recover", e)
            }
          }
          else {
            spins += 1
            // a claim held past the staleness horizon with no manifest is a
            // crashed claimant — reclaim it instead of spinning to the
            // timeout (see [[expireStaleClaim]])
            if (!expireStaleClaim(table, v)) {
              require(spins < 12000,
                s"Acid: version-claim timeout on $table v$v (if no writer is " +
                  s"live, remove claim-$v to recover)")
              Thread.sleep(5)
            }
          }
      }
    }
    out
  }

  /** Snapshot commit. `txnId` makes it IDEMPOTENT (the foreachBatch
    * exactly-once contract for non-append sinks, Delta's `txnAppId`/
    * `txnVersion` shape): the id rides the manifest's `# txn:` ledger, a
    * replayed commit whose id is already in the ledger no-ops — so a
    * restarted micro-batch that re-commits derived state (e.g. an
    * incrementally-maintained MV) can never double-apply its delta. */
  def commit(spark: SparkSession, table: String, df: DataFrame,
      partitionCols: Seq[String] = Nil,
      stats: Option[(String, Column)] = None,
      bloom: Option[(String, Column)] = None,
      rowCounts: Boolean = false,
      txnId: Option[Long] = None): Long = withWriterLock(table) {
    commitNextVersion(table)((cur, prev) =>
      txnId.filter(t => prev.contains(s"# txn:$t")).map(_ => cur.get)) { (v, prev) =>
    val ledger = txnId.toSeq.flatMap(t =>
      prev.filter(_.startsWith("# txn:")) :+ s"# txn:$t")
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
    val abs = dataDir.toAbsolutePath
    // input_file_name yields a file: URI — relativize through Path so
    // the stat key matches the manifest's data-file lines exactly
    def relOf(r: org.apache.spark.sql.Row): String =
      abs.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString
    val statLines = stats.toSeq.flatMap { case (name, expr) =>
      spark.read.parquet(dataDir.toString)
        .groupBy(input_file_name().as("f"))
        .agg(min(expr).as("lo"), max(expr).as("hi"))
        .collect() // O(files) rows — manifest-construction control plane
        .map(r => s"# minmax:${relOf(r)}|$name|${r.getLong(1)}|${r.getLong(2)}")
        .sorted
    }
    // per-file 4096-bit bloom over a long-valued expr: one pass computing
    // all 64 words as bit_or aggregates (fully distributed — no per-file
    // driver collect of keys). Parquet can carry column blooms in the
    // footer (parquet.bloom.filter.enabled); recording them at the
    // MANIFEST level is what lets a point lookup prune the file list
    // before any footer I/O — Iceberg's puffin-file shape. At 100 TB
    // writers harvest these from the footers they just produced.
    val bloomStatLines = bloom.toSeq.flatMap { case (name, expr0) =>
      bloomLines(spark, Seq(dataDir.toString), dataDir.toAbsolutePath, name, expr0)
    }
    // per-file row counts (`# rows:<file>|<n>`): the statistic that lets
    // COUNT(*)-shaped queries be answered from the manifest alone —
    // O(files) arithmetic, zero data I/O. At 100 TB writers take these
    // from the parquet footers they just wrote (free); the re-read here
    // is fixture-scale convenience, same as the zone-map path above.
    // per-file row counts come straight from the parquet FOOTERS the write
    // just produced (r20) — exactly the "writers take these from the
    // footers (free)" note above, now literal: zero Spark jobs, exact
    // counts. Empty part files carry no line, matching the old
    // groupBy(file) behavior (an empty file groups to no row).
    val rowLines = if (!rowCounts) Seq.empty else files.toSeq
      .map(f => f -> footerRowCount(spark, abs.resolve(f).toString))
      .filter(_._2 > 0)
      .map { case (f, n) => s"# rows:$f|$n" }.sorted
    ledger ++ statLines ++ bloomStatLines ++ rowLines ++ files.toSeq
    }
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
      txnId: Long): Long = withWriterLock(table) {
    lazy val newFiles = writeTxnData(spark, table, df, txnId) // written at most once
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isEmpty || prev.contains("# base:."),
        s"appendTxn on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None // replay → no-op
    } { (_, prev) =>
      // standing delete vectors ride along: an append does not resurrect
      // previously deleted keys
      appendManifest(prev, txnId, newFiles)
    }
  }

  /** Land `df` under `txn=<id>/` (overwrite — a replayed write overwrites
    * its own output) and return the table-relative file list. */
  private def writeTxnData(spark: SparkSession, table: String, df: DataFrame,
      txnId: Long): Seq[String] = {
    val dataDir = Paths.get(table).resolve(s"txn=$txnId")
    df.write.mode("overwrite").parquet(dataDir.toString)
    listParquet(table, dataDir)
  }

  /** Write a DML rewrite frame, then run the standing CHECK constraints
    * over the files that were ACTUALLY WRITTEN (ADVICE r18: a pre-write
    * constraint aggregate is a separate Spark action from the write — a
    * nondeterministic change plan or SET expression could pass the check
    * and then write different, violating rows; validating the written
    * bytes closes the two-action gap, the same reason mergeCowLineage
    * freezes its change frame). A violation throws BEFORE commit, leaving
    * only an uncommitted txn= dir that vacuum GCs. */
  private def writeTxnDataChecked(spark: SparkSession, table: String,
      df: DataFrame, txnId: Long, lines: Seq[String],
      what: String): Seq[String] = {
    val files = writeTxnData(spark, table, df, txnId)
    if (files.nonEmpty && lines.exists(_.startsWith("# constraint:")))
      checkConstraintLines(lines,
        spark.read.parquet(files.map(f => s"$table/$f"): _*), what)
    files
  }

  /** The append-commit manifest: predecessor's ledger + this txn, standing
    * delete vectors carried forward, predecessor's files + the new ones. */
  private def appendManifest(prev: Seq[String], txnId: Long,
      newFiles: Seq[String]): Seq[String] =
    ("# base:." +:
      (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
      prev.filter(l => l.startsWith("# delkey:") || l.startsWith("# delete:") ||
        l.startsWith("# pval:") || l.startsWith("# pspec:") ||
        l.startsWith("# constraint:") ||
        // column mapping is table metadata — it survives every append
        // (dropping it would un-rename the table on the next commit)
        l.startsWith("# colmap:") || l.startsWith("# coldrop:") ||
        // per-file stats describe PHYSICAL files an append never touches —
        // dropping them here would blind skipping/erase after any append
        l.startsWith("# minmax:") || l.startsWith("# bloom:") ||
        l.startsWith("# rows:") ||
        // row-lineage assignments are per-PHYSICAL-file and the high-water
        // mark is table metadata — both survive every append
        l.startsWith("# firstrow:") || l.startsWith("# rowid_phys:") ||
        l.startsWith("# rowid_next:") || l.startsWith("# coldefault:") ||
        l.startsWith("# pdel:") || l.startsWith("# prop:") ||
        // branch-op log lines ride branch manifests only (appendTxnBranch
        // routes through here); fastForwardBranch strips them at publish
        l.startsWith("# dml:")) ++
      prev.filterNot(_.startsWith("#")) ++ newFiles

  /** Optimistic multi-writer append — Delta's commit protocol shape,
    * replacing [[appendTxn]]'s writer lock with version-claim CAS:
    *
    *  1. Data lands in `txn=<id>/` FIRST, outside any critical section —
    *     concurrent writers never serialize on their (possibly huge) data
    *     writes, only on the O(lines) manifest step.
    *  2. The writer then claims its target version with an atomic O_EXCL
    *     create of `claim-<v>` (the POSIX twin of Delta's put-if-absent
    *     on `<v>.json`). Exactly one claimant wins version v.
    *  3. A loser RE-READS the advanced table state and REBASES: its
    *     manifest is rebuilt against the winner's — appends touch
    *     disjoint files, so the rebase is always conflict-free (the
    *     general protocol would check semantic conflicts here and abort
    *     non-commuting txns; append-vs-append never conflicts).
    *
    * Readers are untouched: they resolve pointer → manifest, and the
    * pointer flips only after the manifest content is durable. A winner
    * crashing between claim and flip leaves a stale claim that blocks
    * later writers into a loud bounded-spin error (the [[withWriterLock]]
    * caveat; production leases or garbage-collects claims). Txn ids must
    * be writer-unique — two writers racing the SAME id race their data
    * dir, exactly Delta's (appId, version) idempotence contract. */
  def appendTxnCAS(spark: SparkSession, table: String, df: DataFrame,
      txnId: Long): Long = {
    Files.createDirectories(Paths.get(table))
    if (committedTxns(table).contains(txnId))
      return currentVersion(table).get // replay → no-op, skip the write
    // data lands FIRST, outside any critical section — writers contend
    // only on the O(lines) manifest step, never on their data writes
    val newFiles = writeTxnData(spark, table, df, txnId)
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isEmpty || prev.contains("# base:."),
        s"appendTxnCAS on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None // raced replay
    } { (_, prev) => appendManifest(prev, txnId, newFiles) }
  }

  // ---- targeted key erasure (GDPR right-to-be-forgotten) ----

  /** Physically erase every row whose `keyCol` is in `keys`, rewriting
    * ONLY the files that can contain them — the right-to-be-forgotten
    * operation at lake scale (Delta's DELETE + VACUUM path, Iceberg
    * RewriteFiles): candidate files are pruned from the manifest's
    * per-file blooms (`bloomName`, see [[skipFilesBloom]]); files the
    * blooms prove clean survive BYTE-UNTOUCHED, so the rewrite is
    * O(files containing the subject), not O(table) — on 100 TB the
    * difference between an afternoon and a quarter. Note the contrast
    * with [[deleteTxn]]: merge-on-read hides rows but the bytes remain
    * (not GDPR-sufficient); erase rewrites the bytes. Files without a
    * recorded bloom are conservatively rewritten. Standing delete
    * vectors, constraints, and the txn ledger carry forward; partition
    * tuples and stat lines for REPLACED files are dropped (they describe
    * dead files), survivors keep theirs. Idempotent per txnId. `keys` is
    * an erasure REQUEST — driver-side by nature, O(subjects), the legal
    * queue is never table-sized. Returns (version, rewritten, total). */
  /** Test seam: fires after eraseKeys snapshots the manifest but before it
    * claims the commit — the window a lock-free appendTxnCAS can land in.
    * No-op in production; ConcurrencySpec injects a concurrent append here
    * to pin the stale-snapshot rebase deterministically. */
  private[graft] var eraseKeysRaceHook: () => Unit = () => ()

  /** Same seam for [[eraseKeysLineage]] (r19 review: the sibling's
    * concurrency window shipped untested). */
  private[graft] var eraseKeysLineageRaceHook: () => Unit = () => ()

  /** Manifest stat lines that describe files a rewrite is REPLACING —
    * they must not carry forward (they describe dead files). The shared
    * predicate of every touched-file rewrite (r19 review: the closure was
    * copy-pasted at seven sites; a new per-file stat prefix must land
    * exactly here). `lineage = true` additionally retires the files'
    * row-id assignment lines (the rewrite re-lands ids materialized). */
  private def deadStatLines(files: Seq[String], lineage: Boolean = false)(
      l: String): Boolean =
    files.exists(f =>
      l.startsWith(s"# pval:$f|") || l.startsWith(s"# minmax:$f|") ||
        l.startsWith(s"# bloom:$f|") || l.startsWith(s"# rows:$f|") ||
        (lineage && (l.startsWith(s"# firstrow:$f|") ||
          l.trim == s"# rowid_phys:$f")))

  def eraseKeys(spark: SparkSession, table: String, keys: Seq[Long],
      keyCol: String, bloomName: String, txnId: Long): (Long, Int, Int) = withWriterLock(table) {
    // Stale-snapshot retry (ADVICE r14, mirrors [[rewriteCommit]]): the
    // candidate/survivor sets below are derived from a SNAPSHOT of the
    // manifest taken before the claim. appendTxnCAS takes no writer lock,
    // so a concurrent append can land between this read and our claim —
    // committing the stale survivor list would silently drop that writer's
    // just-committed data files. The precheck detects the advance
    // (cur != snapV), returns a sentinel, and the whole erase recomputes
    // against the fresh state (the re-write of txn=<id>/ overwrites its
    // own prior attempt, so retries stay idempotent).
    val StaleSnapshot = -2L
    var attempts = 0
    var result: (Long, Int, Int) = null
    while (result == null) {
      attempts += 1
      require(attempts <= 50, s"eraseKeys: concurrent-commit retry limit on $table")
      val cur = currentVersion(table).getOrElse(
        sys.error(s"Acid.eraseKeys: no committed version at $table"))
      val lines = manifestLines(table, cur)
      if (lines.contains(s"# txn:$txnId")) {
        result = (cur, 0, lines.count(!_.startsWith("#"))) // replay → no-op
      } else {
        require(lines.contains("# base:."), s"eraseKeys on snapshot-mode table $table")
        require(!lines.exists(l => l.startsWith("# firstrow:") ||
          l.startsWith("# rowid_phys:") || l.startsWith("# rowid_next:")),
          s"eraseKeys on row-lineage table $table — the rewrite would " +
            "strand id assignments; erase support for lineage tables is " +
            "a migration, not a silent rewrite")
        val candidates = keys
          .flatMap(k => skipFilesBloom(table, cur, bloomName, k)._1)
          .distinct.sorted
        val all = lines.filterNot(_.startsWith("#"))
        val survivors = all.filterNot(candidates.contains)
        val newFiles = if (candidates.isEmpty) Seq.empty else {
          // standing vectors fold into the rewrite (a positional entry
          // names a (file, pos) that won't exist after the move — carrying
          // the hidden row raw would resurrect it under the new position).
          // The candidate read goes through the LOGICAL frame (r19, lifting
          // the r18 refusal): on an evolved table `keyCol` is the
          // post-rename name, candidate files from any generation resolve
          // via footer-union + colmap + defaults — same recipe as
          // mergeCow/updateWhere DML — and the scrubbed rewrite lands the
          // logical schema while the carried colmap/coldefault lines keep
          // resolving the untouched survivors. Bloom pruning stays sound
          // across generations: blooms are stat-name-keyed and files
          // without one are conservatively rewritten.
          // NULL-key rows are never erasure subjects: `!isin` evaluates
          // NULL for them and a bare filter would DROP them from rewritten
          // files while identical rows in pruned files survive —
          // nondeterministic loss (r19 review). coalesce keeps them, the
          // same three-valued rule deleteWhere applies.
          val scrubbed = subtractDeletes(spark, table, lines,
            readLogical(spark, table, lines, candidates))
            .filter(!coalesce(col(keyCol).isin(keys: _*), lit(false)))
          writeTxnDataChecked(spark, table, scrubbed, txnId, lines,
            "eraseKeys")
        }
        val deadStat = deadStatLines(candidates) _
        eraseKeysRaceHook()
        val v = commitNextVersion(table) { (c, prev) =>
          if (prev.contains(s"# txn:$txnId")) Some(c.get)
          else if (c.get != cur) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          ("# base:." +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") && !deadStat(l)) ++
            survivors ++ newFiles
        }
        if (v != StaleSnapshot) result = (v, candidates.size, all.size)
      }
    }
    result
  }

  /** GDPR erase on a ROW-LINEAGE table (r19 — the last refusal in the
    * DML × table-metadata matrix): [[eraseKeys]]'s bloom-pruned
    * copy-on-write with the candidate rewrite running over the
    * id-attached LOGICAL frame and landing ids MATERIALIZED (`__row_id` +
    * `# rowid_phys:` marks — [[updateWhereLineage]]'s mechanism). Every
    * SURVIVING row keeps its id bit-for-bit; the subjects' ids simply
    * RETIRE — never reused, the `# rowid_next:` high-water mark carries.
    * Files the blooms prove clean keep their lazy `# firstrow:` lines
    * byte-untouched; evolved tables compose for free (the lineage frame
    * is logical). Locked, not CAS — an id-carrying rewrite serializes
    * with assignRowIds like every lineage writer. The stale-snapshot
    * retry keeps the SURVIVOR LIST sound against a lock-free
    * appendTxnCAS racer (the commit can never drop the racer's file);
    * completing the erase then requires the racer's file to get its id
    * assignment first — the retry fails LOUDLY with lineageFrameFor's
    * "run assignRowIds first" (the same contract readLineage applies to
    * unassigned files), and the re-run after assignRowIds succeeds —
    * spec-pinned in ConcurrencySpec. Idempotent per txnId. Returns
    * (version, rewritten, total). */
  def eraseKeysLineage(spark: SparkSession, table: String, keys: Seq[Long],
      keyCol: String, bloomName: String,
      txnId: Long): (Long, Int, Int) = withWriterLock(table) {
    val StaleSnapshot = -2L
    var attempts = 0
    var result: (Long, Int, Int) = null
    while (result == null) {
      attempts += 1
      require(attempts <= 50, s"eraseKeysLineage: concurrent-commit retry limit on $table")
      val cur = currentVersion(table).getOrElse(
        sys.error(s"Acid.eraseKeysLineage: no committed version at $table"))
      val lines = manifestLines(table, cur)
      if (lines.contains(s"# txn:$txnId")) {
        result = (cur, 0, lines.count(!_.startsWith("#"))) // replay → no-op
      } else {
        require(lines.contains("# base:."),
          s"eraseKeysLineage on snapshot-mode table $table")
        require(lines.exists(l => l.startsWith("# firstrow:") ||
          l.startsWith("# rowid_phys:")),
          s"eraseKeysLineage on $table: not a row-lineage table — use eraseKeys")
        val candidates = keys
          .flatMap(k => skipFilesBloom(table, cur, bloomName, k)._1)
          .distinct.sorted
        val all = lines.filterNot(_.startsWith("#"))
        val survivors = all.filterNot(candidates.contains)
        val newFiles = if (candidates.isEmpty) Seq.empty else {
          // NULL-key rows survive (three-valued isin — see eraseKeys)
          val scrubbed = subtractDeletes(spark, table, lines,
            lineageFrameFor(spark, table, lines, candidates, "eraseKeysLineage"))
            .filter(!coalesce(col(keyCol).isin(keys: _*), lit(false)))
            .withColumnRenamed("row_id", "__row_id")
          writeTxnDataChecked(spark, table, scrubbed, txnId, lines,
            "eraseKeysLineage")
        }
        val deadMeta = deadStatLines(candidates, lineage = true) _
        eraseKeysLineageRaceHook()
        val v = commitNextVersion(table) { (c, prev) =>
          if (prev.contains(s"# txn:$txnId")) Some(c.get)
          else if (c.get != cur) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          ("# base:." +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") && !deadMeta(l)) ++
            newFiles.map(f => s"# rowid_phys:$f") ++
            survivors ++ newFiles
        }
        if (v != StaleSnapshot) result = (v, candidates.size, all.size)
      }
    }
    result
  }

  // ---- row-level MERGE (copy-on-write) ----

  /** MERGE INTO, copy-on-write — the Delta/Iceberg row-level MERGE
    * algorithm on the manifest seam: `changes` rows REPLACE table rows
    * with the same `keyCol` (matched → update), land as inserts otherwise
    * (not-matched → insert), and — when `opCol` is given — rows whose op
    * is `"delete"` remove the key. Mechanics, in the order Delta runs
    * them:
    *
    *  1. **Touched-file probe**: one distributed semi-join of the table
    *     scan against the (broadcast-small) change keys, grouped by
    *     `input_file_name()` — exactly Delta MERGE's findTouchedFiles
    *     job. Output is O(files), a control-plane collect; at 100 TB the
    *     scan side is pre-pruned by manifest blooms/zone maps before any
    *     footer opens.
    *  2. **Rewrite only the touched files**: survivors stay
    *     byte-untouched (spec-pinned); the rewrite anti-joins ALL change
    *     keys out and unions the upsert rows in. Cost is O(files
    *     containing a matched key), never O(table).
    *  3. **Delete-vector reconciliation**: standing merge-on-read vectors
    *     are folded into the rewrite (a vector-deleted row never
    *     resurrects by accident), and upserted keys are REMOVED from the
    *     vector (an explicit MERGE insert of a previously-deleted key
    *     must resurrect it — the one place append semantics and MERGE
    *     semantics differ). An empty reconciled vector drops the delete
    *     lines entirely.
    *
    * Concurrent lock-free appends rebase through the same stale-snapshot
    * retry as [[eraseKeys]]; idempotent per txnId via the ledger. Returns
    * (version, touched files, total files). */
  /** One COW-merge attempt over an explicit manifest state — the shared
    * algorithm of [[mergeCow]] (per optimistic retry) and
    * [[mergeCowBranch]]: Delta's findTouchedFiles probe, the
    * (touched − vectors − change keys) ∪ upserts rewrite landed under
    * `dataDir`, and the upserted-keys-leave-the-vector reconciliation
    * landed under `delDir`. Returns the manifest ingredients; committing
    * them (version claim vs branch manifest) stays with the caller. */
  private final case class CowMerge(touched: Seq[String],
      survivors: Seq[String], newFiles: Seq[String],
      vectorLines: Seq[String], deadStat: String => Boolean, total: Int)
  private def cowMergeAttempt(spark: SparkSession, table: String,
      lines: Seq[String], changes: DataFrame, keyCol: String,
      opCol: Option[String], dataDir: Path, delDir: Path,
      what: String): CowMerge = {
    val all = lines.filterNot(_.startsWith("#"))
    val root = Paths.get(table).toAbsolutePath
    val allKeys = changes.select(col(keyCol)).distinct()
    val upserts = opCol match {
      case Some(o) => changes.filter(col(o) =!= "delete").drop(o)
      case None    => changes
    }
    // Delta's findTouchedFiles: which files contain a changed key —
    // one semi-join scan over the LOGICAL frame (r18: an evolved table
    // probes post-rename key names and default-filled values), O(files)
    // rows back to the driver
    val touched = if (all.isEmpty) Seq.empty[String]
    else touchedFilesPlanOver(readLogical(spark, table, lines, all),
      allKeys, keyCol)
      .collect() // O(files) rows — manifest-construction control plane
      .map(r => root.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString)
      .sorted.toSeq
    val survivors = all.filterNot(touched.contains)
    // rewrite = (touched files − standing vectors − change keys) ∪ upserts
    val rewritten = {
      val basePart =
        if (touched.isEmpty) upserts.limit(0)
        else subtractDeletes(spark, table, lines,
          readLogical(spark, table, lines, touched))
          .join(allKeys, Seq(keyCol), "left_anti")
      basePart.unionByName(upserts)
    }
    // write FIRST, then constraint-check the written files (ADVICE r18:
    // checking the plan pre-write is a separate action — a nondeterministic
    // changes frame could pass the check yet write violating rows)
    rewritten.write.mode("overwrite").parquet(dataDir.toString)
    val newFiles = listParquet(table, dataDir)
    if (newFiles.nonEmpty && lines.exists(_.startsWith("# constraint:")))
      checkConstraintLines(lines,
        spark.read.parquet(newFiles.map(f => s"$table/$f"): _*), what)
    // vector reconciliation: upserted keys leave the standing vector
    val upsertedKeyRows = upserts.select(col(keyCol)).distinct()
    val vectorLines = reconcileVector(spark, table, lines, upsertedKeyRows,
      keyCol, delDir, what)
    val deadStat = deadStatLines(touched) _
    CowMerge(touched, survivors, newFiles, vectorLines, deadStat, all.size)
  }

  /** Evaluate the manifest's standing CHECK constraints over a frame a
    * row-level rewrite (UPDATE/DELETE/MERGE) is about to WRITE — Delta
    * enforces invariants on every write path, not only appends (r18
    * review: an unchecked DML could store a real NULL into a defaulted
    * column, which the read-side coalesce would then silently masquerade
    * as the default — the exactness contract the auto NOT NULL constraint
    * exists to protect). One O(batch) aggregate over the rewrite frame;
    * a violating batch refuses loudly with the table unmoved. Carried
    * rows re-checking is free of false positives: [[addConstraint]]
    * validates existing data when the constraint lands. */
  private def checkConstraintLines(lines: Seq[String], df: DataFrame,
      what: String): Unit = {
    val all = lines.filter(_.startsWith("# constraint:")).map { l =>
      val body = l.stripPrefix("# constraint:")
      val (n, p) = body.span(_ != '|'); (n.trim, p.drop(1))
    }
    if (all.nonEmpty) {
      val aggs = all.map { case (n, p) =>
        count(when(!expr(p) || expr(p).isNull, 1)).as(n) }
      val row = df.agg(aggs.head, aggs.tail: _*).head
      val bad = all.zipWithIndex
        .map { case ((n, p), i) => (n, p, row.getLong(i)) }.filter(_._3 > 0)
      if (bad.nonEmpty) throw new ConstraintViolationException(
        s"$what: " +
          bad.map { case (n, p, c) => s"$n ($p): $c rows" }.mkString("; "))
    }
  }

  /** Vector reconciliation shared by every COW-merge flavor
    * ([[cowMergeAttempt]] / [[mergeCowLineage]]): upserted keys LEAVE the
    * standing vector — an explicit MERGE insert of a previously-deleted
    * key must resurrect it. Returns the next manifest's vector lines; an
    * empty reconciled vector drops the delete lines entirely. */
  private def reconcileVector(spark: SparkSession, table: String,
      lines: Seq[String], upsertedKeyRows: DataFrame, keyCol: String,
      delDir: Path, what: String): Seq[String] =
    standingDeletes2(lines).map { case (k, delFiles) =>
      require(k == keyCol, s"$what: table uses delete key $k, got $keyCol")
      val remaining = spark.read.parquet(delFiles.map(f => s"$table/$f"): _*)
        .select(col(k)).distinct()
        .join(upsertedKeyRows, Seq(k), "left_anti")
      if (remaining.isEmpty) Seq.empty[String]
      else {
        remaining.coalesce(1).write.mode("overwrite").parquet(delDir.toString)
        listParquet(table, delDir)
      }
    } match {
      case Some(fs) if fs.nonEmpty =>
        Seq(s"# delkey:$keyCol") ++ fs.map(f => s"# delete:$f")
      case _ => Seq.empty // no vector, or reconciled to empty
    }

  def mergeCow(spark: SparkSession, table: String, changes: DataFrame,
      keyCol: String, txnId: Long,
      opCol: Option[String] = None): (Long, Int, Int) = withWriterLock(table) {
    val StaleSnapshot = -2L
    var attempts = 0
    var result: (Long, Int, Int) = null
    while (result == null) {
      attempts += 1
      require(attempts <= 50, s"mergeCow: concurrent-commit retry limit on $table")
      // an uninitialized table is a legal MERGE target (the streaming CDC
      // consumer's first micro-batch): empty file set, everything inserts
      val cur = currentVersion(table)
      val lines = cur.map(manifestLines(table, _)).getOrElse(Seq("# base:."))
      if (lines.contains(s"# txn:$txnId")) {
        result = (cur.get, 0, lines.count(!_.startsWith("#"))) // replay → no-op
      } else {
        require(lines.contains("# base:."), s"mergeCow on snapshot-mode table $table")
        // MERGE on a lineage table needs fresh-id allocation for inserts
        // AND materialization for carried rows — neither happens here;
        // refuse instead of stranding stale assignment lines (r18)
        require(!lines.exists(l => l.startsWith("# firstrow:") ||
          l.startsWith("# rowid_phys:") || l.startsWith("# rowid_next:")),
          s"mergeCow on row-lineage table $table — use mergeCowLineage " +
            "(it keeps matched ids and allocates insert ids from the mark)")
        val m = cowMergeAttempt(spark, table, lines, changes, keyCol, opCol,
          Paths.get(table).resolve(s"txn=$txnId"),
          Paths.get(table).resolve(s"del=$txnId"), "mergeCow")
        val v = commitNextVersion(table) { (c, prev) =>
          if (prev.contains(s"# txn:$txnId")) Some(c.get)
          else if (c != cur) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          ("# base:." +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            m.vectorLines ++
            prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") &&
              !l.startsWith("# delkey:") && !l.startsWith("# delete:") &&
              !m.deadStat(l)) ++
            m.survivors ++ m.newFiles
        }
        if (v != StaleSnapshot) result = (v, m.touched.size, m.total)
      }
    }
    result
  }

  /** The touched-file probe plan (exposed for plan-shape pinning): scan →
    * LEFT SEMI against the (small) change-key set → distinct file names.
    * `input_file_name` is captured ON the scan, before the join —
    * post-join the expression has two sources and Spark rejects it. At
    * any healthy size the key side broadcasts (AQE; no shuffle of the
    * table side beyond the final O(files) distinct) — PlanShapeSpec pins
    * the BroadcastHashJoin LeftSemi shape. */
  private[graft] def touchedFilesPlan(spark: SparkSession, paths: Seq[String],
      keys: DataFrame, keyCol: String): DataFrame =
    touchedFilesPlanOver(spark.read.parquet(paths: _*), keys, keyCol)

  /** [[touchedFilesPlan]] over a caller-built scan — the seam that lets
    * evolved tables probe through their LOGICAL frame ([[readLogical]]):
    * `input_file_name()` resolves through the mapping projections because
    * the frame still has exactly one scan source. */
  private[graft] def touchedFilesPlanOver(scan: DataFrame,
      keys: DataFrame, keyCol: String): DataFrame =
    scan.select(col(keyCol), input_file_name().as("f"))
      .join(keys, Seq(keyCol), "left_semi")
      .select(col("f")).distinct()

  /** The LOGICAL frame of a file subset: a plain scan normally;
    * footer-union + column mapping + defaults when the manifest mixes
    * schema generations. This is what row-level DML probes and rewrites
    * evaluate against (r18 — lifting the blanket refusal): predicates and
    * key joins see post-evolution names and default-filled values, and
    * the rewrite lands the logical schema — the carried colmap/coldefault
    * lines keep resolving the UNTOUCHED files while rewritten files are
    * simply current-generation (Delta's DML-on-column-mapped-tables
    * behavior). */
  private def readLogical(spark: SparkSession, table: String,
      lines: Seq[String], files: Seq[String]): DataFrame =
    if (!mixedGenerations(lines))
      spark.read.parquet(files.map(f => s"$table/$f"): _*)
    else applyColumnDefaults(lines, applyColumnMapping(lines,
      readMergedSchema(spark, files.map(f => s"$table/$f"))))

  // ---- predicate-based row-level UPDATE / DELETE (copy-on-write) ----

  /** Shared predicate-COW commit loop ([[updateWhere]]/[[deleteWhere]]) —
    * Delta's UPDATE/DELETE algorithm: ONE scan finds the files containing
    * a predicate-matching row (O(files) collect, control plane), only
    * those are rewritten through `transform` (standing delete vectors
    * subtracted first, so a vector-hidden row can neither update nor
    * resurrect), survivors stay byte-untouched — cost is O(files touched
    * by the predicate), never O(table); on a table clustered near the
    * predicate column the zone maps make that a sliver. Stat lines for
    * replaced files are dropped (they describe dead files); the txn
    * ledger, constraints, and the standing vector carry forward (the
    * vector keys are already subtracted from the new files — the lines
    * stay to keep hiding them in survivors). Stale-snapshot rebase and
    * per-txnId idempotence exactly as [[mergeCow]]. Returns
    * (version, touched files, total files). */
  private def cowWhere(spark: SparkSession, table: String, pred: Column,
      txnId: Long, what: String)(
      transform: DataFrame => DataFrame): (Long, Int, Int) = withWriterLock(table) {
    val StaleSnapshot = -2L
    var attempts = 0
    var result: (Long, Int, Int) = null
    while (result == null) {
      attempts += 1
      require(attempts <= 50, s"$what: concurrent-commit retry limit on $table")
      val cur = currentVersion(table)
      val lines = cur.map(manifestLines(table, _)).getOrElse(
        sys.error(s"Acid.$what: no committed version at $table"))
      if (lines.contains(s"# txn:$txnId")) {
        result = (cur.get, 0, lines.count(!_.startsWith("#"))) // replay → no-op
      } else {
        require(lines.contains("# base:."), s"$what on snapshot-mode table $table")
        // a plain COW rewrite drops the touched files' row-id assignments
        // (r18): lineage tables update through updateWhereLineage, which
        // materializes ids through the rewrite
        require(!lines.exists(l => l.startsWith("# firstrow:") ||
          l.startsWith("# rowid_phys:") || l.startsWith("# rowid_next:")),
          s"$what on row-lineage table $table — use updateWhereLineage " +
            "(it materializes ids through the rewrite)")
        val all = lines.filterNot(_.startsWith("#"))
        val root = Paths.get(table).toAbsolutePath
        // probe + rewrite run over the LOGICAL frame (r18): on an evolved
        // table the predicate sees post-rename names and default-filled
        // values — Delta's DML semantics on column-mapped tables — and
        // the rewrite lands the logical schema
        val touched = if (all.isEmpty) Seq.empty[String]
        else readLogical(spark, table, lines, all)
          .filter(pred)
          .select(input_file_name().as("f")).distinct()
          .collect() // O(files) rows — manifest-construction control plane
          .map(r => root.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString)
          .sorted.toSeq
        val survivors = all.filterNot(touched.contains)
        val newFiles =
          if (touched.isEmpty) Seq.empty[String]
          else {
            val out = transform(subtractDeletes(spark, table, lines,
              readLogical(spark, table, lines, touched)))
            writeTxnDataChecked(spark, table, out, txnId, lines, what)
          }
        val deadStat = deadStatLines(touched) _
        val v = commitNextVersion(table) { (c, prev) =>
          if (prev.contains(s"# txn:$txnId")) Some(c.get)
          else if (c != cur) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          ("# base:." +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") && !deadStat(l)) ++
            survivors ++ newFiles
        }
        if (v != StaleSnapshot) result = (v, touched.size, all.size)
      }
    }
    result
  }

  /** Raised when a lock-free writer loses a race it cannot rebase across —
    * Delta's ConcurrentAppendException / ConcurrentDeleteReadException
    * family. The caller retries on the new snapshot or surfaces the abort. */
  final class WriteConflictException(msg: String) extends RuntimeException(msg)

  /** Lock-free predicate UPDATE — Delta's optimistic-concurrency contract
    * for row-level writes, replacing [[updateWhere]]'s writer lock with
    * version-claim CAS + SEMANTIC conflict detection:
    *
    *  1. Probe + rewrite run against a snapshot OUTSIDE any lock — two
    *     updates on a 100 TB table never serialize their (possibly huge)
    *     rewrites, only the O(lines) manifest step.
    *  2. At commit, the loser of a version race REBASES iff the races
    *     commute: the winner must not have REMOVED any file this update
    *     read (Delta ConcurrentDeleteRead — our rewrite would resurrect
    *     the winner's dead rows), must not have landed a standing delete
    *     VECTOR (its hides apply to rows we already rewrote), and must
    *     not have ADDED rows matching this update's predicate (Delta
    *     ConcurrentAppend — serializability would require updating them
    *     too). Disjoint-file updates and non-matching appends all rebase
    *     and commit; anything else aborts loudly with
    *     [[WriteConflictException]], table unmoved by this writer.
    *
    * The conflict check costs O(files changed since the snapshot): set
    * arithmetic on manifests plus one predicate probe of only the
    * winner's added files. Idempotent per txnId. `beforeCommit` is a
    * test seam injected between the rewrite and the commit loop so specs
    * can stage deterministic races. */
  def updateWhereCAS(spark: SparkSession, table: String,
      sets: Seq[(String, Column)], pred: Column, txnId: Long,
      beforeCommit: () => Unit = () => ()): (Long, Int, Int) = {
    require(sets.nonEmpty, "updateWhereCAS: no SET assignments")
    val bySet = sets.toMap
    require(bySet.size == sets.size, "updateWhereCAS: duplicate SET column")
    val curV = currentVersion(table).getOrElse(
      sys.error(s"Acid.updateWhereCAS: no committed version at $table"))
    val snap = manifestLines(table, curV)
    if (snap.contains(s"# txn:$txnId"))
      return (curV, 0, snap.count(!_.startsWith("#"))) // replay → no-op
    require(snap.contains("# base:."),
      s"updateWhereCAS on snapshot-mode table $table")
    require(!snap.exists(l => l.startsWith("# delete:") || l.startsWith("# pdel:")),
      s"updateWhereCAS: $table carries standing delete vectors — use the " +
        "locked updateWhere (vector semantics do not commute with appends)")
    require(!snap.exists(l => l.startsWith("# firstrow:") ||
      l.startsWith("# rowid_phys:") || l.startsWith("# rowid_next:")),
      s"updateWhereCAS on row-lineage table $table — use updateWhereLineage")
    val all = snap.filterNot(_.startsWith("#"))
    val root = Paths.get(table).toAbsolutePath
    // probe + rewrite run over the LOGICAL frame (r19, lifting the r18
    // refusal): on an evolved table the predicate and SET expressions see
    // post-rename names and default-filled values, and the rewrite lands
    // the logical schema — the commit loop's evolution-delta check below
    // keeps the commute analysis honest against CONCURRENT evolution
    val touched = if (all.isEmpty) Seq.empty[String]
    else readLogical(spark, table, snap, all)
      .filter(pred)
      .select(input_file_name().as("f")).distinct()
      .collect() // O(files) rows — manifest-construction control plane
      .map(r => root.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString)
      .sorted.toSeq
    val touchedSet = touched.toSet
    val newFiles =
      if (touched.isEmpty) Seq.empty[String]
      else {
        val base = readLogical(spark, table, snap, touched)
        sets.foreach { case (c, _) =>
          require(base.columns.contains(c), s"updateWhereCAS: no column $c") }
        val updated = base.select(base.columns.toSeq.map { c =>
          bySet.get(c) match {
            case Some(e) => when(pred, e).otherwise(col(c)).as(c)
            case None    => col(c)
          }
        }: _*)
        writeTxnDataChecked(spark, table, updated, txnId, snap,
          "updateWhereCAS")
      }
    beforeCommit()
    val deadStat = deadStatLines(touched) _
    val v = commitNextVersion(table) { (c, prev) =>
      if (prev.contains(s"# txn:$txnId")) Some(c.get)
      else {
        // conflict check against however far the table advanced past the
        // snapshot — runs BEFORE the claim, so an abort never wedges a
        // claim file; re-evaluated from scratch on every raced retry
        val prevFiles = prev.filterNot(_.startsWith("#")).toSet
        val lostRead = touched.filterNot(prevFiles)
        if (lostRead.nonEmpty) throw new WriteConflictException(
          s"updateWhereCAS($txnId) on $table: a concurrent writer rewrote " +
            s"file(s) this update read (${lostRead.take(3).mkString(", ")}) — " +
            "retry on the new snapshot")
        if (prev.exists(l => l.startsWith("# delete:") || l.startsWith("# pdel:")))
          throw new WriteConflictException(
            s"updateWhereCAS($txnId) on $table: a concurrent merge-on-read " +
              "delete landed a standing vector — its hides apply to rows " +
              "this update already rewrote; retry on the new snapshot")
        // the snapshot-time guards re-checked at commit (r18 review, r19
        // narrowed to genuinely non-commuting commits): a concurrent
        // assignRowIds commit would have its assignment lines stranded by
        // this rewrite, and a concurrent SCHEMA-EVOLUTION commit (new
        // colmap/coldrop/coldefault lines vs the snapshot) changes what
        // the logical rewrite should have produced — snapshot-matching
        // evolution metadata commutes and carries forward
        val evoOf = (ls: Seq[String]) => ls.filter(l =>
          l.startsWith("# colmap:") || l.startsWith("# coldrop:") ||
            l.startsWith("# coldefault:"))
        if (evoOf(prev) != evoOf(snap) || prev.exists(l =>
          l.startsWith("# firstrow:") || l.startsWith("# rowid_phys:") ||
            l.startsWith("# rowid_next:")))
          throw new WriteConflictException(
            s"updateWhereCAS($txnId) on $table: a concurrent commit " +
              "installed schema-evolution or row-lineage metadata — the " +
              "rewrite no longer commutes; retry through the appropriate path")
        val addedSince = prevFiles.diff(all.toSet).toSeq.sorted
        if (addedSince.nonEmpty) {
          // logical read: the predicate references post-evolution names,
          // and a concurrent append of a pre-default frame must still
          // surface default-filled values to the probe
          val hit = readLogical(spark, table, prev, addedSince)
            .filter(pred).limit(1).count() > 0
          if (hit) throw new WriteConflictException(
            s"updateWhereCAS($txnId) on $table: a concurrent append added " +
              "rows matching this update's predicate — serializability " +
              "requires updating them too; retry on the new snapshot")
        }
        None
      }
    } { (_, prev) =>
      // rebase: the advanced state minus this update's touched files
      ("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:") && !deadStat(l)) ++
        prev.filterNot(_.startsWith("#")).filterNot(touchedSet) ++ newFiles
    }
    (v, touched.size, all.size)
  }

  /** `UPDATE ... SET ... WHERE pred`, copy-on-write. Every SET expression
    * evaluates against the PRE-update row (SQL standard — `SET a = b,
    * b = a` swaps), via one simultaneous projection, never sequential
    * withColumn chaining. Rows not matching `pred` (or matching NULL)
    * pass through unchanged. */
  def updateWhere(spark: SparkSession, table: String,
      sets: Seq[(String, Column)], pred: Column,
      txnId: Long): (Long, Int, Int) = {
    require(sets.nonEmpty, "updateWhere: no SET assignments")
    val bySet = sets.toMap
    require(bySet.size == sets.size, "updateWhere: duplicate SET column")
    cowWhere(spark, table, pred, txnId, "updateWhere") { base =>
      sets.foreach { case (c, _) =>
        require(base.columns.contains(c), s"updateWhere: no column $c") }
      base.select(base.columns.toSeq.map { c =>
        bySet.get(c) match {
          case Some(e) => when(pred, e).otherwise(col(c)).as(c)
          case None    => col(c)
        }
      }: _*)
    }
  }

  /** `DELETE FROM ... WHERE pred`, copy-on-write: rows matching `pred`
    * are physically removed from the rewritten files (contrast with
    * [[deleteTxn]]'s merge-on-read vector — COW pays the rewrite now so
    * reads carry no anti-join). A NULL predicate keeps the row (SQL
    * three-valued DELETE). */
  def deleteWhere(spark: SparkSession, table: String, pred: Column,
      txnId: Long): (Long, Int, Int) =
    cowWhere(spark, table, pred, txnId, "deleteWhere")(
      _.filter(!coalesce(pred, lit(false))))

  // ---- CHECK constraints (Delta table constraints / invariants) ----

  /** Constraints recorded in version `v`'s manifest: name → SQL predicate
    * every row of every future append must satisfy. */
  def constraints(table: String, v: Long): Seq[(String, String)] =
    manifestLines(table, v).filter(_.startsWith("# constraint:")).map { l =>
      val body = l.stripPrefix("# constraint:")
      val (n, p) = body.span(_ != '|')
      n -> p.drop(1)
    }

  /** Idempotent append that ENFORCES the table's CHECK constraints —
    * Delta's `ALTER TABLE ADD CONSTRAINT` contract: constraints ride the
    * manifest (`# constraint:<name>|<predicate>` lines, carried forward
    * by every commit class), and every append validates its batch against
    * ALL standing constraints plus any declared with this call. The check
    * is ONE aggregate over the batch (count of violations per constraint,
    * map-side combined — O(batch), never O(table)); a violating batch
    * throws [[ConstraintViolationException]] with per-constraint counts
    * and the table does not advance. Enforce-at-write is what makes
    * downstream readers trust the predicate without re-checking it —
    * the garbage stops at the gate, not in every consumer. */
  def appendTxnChecked(spark: SparkSession, table: String, df: DataFrame,
      txnId: Long, newConstraints: Seq[(String, String)] = Nil): Long = withWriterLock(table) {
    val standing = currentVersion(table).map(constraints(table, _)).getOrElse(Seq.empty)
    val all = (standing ++ newConstraints).distinct
    require(all.map(_._1).distinct.size == all.size,
      s"duplicate constraint names at $table")
    if (all.nonEmpty) {
      val aggs = all.map { case (n, p) =>
        count(when(!expr(p) || expr(p).isNull, 1)).as(n)
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head
      val bad = all.zipWithIndex
        .map { case ((n, p), i) => (n, p, row.getLong(i)) }
        .filter(_._3 > 0)
      if (bad.nonEmpty) throw new ConstraintViolationException(
        bad.map { case (n, p, c) => s"$n ($p): $c rows" }.mkString("; "))
    }
    lazy val newFiles = writeTxnData(spark, table, df, txnId)
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isEmpty || prev.contains("# base:."),
        s"appendTxnChecked on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (_, prev) =>
      val declared = prev.filter(_.startsWith("# constraint:"))
      val added = newConstraints.map { case (n, p) => s"# constraint:$n|$p" }
        .filterNot(declared.contains)
      appendManifest(prev, txnId, newFiles) ++ added
    }
  }

  // ---- partition evolution (Iceberg partition-spec evolution) ----

  /** Append under a PARTITION SPEC that may differ from earlier commits'
    * — Iceberg's partition evolution, the capability hive-style layouts
    * structurally lack: the spec is per-COMMIT metadata, not a table-wide
    * path convention, so changing how new data is clustered never
    * rewrites a byte of old data. Mechanics:
    *
    *  - data lands hive-clustered under `txn=<id>/` via SHADOW copies of
    *    the partition columns (`__part_<c>=<v>` dirs), so the REAL
    *    columns stay inside the parquet files — readers never depend on
    *    path-derived columns, which is exactly what lets two specs
    *    coexist in one file list (mixed hive schemes under one basePath
    *    cannot even be loaded);
    *  - each file's partition values are recorded in the manifest
    *    (`# pval:<file>|c=v,...`), the spec itself as `# pspec:<txn>|c,...`
    *    — Iceberg's manifest-entry partition tuple;
    *  - [[readPrunedEvolved]] prunes the file list from those tuples:
    *    a file is dropped only if it NAMES a predicate column with a
    *    different value; files from an older spec that never recorded
    *    the column are always kept (they may contain matching rows), and
    *    the caller's residual filter keeps the answer exact — pruning is
    *    an optimization, never a semantics change.
    *
    * Idempotent per txnId like [[appendTxn]]; delete vectors and the txn
    * ledger carry forward unchanged. */
  def appendTxnEvolved(spark: SparkSession, table: String, df: DataFrame,
      txnId: Long, partitionCols: Seq[String]): Long = withWriterLock(table) {
    require(partitionCols.nonEmpty, "appendTxnEvolved: empty spec — use appendTxn")
    lazy val written: (Seq[String], Seq[String]) = { // at most once
      val root = Paths.get(table)
      val dataDir = root.resolve(s"txn=$txnId")
      val shadows = partitionCols.map(c => s"__part_$c")
      val shadowed = partitionCols.zip(shadows).foldLeft(df) {
        case (d, (c, s)) => d.withColumn(s, col(c))
      }
      shadowed.write.mode("overwrite")
        .partitionBy(shadows: _*).parquet(dataDir.toString)
      val walk = Files.walk(dataDir)
      val files =
        try walk.filter(p => p.toString.endsWith(".parquet"))
          .map[String](p => root.relativize(p).toString)
          .sorted().toArray.map(_.toString).toSeq
        finally walk.close()
      // partition tuple per file, parsed from the shadow dirs it landed in
      val pvals = files.map { f =>
        val vals = f.split('/').toSeq.collect {
          case seg if seg.startsWith("__part_") && seg.contains('=') =>
            val Array(c, v) = seg.split("=", 2)
            s"${c.stripPrefix("__part_")}=$v"
        }
        s"# pval:$f|${vals.mkString(",")}"
      }
      (files, pvals :+ s"# pspec:$txnId|${partitionCols.mkString(",")}")
    }
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isEmpty || prev.contains("# base:."),
        s"appendTxnEvolved on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (_, prev) =>
      ("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        // same carry-forward prefix set as [[appendManifest]] (ADVICE r14:
        // dropping constraint/minmax/bloom/rows here silently un-enforced
        // standing CHECK constraints and blinded skipping/erase after any
        // evolved append)
        prev.filter(l => l.startsWith("# delkey:") || l.startsWith("# delete:") ||
          l.startsWith("# pval:") || l.startsWith("# pspec:") ||
          l.startsWith("# constraint:") ||
          l.startsWith("# minmax:") || l.startsWith("# bloom:") ||
          l.startsWith("# rows:") || l.startsWith("# coldefault:") ||
          l.startsWith("# firstrow:") || l.startsWith("# rowid_phys:") ||
          l.startsWith("# rowid_next:") || l.startsWith("# pdel:") ||
          l.startsWith("# prop:")) ++
        written._2 ++
        prev.filterNot(_.startsWith("#")) ++ written._1
    }
  }

  // ---- hidden partitioning (Iceberg partition transforms) ----

  /** Append under TRANSFORM-derived partition values — Iceberg's hidden
    * partitioning, the piece hive layouts get catastrophically wrong:
    * the table is clustered by `day(ts)` / `bucket(id)` but the USER
    * never sees, writes, or filters on a derived column — queries state
    * raw predicates (`ts BETWEEN …`, `id = k`) and the engine maps them
    * to partition math at plan time ([[readPrunedHidden]]). Hive's
    * alternative (a physical `dt` string column the user must remember
    * to filter on) silently full-scans the moment anyone forgets.
    *
    * `transforms` are (derivedName, expr) pairs; the derived value lands
    * ONLY in the shadow partition dirs and the manifest's `# pval:`
    * tuples — data files keep exactly `df`'s columns (hidden = not in the
    * schema). Same manifest format as [[appendTxnEvolved]], so specs can
    * evolve (add a transform later; old files are conservatively kept by
    * every pruner). Idempotent per txnId. */
  def appendTxnHidden(spark: SparkSession, table: String, df: DataFrame,
      txnId: Long, transforms: Seq[(String, Column)]): Long = withWriterLock(table) {
    require(transforms.nonEmpty, "appendTxnHidden: no transforms — use appendTxn")
    lazy val written: (Seq[String], Seq[String]) = { // at most once
      val root = Paths.get(table)
      val dataDir = root.resolve(s"txn=$txnId")
      val shadows = transforms.map { case (n, _) => s"__part_$n" }
      val shadowed = transforms.foldLeft(df) {
        case (d, (n, e)) => d.withColumn(s"__part_$n", e)
      }
      // one task per partition tuple keeps the file count O(tuples), not
      // O(tuples × tasks) — the small-files guard a real writer applies.
      // Keyed by the FULL tuple (r20; the head transform alone serialized
      // each day's bucket files through one task) with an explicit count:
      // AQE would coalesce this small shuffle to a single writer task,
      // while 8× parallelism spawned ~250 empty write tasks per commit
      // for single-transform layouts (the 8-16-bucket SPJ fixtures,
      // measured +3 s over 5 commits). 2× parallelism spreads a
      // day × bucket tuple set across every core and keeps empty-task
      // overhead negligible; each tuple still hashes to exactly one
      // task, so the file count stays O(tuples).
      shadowed.repartition(
          spark.sparkContext.defaultParallelism * 2, shadows.map(col): _*)
        .write.mode("overwrite")
        .partitionBy(shadows: _*).parquet(dataDir.toString)
      val walk = Files.walk(dataDir)
      val files =
        try walk.filter(p => p.toString.endsWith(".parquet"))
          .map[String](p => root.relativize(p).toString)
          .sorted().toArray.map(_.toString).toSeq
        finally walk.close()
      val pvals = files.map { f =>
        val vals = f.split('/').toSeq.collect {
          case seg if seg.startsWith("__part_") && seg.contains('=') =>
            val Array(c, v) = seg.split("=", 2)
            s"${c.stripPrefix("__part_")}=$v"
        }
        s"# pval:$f|${vals.mkString(",")}"
      }
      (files, pvals :+ s"# pspec:$txnId|${transforms.map(_._1).mkString(",")}")
    }
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isEmpty || prev.contains("# base:."),
        s"appendTxnHidden on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (_, prev) =>
      ("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("# delkey:") || l.startsWith("# delete:") ||
          l.startsWith("# pval:") || l.startsWith("# pspec:") ||
          l.startsWith("# constraint:") ||
          l.startsWith("# minmax:") || l.startsWith("# bloom:") ||
          l.startsWith("# rows:") || l.startsWith("# coldefault:") ||
          l.startsWith("# firstrow:") || l.startsWith("# rowid_phys:") ||
          l.startsWith("# rowid_next:") || l.startsWith("# pdel:") ||
          l.startsWith("# prop:")) ++
        written._2 ++
        prev.filterNot(_.startsWith("#")) ++ written._1
    }
  }

  /** The standard transforms, as (derivedName, expr) builders. `dayOf`
    * buckets a timestamp column into epoch-day ordinals (Iceberg `days`);
    * `bucketOf` mods a long key into n buckets (Iceberg `bucket[n]`;
    * production uses murmur3 — plain mod keeps the driver-side predicate
    * mapping trivially reproducible here, same contract). Exposed so the
    * WRITE side and the PRUNE side provably share one definition. */
  def dayOf(tsCol: String): (String, Column) =
    // exact integer FLOOR division (ADVICE r15): Spark's `/` is double
    // true-division and cast-to-long truncates toward zero, which disagrees
    // with [[dayOfValue]]'s Math.floorDiv for pre-epoch micros (and loses
    // precision past 2^53). `a - pmod(a,d)` is an exact multiple of d, so
    // integral `div` equals floorDiv — no floating point anywhere, exact
    // over the full long domain (Iceberg's days transform floor-divides).
    s"day_$tsCol" -> org.apache.spark.sql.functions.expr(
      s"(unix_micros(`$tsCol`) - pmod(unix_micros(`$tsCol`), 86400000000)) " +
        s"div 86400000000")
  def bucketOf(c: String, n: Int): (String, Column) =
    s"b${n}_$c" -> org.apache.spark.sql.functions.pmod(col(c), org.apache.spark.sql.functions.lit(n.toLong))
  /** Driver-side twins of the transforms — the predicate mapping. */
  def dayOfValue(micros: Long): Long = Math.floorDiv(micros, 86400000000L)
  def bucketOfValue(key: Long, n: Int): Long = Math.floorMod(key, n.toLong)

  /** Hidden-partition pruning from RAW predicates: `ranges` are
    * (derivedName, lo, hi) bounds and `eqs` exact derived values — both
    * computed by the caller from raw predicates via the [[dayOfValue]]/
    * [[bucketOfValue]] twins, so the user-facing query never names a
    * derived column. A file is kept unless its recorded tuple names the
    * derived column with a value provably outside the predicate;
    * un-tupled (pre-transform) files are always kept; the caller's raw
    * residual filter keeps the answer exact — pruning is an optimization,
    * never a semantics change (same contract as [[readPrunedEvolved]]).
    * Returns (frame, kept, total). */
  def readPrunedHidden(spark: SparkSession, table: String,
      ranges: Seq[(String, Long, Long)],
      eqs: Map[String, Long] = Map.empty): (DataFrame, Int, Int) = {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.readPrunedHidden: no committed version at $table"))
    val lines = manifestLines(table, cur)
    require(lines.contains("# base:."),
      s"readPrunedHidden on snapshot-mode table $table")
    val pvals: Map[String, Map[String, String]] = lines
      .filter(_.startsWith("# pval:"))
      .map { l =>
        val body = l.stripPrefix("# pval:")
        val (f, tup) = body.span(_ != '|')
        f -> tup.drop(1).split(',').filter(_.nonEmpty)
          .map { kv => val Array(c, v) = kv.split("=", 2); c -> v }.toMap
      }.toMap
    val files = lines.filterNot(_.startsWith("#"))
    val kept = files.filter { f =>
      val tuple = pvals.getOrElse(f, Map.empty)
      ranges.forall { case (n, lo, hi) =>
        tuple.get(n).forall { v => val x = v.toLong; x >= lo && x <= hi } } &&
        eqs.forall { case (n, v) => tuple.get(n).forall(_.toLong == v) }
    }
    if (kept.isEmpty) {
      require(files.nonEmpty, s"readPrunedHidden: empty manifest at $table v$cur")
      val empty = readMergedSchema(spark, files.map(f => s"$table/$f")).limit(0)
      (subtractDeletes(spark, table, lines, empty), 0, files.size)
    } else {
      val base = spark.read.parquet(kept.map(f => s"$table/$f"): _*)
      (subtractDeletes(spark, table, lines, base), kept.size, files.size)
    }
  }

  /** Metadata partition pruning across EVOLVED specs: keep a file unless
    * its recorded partition tuple names a predicate column with a
    * DIFFERENT value (old-spec files that never recorded the column are
    * kept — only provably-dead files drop). Returns (dataframe over kept
    * files, kept count, total count); the caller applies the predicate as
    * a residual filter, so the answer is exact whatever the prune kept. */
  def readPrunedEvolved(spark: SparkSession, table: String,
      preds: Map[String, String]): (DataFrame, Int, Int) = {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.readPrunedEvolved: no committed version at $table"))
    val lines = manifestLines(table, cur)
    require(lines.contains("# base:."),
      s"readPrunedEvolved on snapshot-mode table $table")
    val pvals: Map[String, Map[String, String]] = lines
      .filter(_.startsWith("# pval:"))
      .map { l =>
        val body = l.stripPrefix("# pval:")
        val (f, tup) = body.span(_ != '|')
        f -> tup.drop(1).split(',').filter(_.nonEmpty)
          .map { kv => val Array(c, v) = kv.split("=", 2); c -> v }.toMap
      }.toMap
    val files = lines.filterNot(_.startsWith("#"))
    val kept = files.filter { f =>
      val tuple = pvals.getOrElse(f, Map.empty)
      preds.forall { case (c, v) => tuple.get(c).forall(_ == v) }
    }
    // an all-pruned predicate is a legitimate empty RESULT, not an error
    // (ADVICE r14: pruning is an optimization, never a semantics change) —
    // return a schema-stable empty frame over the table's merged schema
    if (kept.isEmpty) {
      require(files.nonEmpty, s"readPrunedEvolved: empty manifest at $table v$cur")
      val empty = readMergedSchema(spark, files.map(f => s"$table/$f")).limit(0)
      (subtractDeletes(spark, table, lines, empty), 0, files.size)
    } else {
      val base = spark.read.parquet(kept.map(f => s"$table/$f"): _*)
      (subtractDeletes(spark, table, lines, base), kept.size, files.size)
    }
  }

  // ---- write-audit-publish staging (Iceberg WAP / Delta shadow-commit) ----

  /** Stage `df` as an UNPUBLISHED append: data lands under `wap=<id>/` and
    * the staged file list is recorded in `manifest-wap-<id>.txt` — a
    * namespace committed readers, writers, and the orphan-manifest check
    * never touch, so a staged batch is invisible to every consumer of the
    * table until [[publishWap]]. This is the audit gate production
    * pipelines put between ingest and visibility (Iceberg's `wap.id`
    * snapshot staging): land the data, run quality checks against
    * [[readWap]]'s preview, then publish metadata-only — or [[abortWap]]
    * and the table never knew. Re-staging the same id overwrites its own
    * data (idempotent retry). Staged files are pinned live against
    * [[vacuum]] by the wap manifest itself. */
  def stageWap(spark: SparkSession, table: String, df: DataFrame,
      wapId: String): Seq[String] = {
    require(wapId.matches("[A-Za-z0-9_-]+"), s"wap id must be path-safe: $wapId")
    val root = Paths.get(table)
    Files.createDirectories(root)
    val dataDir = root.resolve(s"wap=$wapId")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val walk = Files.walk(dataDir)
    val files =
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .map[String](p => root.relativize(p).toString)
        .sorted().toArray.map(_.toString).toSeq
      finally walk.close()
    val tmp = root.resolve(s"manifest-wap-$wapId.txt.tmp")
    Files.write(tmp, files.mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.move(tmp, wapManifest(table, wapId),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    files
  }

  private def wapManifest(table: String, wapId: String) =
    Paths.get(table, s"manifest-wap-$wapId.txt")

  /** Staged-but-unpublished wap ids (the audit queue). */
  def stagedWapIds(table: String): Seq[String] =
    Option(new java.io.File(table).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("manifest-wap-") && n.endsWith(".txt") =>
        n.stripPrefix("manifest-wap-").stripSuffix(".txt") }
      .sorted.toSeq

  private def wapFiles(table: String, wapId: String): Seq[String] = {
    val p = wapManifest(table, wapId)
    require(Files.exists(p), s"Acid: no staged wap '$wapId' at $table")
    val it = Files.readAllLines(p).iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) { val l = it.next().trim; if (l.nonEmpty) b += l }
    b.result()
  }

  /** The AUDIT view: current committed snapshot ∪ the staged batch —
    * exactly what [[publishWap]] would make visible (standing delete
    * vectors apply to the committed base; like [[appendTxn]], an append
    * does not resurrect deleted keys, so they subtract from the staged
    * rows too). Quality checks run here; the table's readers see none
    * of it. */
  def readWap(spark: SparkSession, table: String, wapId: String): DataFrame = {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.readWap: no committed version at $table"))
    val lines = manifestLines(table, cur)
    require(lines.contains("# base:."), s"readWap on snapshot-mode table $table")
    val all = lines.filterNot(_.startsWith("#")) ++ wapFiles(table, wapId)
    subtractDeletes(spark, table, lines,
      spark.read.parquet(all.map(f => s"$table/$f"): _*))
  }

  /** Publish a staged batch: a METADATA-ONLY commit through the same
    * CAS/rebase path as [[appendTxnCAS]] — the staged files are already
    * durable, so publish moves no data whatever the batch size (Iceberg's
    * cherry-pick of a wap snapshot). Idempotent per `txnId` via the txn
    * ledger; concurrent appends rebase exactly as append∥append does. The
    * wap manifest is retired on success (its files are now pinned by the
    * committed manifest). */
  def publishWap(table: String, wapId: String, txnId: Long): Long = {
    if (committedTxns(table).contains(txnId)) {
      // replayed retry — possibly after a crash between the commit and the
      // wap-manifest retirement below: finish the retirement, change nothing
      Files.deleteIfExists(wapManifest(table, wapId))
      return currentVersion(table).get
    }
    val files = wapFiles(table, wapId)
    val v = commitNextVersion(table) { (cur, prev) =>
      require(cur.isEmpty || prev.contains("# base:."),
        s"publishWap on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None // replay
    } { (_, prev) => appendManifest(prev, txnId, files) }
    Files.deleteIfExists(wapManifest(table, wapId))
    v
  }

  /** Drop a staged batch that failed its audit: manifest + data gone, the
    * table never saw it. */
  def abortWap(table: String, wapId: String): Unit = {
    Files.deleteIfExists(wapManifest(table, wapId))
    val dataDir = Paths.get(table, s"wap=$wapId")
    if (Files.exists(dataDir)) {
      val walk = Files.walk(dataDir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  private def commitManifest(table: String, v: Long, lines: Seq[String]): Long = {
    // CREATE_NEW: the manifest write is itself a put-if-absent, so two
    // writers who both believe they own v (possible only through stale-claim
    // reclamation racing a slow-but-live claimant) cannot silently clobber
    // each other — the loser throws FileAlreadyExistsException and rebases
    Files.write(Paths.get(table, s"manifest-$v.txt"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    val tmp = Paths.get(table, s"_current.tmp.$v")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, pointer(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Equality-delete transaction (merge-on-read) — Iceberg's equality
    * delete files / Delta's deletion-vector shape: instead of rewriting
    * every data file that contains a doomed row (copy-on-write, O(table)),
    * commit a tiny file of deleted KEYS and let readers subtract it. The
    * commit costs O(deleted keys); the read path applies one broadcast
    * anti-join (the delete set is orders of magnitude smaller than the
    * table, so AQE broadcasts it — the snapshot side never shuffles).
    * [[compactDeletes]] is the deferred copy-on-write that folds the
    * vectors back in during maintenance windows. Idempotent per txnId via
    * the same ledger as [[appendTxn]]. */
  def deleteTxn(spark: SparkSession, table: String, keys: DataFrame,
      keyCol: String, txnId: Long): Long = withWriterLock(table) {
    lazy val delFiles = { // written at most once
      val root = Paths.get(table)
      val delDir = root.resolve(s"del=$txnId")
      keys.select(col(keyCol)).distinct().coalesce(1)
        .write.mode("overwrite").parquet(delDir.toString)
      val walk = Files.walk(delDir)
      try walk.filter(p => p.toString.endsWith(".parquet"))
        .map[String](p => root.relativize(p).toString)
        .sorted().toArray.map(_.toString).toSeq
      finally walk.close()
    }
    commitNextVersion(table) { (cur, prev) =>
      val c = cur.getOrElse(sys.error(s"Acid.deleteTxn: no committed version at $table"))
      require(prev.contains("# base:."), s"deleteTxn on snapshot-mode table $table")
      val prevKey = prev.find(_.startsWith("# delkey:")).map(_.stripPrefix("# delkey:").trim)
      require(prevKey.forall(_ == keyCol),
        s"deleteTxn: table uses delete key ${prevKey.get}, got $keyCol")
      if (prev.contains(s"# txn:$txnId")) Some(c) else None // replay → no-op
    } { (_, prev) =>
      ("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        Seq(s"# delkey:$keyCol") ++
        (prev.filter(_.startsWith("# delete:")) ++ delFiles.map(f => s"# delete:$f")) ++
        // partition-evolution metadata, CHECK constraints, and per-file
        // stats survive merge-on-read deletes (the data files are
        // untouched, so their tuples/zone-maps/blooms still hold; # rows
        // stays PHYSICAL truth — logical counts subtract the vectors)
        prev.filter(l => l.startsWith("# pval:") || l.startsWith("# pspec:") ||
          l.startsWith("# constraint:") || l.startsWith("# minmax:") ||
          l.startsWith("# bloom:") || l.startsWith("# rows:") ||
          l.startsWith("# colmap:") || l.startsWith("# coldrop:") ||
          l.startsWith("# firstrow:") || l.startsWith("# rowid_phys:") ||
          l.startsWith("# rowid_next:") || l.startsWith("# coldefault:") ||
          l.startsWith("# pdel:") || l.startsWith("# prop:")) ++
        prev.filterNot(_.startsWith("#"))
    }
  }

  /** Fold standing delete vectors into the data (deferred copy-on-write):
    * reads the merged current state, rewrites it as `txn=<txnId>/`, and
    * commits a manifest with NO delete lines — the maintenance operator
    * that keeps the read-path anti-join small. The txn ledger is carried
    * forward so streaming exactly-once resumption survives compaction. */
  def compactDeletes(spark: SparkSession, table: String, txnId: Long): Long =
    rewriteCommit(spark, table, txnId, "compactDeletes")(identity)(_ => Seq.empty)

  /** OPTIMIZE — small-file compaction + clustering (Delta `OPTIMIZE …
    * ZORDER BY` / Iceberg `rewrite_data_files`): rewrite the live merged
    * snapshot as `targetFiles` files, range-clustered on `clusterCol`
    * (bin-pack only when None), in one rewrite commit. This is the
    * maintenance operator for the small-files problem a streaming sink
    * creates by construction — a commit per micro-batch means O(batches)
    * tiny files, and every later scan pays per-file open cost while zone
    * maps stay useless because ARRIVAL order clusters nothing. After the
    * rewrite each file owns a disjoint `clusterCol` slice, so the
    * `stats` zone maps harvested here make [[readSkipping]] sharp —
    * compaction is what MAKES data skipping effective, they are one
    * operation at 100 TB, not two. Standing delete vectors fold in (the
    * rewrite reads the merged state), the txn ledger is carried forward
    * (streaming exactly-once survives, replay no-ops), and a commit
    * racing the rewrite triggers the stale-snapshot retry rather than
    * being silently dropped — same loop as [[compactDeletes]]. */
  def optimize(spark: SparkSession, table: String, txnId: Long,
      targetFiles: Int, clusterCol: Option[String] = None,
      stats: Option[(String, Column)] = None,
      bloom: Option[(String, Column)] = None): Long = {
    require(targetFiles >= 1, "optimize: targetFiles must be >= 1")
    rewriteCommit(spark, table, txnId, "optimize") { merged =>
      clusterCol match {
        case Some(c) => merged.repartitionByRange(targetFiles, col(c))
        case None    => merged.coalesce(targetFiles)
      }
    } { newFiles =>
      // zone maps for the freshly clustered files (root-relative paths, so
      // [[skipFiles]] matches them against the manifest's data lines). At
      // 100 TB these come free from the parquet footers the rewrite just
      // wrote; the narrow re-read is fixture-scale convenience, same as
      // [[commit]]'s stat harvest.
      stats.toSeq.flatMap { case (name, expr) =>
        val root = Paths.get(table).toAbsolutePath
        spark.read.parquet(newFiles.map(f => s"$table/$f"): _*)
          .groupBy(input_file_name().as("f"))
          .agg(min(expr).as("lo"), max(expr).as("hi"))
          .collect() // O(files) rows — manifest-construction control plane
          .map { r =>
            val rel = root.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString
            s"# minmax:$rel|$name|${r.getLong(1)}|${r.getLong(2)}"
          }.sorted
      } ++
      // file-level blooms for append-mode tables (commit's bloom harvest,
      // root-relative) — the point-lookup index [[eraseKeys]] prunes by
      bloom.toSeq.flatMap { case (name, expr0) =>
        bloomLines(spark, newFiles.map(f => s"$table/$f"),
          Paths.get(table).toAbsolutePath, name, expr0)
      }
    }
  }

  /** Partition-scoped OPTIMIZE — Delta's `OPTIMIZE ... WHERE` / Iceberg
    * `rewrite_data_files(where)`: compact ONLY the files whose recorded
    * partition tuple (`# pval:`) names `part._1 = part._2`, leaving every
    * other file byte-untouched. This is the maintenance shape a streaming
    * ingest actually needs — yesterday's partition compacts while today's
    * keeps appending and the rest of the 100 TB table is never read,
    * listed, or rewritten; a full [[optimize]] would pay O(table) for a
    * one-partition problem. The compacted files inherit exactly the
    * selector as their tuple (other tuple columns go unnamed, which the
    * [[readPrunedHidden]] contract treats as always-kept — pruning stays
    * exact across the rewrite). Standing delete vectors subtract from the
    * rewritten rows and CARRY FORWARD (they still hide rows in survivor
    * files — contrast [[optimize]], which folds and drops them); stat
    * lines for replaced files drop, survivors' stats stay live.
    * Idempotent per txnId; stale-snapshot rebase like every rewrite. */
  def optimizeWhere(spark: SparkSession, table: String, txnId: Long,
      targetFiles: Int, part: (String, Long)): Long = {
    require(targetFiles >= 1, "optimizeWhere: targetFiles must be >= 1")
    val (name, value) = part
    val StaleSnapshot = -2L
    var attempts = 0
    var out = StaleSnapshot
    while (out == StaleSnapshot) {
      attempts += 1
      require(attempts <= 50, s"optimizeWhere: concurrent-commit retry limit on $table")
      val snapV = currentVersion(table).getOrElse(
        sys.error(s"Acid.optimizeWhere: no committed version at $table"))
      val lines = manifestLines(table, snapV)
      if (lines.contains(s"# txn:$txnId")) return snapV // replay → no-op
      require(lines.contains("# base:."),
        s"optimizeWhere on snapshot-mode table $table")
      // same guard as [[rewriteCommit]] (ADVICE r17): a partition-scoped
      // rewrite drops the selected files' `# firstrow:` assignments, so a
      // later assignRowIds would silently re-issue ids — row lineage must
      // compact through optimizeLineage, which materializes the ids
      require(!lines.exists(l => l.startsWith("# firstrow:") ||
        l.startsWith("# rowid_phys:") || l.startsWith("# rowid_next:")),
        s"optimizeWhere on row-lineage table $table — use optimizeLineage " +
          "(it materializes ids through the rewrite)")
      val sel = lines.collect {
        case l if l.startsWith("# pval:") =>
          val body = l.stripPrefix("# pval:")
          val (f, tuple) = body.span(_ != '|')
          (f, tuple.drop(1).split(',').toSeq)
      }.collect { case (f, comps) if comps.contains(s"$name=$value") => f }
      require(sel.nonEmpty,
        s"optimizeWhere: no file's partition tuple names $name=$value")
      val selSet = sel.toSet
      // footer-union read under schema evolution, like [[readRewriteSnapshot]]
      // — a plain scan would let an arbitrary footer drop a generation's
      // stored column from the rewrite (ADVICE r17)
      val selScan = if (mixedGenerations(lines))
        readMergedSchema(spark, sel.map(f => s"$table/$f"))
      else spark.read.parquet(sel.map(f => s"$table/$f"): _*)
      val merged = subtractDeletes(spark, table, lines, selScan)
        .coalesce(targetFiles).cache()
      merged.count() // materialize BEFORE the lock
      try out = withWriterLock(table) {
        commitNextVersion(table) { (cur, prev) =>
          if (prev.contains(s"# txn:$txnId")) Some(cur.get)
          else if (cur.get != snapV) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          val newFiles = writeTxnData(spark, table, merged, txnId)
          val deadMeta = (l: String) => sel.exists(f =>
            l.startsWith(s"# pval:$f|") || l.startsWith(s"# minmax:$f|") ||
              l.startsWith(s"# bloom:$f|") || l.startsWith(s"# rows:$f|") ||
              l.startsWith(s"# firstrow:$f|"))
          ("# base:." +: s"# op:rewrite:optimizeWhere" +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") && !deadMeta(l)) ++
            newFiles.map(f => s"# pval:$f|$name=$value") ++
            prev.filterNot(_.startsWith("#")).filterNot(selSet) ++ newFiles
        }
      } finally merged.unpersist(blocking = false)
    }
    out
  }

  /** ANALYZE — retrofit manifest STATISTICS onto existing files,
    * metadata-only (Delta `ANALYZE TABLE ... COMPUTE STATISTICS` /
    * Iceberg `compute_table_stats`): tables written before a stats
    * policy existed (or by writers that skipped the harvest) get zone
    * maps, blooms, and row counts WITHOUT rewriting a byte — the scan
    * cost is one pass over exactly the files MISSING the requested
    * line (files that already carry it are skipped, so re-analyzing is
    * incremental), and the commit is one new manifest. This is what
    * turns an inherited pile of parquet into a skippable table — at
    * 100 TB, retrofit-then-skip beats rewrite by the size of the lake.
    * Idempotent per txnId. */
  def analyzeTable(spark: SparkSession, table: String, txnId: Long,
      stats: Option[(String, Column)] = None,
      bloom: Option[(String, Column)] = None,
      rowCounts: Boolean = false): Long = withWriterLock(table) {
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isDefined, s"Acid.analyzeTable: no committed version at $table")
      require(prev.contains("# base:."),
        s"analyzeTable on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (_, prev) =>
      val files = prev.filterNot(_.startsWith("#"))
      val root = Paths.get(table).toAbsolutePath
      def rel(uri: String) =
        root.relativize(Paths.get(java.net.URI.create(uri))).toString
      val statLines = stats.toSeq.flatMap { case (name, e) =>
        val missing = files.filterNot(f =>
          prev.exists(_.startsWith(s"# minmax:$f|$name|")))
        if (missing.isEmpty) Seq.empty
        else spark.read.parquet(missing.map(f => s"$table/$f"): _*)
          .groupBy(input_file_name().as("f"))
          .agg(min(e).as("lo"), max(e).as("hi"))
          .filter(col("lo").isNotNull) // all-null/empty files carry no line
          .collect() // O(files) rows — manifest control plane
          .map(r => s"# minmax:${rel(r.getString(0))}|$name|${r.getLong(1)}|${r.getLong(2)}")
          .sorted.toSeq
      }
      val bloomStatLines = bloom.toSeq.flatMap { case (name, e) =>
        val missing = files.filterNot(f =>
          prev.exists(_.startsWith(s"# bloom:$f|$name|")))
        if (missing.isEmpty) Seq.empty
        else bloomLines(spark, missing.map(f => s"$table/$f"), root, name, e)
      }
      val rowLines = if (!rowCounts) Seq.empty else {
        val missing = files.filterNot(f => prev.exists(_.startsWith(s"# rows:$f|")))
        // counts from the immutable files' footers — no scan job (r20)
        missing.map(f => f -> footerRowCount(spark, s"$table/$f"))
          .filter(_._2 > 0)
          .map { case (f, n) => s"# rows:$f|$n" }.sorted
      }
      ("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:")) ++
        statLines ++ bloomStatLines ++ rowLines ++ files
    }
  }

  // ---- table properties (Delta TBLPROPERTIES / Iceberg properties) ----

  /** SET TBLPROPERTIES — metadata-only `# prop:<k>|<v>` manifest lines:
    * re-SETting a key replaces its value, properties survive every commit
    * class (the whitelists + generic metadata carries), and they are the
    * operator-facing knob store DESCRIBE surfaces. Idempotent per txnId. */
  def setProperties(table: String, props: Seq[(String, String)],
      txnId: Long): Long = withWriterLock(table) {
    require(props.nonEmpty, "setProperties: empty property list")
    props.foreach { case (k, v) =>
      require(k.nonEmpty && !k.contains('|') && !k.contains('\n'),
        s"setProperties: bad key '$k'")
      require(!v.contains('\n'), s"setProperties: bad value for '$k'")
    }
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isDefined, s"Acid.setProperties: no committed version at $table")
      require(prev.contains("# base:."),
        s"setProperties on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (_, prev) =>
      val keys = props.map(_._1).toSet
      def propKey(l: String) = l.stripPrefix("# prop:").takeWhile(_ != '|')
      (("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:") &&
          !(l.startsWith("# prop:") && keys.contains(propKey(l)))) ++
        props.map { case (k, v) => s"# prop:$k|$v" }) ++
        prev.filterNot(_.startsWith("#"))
    }
  }

  /** Current table properties (insertion-independent: sorted by key). */
  def properties(table: String): Seq[(String, String)] =
    headLines(table).collect { case l if l.startsWith("# prop:") =>
      val body = l.stripPrefix("# prop:")
      val (k, v) = body.span(_ != '|')
      (k, v.drop(1))
    }.sortBy(_._1)

  /** DESCRIBE — the evolved schema (post column-mapping, defaults
    * visible) plus table properties, as (section, name, value) rows:
    * metadata-only except one footer read for the merged schema. */
  def describeTable(spark: SparkSession, table: String): DataFrame = {
    val cols = readEvolved(spark, table).schema.fields.toSeq
      .map(f => ("column", f.name, f.dataType.simpleString))
    val props = properties(table).map { case (k, v) => ("property", k, v) }
    import spark.implicits._
    (cols ++ props).toDF("section", "name", "value")
  }

  // ---- row lineage (Iceberg v3 row ids, assigned lazily) ----

  /** Assign STABLE ROW IDS to every data file lacking one — Iceberg v3's
    * row-lineage upgrade done the metadata-only way: each file gets a
    * `# firstrow:<file>|<id>` manifest line claiming the contiguous id
    * range [id, id + rows), and a reader materializes
    * `row_id = firstrow + _metadata.row_index` — ZERO data rewrite, zero
    * shuffle, O(files) metadata. The table-level `# rowid_next:`
    * high-water mark makes re-runs INCREMENTAL (only files appended since
    * the last assignment pay a count pass, and `# rows:` lines recorded
    * by ANALYZE are reused for free) and guarantees ids are never reused
    * — the contract an incremental downstream consumer (CDC indexing,
    * feature-store sync) keys its bookkeeping on. Idempotent per txnId. */
  def assignRowIds(spark: SparkSession, table: String, txnId: Long): Long =
    withWriterLock(table) {
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isDefined, s"Acid.assignRowIds: no committed version at $table")
      require(prev.contains("# base:."),
        s"assignRowIds on snapshot-mode table $table")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (_, prev) =>
      val files = prev.filterNot(_.startsWith("#"))
      val assigned = prev.collect {
        case l if l.startsWith("# firstrow:") =>
          l.stripPrefix("# firstrow:").takeWhile(_ != '|')
      }.toSet
      val phys = prev.collect { case l if l.startsWith("# rowid_phys:") =>
        l.stripPrefix("# rowid_phys:").trim }.toSet
      val missing = files.filterNot(f => assigned(f) || phys(f)).sorted
      val recorded: Map[String, Long] = prev.collect {
        case l if l.startsWith("# rows:") =>
          val body = l.stripPrefix("# rows:")
          val (f, n) = body.span(_ != '|')
          f -> n.drop(1).toLong
      }.toMap
      val toCount = missing.filterNot(recorded.contains)
      // counts from the immutable files' footers — no scan job (r20)
      val counted: Map[String, Long] =
        toCount.map(f => f -> footerRowCount(spark, s"$table/$f")).toMap
      var next = prev.find(_.startsWith("# rowid_next:"))
        .map(_.stripPrefix("# rowid_next:").trim.toLong).getOrElse(0L)
      val newLines = missing.map { f =>
        val line = s"# firstrow:$f|$next"
        next += counted.getOrElse(f, recorded.getOrElse(f, 0L))
        line
      }
      (("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:") &&
          !l.startsWith("# rowid_next:")) ++
        newLines :+ s"# rowid_next:$next") ++ files
    }
  }

  /** Read with lineage: the table's columns + `row_id`. Lazily-assigned
    * files compute `firstrow + _metadata.row_index` (a broadcast of the
    * O(files) map — the data never shuffles); files rewritten by
    * [[optimizeLineage]] carry the id MATERIALIZED (`__row_id`) and read
    * it back directly. Standing delete vectors subtract as everywhere
    * else — a hidden row keeps its id for when MERGE resurrects the key. */
  def readLineage(spark: SparkSession, table: String): DataFrame = {
    val lines = headLines(table)
    subtractDeletes(spark, table, lines, lineageFrameFor(spark, table, lines,
      lines.filterNot(_.startsWith("#")), "readLineage"))
  }

  /** The row_id-attached frame for a SUBSET of a manifest's data files —
    * the shared kernel of [[readLineage]] (all files) and
    * [[updateWhereLineage]] (the predicate-touched files only). No
    * delete-vector subtraction here; callers decide. */
  private def lineageFrameFor(spark: SparkSession, table: String,
      lines: Seq[String], files: Seq[String], what: String): DataFrame = {
    val first: Map[String, Long] = lines.collect {
      case l if l.startsWith("# firstrow:") =>
        val b = l.stripPrefix("# firstrow:")
        val (f, v) = b.span(_ != '|')
        f -> v.drop(1).toLong
    }.toMap
    val phys = lines.collect { case l if l.startsWith("# rowid_phys:") =>
      l.stripPrefix("# rowid_phys:").trim }.toSet
    files.find(f => !first.contains(f) && !phys(f)).foreach(f => sys.error(
      s"Acid.$what: $f has no row-id assignment — run assignRowIds first"))
    val lazyFiles = files.filterNot(phys)
    val physFiles = files.filter(phys)
    // LOGICAL frame per part (r19 — lineage × schema evolution, the
    // Iceberg-v3 combination): on a mixed-generation table each part
    // footer-unions its files, attaches row_id against the PHYSICAL
    // layout (ids are positional — they must resolve before any
    // projection), then applies colmap + defaults so both parts land the
    // post-evolution schema and union cleanly. Single-generation tables
    // take the exact pre-r19 path (plain scans, no-op mapping).
    val mixed = mixedGenerations(lines)
    def rd(fs: Seq[String]) =
      if (mixed) readMergedSchema(spark, fs.map(f => s"$table/$f"))
      else spark.read.parquet(fs.map(f => s"$table/$f"): _*)
    def logical(df: DataFrame): DataFrame =
      applyColumnDefaults(lines, applyColumnMapping(lines, df))
    val parts = Seq(
      if (lazyFiles.isEmpty) None else Some {
        val base = rd(lazyFiles)
        require(!base.columns.contains("row_id"),
          s"$what: $table already has a row_id data column")
        val dataCols = base.columns.toSeq
        val uriMap = lazyFiles.map(f =>
          (Paths.get(table, f).toAbsolutePath.toUri.toString, first(f)))
        val mapDf = spark.createDataFrame(uriMap).toDF("__uri", "__first")
        logical(base
          .withColumn("__uri", input_file_name())
          .withColumn("__idx", col("_metadata.row_index"))
          .join(org.apache.spark.sql.functions.broadcast(mapDf), Seq("__uri"))
          .withColumn("row_id", col("__first") + col("__idx"))
          .select(dataCols.map(col) :+ col("row_id"): _*))
      },
      if (physFiles.isEmpty) None else Some {
        logical(rd(physFiles).withColumnRenamed("__row_id", "row_id"))
      }
    ).flatten
    // a lineage table erased/deleted down to ZERO data files has no footer
    // to derive a schema from — loud and explanatory instead of the bare
    // empty.reduce crash (r19 review); a fresh append + assignRowIds
    // re-enables the table
    require(parts.nonEmpty,
      s"Acid.$what: $table has no data files (fully-erased lineage " +
        "table?) — append + assignRowIds to re-enable lineage reads")
    parts.reduce(_ unionByName _)
  }

  /** `UPDATE ... SET ... WHERE` on a ROW-LINEAGE table, copy-on-write,
    * ids PRESERVED — the Iceberg v3 DML contract the plain [[updateWhere]]
    * refuses (its rewrite would drop the touched files' id assignments to
    * a loud re-assign): rows in predicate-touched files rewrite WITH their
    * `row_id` materialized as a physical `__row_id` column (the
    * [[optimizeLineage]] mechanism), so a touched row keeps its id across
    * the UPDATE and untouched files keep their lazy `# firstrow:`
    * assignment lines byte-for-byte. SET semantics are [[updateWhere]]'s
    * exactly (simultaneous projection against the PRE-update row; standing
    * vectors subtract first so a hidden row can neither update nor
    * resurrect). The `# rowid_next:` high-water mark carries — later
    * appends still allocate above every id ever issued. Cost is O(files
    * the predicate touches), never O(table); stale-snapshot rebase and
    * per-txnId idempotence as everywhere. */
  def updateWhereLineage(spark: SparkSession, table: String,
      sets: Seq[(String, Column)], pred: Column,
      txnId: Long): (Long, Int, Int) = withWriterLock(table) {
    require(sets.nonEmpty, "updateWhereLineage: no SET assignments")
    val bySet = sets.toMap
    require(bySet.size == sets.size, "updateWhereLineage: duplicate SET column")
    require(!bySet.contains("row_id") && !bySet.contains("__row_id"),
      "updateWhereLineage: row_id is the lineage identity — not assignable")
    val StaleSnapshot = -2L
    var attempts = 0
    var result: (Long, Int, Int) = null
    while (result == null) {
      attempts += 1
      require(attempts <= 50,
        s"updateWhereLineage: concurrent-commit retry limit on $table")
      val cur = currentVersion(table)
      val lines = cur.map(manifestLines(table, _)).getOrElse(
        sys.error(s"Acid.updateWhereLineage: no committed version at $table"))
      if (lines.contains(s"# txn:$txnId")) {
        result = (cur.get, 0, lines.count(!_.startsWith("#"))) // replay → no-op
      } else {
        require(lines.contains("# base:."),
          s"updateWhereLineage on snapshot-mode table $table")
        require(lines.exists(l => l.startsWith("# firstrow:") ||
          l.startsWith("# rowid_phys:")),
          s"updateWhereLineage on $table: not a row-lineage table — " +
            "use updateWhere (or assignRowIds first)")
        val all = lines.filterNot(_.startsWith("#"))
        val root = Paths.get(table).toAbsolutePath
        // probe over the LOGICAL frame (r19 — lineage × evolution): the
        // predicate sees post-rename names and default-filled values
        val touched = if (all.isEmpty) Seq.empty[String]
        else readLogical(spark, table, lines, all)
          .filter(pred)
          .select(input_file_name().as("f")).distinct()
          .collect() // O(files) rows — manifest-construction control plane
          .map(r => root.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString)
          .sorted.toSeq
        val touchedSet = touched.toSet
        val newFiles =
          if (touched.isEmpty) Seq.empty[String]
          else {
            val base = subtractDeletes(spark, table, lines,
              lineageFrameFor(spark, table, lines, touched, "updateWhereLineage"))
            sets.foreach { case (c, _) =>
              require(base.columns.contains(c), s"updateWhereLineage: no column $c") }
            val dataCols = base.columns.toSeq.filterNot(_ == "row_id")
            val updated = base.select(dataCols.map { c =>
              bySet.get(c) match {
                case Some(e) => when(pred, e).otherwise(col(c)).as(c)
                case None    => col(c)
              }
            } :+ col("row_id").as("__row_id"): _*)
            writeTxnDataChecked(spark, table, updated, txnId, lines,
              "updateWhereLineage")
          }
        val deadMeta = deadStatLines(touched, lineage = true) _
        val v = commitNextVersion(table) { (c, prev) =>
          if (prev.contains(s"# txn:$txnId")) Some(c.get)
          else if (c != cur) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          ("# base:." +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") && !deadMeta(l)) ++
            newFiles.map(f => s"# rowid_phys:$f") ++
            prev.filterNot(_.startsWith("#")).filterNot(touchedSet) ++ newFiles
        }
        if (v != StaleSnapshot) result = (v, touched.size, all.size)
      }
    }
    result
  }

  /** MERGE INTO a ROW-LINEAGE table, copy-on-write, ids PRESERVED AND
    * ALLOCATED — the Iceberg v3 MERGE contract completing
    * [[updateWhereLineage]]:
    *
    *  - MATCHED → update: the change row replaces the target row but
    *    KEEPS the target's `row_id` (identity survives the value change);
    *  - NOT MATCHED → insert: fresh ids allocate from the
    *    `# rowid_next:` high-water mark, deterministically (inserts
    *    ordered by `keyCol`), and the mark advances — an id is never
    *    reused, even for a key deleted and re-inserted (the resurrected
    *    key is a NEW row with a NEW id, Iceberg's rule);
    *  - MATCHED + op "delete": the row goes and its id simply retires.
    *
    * Mechanics are [[mergeCow]]'s (findTouchedFiles probe, touched-only
    * rewrite, survivors byte-untouched) with the rewrite running over the
    * id-attached frame and landing `__row_id` physically
    * (`# rowid_phys:` marks). Standing delete vectors subtract before
    * matching, and upserted keys leave the vector (resurrection = insert
    * with a fresh id). Cost O(files containing a matched key), never
    * O(table). Idempotent per txnId; locked like [[updateWhereLineage]]
    * (the high-water allocation must serialize with other writers).
    * Returns (version, touched files, total files). */
  def mergeCowLineage(spark: SparkSession, table: String, changes: DataFrame,
      keyCol: String, txnId: Long,
      opCol: Option[String] = None): (Long, Int, Int) = withWriterLock(table) {
    val StaleSnapshot = -2L
    var attempts = 0
    var result: (Long, Int, Int) = null
    while (result == null) {
      attempts += 1
      require(attempts <= 50, s"mergeCowLineage: concurrent-commit retry limit on $table")
      val cur = currentVersion(table)
      val lines = cur.map(manifestLines(table, _)).getOrElse(
        sys.error(s"Acid.mergeCowLineage: no committed version at $table"))
      if (lines.contains(s"# txn:$txnId")) {
        result = (cur.get, 0, lines.count(!_.startsWith("#"))) // replay → no-op
      } else {
        require(lines.contains("# base:."),
          s"mergeCowLineage on snapshot-mode table $table")
        require(lines.exists(l => l.startsWith("# firstrow:") ||
          l.startsWith("# rowid_phys:")),
          s"mergeCowLineage on $table: not a row-lineage table — use mergeCow")
        val next = lines.find(_.startsWith("# rowid_next:"))
          .map(_.stripPrefix("# rowid_next:").trim.toLong).getOrElse(
            sys.error(s"mergeCowLineage: $table has no rowid_next mark — " +
              "run assignRowIds first"))
        val all = lines.filterNot(_.startsWith("#"))
        val root = Paths.get(table).toAbsolutePath
        // FREEZE the change frame before anything reads it (the same rule
        // mergeCowBranch applies, and here it is correctness-critical: the
        // id allocation below runs SEVERAL actions over the changes — a
        // nondeterministic plan re-evaluating between inserts.count() and
        // the data write would make the committed `# rowid_next:` mark
        // disagree with the ids actually written → silent id reuse)
        val chgDir = Paths.get(table).resolve(s"chg=$txnId")
        changes.write.mode("overwrite").parquet(chgDir.toString)
        val changesF = spark.read.parquet(
          listParquet(table, chgDir).map(f => s"$table/$f"): _*)
        val allKeys = changesF.select(col(keyCol)).distinct()
        val upserts = opCol match {
          case Some(o) => changesF.filter(col(o) =!= "delete").drop(o)
          case None    => changesF
        }
        // key probe over the LOGICAL frame (r19 — lineage × evolution)
        val touched = if (all.isEmpty) Seq.empty[String]
        else touchedFilesPlanOver(readLogical(spark, table, lines, all),
          allKeys, keyCol)
          .collect() // O(files) rows — manifest-construction control plane
          .map(r => root.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString)
          .sorted.toSeq
        val touchedSet = touched.toSet
        // the VISIBLE id-attached target slice (vectors subtracted — a
        // hidden row neither matches nor donates its id)
        val target =
          if (touched.isEmpty) null
          else subtractDeletes(spark, table, lines,
            lineageFrameFor(spark, table, lines, touched, "mergeCowLineage"))
            .cache()
        val dataCols: Seq[String] =
          if (target != null) target.columns.toSeq.filterNot(_ == "row_id")
          else upserts.columns.toSeq
        // matched = change rows whose key is VISIBLE somewhere in the
        // table; since touched covers every file containing a change key,
        // visible-in-table == visible-in-target. The no-touched-file MERGE
        // (pure inserts / deletes of absent keys) has an EMPTY matched set
        // — shaped with the row_id column the projection below resolves
        val targetIds =
          if (target == null) null
          else target.select(col(keyCol), col("row_id")).cache()
        val matchedUpserts =
          if (target == null) upserts.limit(0).withColumn("row_id", lit(0L))
          else upserts.join(targetIds, Seq(keyCol), "inner")
        val inserts0 =
          if (target == null) upserts
          else upserts.join(targetIds.select(col(keyCol)), Seq(keyCol), "left_anti")
        // deterministic fresh-id allocation: inserts ordered by key (the
        // insert side is the change batch — O(batch) through one window)
        val w = org.apache.spark.sql.expressions.Window.orderBy(col(keyCol))
        val inserts = inserts0
          .withColumn("row_id",
            lit(next) + org.apache.spark.sql.functions.row_number().over(w) - 1L)
        val nInserts = inserts.count()
        val carried =
          if (target == null) inserts.limit(0)
          else target.join(allKeys, Seq(keyCol), "left_anti")
        val rewritten = carried
          .unionByName(matchedUpserts.select((dataCols.map(col) :+ col("row_id")): _*))
          .unionByName(inserts.select((dataCols.map(col) :+ col("row_id")): _*))
          .withColumnRenamed("row_id", "__row_id")
        val newFiles =
          if (target == null && nInserts == 0) Seq.empty[String]
          else {
            checkConstraintLines(lines, rewritten, "mergeCowLineage")
            writeTxnData(spark, table, rewritten, txnId)
          }
        // vector reconciliation, mergeCow's rule: upserted keys leave the
        // standing vector (the insert above is the resurrection)
        val vectorLines = reconcileVector(spark, table, lines,
          upserts.select(col(keyCol)).distinct(), keyCol,
          Paths.get(table).resolve(s"del=$txnId"), "mergeCowLineage")
        val deadMeta = deadStatLines(touched, lineage = true) _
        val v = commitNextVersion(table) { (c, prev) =>
          if (prev.contains(s"# txn:$txnId")) Some(c.get)
          else if (c != cur) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          ("# base:." +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            vectorLines ++
            prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") &&
              !l.startsWith("# delkey:") && !l.startsWith("# delete:") &&
              !l.startsWith("# rowid_next:") && !deadMeta(l)) ++
            Seq(s"# rowid_next:${next + nInserts}") ++
            newFiles.map(f => s"# rowid_phys:$f") ++
            prev.filterNot(_.startsWith("#")).filterNot(touchedSet) ++ newFiles
        }
        if (target != null) {
          target.unpersist(blocking = false)
          targetIds.unpersist(blocking = false)
        }
        if (v != StaleSnapshot) result = (v, touched.size, all.size)
      }
    }
    result
  }

  /** Compaction that PRESERVES row ids — what Iceberg v3 does on any
    * rewrite: the compacted files carry the id MATERIALIZED as a physical
    * `__row_id` column (`# rowid_phys:` manifest mark), so a row's id
    * survives arbitrarily many maintenance cycles; standing delete
    * vectors fold in; the `# rowid_next:` high-water mark carries so later
    * appends keep allocating above every id ever issued. Plain
    * [[read]]/[[optimize]] remain the non-lineage path — a lineage table
    * is read through [[readLineage]]. */
  def optimizeLineage(spark: SparkSession, table: String, txnId: Long,
      targetFiles: Int, clusterCol: Option[String] = None): Long = {
    require(targetFiles >= 1, "optimizeLineage: targetFiles must be >= 1")
    val StaleSnapshot = -2L
    var attempts = 0
    var out = StaleSnapshot
    while (out == StaleSnapshot) {
      attempts += 1
      require(attempts <= 50, s"optimizeLineage: concurrent-commit retry limit on $table")
      val snapV = currentVersion(table).getOrElse(
        sys.error(s"Acid.optimizeLineage: no committed version at $table"))
      // readLineage resolves the LOGICAL frame (r19): on an evolved table
      // the compaction materializes post-rename names and default-filled
      // values — after this rewrite every file is current-generation, the
      // carried colmap/coldrop lines resolve to no-ops, and the defaults
      // are STORED (their auto NOT NULL constraints carry, so future
      // checked appends keep the exactness contract)
      val merged0 = readLineage(spark, table).withColumnRenamed("row_id", "__row_id")
      val merged = (clusterCol match {
        case Some(c) => merged0.repartitionByRange(targetFiles, col(c))
        case None    => merged0.coalesce(targetFiles)
      }).cache()
      merged.count() // materialize BEFORE the lock
      try out = withWriterLock(table) {
        commitNextVersion(table) { (cur, prev) =>
          require(prev.contains("# base:."),
            s"optimizeLineage on snapshot-mode table $table")
          if (prev.contains(s"# txn:$txnId")) Some(cur.get)
          else if (cur.get != snapV) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          val newFiles = writeTxnData(spark, table, merged, txnId)
          ("# base:." +: s"# op:rewrite:optimizeLineage" +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            // coldefault carries too (r19): the rewrite STORES the fill,
            // but the default stays table metadata for future appends —
            // a later file missing the column must still read the default
            prev.filter(l => l.startsWith("# constraint:") ||
              l.startsWith("# colmap:") || l.startsWith("# coldrop:") ||
              l.startsWith("# coldefault:") ||
              l.startsWith("# rowid_next:") || l.startsWith("# prop:")) ++
            newFiles.map(f => s"# rowid_phys:$f") ++ newFiles
        }
      } finally merged.unpersist(blocking = false)
    }
    out
  }

  /** True iff the manifest mixes file GENERATIONS whose parquet footers
    * can disagree — a rename/drop/default landed while older files stayed
    * on disk. A rewrite reading such a set with a plain parquet scan lets
    * an ARBITRARY footer win schema inference: the later generation's
    * stored column silently vanishes from the rewrite, and a carried
    * `# coldefault:` line then masquerades the lost values as the default
    * on the next [[readEvolved]] — silent corruption (ADVICE r17). */
  private def mixedGenerations(lines: Seq[String]): Boolean =
    lines.exists(l => l.startsWith("# colmap:") ||
      l.startsWith("# coldrop:") || l.startsWith("# coldefault:"))

  /** Rewrite-path snapshot read: plain parquet normally; footer-UNION
    * (`mergeSchema`) when [[mixedGenerations]] — the union frame keeps
    * every generation's physical columns (pre-evolution rows surface NULL
    * in later columns, exactly as they do on disk), so the carried
    * colmap/coldefault lines keep resolving over the rewritten files and
    * no stored value is lost. Root-relative manifests only (every rewrite
    * caller requires `# base:.` at commit; non-append tables fall back to
    * [[readVersion]] to preserve its failure mode). */
  private def readRewriteSnapshot(spark: SparkSession, table: String,
      v: Long): DataFrame = {
    val lines = manifestLines(table, v)
    if (!lines.contains("# base:.") || !mixedGenerations(lines))
      readVersion(spark, table, v)
    else {
      val files = lines.filterNot(_.startsWith("#"))
      subtractDeletes(spark, table, lines,
        readMergedSchema(spark, files.map(f => s"$table/$f")))
    }
  }

  /** Shared snapshot-rewrite commit loop ([[compactDeletes]] /
    * [[optimize]]): materialize the merged current state OUTSIDE the lock
    * (the rewrite must not read files its own manifest is about to stop
    * referencing), apply `layout`, land as `txn=<txnId>/`, and commit a
    * manifest of ledger + `headers(newFiles)` + the new files only — no
    * delete lines (the rewrite folded them in). A commit landing between
    * materialization and the lock restarts the loop against the advanced
    * state; committing the stale snapshot would silently drop that
    * writer's rows. */
  private def rewriteCommit(spark: SparkSession, table: String, txnId: Long,
      what: String)(layout: DataFrame => DataFrame)(
      headers: Seq[String] => Seq[String]): Long = {
    val StaleSnapshot = -2L
    var attempts = 0
    var out = StaleSnapshot
    while (out == StaleSnapshot) {
      attempts += 1
      require(attempts <= 50, s"$what: concurrent-commit retry limit on $table")
      val snapV = currentVersion(table).getOrElse(
        sys.error(s"Acid.$what: no committed version at $table"))
      val merged = layout(readRewriteSnapshot(spark, table, snapV)).cache()
      merged.count() // materialize BEFORE the lock
      try out = withWriterLock(table) {
        commitNextVersion(table) { (cur, prev) =>
          require(prev.contains("# base:."),
            s"$what on snapshot-mode table $table")
          // a plain rewrite would drop the row-id assignments AND the
          // never-reuse high-water mark — silent id recycling downstream
          require(!prev.exists(l => l.startsWith("# firstrow:") ||
            l.startsWith("# rowid_phys:") || l.startsWith("# rowid_next:")),
            s"$what on row-lineage table $table — use optimizeLineage " +
              "(it materializes ids through the rewrite)")
          if (prev.contains(s"# txn:$txnId")) Some(cur.get) // replay → no-op
          else if (cur.get != snapV) Some(StaleSnapshot)
          else None
        } { (_, prev) =>
          val newFiles = writeTxnData(spark, table, merged, txnId)
          // "# op:rewrite" = Delta's dataChange=false: the commit replaced
          // files without logical change, so streaming readers may cross it
          // contributing nothing (background OPTIMIZE must not break tailing
          // consumers). Commit-local by construction: appendManifest carries
          // only txn/delete headers forward.
          ("# base:." +: s"# op:rewrite:$what" +:
            (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
            // CHECK constraints are table invariants — they outlive a
            // rewrite (pvals/delete vectors do NOT: they describe the
            // replaced files). Column mapping survives too: the rewrite
            // reads the RAW physical frame, so the new files keep the old
            // physical names and the mapping must keep resolving them.
            prev.filter(l => l.startsWith("# constraint:") ||
              l.startsWith("# colmap:") || l.startsWith("# coldrop:") ||
              l.startsWith("# coldefault:") || l.startsWith("# prop:")) ++
            headers(newFiles) ++ newFiles
        }
      } finally merged.unpersist(blocking = false)
    }
    out
  }

  // ---- RESTORE (version rollback) ----

  /** RESTORE the table to the logical state of version `toV` — Delta's
    * `RESTORE TABLE ... TO VERSION AS OF`: a METADATA-ONLY commit whose
    * manifest re-references `toV`'s files, delete vectors, and stat lines
    * verbatim. No data moves whatever the table size (the files are still
    * on disk — that is what retention pays for), history is preserved
    * (the bad versions stay time-travelable until vacuum; a restore is a
    * new version, not an erasure), and the txn LEDGER carries forward
    * from the CURRENT version, not `toV` — exactly-once streams that
    * committed after `toV` must keep no-oping their replays even though
    * their data was rolled back (Delta keeps `txn` appIds across RESTORE
    * for the same reason). Idempotent per `txnId`; concurrent lock-free
    * appends rebase via the claim loop. */
  def restore(table: String, toV: Long, txnId: Long): Long = withWriterLock(table) {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.restore: no committed version at $table"))
    require(toV >= 0 && toV <= cur, s"restore: version $toV not committed (current $cur)")
    require(toV >= horizon(table),
      s"restore: version $toV vacuumed (retention horizon is ${horizon(table)})")
    val target = manifestLines(table, toV)
    require(target.contains("# base:."), s"restore on snapshot-mode table $table")
    commitNextVersion(table) { (c, prev) =>
      if (prev.contains(s"# txn:$txnId")) Some(c.get) else None // replay
    } { (_, prev) =>
      // the op:restore stamp lets change-feed readers tell a rollback from
      // a DML/fold commit — a restore that drops delete-vector lines
      // resurrects keys in SURVIVING files, which no file diff can see
      // (ADVICE r17); feeds refuse to cross such a step
      ("# base:." +: s"# op:restore:$toV" +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        target.filter(l => !l.startsWith("# txn:") && !l.startsWith("# base:") &&
          !l.startsWith("# op:"))
    }
  }

  // ---- shallow clone (zero-copy table fork) ----

  /** Shallow-clone version `version` (default: current) of `src` as a new
    * table at `dst` — Delta `CREATE TABLE ... SHALLOW CLONE`: a
    * metadata-only fork that copies NO data. The clone's manifest
    * re-references the source's files through a relative path, so it
    * costs O(manifest) regardless of table size; writes to either side
    * never touch the other (clone appends land in the clone's own
    * `txn=<id>/` dirs; the source's files are immutable by the commit
    * contract). Per-file stat/partition lines are rewritten through the
    * same prefix so skipping stays sharp on the clone. The source's txn
    * ledger is NOT carried — the clone is a new table and streams writing
    * to it start their own exactly-once history. Standing delete vectors
    * DO carry (the clone's logical state must equal the source's at the
    * cloned version). Caveat, same as Delta's: vacuuming the SOURCE can
    * delete files the clone still references — production either tracks
    * cross-table references or re-materializes clones ([[optimize]] on
    * the clone localizes every file into it). */
  def shallowClone(src: String, dst: String, version: Option[Long] = None): Long = {
    val v = version.getOrElse(currentVersion(src).getOrElse(
      sys.error(s"Acid.shallowClone: no committed version at $src")))
    require(v >= horizon(src), s"shallowClone: version $v vacuumed at $src")
    val lines = manifestLines(src, v)
    require(lines.contains("# base:."), s"shallowClone on snapshot-mode table $src")
    require(currentVersion(dst).isEmpty, s"shallowClone: $dst already exists")
    Files.createDirectories(Paths.get(dst))
    val rel = Paths.get(dst).toAbsolutePath.normalize
      .relativize(Paths.get(src).toAbsolutePath.normalize).toString
    def reroot(f: String) = s"$rel/$f"
    // per-file stat/tuple lines key on the data-file path — rewrite the
    // embedded path so lookups still match the rerooted file lines
    def rerootStat(l: String, prefix: String): String = {
      val body = l.stripPrefix(prefix)
      val (f, tail) = body.span(_ != '|')
      s"$prefix${reroot(f)}$tail"
    }
    val out = lines.flatMap {
      case l if l.startsWith("# txn:") || l.startsWith("# op:") => None
      case l if l.startsWith("# delete:") =>
        Some("# delete:" + reroot(l.stripPrefix("# delete:").trim))
      case l if l.startsWith("# pdel:") =>
        Some("# pdel:" + reroot(l.stripPrefix("# pdel:").trim))
      case l if l.startsWith("# firstrow:") => Some(rerootStat(l, "# firstrow:"))
      case l if l.startsWith("# rowid_phys:") =>
        Some("# rowid_phys:" + reroot(l.stripPrefix("# rowid_phys:").trim))
      case l if l.startsWith("# pval:")   => Some(rerootStat(l, "# pval:"))
      case l if l.startsWith("# minmax:") => Some(rerootStat(l, "# minmax:"))
      case l if l.startsWith("# bloom:")  => Some(rerootStat(l, "# bloom:"))
      case l if l.startsWith("# rows:")   => Some(rerootStat(l, "# rows:"))
      case l if l.startsWith("#")         => Some(l) // base/delkey/constraint/pspec
      case f                              => Some(reroot(f))
    }
    commitNextVersion(dst)((_, _) => None)((_, _) => out)
  }

  // ---- Z-ORDER clustering (multi-dimension data skipping) ----

  /** OPTIMIZE ... ZORDER BY — rewrite the live snapshot clustered on the
    * INTERLEAVED bits of several dimensions, so per-file zone maps prune
    * on EVERY listed column at once (Delta's multi-column OPTIMIZE
    * ZORDER; range-clustering on one column makes that column's zone
    * maps sharp and everyone else's useless — the z-curve spends its
    * locality budget across all dimensions). Each `zCols` entry is
    * (statsName, long-valued expr); per-file min/max for every dimension
    * are harvested into the manifest for [[readSkippingAll]].
    *
    * Normalization: each dimension maps to a 16-bit bucket via its global
    * [min,max] — ONE tiny aggregate (2·dims values, control plane; at
    * 100 TB these come from existing table stats). Bucket width is
    * integer arithmetic (no overflow at any span); the z-value is a pure
    * bit-interleave expression, fully codegen'd, and the rewrite is one
    * `repartitionByRange` shuffle on it — the same cost as single-column
    * clustering. Ledger carry, delete-vector fold-in, and concurrent
    * -commit retry are [[rewriteCommit]]'s. */
  def optimizeZorder(spark: SparkSession, table: String, txnId: Long,
      targetFiles: Int, zCols: Seq[(String, Column)]): Long = {
    require(zCols.size >= 2, "optimizeZorder: need >= 2 dimensions (use optimize)")
    require(targetFiles >= 1, "optimizeZorder: targetFiles must be >= 1")
    val bits = 16
    val k = zCols.size
    rewriteCommit(spark, table, txnId, "optimizeZorder") { merged =>
      val aggs = zCols.flatMap { case (n, e) =>
        Seq(min(e).as(s"mn_$n"), max(e).as(s"mx_$n")) }
      val row = merged.agg(aggs.head, aggs.tail: _*).head
      if (row.isNullAt(0)) merged // empty snapshot: nothing to cluster
      else {
        val dims = zCols.zipWithIndex.map { case ((_, e), i) =>
          (e, row.getLong(2 * i), row.getLong(2 * i + 1)) }
        merged.withColumn("__z", zorderColumn(dims, bits))
          .repartitionByRange(targetFiles, col("__z")).drop("__z")
      }
    } { newFiles =>
      // one pass harvesting every dimension's per-file zone map
      val root = Paths.get(table).toAbsolutePath
      val aggs = zCols.flatMap { case (n, e) =>
        Seq(min(e).as(s"lo_$n"), max(e).as(s"hi_$n")) }
      spark.read.parquet(newFiles.map(f => s"$table/$f"): _*)
        .groupBy(input_file_name().as("f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect() // O(files) rows — manifest-construction control plane
        .flatMap { r =>
          val f = root.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString
          zCols.zipWithIndex.map { case ((n, _), i) =>
            s"# minmax:$f|$n|${r.getLong(2 * i + 1)}|${r.getLong(2 * i + 2)}"
          }
        }.sorted.toSeq
    }
  }

  /** The z-value Column (exposed for plan-shape + bit-exactness pinning):
    * each (expr, min, max) dimension maps to a 16-bit bucket by a pure
    * power-of-two SHIFT (integer-exact at any span, no double rounding),
    * narrow dimensions TOP-ALIGN to the full bit width (left as-is they
    * would only populate the LOW interleave positions and any wide
    * dimension's high bits would dominate the curve — single-column
    * clustering with extra steps; scaling up costs nothing, buckets are
    * ordinal), and the buckets bit-interleave. Pure arithmetic — stays
    * inside whole-stage codegen (PlanShapeSpec pins no UDF/codegen
    * break); [[zorderValue]] is the driver-side twin the spec checks
    * bit-for-bit. */
  private[graft] def zorderColumn(dims: Seq[(Column, Long, Long)],
      bits: Int = 16): Column = {
    import org.apache.spark.sql.functions.{greatest, least, lit, shiftleft, shiftright}
    val k = dims.size
    val buckets = dims.map { case (e, mn, mx) =>
      val span = math.max(1L, mx - mn + 1)
      val usedBits = 64 - java.lang.Long.numberOfLeadingZeros(span - 1)
      val shift = math.max(0, usedBits - bits)
      val raw = least(greatest(shiftright(e - lit(mn), shift), lit(0L)),
        lit((1L << bits) - 1))
      if (usedBits >= bits) raw else shiftleft(raw, bits - usedBits)
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (bk, i)) =>
        a.bitwiseOR(shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * k + i))
      }
    }
  }

  /** Driver-side twin of [[zorderColumn]] — same shifts, same clamps,
    * same interleave, plain Scala. */
  private[graft] def zorderValue(values: Seq[Long],
      bounds: Seq[(Long, Long)], bits: Int = 16): Long = {
    val k = values.size
    val buckets = values.zip(bounds).map { case (v, (mn, mx)) =>
      val span = math.max(1L, mx - mn + 1)
      val usedBits = 64 - java.lang.Long.numberOfLeadingZeros(span - 1)
      val shift = math.max(0, usedBits - bits)
      val raw = math.min(math.max((v - mn) >> shift, 0L), (1L << bits) - 1)
      if (usedBits >= bits) raw else raw << (bits - usedBits)
    }
    (0 until bits).foldLeft(0L) { (acc, b) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (bk, i)) =>
        a | (((bk >> b) & 1L) << (b * k + i))
      }
    }
  }

  /** Multi-dimension data-skipping read: drop every file whose zone map
    * proves it misses ANY of the `[lo,hi]` predicates — the consumer
    * [[optimizeZorder]] exists for (each predicate prunes independently;
    * conjunction keeps only files alive on every dimension). Same
    * conservative contract as [[readSkipping]]: un-statted files are
    * kept, the caller re-applies every predicate as a residual. */
  def readSkippingAll(spark: SparkSession, table: String,
      preds: Seq[(String, Long, Long)]): (DataFrame, Int, Int) = {
    require(preds.nonEmpty, "readSkippingAll: need at least one predicate")
    val v = currentVersion(table).getOrElse(
      sys.error(s"Acid.readSkippingAll: no committed version at $table"))
    val lines = manifestLines(table, v)
    require(lines.contains("# base:."),
      s"readSkippingAll on snapshot-mode table $table")
    val all = lines.filterNot(_.startsWith("#"))
    require(all.nonEmpty, s"Acid.readSkippingAll: empty manifest at $table v$v")
    val kept = preds.foldLeft(all) { case (fs, (name, lo, hi)) =>
      val (k, _) = skipFiles(table, v, name, lo, hi)
      fs.filter(k.contains)
    }
    val base =
      // schema-stable empty frame (ADVICE r15): build from ALL files with
      // mergeSchema, like readPrunedEvolved — a single file's schema would
      // silently drop evolved columns from the empty result
      if (kept.isEmpty) readMergedSchema(spark, all.map(f => s"$table/$f")).limit(0)
      else spark.read.parquet(kept.map(f => s"$table/$f"): _*)
    (subtractDeletes(spark, table, lines, base), kept.size, all.size)
  }

  /** Zone-map file lists for [[readSkipping]]: (kept, all) data files of
    * version `v`, keeping a file unless its recorded `[min,max]` for
    * `statsName` provably misses `[lo,hi]`. Files with no recorded stats
    * are kept — skipping is an optimization, never a correctness gate. */
  def skipFiles(table: String, v: Long, statsName: String, lo: Long,
      hi: Long): (Seq[String], Seq[String]) = {
    val lines = manifestLines(table, v)
    val ranges = lines.filter(_.startsWith("# minmax:")).flatMap { l =>
      l.stripPrefix("# minmax:").split('|') match {
        case Array(f, n, mn, mx) if n == statsName => Some(f -> (mn.toLong, mx.toLong))
        case _ => None
      }
    }.toMap
    val all = lines.filterNot(_.startsWith("#"))
    val kept = all.filter(f => ranges.get(f).forall { case (mn, mx) => mn <= hi && mx >= lo })
    (kept, all)
  }

  /** Data-skipping read: resolve the committed manifest, drop every file
    * whose zone map proves it cannot contain a row with `statsName` in
    * `[lo, hi]`, and scan only the survivors. This is the manifest-level
    * pruning Delta/Iceberg do BEFORE Spark ever lists a file — at 100 TB
    * it is the difference between "open 4 of 40,000 files" and "open all
    * of them to let parquet row-group stats say no". The caller keeps the
    * residual predicate on the returned frame: skipping only removes
    * provably-dead files, it never substitutes for the filter. Works on
    * both snapshot-mode (`v=<n>/`-relative) and append-mode
    * (root-relative) manifests — the latter get their zone maps from
    * [[optimize]]; standing delete vectors are subtracted so a skipping
    * read never resurrects a deleted row. */
  def readSkipping(spark: SparkSession, table: String, statsName: String,
      lo: Long, hi: Long): DataFrame = {
    val v = currentVersion(table).getOrElse(
      sys.error(s"Acid.readSkipping: no committed version at $table"))
    val (kept, all) = skipFiles(table, v, statsName, lo, hi)
    require(all.nonEmpty, s"Acid.readSkipping: empty manifest at $table v$v")
    val lines = manifestLines(table, v)
    val rootRel = lines.contains("# base:.")
    val base = if (rootRel) table else s"$table/v=$v"
    // append-mode files live under txn=<id>/ dirs: a basePath at the table
    // root would hive-parse `txn` into a phantom partition column, so the
    // root-relative branch reads explicit files bare (same as readVersion)
    def rd(paths: Seq[String]) =
      if (rootRel) spark.read.parquet(paths: _*)
      else spark.read.option("basePath", base).parquet(paths: _*)
    val df =
      if (kept.isEmpty) rd(Seq(s"$base/${all.head}")).limit(0) // schema-stable empty
      else rd(kept.map(f => s"$base/$f"))
    subtractDeletes(spark, table, lines, df)
  }

  /** Per-file row counts of version `v`, from the manifest's `# rows:`
    * lines (written by [[commit]] with `rowCounts = true`). File paths are
    * `v=<n>/`-relative, so hive partition values are parseable from them. */
  def rowStats(table: String, v: Long): Seq[(String, Long)] =
    manifestLines(table, v).filter(_.startsWith("# rows:")).flatMap { l =>
      l.stripPrefix("# rows:").split('|') match {
        case Array(f, n) => Some(f -> n.toLong)
        case _ => None
      }
    }

  /** Per-file zone maps of version `v` for `statsName`, from the
    * manifest's `# minmax:` lines — (file, min, max). The metadata that
    * answers MIN/MAX-shaped queries with zero data I/O (fold over
    * O(files) driver-side lines), the aggregation twin of [[rowStats]]. */
  def minmaxStats(table: String, v: Long, statsName: String): Seq[(String, Long, Long)] =
    manifestLines(table, v).filter(_.startsWith("# minmax:")).flatMap { l =>
      l.stripPrefix("# minmax:").split('|') match {
        case Array(f, n, mn, mx) if n == statsName => Some((f, mn.toLong, mx.toLong))
        case _ => None
      }
    }

  /** Bloom file lists for [[readBloomSkipping]]: (kept, all) data files of
    * version `v`, keeping a file unless its recorded bloom for `statsName`
    * PROVES `key` absent (either probed bit unset). Files with no recorded
    * bloom are kept — skipping is an optimization, never a correctness
    * gate (same contract as [[skipFiles]]). */
  def skipFilesBloom(table: String, v: Long, statsName: String,
      key: Long): (Seq[String], Seq[String]) = {
    val lines = manifestLines(table, v)
    // (words, versioned): the `h2` token marks blooms written with the
    // widened 2^31-1 pre-mod (ADVICE r19 — versioning the hash in the
    // stat line lets new blooms probe ONLY the new position pair; the
    // legacy dual probe applies solely to unversioned lines, instead of
    // permanently ~doubling every bloom's false-positive rate)
    val blooms = lines.filter(_.startsWith("# bloom:")).flatMap { l =>
      l.stripPrefix("# bloom:").split('|') match {
        case Array(f, n, "h2", ws) if n == statsName =>
          Some(f -> (ws.split(',').map(_.toLong), true))
        case Array(f, n, ws) if n == statsName =>
          Some(f -> (ws.split(',').map(_.toLong), false))
        case _ => None
      }
    }.toMap
    def hasBit(w: Array[Long], p: Int): Boolean = (w(p / 64) >>> (p % 64) & 1L) == 1L
    val all = lines.filterNot(_.startsWith("#"))
    val kept = all.filter(f =>
      blooms.get(f).forall { case (w, versioned) =>
        // width is per-line (adaptive blooms; mixed generations coexist)
        val bits = w.length * 64
        val (p1, p2) = bloomPositions(key, bits)
        val newHit = hasBit(w, p1) && hasBit(w, p2)
        if (versioned) newHit
        else {
          // unversioned legacy line: written before the pre-mod domain
          // widened (1e6 → 2^31-1) — bits sit at the OLD positions, so
          // probing only the new pair would false-NEGATIVE and prune a
          // file that contains the key (unsound for erase). EITHER
          // generation's pair keeps the file: conservative for both.
          val (q1, q2) = {
            val y = Math.floorMod(key, 1000003L) // legacy pre-mod domain
            val h1 = (y * 48271L) % 2147483647L
            val h2 = (h1 * 48271L) % 2147483647L
            ((h1 % bits).toInt, (h2 % bits).toInt)
          }
          newHit || (hasBit(w, q1) && hasBit(w, q2))
        }
      })
    (kept, all)
  }

  /** Point-lookup data-skipping read: drop every file whose bloom proves
    * it cannot contain `key`, scan only the survivors. The range twin is
    * [[readSkipping]]; blooms cover the case zone maps cannot — a
    * high-cardinality key scattered across a table clustered on something
    * else entirely (here: who-did-what lookups on an event log
    * hash-clustered by user bucket). Caller keeps the residual predicate. */
  def readBloomSkipping(spark: SparkSession, table: String, statsName: String,
      key: Long): DataFrame = {
    val v = currentVersion(table).getOrElse(
      sys.error(s"Acid.readBloomSkipping: no committed version at $table"))
    val (kept, all) = skipFilesBloom(table, v, statsName, key)
    require(all.nonEmpty, s"Acid.readBloomSkipping: empty manifest at $table v$v")
    if (kept.isEmpty) spark.read
      .option("basePath", s"$table/v=$v")
      .parquet(s"$table/v=$v/${all.head}").limit(0) // schema-stable empty
    else spark.read
      .option("basePath", s"$table/v=$v")
      .parquet(kept.map(f => s"$table/v=$v/$f"): _*)
  }

  /** Manifest accessor for the streaming source and change feed: (data
    * files, `# delete:` lines) of version `v` — O(lines) control plane. */
  private[graft] def manifestFiles(table: String, v: Long): (Seq[String], Seq[String]) = {
    val lines = manifestLines(table, v)
    (lines.filterNot(_.startsWith("#")), lines.filter(_.startsWith("# delete:")))
  }

  /** True iff version `v` is a tagged rewrite commit ([[optimize]] /
    * [[compactDeletes]]) — files replaced, no logical change; Delta's
    * `dataChange=false`. Streaming readers cross these contributing
    * nothing. Manifests written before the tag existed read as false and
    * fall back to the structural (file-diff) detection at their call
    * sites. */
  private[graft] def isRewriteCommit(table: String, v: Long): Boolean =
    manifestLines(table, v).exists(_.startsWith("# op:rewrite"))

  /** Standing equality-delete vector of version `v`: (key column, delete
    * file paths), if any. Control plane for readers that assemble their
    * own scans (the streaming source) yet must honor merge-on-read. */
  private[graft] def standingDeletes(table: String, v: Long): Option[(String, Seq[String])] =
    standingDeletes2(manifestLines(table, v))

  /** Change data feed — row-level changes committed in versions
    * `(fromV, toV]` of an append-mode table (Delta CDF's `table_changes` /
    * Iceberg's changelog scan): the incremental-consumption seam that
    * lets a downstream job (MV refresh, index update, replication)
    * process O(changes) instead of rescanning O(table) per cycle.
    *
    * Derived entirely from the two manifests, no change files needed,
    * because append-mode commits are monotone: appends ADD files (never
    * touch old ones — pinned in OperatorSpec) and deletes ADD key
    * vectors. So:
    *
    *  - inserts = rows in (toV's files − fromV's files), minus keys in
    *    toV's standing vectors — a row appended then deleted inside the
    *    window nets to nothing, and a row appended under an
    *    already-deleted key was never visible (vectors subtract keys,
    *    not predicates — the [[appendManifest]] carry-forward rule);
    *  - deletes = fromV's LIVE state semi-joined to (toV's vectors −
    *    fromV's vectors) — full preimage rows, Delta CDF shape; keys
    *    deleted that never existed at fromV emit nothing.
    *
    * The fundamental invariant (spec-pinned): state(fromV) + inserts −
    * deletes == state(toV), bit for bit. Rewrite commits
    * ([[compactDeletes]]/[[optimize]]) REPLACE files without logical
    * change, which breaks the file-diff derivation — crossing one fails
    * loudly; production CDF materializes `_change_data` files at write
    * time for exactly this case (out of scope). Cost: O(changed files +
    * vectors) I/O for inserts; the delete preimage reads fromV filtered
    * by a broadcast semi-join (at 100 TB, [[skipFilesBloom]] prunes that
    * scan to the files whose blooms admit a deleted key). */
  def changeFeed(spark: SparkSession, table: String, fromV: Long,
      toV: Long): DataFrame = {
    require(fromV < toV, s"changeFeed: need fromV < toV, got $fromV >= $toV")
    val linesFrom = manifestLines(table, fromV)
    val linesTo = manifestLines(table, toV)
    require(linesFrom.contains("# base:.") && linesTo.contains("# base:."),
      s"changeFeed on snapshot-mode table $table")
    val filesFrom = linesFrom.filterNot(_.startsWith("#")).toSet
    val filesTo = linesTo.filterNot(_.startsWith("#"))
    require(filesFrom.subsetOf(filesTo.toSet),
      s"changeFeed($fromV, $toV) crosses a rewrite commit (files were " +
        "replaced without logical change) — consume the feed before " +
        "maintenance or materialize change files at write time")
    require(linesFrom.filter(_.startsWith("# pdel:")) ==
      linesTo.filter(_.startsWith("# pdel:")),
      s"changeFeed($fromV, $toV) crosses a POSITIONAL delete commit — " +
        "row-level feeds need CDC materialization for this commit class " +
        "(Delta deletion vectors have the same caveat)")
    def delFiles(lines: Seq[String]): Seq[String] =
      lines.filter(_.startsWith("# delete:")).map(_.stripPrefix("# delete:").trim)
    def keyOf(lines: Seq[String]): Option[String] =
      lines.find(_.startsWith("# delkey:")).map(_.stripPrefix("# delkey:").trim)
    val added = filesTo.filterNot(filesFrom)
    // vector monotonicity: append-mode deletes only ADD vector files; a
    // vector line VANISHING with the data files intact is a RESTORE
    // un-hiding keys in surviving files — inserts the file diff cannot
    // see (ADVICE r17, sibling of changeFeedRow's restore guard).
    // EXCEPTION (ADVICE r18, tightened r19 review): a commit that
    // reconciles the standing vector while only ADDING files (an explicit
    // re-insert of a key that existed only in the vector) makes the
    // resurrection fully visible in the added files — permit the drop iff
    // every key removed from the vector (a) appears in the commit's added
    // files AND (b) appears in NO surviving file. Without (b), a RESTORE
    // un-hiding a key in a surviving file slipped through whenever some
    // commit in the window coincidentally appended the same key — the
    // surviving file's resurrected row would never be emitted (silent CDC
    // loss). (b) is one semi-join scan of the surviving files pruned by a
    // broadcast of the removed keys — at 100 TB skipFilesBloom-class
    // pruning applies, same bill as the delete preimage below.
    if (!delFiles(linesFrom).toSet.subsetOf(delFiles(linesTo).toSet)) {
      val visible = keyOf(linesFrom).exists { k =>
        val fromKeys = spark.read
          .parquet(delFiles(linesFrom).map(f => s"$table/$f"): _*)
          .select(col(k)).distinct()
        val toKeys =
          if (delFiles(linesTo).isEmpty) fromKeys.limit(0)
          else spark.read.parquet(delFiles(linesTo).map(f => s"$table/$f"): _*)
            .select(col(k)).distinct()
        val removed = fromKeys.join(toKeys, Seq(k), "left_anti")
        // survivors = fromV's files STILL LIVE at toV (ADVICE r19): a
        // replaced file cannot resurrect rows at toV, so intersecting
        // keeps the check sound — and keeps the probe off files a vacuum
        // may have reclaimed. Under the rewrite-crossing require above
        // the intersection is currently the identity (filesFrom ⊆
        // filesTo); the intersect future-proofs the probe if that
        // admission is ever relaxed.
        val surviving = filesFrom.intersect(filesTo.toSet).toSeq.sorted
        val inSurvivors = surviving.nonEmpty &&
          readLogical(spark, table, linesTo, surviving)
            .join(removed, Seq(k), "left_semi").limit(1).count() > 0
        added.nonEmpty && !inSurvivors && removed.join(
          readLogical(spark, table, linesTo, added.toSeq)
            .select(col(k)).distinct(),
          Seq(k), "left_anti").isEmpty
      }
      require(visible,
        s"changeFeed($fromV, $toV) crosses a commit that dropped delete-" +
          "vector lines without replacing files (RESTORE across a vector " +
          "commit?) — the resurrection is invisible to a file diff; " +
          "re-seed the consumer")
    }
    val delsToFiles = delFiles(linesTo)
    val newDelFiles = delsToFiles.filterNot(delFiles(linesFrom).toSet)
    // added files read through toV's LOGICAL frame (r19 review: with
    // readVersion now logical, a raw read here would mix physical-named
    // inserts with logical-named deletes on an evolved table — a feed
    // window spanning a rename either threw on unionByName or emitted
    // old-name rows a consumer cannot apply)
    val insertsRaw =
      if (added.isEmpty) readVersion(spark, table, toV).limit(0) // schema-stable
      else readLogical(spark, table, linesTo, added.toSeq)
    val insertTag = org.apache.spark.sql.functions.lit("insert")
    keyOf(linesTo).filter(_ => delsToFiles.nonEmpty) match {
      case Some(k) =>
        val standing = spark.read.parquet(delsToFiles.map(f => s"$table/$f"): _*)
          .select(col(k)).distinct()
        val inserts = insertsRaw.join(standing, Seq(k), "left_anti")
          .withColumn("change_type", insertTag)
        if (newDelFiles.isEmpty) inserts
        else {
          val fresh = spark.read.parquet(newDelFiles.map(f => s"$table/$f"): _*)
            .select(col(k)).distinct()
          val deletes = readVersion(spark, table, fromV)
            .join(fresh, Seq(k), "left_semi")
            .withColumn("change_type", org.apache.spark.sql.functions.lit("delete"))
          inserts.unionByName(deletes)
        }
      case None => insertsRaw.withColumn("change_type", insertTag)
    }
  }

  /** Row-granular change feed WITH update images — Delta CDF's four change
    * types (`insert` / `delete` / `update_preimage` / `update_postimage`;
    * Iceberg's `create_changelog_view(compute_updates => true)`) — and,
    * unlike [[changeFeed]], it CROSSES rewrite commits: each version step
    * is reconstructed from the manifest DIFF (removed ∪ added files plus
    * the delete-vector delta), keyed on `keyCol`, so a COW
    * MERGE/UPDATE/DELETE step emits exactly the rows that logically
    * changed and a maintenance rewrite (optimize / zorder /
    * compactDeletes — `# op:rewrite` commits) emits NOTHING: the carried
    * rows compare equal on both sides and cancel out, no special casing.
    *
    * Cost model (the 100 TB contract): a rewrite step reads only the
    * files the commit itself touched (removed ∪ added — the same
    * minority the COW write already paid for), a MoR-delete step pays one
    * semi-join of the prior snapshot against the newly-hidden key set
    * (zone-map/bloom prunable — the cost the delete's own readers pay),
    * and an append step reads only the appended files. Never
    * O(table × versions), and nothing collects to the driver.
    *
    * `keyCol` must identify a row uniquely within any one commit's
    * touched scope — the same uniqueness the MERGE key contract already
    * imposes on every writer of this table. */
  def changeFeedRow(spark: SparkSession, table: String, fromV: Long,
      toV: Long, keyCol: String): DataFrame = {
    require(fromV < toV, s"changeFeedRow: need fromV < toV, got $fromV >= $toV")
    require(fromV >= horizon(table),
      s"changeFeedRow: version $fromV of $table vacuumed (horizon is " +
        s"${horizon(table)}) — the window's manifests no longer exist")
    def vecKeys(lines: Seq[String]): Option[DataFrame] = {
      val fs = lines.filter(_.startsWith("# delete:"))
        .map(_.stripPrefix("# delete:").trim)
      lines.find(_.startsWith("# delkey:"))
        .map(_.stripPrefix("# delkey:").trim) match {
        case Some(k) if fs.nonEmpty =>
          require(k == keyCol,
            s"changeFeedRow: table uses delete key $k, got $keyCol")
          Some(spark.read.parquet(fs.map(f => s"$table/$f"): _*)
            .select(col(k)).distinct())
        case _ => None
      }
    }
    val snapshot = readVersion(spark, table, toV).limit(0)
    val dataCols = snapshot.columns.toSeq
    require(dataCols.contains(keyCol), s"changeFeedRow: no column $keyCol")
    val outCols = dataCols.map(col) :+ col("change_type") :+ col("commit_version")
    val emptyOut = snapshot
      .withColumn("change_type", lit(""))
      .withColumn("commit_version", lit(0L))
      .select(outCols: _*)
    def keyed(d: DataFrame) =
      d.select(col(keyCol).as("__k"), struct(dataCols.map(col): _*).as("__r"))
    val steps: Seq[DataFrame] = ((fromV + 1) to toV).flatMap { v =>
      val prev = manifestLines(table, v - 1)
      val cur = manifestLines(table, v)
      require(prev.contains("# base:.") && cur.contains("# base:."),
        s"changeFeedRow on snapshot-mode table $table")
      // only pdel ADDITIONS are delete commits needing CDC; a fold (a
      // rewrite REMOVING vector lines) changed nothing logically and the
      // ordinary file diff below cancels it out. Vector lines vanishing
      // WITHOUT any file rewrite (RESTORE across a vector commit) is a
      // resurrection the diff cannot see — refuse loudly.
      val pdelPrev = prev.filter(_.startsWith("# pdel:")).toSet
      val pdelCur = cur.filter(_.startsWith("# pdel:")).toSet
      val removedAny = prev.filterNot(_.startsWith("#"))
        .exists(f => !cur.contains(f))
      val vecDropped = pdelPrev.diff(pdelCur).nonEmpty ||
        prev.filter(_.startsWith("# delete:")).toSet
          .diff(cur.filter(_.startsWith("# delete:")).toSet).nonEmpty
      // the removedAny escape is for DML/fold commits, whose file diff
      // carries the logical change. A RESTORE can satisfy removedAny by
      // reverting an append in the same stroke it reverts the vector
      // commit (ADVICE r17) — the keys un-hidden in SURVIVING files then
      // resurrect with no emitted event; refuse restores outright here.
      val isRestoreStep = cur.exists(_.startsWith("# op:restore:"))
      require(!vecDropped || (removedAny && !isRestoreStep),
        s"changeFeedRow: version $v of $table dropped delete-vector lines " +
          "without a reconstructible file rewrite (RESTORE across a vector " +
          "commit?) — the feed cannot reconstruct the resurrection; " +
          "re-seed the consumer")
      val pdelAdded = pdelCur.diff(pdelPrev).nonEmpty
      if (pdelAdded) {
        // a positional-delete commit: consumable ONLY through materialized
        // CDC preimages (deletePositionsTxn(cdc = true) — Delta deletion
        // vectors have the same contract)
        val cdcFiles = cur.collect {
          case l if l.startsWith(s"# cdc:$v|") => l.stripPrefix(s"# cdc:$v|").trim
        }
        require(cdcFiles.nonEmpty,
          s"changeFeedRow: version $v of $table is a POSITIONAL delete " +
            "commit without materialized CDC — delete with cdc = true, or " +
            "consume the feed before vector deletes")
        Some(spark.read.parquet(cdcFiles.map(f => s"$table/$f"): _*)
          .withColumn("change_type", lit("delete"))
          .withColumn("commit_version", lit(v))
          .select(outCols: _*))
      } else {
      val pf = prev.filterNot(_.startsWith("#"))
      val cf = cur.filterNot(_.startsWith("#"))
      val added = cf.filterNot(pf.toSet)
      val removed = pf.filterNot(cf.toSet)
      // vector delta: keys newly hidden at v (MoR delete). Their rows can
      // sit in ANY surviving file, so they are found by one prunable
      // semi-join against the prior snapshot, not by the file diff.
      val vecLinesEq = prev.filter(_.startsWith("# delete:")) ==
        cur.filter(_.startsWith("# delete:"))
      val nhKeys =
        if (vecLinesEq) None // unchanged vector: no O(table) MoR scan
        else (vecKeys(cur), vecKeys(prev)) match {
          case (Some(c), Some(p)) => Some(c.join(p, Seq(keyCol), "left_anti"))
          case (Some(c), None)    => Some(c)
          case _                  => None
        }
      if (added.isEmpty && removed.isEmpty && nhKeys.isEmpty) None
      else {
        // old side = rows VISIBLE at v-1 inside the removed files (standing
        // vector subtracted; newly-hidden keys routed to the MoR branch so
        // no event double-emits); new side = rows visible at v inside the
        // added files. Equal (key, row) pairs cancel — that is what makes
        // a maintenance rewrite silent here.
        val oldRows = if (removed.isEmpty) snapshot
          else nhKeys.foldLeft(subtractDeletes(spark, table, prev,
            spark.read.parquet(removed.map(f => s"$table/$f"): _*)))(
            (d, k) => d.join(k, Seq(keyCol), "left_anti"))
        val newRows = if (added.isEmpty) snapshot
          else subtractDeletes(spark, table, cur,
            spark.read.parquet(added.map(f => s"$table/$f"): _*))
        val j = keyed(oldRows).as("o")
          .join(keyed(newRows).as("n"), col("o.__k") === col("n.__k"),
            "full_outer")
        val events = j.select(explode(
          when(col("o.__r").isNull,
            array(struct(col("n.__r").as("r"), lit("insert").as("t"))))
            .when(col("n.__r").isNull,
              array(struct(col("o.__r").as("r"), lit("delete").as("t"))))
            .when(!(col("o.__r") <=> col("n.__r")), array(
              struct(col("o.__r").as("r"), lit("update_preimage").as("t")),
              struct(col("n.__r").as("r"), lit("update_postimage").as("t"))))
            .otherwise(lit(null))).as("e"))
          .select(col("e.r.*"), col("e.t").as("change_type"))
          .withColumn("commit_version", lit(v))
          .select(outCols: _*)
        val withMor = nhKeys.fold(events) { k =>
          events.unionByName(
            readVersion(spark, table, v - 1)
              .join(k, Seq(keyCol), "left_semi")
              .withColumn("change_type", lit("delete"))
              .withColumn("commit_version", lit(v))
              .select(outCols: _*))
        }
        Some(withMor)
      }
      }
    }
    steps.reduceOption(_ unionByName _).getOrElse(emptyOut)
  }

  // ---- snapshot tags (Iceberg named refs) ----

  /** TAG a committed version with an immutable name — Iceberg's tag refs
    * (`AS OF 'training-run-2024q3'`): the auditable pin a reproduction or
    * compliance claim hangs on. Tags are CREATE_NEW (a name can never be
    * silently repointed — delete and re-tag is the explicit operator
    * action), cost one O(1) file, and — the load-bearing part — PIN their
    * version against [[vacuum]]: retention GC keeps a tagged manifest and
    * every file it references alive past the horizon, so the tag stays
    * readable for years while ordinary history ages out. Version-number
    * time travel to the same snapshot still expires (the horizon contract
    * is unchanged); the NAME is the durable handle. */
  def tagVersion(table: String, name: String, v: Long): Unit = withWriterLock(table) {
    // under the writer lock (ADVICE r15): vacuum computes its live set
    // under the same lock, so a tag can no longer slip in between the
    // live-set snapshot and the deletions — tag creation and vacuum
    // serialize, which is the whole "tags pin their snapshot" guarantee
    require(name.matches("[A-Za-z0-9._-]+"), s"tag name must be path-safe: $name")
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.tagVersion: no committed version at $table"))
    require(v >= 0 && v <= cur, s"tagVersion: version $v not committed (current $cur)")
    require(v >= horizon(table), s"tagVersion: version $v already vacuumed")
    Files.write(Paths.get(table, s"tag-$name.txt"),
      v.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
  }

  /** All tags of `table`: name → pinned version. */
  def tags(table: String): Map[String, Long] =
    Option(new java.io.File(table).listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith("tag-") && n.endsWith(".txt"))
          Some(n.stripPrefix("tag-").stripSuffix(".txt") ->
            new String(Files.readAllBytes(f.toPath), "UTF-8").trim.toLong)
        else None
      }.toMap

  /** Drop a tag (the version becomes ordinary history and ages out with
    * the next vacuum unless still above the horizon). */
  def dropTag(table: String, name: String): Unit = withWriterLock(table) {
    Files.deleteIfExists(Paths.get(table, s"tag-$name.txt")); ()
  }

  /** Read the snapshot a tag pins — works BELOW the vacuum horizon (the
    * tag kept the manifest and its files alive), which version-number
    * time travel deliberately does not. */
  def readTag(spark: SparkSession, table: String, name: String): DataFrame = {
    val v = tags(table).getOrElse(name,
      sys.error(s"Acid.readTag: no tag '$name' at $table"))
    val lines = manifestLines(table, v)
    val rootRel = lines.contains("# base:.")
    val files = lines.filterNot(_.startsWith("#"))
    val base = // logical-frame like readVersion (r19)
      if (rootRel) readLogical(spark, table, lines, files)
      else spark.read
        .option("basePath", s"$table/v=$v")
        .parquet(files.map(f => s"$table/v=$v/$f"): _*)
    subtractDeletes(spark, table, lines, base)
  }

  // ---- branch refs (Iceberg branches / Nessie-style write-isolate-publish) ----
  //
  // A BRANCH is a named, writable line of commits forked from a committed
  // main version — the generalization of WAP from "one staged batch" to "a
  // whole experiment's worth of commits". Branch state lives beside main's:
  // `branch-<name>.txt` holds `base=<mainV>` + `head=<k>`; branch commits
  // land as self-contained manifests `manifest-br-<name>-<k>.txt` (same
  // format as main's, same txn ledger semantics), data under
  // `branch=<name>/txn=<id>/`. Main's readers and writers never look at
  // any of it; [[vacuum]] pins every branch's head (and its fork base)
  // alive, exactly like tags. Publish is [[fastForwardBranch]] (main did
  // not advance: main adopts the branch head METADATA-ONLY, ledger and
  // all) or [[mergeBranch]] (main advanced: append-only branch commits
  // rebase onto main's head — the append∥append commute; a branch that
  // recorded deletes refuses to merge loudly, that reconciliation is
  // [[mergeCow]]'s job). At 100 TB both publishes move zero data bytes.

  private def branchRef(table: String, name: String) =
    Paths.get(table, s"branch-$name.txt")
  private def brManifest(table: String, name: String, k: Long) =
    Paths.get(table, s"manifest-br-$name-$k.txt")

  /** All branches of `table`: name → (fork base version, head commit
    * ordinal; head == -1 means no branch commits yet). */
  def branches(table: String): Map[String, (Long, Long)] =
    Option(new java.io.File(table).listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (f.isFile && n.startsWith("branch-") && n.endsWith(".txt")) {
          val kv = new String(Files.readAllBytes(f.toPath), "UTF-8").trim
            .split('\n').map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
          Some(n.stripPrefix("branch-").stripSuffix(".txt") ->
            (kv("base").toLong, kv("head").toLong))
        } else None
      }.toMap

  private def writeBranchRef(table: String, name: String, base: Long,
      head: Long, createNew: Boolean): Unit = {
    val bytes = s"base=$base\nhead=$head\n".getBytes("UTF-8")
    if (createNew)
      Files.write(branchRef(table, name), bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
    else {
      val tmp = Paths.get(table, s"_branch-$name.tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, branchRef(table, name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Fork a branch at committed main version `v`. CREATE_NEW like tags —
    * a branch name can never be silently repointed. Same writer-lock
    * discipline as [[tagVersion]]: branch creation serializes with vacuum
    * so the fork base cannot be GC'd out from under it. */
  def createBranch(table: String, name: String, v: Long): Unit = withWriterLock(table) {
    require(name.matches("[A-Za-z0-9._-]+"), s"branch name must be path-safe: $name")
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.createBranch: no committed version at $table"))
    require(v >= 0 && v <= cur, s"createBranch: version $v not committed (current $cur)")
    require(v >= horizon(table), s"createBranch: version $v already vacuumed")
    require(manifestLines(table, v).contains("# base:."),
      s"createBranch on snapshot-mode table $table")
    writeBranchRef(table, name, v, -1L, createNew = true)
  }

  /** The branch head's manifest lines (the fork base's when the branch
    * has no commits of its own). */
  private def branchLines(table: String, name: String): Seq[String] = {
    val (base, head) = branches(table).getOrElse(name,
      sys.error(s"Acid: no branch '$name' at $table"))
    if (head < 0) manifestLines(table, base)
    else {
      val it = Files.readAllLines(brManifest(table, name, head)).iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) { val l = it.next().trim; if (l.nonEmpty) b += l }
      b.result()
    }
  }

  /** Append to a BRANCH: same idempotent-txn contract as [[appendTxn]],
    * against the branch's own ledger; main never sees the commit. */
  def appendTxnBranch(spark: SparkSession, table: String, name: String,
      df: DataFrame, txnId: Long): Long = withWriterLock(table) {
    val (base, head) = branches(table).getOrElse(name,
      sys.error(s"Acid.appendTxnBranch: no branch '$name' at $table"))
    val prev = branchLines(table, name)
    if (prev.contains(s"# txn:$txnId")) return head // replay → no-op
    // Global-ledger guard (ADVICE r16, Delta's txnAppId contract): a txn id
    // already committed to MAIN but absent from this branch's own ledger is
    // a cross-incarnation replay — after a merge/cherry-pick publish, main
    // permanently references files under branch=<name>/txn=<id>/, and a
    // re-created branch replaying that id would overwrite (mode=overwrite)
    // published data files, silently corrupting main's committed snapshot.
    // The branch-local ledger (fork base ∪ branch commits) already no-ops
    // legitimate same-incarnation replays above; anything else refuses.
    require(!committedTxns(table).contains(txnId),
      s"Acid.appendTxnBranch: txn $txnId is already committed on main at " +
        s"$table but not on branch '$name' — a published txn's data files " +
        s"must never be overwritten by a branch replay; use a fresh txn id")
    val root = Paths.get(table)
    val dataDir = root.resolve(s"branch=$name").resolve(s"txn=$txnId")
    df.write.mode("overwrite").parquet(dataDir.toString)
    val files = listParquet(table, dataDir)
    val k = head + 1
    Files.write(brManifest(table, name, k),
      (appendManifest(prev, txnId, files) :+
        s"# dml:$k|append|$txnId|-|-|${files.mkString(",")}")
        .mkString("", "\n", "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    writeBranchRef(table, name, base, k, createNew = false)
    k
  }

  /** Read the branch head (fork base ∪ branch commits, standing delete
    * vectors applied — the preview [[fastForwardBranch]] would publish).
    * A branch forked from a schema-evolved main carries the base's
    * colmap/coldefault lines: the read goes footer-union + mapping +
    * defaults ([[readEvolved]]'s semantics) — a plain scan would let an
    * arbitrary footer drop a generation's columns (ADVICE r18 sweep). */
  def readBranch(spark: SparkSession, table: String, name: String): DataFrame = {
    val lines = branchLines(table, name)
    subtractDeletes(spark, table, lines,
      readLogical(spark, table, lines, lines.filterNot(_.startsWith("#"))))
  }

  /** Row-level MERGE INTO a BRANCH, copy-on-write — the dev-pipeline story
    * completed: the merge job under test runs against the experiment
    * branch with [[mergeCow]]'s exact semantics, MAIN NEVER SEES A BYTE
    * (touched fork-base files rewrite into branch-local copies under
    * `branch=<name>/txn=<id>/` — the base file itself is never touched, so
    * main and sibling branches keep reading it), standing vectors fold in
    * and reconcile identically, and a fast-forward publish later adopts
    * the result wholesale. Branch-ledger idempotent per txnId, with
    * [[appendTxnBranch]]'s cross-incarnation replay guard. */
  def mergeCowBranch(spark: SparkSession, table: String, name: String,
      changes: DataFrame, keyCol: String, txnId: Long,
      opCol: Option[String] = None): (Long, Int, Int) = withWriterLock(table) {
    val (base, head) = branches(table).getOrElse(name,
      sys.error(s"Acid.mergeCowBranch: no branch '$name' at $table"))
    val prev = branchLines(table, name)
    if (prev.contains(s"# txn:$txnId"))
      return (head, 0, prev.count(!_.startsWith("#"))) // replay → no-op
    require(!committedTxns(table).contains(txnId),
      s"Acid.mergeCowBranch: txn $txnId is already committed on main at " +
        s"$table but not on branch '$name' — use a fresh txn id")
    require(prev.contains("# base:."),
      s"mergeCowBranch on snapshot-mode table $table")
    // Persist the LOGICAL change frame under the branch namespace before
    // touching anything — the op log's merge entry points at this copy, so
    // [[rebaseBranchDml]] can re-run the exact same MERGE against a future
    // base (and the merge itself consumes the frozen copy, making the
    // rewrite deterministic even for a nondeterministic `changes` plan).
    val chgDir = Paths.get(table).resolve(s"branch=$name").resolve(s"chg=$txnId")
    changes.write.mode("overwrite").parquet(chgDir.toString)
    val chgFiles = listParquet(table, chgDir)
    val changesSaved = spark.read.parquet(chgFiles.map(f => s"$table/$f"): _*)
    val m = cowMergeAttempt(spark, table, prev, changesSaved, keyCol, opCol,
      Paths.get(table).resolve(s"branch=$name").resolve(s"txn=$txnId"),
      Paths.get(table).resolve(s"branch=$name").resolve(s"del=$txnId"),
      "mergeCowBranch")
    val k1 = head + 1
    val manifest = (("# base:." +:
      (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
      m.vectorLines ++
      prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
        !l.startsWith("# base:") && !l.startsWith("# op:") &&
        !l.startsWith("# delkey:") && !l.startsWith("# delete:") &&
        !m.deadStat(l)) ++
      m.survivors ++ m.newFiles) :+
      s"# dml:$k1|merge|$txnId|$keyCol|${opCol.getOrElse("-")}|${chgFiles.mkString(",")}"
    Files.write(brManifest(table, name, k1),
      manifest.mkString("", "\n", "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    writeBranchRef(table, name, base, k1, createNew = false)
    (k1, m.touched.size, m.total)
  }

  /** Merge-on-read DELETE on a BRANCH: the branch's standing vector grows
    * by `keys` (one O(keys) vector file under the branch's namespace),
    * fork-base data untouched, main blind to it — publish carries the
    * vector. Branch-ledger idempotent; same replay guard as appends. */
  def deleteTxnBranch(spark: SparkSession, table: String, name: String,
      keys: DataFrame, keyCol: String, txnId: Long): Long = withWriterLock(table) {
    val (base, head) = branches(table).getOrElse(name,
      sys.error(s"Acid.deleteTxnBranch: no branch '$name' at $table"))
    val prev = branchLines(table, name)
    if (prev.contains(s"# txn:$txnId")) return head // replay → no-op
    require(!committedTxns(table).contains(txnId),
      s"Acid.deleteTxnBranch: txn $txnId is already committed on main at " +
        s"$table but not on branch '$name' — use a fresh txn id")
    val prevKey = prev.find(_.startsWith("# delkey:"))
      .map(_.stripPrefix("# delkey:").trim)
    require(prevKey.forall(_ == keyCol),
      s"deleteTxnBranch: branch uses delete key ${prevKey.getOrElse("")}, got $keyCol")
    val delDir = Paths.get(table).resolve(s"branch=$name").resolve(s"del=$txnId")
    keys.select(col(keyCol)).distinct()
      .coalesce(1).write.mode("overwrite").parquet(delDir.toString)
    val delFiles = listParquet(table, delDir)
    val k1 = head + 1
    val manifest = (("# base:." +:
      (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
      Seq(s"# delkey:$keyCol") ++
      (prev.filter(_.startsWith("# delete:")) ++ delFiles.map(f => s"# delete:$f")) ++
      prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
        !l.startsWith("# base:") && !l.startsWith("# op:") &&
        !l.startsWith("# delkey:") && !l.startsWith("# delete:")) ++
      prev.filterNot(_.startsWith("#"))) :+
      s"# dml:$k1|delete|$txnId|$keyCol|-|${delFiles.mkString(",")}"
    Files.write(brManifest(table, name, k1),
      manifest.mkString("", "\n", "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    writeBranchRef(table, name, base, k1, createNew = false)
    k1
  }

  // ---- predicate COW UPDATE / DELETE on a BRANCH (r20 — lifts sql_txn's
  // INSERT/MERGE-only restriction: native UPDATE/DELETE statements inside
  // BEGIN/COMMIT compile to these) ----

  private final case class CowWhere(touched: Seq[String],
      survivors: Seq[String], newFiles: Seq[String],
      deadStat: String => Boolean, total: Int)

  /** One predicate-COW attempt over explicit manifest lines —
    * [[cowWhere]]'s per-attempt body lifted to the branch/rebase seam:
    * probe the files containing a predicate-matching row over the LOGICAL
    * frame, rewrite only those through the update/delete transform
    * (standing vectors subtracted first, so a hidden row can neither
    * update nor resurrect), write under `dataDir`, constraint-check the
    * WRITTEN bytes (write-then-verify, the one-action contract). The
    * standing vector lines carry forward unchanged — the rewritten files
    * already have hidden rows removed; the lines keep hiding them in
    * survivors, exactly [[cowWhere]]'s contract. */
  private def cowWhereAttempt(spark: SparkSession, table: String,
      lines: Seq[String], kind: String, setCols: Seq[String],
      setExprs: Seq[String], predSql: String, dataDir: Path,
      what: String): CowWhere = {
    val pred = expr(predSql)
    val all = lines.filterNot(_.startsWith("#"))
    val root = Paths.get(table).toAbsolutePath
    val touched = if (all.isEmpty) Seq.empty[String]
    else readLogical(spark, table, lines, all)
      .filter(pred)
      .select(input_file_name().as("f")).distinct()
      .collect() // O(files) rows — manifest-construction control plane
      .map(r => root.relativize(Paths.get(java.net.URI.create(r.getString(0)))).toString)
      .sorted.toSeq
    val survivors = all.filterNot(touched.contains)
    val newFiles =
      if (touched.isEmpty) Seq.empty[String]
      else {
        val base = subtractDeletes(spark, table, lines,
          readLogical(spark, table, lines, touched))
        val out = kind match {
          case "updwhere" =>
            setCols.foreach(c => require(base.columns.contains(c),
              s"$what: no column $c"))
            val bySet = setCols.zip(setExprs).toMap
            base.select(base.columns.toSeq.map { c =>
              bySet.get(c) match {
                case Some(e) => when(pred, expr(e)).otherwise(col(c)).as(c)
                case None    => col(c)
              }
            }: _*)
          case "delwhere" => base.filter(!coalesce(pred, lit(false)))
          case other => sys.error(s"$what: unknown predicate-COW kind '$other'")
        }
        out.write.mode("overwrite").parquet(dataDir.toString)
        val nf = listParquet(table, dataDir)
        if (nf.nonEmpty && lines.exists(_.startsWith("# constraint:")))
          checkConstraintLines(lines,
            spark.read.parquet(nf.map(f => s"$table/$f"): _*), what)
        nf
      }
    CowWhere(touched, survivors, newFiles, deadStatLines(touched) _, all.size)
  }

  /** Predicate COW UPDATE on a BRANCH — [[updateWhere]]'s semantics
    * against the branch head, main never sees a byte (touched fork-base
    * files rewrite into branch-local copies under `branch=<n>/txn=<id>/`).
    * SET assignments and the predicate are SQL TEXT: the logical statement
    * freezes to a spec parquet under the branch namespace, referenced by
    * the `# dml:` op-log line, so [[rebaseBranchDml]] replays the
    * STATEMENT (not the stale file images) against a future base — and
    * vacuum keeps it alive with the branch like every op-log input.
    * Branch-ledger idempotent per txnId; cross-incarnation replay guard
    * as every branch writer. */
  def updateWhereBranch(spark: SparkSession, table: String, name: String,
      sets: Seq[(String, String)], predSql: String,
      txnId: Long): (Long, Int, Int) = {
    require(sets.nonEmpty, "updateWhereBranch: no SET assignments")
    require(sets.map(_._1).distinct.size == sets.size,
      "updateWhereBranch: duplicate SET column")
    cowWhereBranch(spark, table, name, "updwhere", sets, predSql, txnId,
      "updateWhereBranch")
  }

  /** Predicate COW DELETE on a BRANCH — [[deleteWhere]]'s semantics with
    * [[updateWhereBranch]]'s branch isolation and replayable op-log. */
  def deleteWhereBranch(spark: SparkSession, table: String, name: String,
      predSql: String, txnId: Long): (Long, Int, Int) =
    cowWhereBranch(spark, table, name, "delwhere", Seq.empty, predSql,
      txnId, "deleteWhereBranch")

  private def cowWhereBranch(spark: SparkSession, table: String,
      name: String, kind: String, sets: Seq[(String, String)],
      predSql: String, txnId: Long,
      what: String): (Long, Int, Int) = withWriterLock(table) {
    val (base, head) = branches(table).getOrElse(name,
      sys.error(s"Acid.$what: no branch '$name' at $table"))
    val prev = branchLines(table, name)
    if (prev.contains(s"# txn:$txnId"))
      return (head, 0, prev.count(!_.startsWith("#"))) // replay → no-op
    require(!committedTxns(table).contains(txnId),
      s"Acid.$what: txn $txnId is already committed on main at $table " +
        s"but not on branch '$name' — use a fresh txn id")
    require(prev.contains("# base:."),
      s"$what on snapshot-mode table $table")
    require(!prev.exists(l => l.startsWith("# firstrow:") ||
      l.startsWith("# rowid_phys:") || l.startsWith("# rowid_next:")),
      s"$what on row-lineage table $table — lineage DML goes through the " +
        "lineage writers (they materialize ids through the rewrite)")
    // freeze the LOGICAL statement for rebase replay (the mergeCowBranch
    // chg= pattern, but the statement instead of a change frame — a
    // predicate re-evaluates against the future base by design)
    import spark.implicits._
    val specDir = Paths.get(table).resolve(s"branch=$name").resolve(s"spec=$txnId")
    Seq((kind, predSql, sets.map(_._1), sets.map(_._2)))
      .toDF("kind", "pred", "set_cols", "set_exprs")
      .coalesce(1).write.mode("overwrite").parquet(specDir.toString)
    val specFiles = listParquet(table, specDir)
    val w = cowWhereAttempt(spark, table, prev, kind, sets.map(_._1),
      sets.map(_._2), predSql,
      Paths.get(table).resolve(s"branch=$name").resolve(s"txn=$txnId"), what)
    val k1 = head + 1
    val manifest = (("# base:." +:
      (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
      prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
        !l.startsWith("# base:") && !l.startsWith("# op:") && !w.deadStat(l)) ++
      w.survivors ++ w.newFiles) :+
      s"# dml:$k1|$kind|$txnId|-|-|${specFiles.mkString(",")}"
    Files.write(brManifest(table, name, k1),
      manifest.mkString("", "\n", "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    writeBranchRef(table, name, base, k1, createNew = false)
    (k1, w.touched.size, w.total)
  }

  /** [[standingDeletes]] over explicit lines (branch manifests live
    * outside the version chain). */
  private def standingDeletes2(lines: Seq[String]): Option[(String, Seq[String])] = {
    val delFiles = lines.filter(_.startsWith("# delete:"))
      .map(_.stripPrefix("# delete:").trim)
    lines.find(_.startsWith("# delkey:")).map(_.stripPrefix("# delkey:").trim)
      .filter(_ => delFiles.nonEmpty).map(k => (k, delFiles))
  }

  /** Publish a branch whose fork base is STILL main's head: main adopts
    * the branch head manifest metadata-only — including the branch's txn
    * ledger, so a stream that committed to the branch keeps no-oping its
    * replays after publish (same ledger-carry contract as [[restore]]).
    * Fails loudly if main advanced past the base — that case is
    * [[mergeBranch]]. Idempotent per `txnId`; retires the branch ref. */
  def fastForwardBranch(table: String, name: String, txnId: Long): Long =
    withWriterLock(table) {
      // Through commitNextVersion like every other commit path (ADVICE r16):
      // the claim is what serializes a publish against lock-free
      // appendTxnCAS writers — a direct commitManifest would throw an
      // unhandled FileAlreadyExistsException on a lost race instead of
      // re-evaluating against the advanced head.
      val v = commitNextVersion(table) { (cur, prev) =>
        if (prev.contains(s"# txn:$txnId")) {
          // txnId already on main: either OUR publish crashed between the
          // commit and the ref retire, or an unrelated main commit happens
          // to carry the same id. Retire the ref only on the completed-
          // publish signature — every branch txn visible on main (ADVICE
          // r16: an accidental collision must not destroy a live branch).
          branches(table).get(name).foreach { _ =>
            val brTxns = branchLines(table, name)
              .filter(_.startsWith("# txn:")).toSet
            require(brTxns.subsetOf(prev.toSet),
              s"fastForwardBranch: txn $txnId is already committed on main " +
                s"at $table but branch '$name' holds unpublished commits — " +
                s"txn-id collision, refusing to retire the branch ref")
            dropBranchRefOnly(table, name)
          }
          Some(cur.get)
        } else {
          val (base, head) = branches(table).getOrElse(name,
            sys.error(s"Acid.fastForwardBranch: no branch '$name' at $table"))
          val c = cur.get
          require(c == base,
            s"fastForwardBranch: main advanced ($base -> $c) since the fork — " +
              s"use mergeBranch")
          if (head < 0) { dropBranchRefOnly(table, name); Some(c) } // empty
          else None
        }
      } { (_, _) =>
        val lines = branchLines(table, name)
        // the # dml: op log is branch-scope replay metadata — main never
        // replays, so publish strips it (keeps main manifests canonical)
        "# base:." +:
          ((lines.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId") ++
            lines.filterNot(l => l.startsWith("# txn:") || l == "# base:." ||
              l.startsWith("# dml:")))
      }
      if (branches(table).contains(name)) dropBranchRefOnly(table, name)
      v
    }

  /** Publish an APPEND-ONLY branch onto a main that has advanced since
    * the fork: the branch's new files and txns rebase onto main's current
    * manifest (append∥append commutes — the same reasoning as
    * [[appendTxnCAS]]'s rebase loop). Main's standing delete vectors
    * apply to the branch's rows, exactly as they would had the rows been
    * appended to main directly. A branch that recorded its OWN deletes
    * after the fork refuses to merge loudly — reconciling delete∥write is
    * [[mergeCow]]'s job, not a silent union's. Idempotent per `txnId`. */
  def mergeBranch(table: String, name: String, txnId: Long): Long =
    withWriterLock(table) {
      // Same claim-protocol routing as [[fastForwardBranch]] (ADVICE r16):
      // the build re-derives against whatever head the claim serialized on,
      // so a racing appendTxnCAS makes the merge rebase, not throw.
      val v = commitNextVersion(table) { (cur, prev) =>
        if (prev.contains(s"# txn:$txnId")) {
          branches(table).get(name).foreach { _ =>
            val brTxns = branchLines(table, name)
              .filter(_.startsWith("# txn:")).toSet
            require(brTxns.subsetOf(prev.toSet),
              s"mergeBranch: txn $txnId is already committed on main at " +
                s"$table but branch '$name' holds unpublished commits — " +
                s"txn-id collision, refusing to retire the branch ref")
            dropBranchRefOnly(table, name)
          }
          Some(cur.get)
        } else {
          branches(table).getOrElse(name,
            sys.error(s"Acid.mergeBranch: no branch '$name' at $table"))
          None
        }
      } { (_, curLines) =>
        val (base, _) = branches(table)(name)
        val baseLines = manifestLines(table, base)
        val brLines = branchLines(table, name)
        def dels(ls: Seq[String]) =
          ls.filter(l => l.startsWith("# delkey:") || l.startsWith("# delete:")).toSet
        require(dels(brLines) == dels(baseLines),
          s"mergeBranch: branch '$name' recorded deletes since the fork — " +
            s"append-only branches merge; delete reconciliation needs mergeCow")
        val removedBase = {
          val brFiles = brLines.filterNot(_.startsWith("#")).toSet
          baseLines.filterNot(_.startsWith("#")).filterNot(brFiles)
        }
        require(removedBase.isEmpty,
          s"mergeBranch: branch '$name' REWROTE fork-base files (branch DML) — " +
            "a three-way merge would resurrect the pre-DML rows; publish by " +
            "fastForwardBranch with main unmoved, or re-fork and re-run")
        val newFiles = {
          val baseFiles = baseLines.filterNot(_.startsWith("#")).toSet
          brLines.filterNot(_.startsWith("#")).filterNot(baseFiles)
        }
        val newTxns = {
          val baseTxns = baseLines.filter(_.startsWith("# txn:")).toSet
          brLines.filter(_.startsWith("# txn:")).filterNot(baseTxns)
        }
        require(curLines.contains("# base:."),
          s"mergeBranch on snapshot-mode table $table")
        // exactly-once across refs: a txn id that landed on BOTH main (since
        // the fork) and the branch is the same logical commit applied twice —
        // merging would double its rows silently. Refuse loudly; the operator
        // resolves by dropping one side (Delta's txnAppId is global for the
        // same reason).
        val collided = newTxns.toSet.intersect(
          curLines.filter(_.startsWith("# txn:")).toSet)
        require(collided.isEmpty,
          s"mergeBranch: txn ids committed on both main and branch '$name' " +
            s"since the fork: ${collided.mkString(", ")} — the same logical " +
            s"commit cannot land twice")
        ("# base:." +:
          ((curLines.filter(_.startsWith("# txn:")) ++ newTxns :+ s"# txn:$txnId") ++
            // # op: is a per-commit marker of MAIN'S HEAD commit, not of
            // this merge — carrying it would make feed readers misread
            // the publish as a rewrite/restore step
            curLines.filter(l => !l.startsWith("# txn:") && l != "# base:." &&
              !l.startsWith("# op:") && l.startsWith("#")))) ++
          curLines.filterNot(_.startsWith("#")) ++ newFiles
      }
      if (branches(table).contains(name)) dropBranchRefOnly(table, name)
      v
    }

  /** REBASE a branch onto main's current head — the git-rebase of refs:
    * a long-running experiment keeps itself current instead of divergence
    * compounding until publish day. The branch's own commits (txns + the
    * files they added since the fork) replay onto main's head manifest as
    * ONE new branch commit, the ref's fork base moves to main's current
    * version, and main is untouched — after a rebase, [[fastForwardBranch]]
    * publishes in O(1) as long as main holds still. Same safety rails as
    * [[mergeBranch]]: append-only branches only, cross-ref txn collisions
    * refuse. Main's standing delete vectors apply to the branch's rows
    * from now on (they ride the new base manifest). Idempotent per
    * `txnId` against the BRANCH ledger. Metadata-only — zero data bytes
    * move whatever the experiment's size. */
  def rebaseBranch(table: String, name: String, txnId: Long): Long =
    withWriterLock(table) {
      val (base, head) = branches(table).getOrElse(name,
        sys.error(s"Acid.rebaseBranch: no branch '$name' at $table"))
      val brLines = branchLines(table, name)
      if (brLines.contains(s"# txn:$txnId")) return head // replay → no-op
      val baseLines = manifestLines(table, base)
      def dels(ls: Seq[String]) =
        ls.filter(l => l.startsWith("# delkey:") || l.startsWith("# delete:")).toSet
      require(dels(brLines) == dels(baseLines),
        s"rebaseBranch: branch '$name' recorded deletes since the fork — " +
          s"append-only branches rebase; delete reconciliation needs mergeCow")
      val removedBase = {
        val brFiles = brLines.filterNot(_.startsWith("#")).toSet
        baseLines.filterNot(_.startsWith("#")).filterNot(brFiles)
      }
      require(removedBase.isEmpty,
        s"rebaseBranch: branch '$name' REWROTE fork-base files (branch DML) — " +
          "a three-way rebase would resurrect the pre-DML rows; publish by " +
          "fastForwardBranch with main unmoved, or re-fork and re-run")
      val newFiles = {
        val baseFiles = baseLines.filterNot(_.startsWith("#")).toSet
        brLines.filterNot(_.startsWith("#")).filterNot(baseFiles)
      }
      val newTxns = {
        val baseTxns = baseLines.filter(_.startsWith("# txn:")).toSet
        brLines.filter(_.startsWith("# txn:")).filterNot(baseTxns)
      }
      val cur = currentVersion(table).get
      val curLines = manifestLines(table, cur)
      require(curLines.contains("# base:."),
        s"rebaseBranch on snapshot-mode table $table")
      val collided = newTxns.toSet.intersect(
        curLines.filter(_.startsWith("# txn:")).toSet)
      require(collided.isEmpty,
        s"rebaseBranch: txn ids committed on both main and branch '$name' " +
          s"since the fork: ${collided.mkString(", ")}")
      val k = head + 1
      Files.write(brManifest(table, name, k),
        (("# base:." +:
          ((curLines.filter(_.startsWith("# txn:")) ++ newTxns :+ s"# txn:$txnId") ++
            // # op: marks MAIN'S HEAD commit, not this rebase — drop it
            curLines.filter(l => !l.startsWith("# txn:") && l != "# base:." &&
              !l.startsWith("# op:") && l.startsWith("#")))) ++
          curLines.filterNot(_.startsWith("#")) ++ newFiles ++
          // keep the branch's op log across the (append-only) rebase so a
          // later rebaseBranchDml still sees a complete replayable history
          // (the rebase's own ledger txn gets a no-op marker entry)
          brLines.filter(_.startsWith("# dml:")) :+
          s"# dml:$k|rebase|$txnId|-|-|")
          .mkString("", "\n", "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      writeBranchRef(table, name, cur, k, createNew = false)
      k
    }

  /** One parsed branch-op-log entry (`# dml:<k>|<kind>|<txn>|<key>|<op>|<files>`):
    * the replayable record every branch writer stamps so a rebase can
    * re-run the branch's LOGICAL history on a new base. */
  private final case class BranchOp(k: Long, kind: String, txn: Long,
      keyCol: String, opCol: Option[String], files: Seq[String])
  private def branchOpLog(lines: Seq[String]): Seq[BranchOp] =
    lines.filter(_.startsWith("# dml:")).map { l =>
      l.stripPrefix("# dml:").split("\\|", 6) match {
        case Array(k, kind, txn, key, op, fs) =>
          BranchOp(k.toLong, kind, txn.toLong, key,
            if (op == "-") None else Some(op),
            if (fs.isEmpty) Seq.empty else fs.split(',').toSeq)
        case other => sys.error(s"Acid: malformed branch op-log line: $l")
      }
    }.sortBy(_.k)

  /** REBASE a branch that carries DML onto main's current head — the lift
    * of [[rebaseBranch]]'s "branch REWROTE fork-base files" refusal. A
    * three-way FILE merge cannot work for DML (the branch's rewritten
    * copies embed the OLD base's rows — grafting them onto a new base
    * resurrects or drops whatever main changed since), so this replays the
    * branch's LOGICAL history instead: every branch commit records a
    * `# dml:` op-log line (append: the landed files; MoR delete: the key
    * files; COW merge: a frozen copy of the change frame under
    * `branch=<n>/chg=<txn>/`), and the rebase re-runs those ops in commit
    * order against main's head manifest — exactly the state the operator
    * would have reached running the same DML had they forked today. The
    * result lands as ONE new branch commit with the op log re-stamped, so
    * rebases compose; [[fastForwardBranch]] then publishes in O(1) while
    * main holds still.
    *
    * Semantics are git-rebase's: the branch's row-level intent wins over
    * main's concurrent changes to the SAME keys (a replayed MERGE
    * re-probes main's files from scratch, so a mid-experiment main
    * OPTIMIZE — the case the three-way merge refuses — is transparent
    * here: the replay reads the compacted files like any other). Cost is
    * O(files the replayed DML touches) per merge op — the same bill the
    * original branch DML paid — plus O(lines) for appends/deletes; never
    * O(table). Cross-ref txn collisions refuse as everywhere; idempotent
    * per `txnId` against the branch ledger. Refuses branches whose
    * commits predate the op log (no `# dml:` record — re-fork). Schema-
    * evolved bases replay fine: the merge replays run through the same
    * LOGICAL-frame probe/rewrite as main DML ([[readLogical]]), and
    * append/delete replays are manifest arithmetic. */
  def rebaseBranchDml(spark: SparkSession, table: String, name: String,
      txnId: Long): Long = withWriterLock(table) {
    val (base, head) = branches(table).getOrElse(name,
      sys.error(s"Acid.rebaseBranchDml: no branch '$name' at $table"))
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.rebaseBranchDml: no committed version at $table"))
    if (head < 0) {
      // An empty branch still lands the rebase as BRANCH COMMIT 0 (main's
      // head lines + this txn + a no-op op-log marker): the branch ledger
      // is what makes a replayed rebase no-op — a bare ref move would let
      // a driver retry silently re-fork onto a further-advanced main
      // (r18 review). Cross-incarnation guard as appendTxnBranch.
      require(!committedTxns(table).contains(txnId),
        s"Acid.rebaseBranchDml: txn $txnId is already committed on main " +
          s"at $table — use a fresh txn id")
      val curLines0 = manifestLines(table, cur)
      require(curLines0.contains("# base:."),
        s"rebaseBranchDml on snapshot-mode table $table")
      val manifest = (("# base:." +:
        (curLines0.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        curLines0.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:") &&
          !l.startsWith("# dml:")) ++
        curLines0.filterNot(_.startsWith("#"))) :+
        s"# dml:0|rebase|$txnId|-|-|"
      Files.write(brManifest(table, name, 0L),
        manifest.mkString("", "\n", "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      writeBranchRef(table, name, cur, 0L, createNew = false)
      return 0L
    }
    val brLines = branchLines(table, name)
    if (brLines.contains(s"# txn:$txnId")) return head // replay → no-op
    val baseLines = manifestLines(table, base)
    val ops = branchOpLog(brLines)
    val ownTxns = {
      val baseTxns = baseLines.filter(_.startsWith("# txn:"))
        .map(_.stripPrefix("# txn:").trim.toLong).toSet
      brLines.filter(_.startsWith("# txn:"))
        .map(_.stripPrefix("# txn:").trim.toLong).filterNot(baseTxns)
    }
    require(ops.map(_.txn).toSet == ownTxns.toSet,
      s"rebaseBranchDml: branch '$name' holds commits with no op-log " +
        s"record (logged ${ops.map(_.txn).mkString(",")} vs own " +
        s"${ownTxns.mkString(",")}) — pre-op-log branch; re-fork and re-run")
    val curLines = manifestLines(table, cur)
    require(curLines.contains("# base:."),
      s"rebaseBranchDml on snapshot-mode table $table")
    val collided = ops.map(o => s"# txn:${o.txn}")
      .toSet.intersect(curLines.filter(_.startsWith("# txn:")).toSet)
    require(collided.isEmpty,
      s"rebaseBranchDml: txn ids committed on both main and branch " +
        s"'$name' since the fork: ${collided.mkString(", ")}")
    // replay the logical history, oldest first, against main's head
    var state = curLines
    ops.foreach { op =>
      state = op.kind match {
        case "rebase" => // ledger-only marker of a past rebase commit:
          // carry the txn (its replay no-op contract survives), no data op
          ("# base:." +:
            (state.filter(_.startsWith("# txn:")) :+ s"# txn:${op.txn}")) ++
            state.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:")) ++
            state.filterNot(_.startsWith("#"))
        case "append" => appendManifest(state, op.txn, op.files)
        case "delete" =>
          val prevKey = state.find(_.startsWith("# delkey:"))
            .map(_.stripPrefix("# delkey:").trim)
          require(prevKey.forall(_ == op.keyCol),
            s"rebaseBranchDml: main now uses delete key " +
              s"${prevKey.getOrElse("")}, branch recorded ${op.keyCol}")
          ("# base:." +:
            (state.filter(_.startsWith("# txn:")) :+ s"# txn:${op.txn}")) ++
            Seq(s"# delkey:${op.keyCol}") ++
            (state.filter(_.startsWith("# delete:")) ++
              op.files.map(f => s"# delete:$f")) ++
            state.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") &&
              !l.startsWith("# delkey:") && !l.startsWith("# delete:")) ++
            state.filterNot(_.startsWith("#"))
        case "merge" =>
          val changes = spark.read.parquet(op.files.map(f => s"$table/$f"): _*)
          // fresh dirs per (op, base, THIS rebase's txn): a later rebase
          // onto another base must not overwrite files an earlier rebase
          // published — and (ADVICE r18) a SECOND rebase at the SAME main
          // head with a fresh txnId must not overwrite dirs the branch's
          // current head manifest still references (part-file names are
          // not stable; an overwrite deletes the old files mid-read and
          // leaves the superseded head dangling). Keying by the rebase's
          // own txnId makes every rebase write fresh dirs.
          val m = cowMergeAttempt(spark, table, state, changes, op.keyCol,
            op.opCol,
            Paths.get(table).resolve(s"branch=$name")
              .resolve(s"txn=${op.txn}-r$cur-t$txnId"),
            Paths.get(table).resolve(s"branch=$name")
              .resolve(s"del=${op.txn}-r$cur-t$txnId"),
            "rebaseBranchDml")
          ("# base:." +:
            (state.filter(_.startsWith("# txn:")) :+ s"# txn:${op.txn}")) ++
            m.vectorLines ++
            state.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") &&
              !l.startsWith("# delkey:") && !l.startsWith("# delete:") &&
              !m.deadStat(l)) ++
            m.survivors ++ m.newFiles
        case "updwhere" | "delwhere" =>
          // replay the frozen LOGICAL statement against the current state
          // — the predicate re-probes the future base from scratch, so
          // rows main changed since the fork get the branch's update/
          // delete intent exactly as if the operator had forked today
          val spec = spark.read
            .parquet(op.files.map(f => s"$table/$f"): _*).head()
          val w = cowWhereAttempt(spark, table, state, op.kind,
            spec.getAs[scala.collection.Seq[String]]("set_cols").toSeq,
            spec.getAs[scala.collection.Seq[String]]("set_exprs").toSeq,
            spec.getAs[String]("pred"),
            Paths.get(table).resolve(s"branch=$name")
              .resolve(s"txn=${op.txn}-r$cur-t$txnId"),
            "rebaseBranchDml")
          ("# base:." +:
            (state.filter(_.startsWith("# txn:")) :+ s"# txn:${op.txn}")) ++
            state.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
              !l.startsWith("# base:") && !l.startsWith("# op:") &&
              !w.deadStat(l)) ++
            w.survivors ++ w.newFiles
        case other => sys.error(s"rebaseBranchDml: unknown op kind '$other'")
      }
    }
    val k = head + 1
    val rebased = ("# base:." +:
      (state.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
      state.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
        !l.startsWith("# base:") && !l.startsWith("# op:") &&
        !l.startsWith("# dml:")) ++
      state.filterNot(_.startsWith("#")) ++
      // re-stamp the op log verbatim (the LOGICAL inputs never move), so
      // a second rebase onto a further-advanced main replays identically;
      // this rebase's own ledger txn gets a no-op marker entry
      (ops.map(o => s"# dml:${o.k}|${o.kind}|${o.txn}|${o.keyCol}|" +
        s"${o.opCol.getOrElse("-")}|${o.files.mkString(",")}") :+
        s"# dml:$k|rebase|$txnId|-|-|")
    Files.write(brManifest(table, name, k),
      rebased.mkString("", "\n", "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
    writeBranchRef(table, name, cur, k, createNew = false)
    k
  }

  /** Cherry-pick ONE branch commit onto main — Iceberg's cherrypickSnapshot:
    * the branch stays open (unlike [[mergeBranch]]), only the files the
    * picked commit ADDED land on main, under both the picked commit's txn
    * id and the publish `txnId` (so the eventual full merge of the same
    * branch refuses loudly via the cross-ref collision guard instead of
    * double-applying the picked rows). Append-only commits only: a picked
    * commit that changed delete vectors refuses. `branchTxn` names the
    * branch commit by its ledger id — the stable handle a replayed pick
    * keys on. Metadata-only; idempotent per `txnId`. */
  def cherryPick(table: String, name: String, branchTxn: Long,
      txnId: Long): Long = withWriterLock(table) {
    val (base, head) = branches(table).getOrElse(name,
      sys.error(s"Acid.cherryPick: no branch '$name' at $table"))
    def linesAt(k: Long): Seq[String] =
      if (k < 0) manifestLines(table, base)
      else {
        val it = Files.readAllLines(brManifest(table, name, k)).iterator()
        val b = Seq.newBuilder[String]
        while (it.hasNext) { val l = it.next().trim; if (l.nonEmpty) b += l }
        b.result()
      }
    val k = (0L to head).find(k => linesAt(k).contains(s"# txn:$branchTxn") &&
        !linesAt(k - 1).contains(s"# txn:$branchTxn"))
      .getOrElse(sys.error(
        s"Acid.cherryPick: no commit with txn $branchTxn on branch '$name'"))
    val (before, after) = (linesAt(k - 1), linesAt(k))
    def dels(ls: Seq[String]) =
      ls.filter(l => l.startsWith("# delkey:") || l.startsWith("# delete:")).toSet
    require(dels(after) == dels(before),
      s"cherryPick: branch commit $branchTxn changed delete vectors — " +
        s"only append-only commits cherry-pick")
    require(before.filterNot(_.startsWith("#"))
        .forall(after.filterNot(_.startsWith("#")).toSet),
      s"cherryPick: branch commit $branchTxn REWROTE files (branch DML) — " +
        "picking only its added files would resurrect the pre-DML rows; " +
        "publish the whole branch by fastForwardBranch instead")
    val picked = {
      val prev = before.filterNot(_.startsWith("#")).toSet
      after.filterNot(_.startsWith("#")).filterNot(prev)
    }
    // Claim-protocol commit like every other publish path (ADVICE r16): a
    // racing appendTxnCAS rebases this pick instead of surfacing as an
    // unhandled FileAlreadyExistsException.
    commitNextVersion(table) { (cur, prev) =>
      if (prev.contains(s"# txn:$txnId")) {
        // completed-pick signature: the picked branch commit itself is on
        // main. An unrelated commit merely sharing our publish id must not
        // silently skip the pick (ADVICE r16).
        require(prev.contains(s"# txn:$branchTxn"),
          s"cherryPick: txn $txnId is already committed on main at $table " +
            s"but picked commit $branchTxn is not — txn-id collision, " +
            s"refusing to skip the pick")
        Some(cur.get)
      } else None
    } { (_, curLines) =>
      require(curLines.contains("# base:."),
        s"cherryPick on snapshot-mode table $table")
      require(!curLines.contains(s"# txn:$branchTxn"),
        s"cherryPick: txn $branchTxn already committed on main")
      ("# base:." +:
        ((curLines.filter(_.startsWith("# txn:")) :+ s"# txn:$branchTxn"
          :+ s"# txn:$txnId") ++
          // # op: marks main's PREVIOUS commit, not this pick — drop it
          curLines.filter(l => !l.startsWith("# txn:") && l != "# base:." &&
            !l.startsWith("# op:") && l.startsWith("#")))) ++
        curLines.filterNot(_.startsWith("#")) ++ picked
    }
  }

  private def dropBranchRefOnly(table: String, name: String): Unit = {
    Files.deleteIfExists(branchRef(table, name))
    Option(new java.io.File(table).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(s"manifest-br-$name-"))
      .foreach(f => Files.deleteIfExists(f.toPath))
  }

  /** Abandon a branch: ref, branch manifests, and the branch's
    * UNPUBLISHED data gone — main never knew (the [[abortWap]] of
    * branches). Files a [[cherryPick]] already landed on main (or that
    * another ref still references) are spared: a dropped experiment must
    * never tear data out of the published table. */
  def dropBranch(table: String, name: String): Unit = withWriterLock(table) {
    dropBranchRefOnly(table, name)
    val dataDir = Paths.get(table, s"branch=$name")
    if (Files.exists(dataDir)) {
      // live set across every other ref: readable main versions, tagged
      // manifests, other branches' heads, staged WAP batches — the same
      // liveness rule vacuum applies, scoped to this branch's data dir
      val cur = currentVersion(table)
      val tagged = tags(table).values.toSet
      def refs(ls: Seq[String]): Seq[String] =
        ls.filter(_.startsWith("# delete:")).map(_.stripPrefix("# delete:").trim) ++
          ls.filter(_.startsWith("# pdel:")).map(_.stripPrefix("# pdel:").trim) ++
          ls.filterNot(_.startsWith("#"))
      val live: Set[String] = (cur.toSeq.flatMap { c =>
        ((horizon(table) to c) ++ tagged.filter(_ < horizon(table)))
          .flatMap(v => refs(manifestLines(table, v)))
      } ++ branches(table).keys.flatMap(n => refs(branchLines(table, n))) ++
        stagedWapIds(table).flatMap(id => wapFiles(table, id))).toSet
      val root = Paths.get(table)
      val walk = Files.walk(dataDir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach { p =>
          val rel = root.relativize(p).toString
          if (Files.isDirectory(p)) {
            // remove now-empty dirs only
            val ls = Files.list(p)
            val empty = try !ls.iterator().hasNext finally ls.close()
            if (empty) Files.deleteIfExists(p)
          } else if (!live(rel)) Files.deleteIfExists(p)
          ()
        }
      finally walk.close()
    }
  }

  /** Retention for NAMED REFS — the GC story the branch/tag families
    * opened: a branch pins its fork base (and every file its head
    * references) against [[vacuum]] FOREVER, so an abandoned experiment
    * quietly pins storage at 100 TB scale. Drops every branch and tag
    * whose ref file was last written more than `maxAgeMs` ago (Iceberg's
    * `max-ref-age-ms`): an expired branch reclaims its EXCLUSIVE
    * unpublished data through [[dropBranch]]'s liveness rule
    * (published/cherry-picked files and anything another ref still
    * references survive — a dropped experiment never tears data out of
    * the published table), and an expired tag releases its manifest pin
    * so the next vacuum can advance past it. `keep` names protected refs
    * exempt from expiry. Control plane only: O(refs) file stats; each
    * drop serializes on the writer lock individually (expiry is
    * maintenance, not a transaction). Returns the expired ref names,
    * kind-prefixed. */
  def expireRefs(table: String, maxAgeMs: Long,
      keep: Set[String] = Set.empty): Seq[String] = {
    val now = System.currentTimeMillis()
    def stale(p: Path): Boolean =
      Files.exists(p) && now - Files.getLastModifiedTime(p).toMillis > maxAgeMs
    val deadTags = tags(table).keys.toSeq.sorted.filterNot(keep)
      .filter(n => stale(Paths.get(table, s"tag-$n.txt")))
    val deadBranches = branches(table).keys.toSeq.sorted.filterNot(keep)
      .filter(n => stale(branchRef(table, n)))
    deadTags.foreach(dropTag(table, _))
    deadBranches.foreach(dropBranch(table, _))
    deadTags.map(n => s"tag:$n") ++ deadBranches.map(n => s"branch:$n")
  }

  /** Staleness horizon for the automatic txn-branch sweep (ms). A LIVE
    * transaction refreshes its branch ref's mtime on every statement
    * commit, so only a transaction idle past this horizon is collectible —
    * the same mtime-staleness rule as [[ClaimStaleMs]]. Mutable only so
    * the sweep is testable without an hour's sleep. */
  @volatile private[graft] var TxnBranchStaleMs = 3600000L

  /** Sweep EXPIRED `txn-*` branches — the BEGIN/COMMIT crash leak closed
    * (VERDICT r19 item 7): a driver killed mid-transaction leaves its
    * txn-private branch on disk; the documented same-id retry reclaims it,
    * but an id never retried leaked until a manual [[expireRefs]]. Called
    * at transaction open (the SQL BEGIN handler), so the garbage of past
    * crashes is collected exactly where new garbage could be created.
    * Safe by construction: a swept branch's ref still exists, so it was
    * never published (publish retires the ref) — dropping it cannot tear
    * data out of main ([[dropBranch]]'s published-file liveness rule).
    * A sweep failure must never block the OPENING transaction: each drop
    * races other sweepers/drivers benignly, so any non-fatal error just
    * skips that branch until the next open. */
  def sweepTxnBranches(table: String): Seq[String] = {
    val now = System.currentTimeMillis()
    val dead = branches(table).keys.toSeq.sorted
      .filter(_.startsWith("txn-"))
      .filter { n =>
        try now - Files.getLastModifiedTime(branchRef(table, n)).toMillis >
          TxnBranchStaleMs
        catch { case _: java.io.IOException => false } // raced a drop
      }
    dead.filter { n =>
      try { dropBranch(table, n); true }
      catch { case scala.util.control.NonFatal(_) => false } // raced a drop/publish
    }.map(n => s"branch:$n")
  }

  /** Commit-history METADATA table — Delta `DESCRIBE HISTORY` / Iceberg's
    * `snapshots` metadata table, as a queryable DataFrame: one row per
    * readable version with its data-file count, txn-ledger depth, standing
    * delete-key count, and exact row count. The structural columns come
    * from O(versions) driver-side manifest reads (no data I/O — this is
    * the control plane); `n_rows` re-counts each version through
    * [[readVersion]], O(history) scan jobs — the fixture-scale audit
    * convenience. At 100 TB the row counts come from the `# rows:` stat
    * lines the writers already record; the manifest seam is the source
    * either way. Vacuumed versions are absent by construction (their
    * manifests are gone — history is exactly what is still readable). */
  def history(spark: SparkSession, table: String): DataFrame = {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.history: no committed version at $table"))
    val rows = (horizon(table) to cur).map { v =>
      val lines = manifestLines(table, v)
      Row(v,
        lines.count(!_.startsWith("#")).toLong,
        lines.count(_.startsWith("# txn:")).toLong,
        readVersion(spark, table, v).count())
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_txns",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Refs METADATA table — Iceberg's `refs`: one row per named reference
    * of the table (the implicit `main` branch, every tag, every live
    * branch) with its kind, pinned version (tag's snapshot / branch's
    * fork base / main's head), and the branch's own unpublished commit
    * count. Pure control plane: O(refs) driver-side file reads, zero data
    * I/O. This is the listing the r16 branch/tag families lacked — an
    * operator of a multi-ref table (now the normal case) can finally ask
    * "what pins storage here" before a vacuum or an [[expireRefs]]. */
  def refs(spark: SparkSession, table: String): DataFrame = {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.refs: no committed version at $table"))
    val rows =
      Seq(Row("main", "branch", cur, 0L)) ++
      tags(table).toSeq.sortBy(_._1).map { case (n, v) =>
        Row(n, "tag", v, 0L) } ++
      branches(table).toSeq.sortBy(_._1).map { case (n, (base, head)) =>
        Row(n, "branch", base, head + 1L) }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ref_name",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("commits",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Files METADATA table — Iceberg's `files`: one row per data file of
    * the current version with its partition tuple (hive path segments or
    * the manifest's `# pval:` line), recorded row count, and recorded
    * min/max stats (canonical `name:lo..hi` string, `;`-joined). Pure
    * manifest arithmetic — zero data I/O, O(files) driver-side; the
    * listing a compaction or skew diagnosis starts from. Files whose
    * writer recorded no `# rows:` line surface NULL (stats are an
    * optimization, never a requirement — same contract as skipping). */
  def filesTable(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      sys.error(s"Acid.filesTable: no committed version at $table"))
    val lines = manifestLines(table, v)
    val files = lines.filterNot(_.startsWith("#"))
    val rowsMap = lines.filter(_.startsWith("# rows:")).flatMap { l =>
      l.stripPrefix("# rows:").split('|') match {
        case Array(f, n) => Some(f -> n.toLong)
        case _ => None
      }
    }.toMap
    val statsMap = lines.filter(_.startsWith("# minmax:")).flatMap { l =>
      l.stripPrefix("# minmax:").split('|') match {
        case Array(f, n, lo, hi) => Some(f -> s"$n:$lo..$hi")
        case _ => None
      }
    }.groupBy(_._1).map { case (f, ss) => f -> ss.map(_._2).sorted.mkString(";") }
    val pvalMap = lines.filter(_.startsWith("# pval:")).flatMap { l =>
      // format: # pval:<file>|<name>=<value>[,<name>=<value>...]
      val body = l.stripPrefix("# pval:")
      val (f, rest) = body.span(_ != '|')
      if (rest.isEmpty) None else Some(f -> rest.drop(1))
    }.toMap
    def hivePartition(f: String): String =
      f.split('/').dropRight(1).filter(_.contains("=")).mkString(",")
    // snapshot-mode tables root their files under v=<n>/
    val prefix = if (lines.contains("# base:.")) "" else s"v=$v/"
    val rows = files.sorted.map { f =>
      Row(f,
        pvalMap.getOrElse(f, hivePartition(f)),
        rowsMap.get(f).map(Long.box).orNull,
        statsMap.getOrElse(f, ""),
        Files.size(Paths.get(table, prefix + f)))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("partition",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("stats",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("size_bytes",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** ADD a CHECK constraint metadata-only — Delta `ALTER TABLE ... ADD
    * CONSTRAINT`: validates the EXISTING data satisfies the predicate
    * first (one aggregate over the current merged state — Delta refuses
    * a constraint the table already violates for the same reason), then
    * commits one `# constraint:` manifest line; every later
    * [[appendTxnChecked]] enforces it at the write gate. Idempotent per
    * txnId. */
  def addConstraint(spark: SparkSession, table: String, name: String,
      predicate: String, txnId: Long): Long = withWriterLock(table) {
    require(!name.contains("|"), "addConstraint: '|' is the separator")
    val bad = read(spark, table)
      .agg(count(when(!expr(predicate) || expr(predicate).isNull, 1)))
      .head.getLong(0)
    if (bad > 0) throw new ConstraintViolationException(
      s"$name ($predicate): $bad existing rows violate it")
    commitNextVersion(table) { (cur, prev) =>
      require(cur.isDefined, s"Acid.addConstraint: no committed version at $table")
      require(prev.contains("# base:."),
        s"addConstraint on snapshot-mode table $table")
      val dup = prev.find(l => l.startsWith(s"# constraint:$name|"))
      require(dup.isEmpty || dup.contains(s"# constraint:$name|$predicate"),
        s"addConstraint: constraint $name already exists with a different predicate")
      if (prev.contains(s"# txn:$txnId")) Some(cur.get) else None
    } { (_, prev) =>
      ("# base:." +:
        (prev.filter(_.startsWith("# txn:")) :+ s"# txn:$txnId")) ++
        prev.filter(l => l.startsWith("#") && !l.startsWith("# txn:") &&
          !l.startsWith("# base:") && !l.startsWith("# op:")) ++
        Seq(s"# constraint:$name|$predicate") ++
        prev.filterNot(_.startsWith("#"))
    }
  }

  /** Partition-tuple METADATA table — Iceberg's `partitions` metadata
    * table: one row per distinct partition tuple of the current version
    * with its data-file count and exact row count. Tuples come from the
    * manifest's `# pval:` lines (O(files) driver-side text); row counts
    * come from the immutable files' parquet FOOTERS (r20 — zero Spark
    * jobs), folded to tuples driver-side — never a per-tuple
    * scan. Reports PHYSICAL data-file facts (standing delete vectors are
    * not subtracted), same contract as Iceberg's partitions table. Files
    * written before any transform existed report under the empty tuple. */
  def partitions(spark: SparkSession, table: String): DataFrame = {
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.partitions: no committed version at $table"))
    val lines = manifestLines(table, cur)
    require(lines.contains("# base:."),
      s"Acid.partitions on snapshot-mode table $table")
    val tupleOf: Map[String, String] =
      lines.filter(_.startsWith("# pval:")).map { l =>
        val parts = l.stripPrefix("# pval:").split("\\|", 2)
        parts(0) -> (if (parts.length > 1) parts(1) else "")
      }.toMap
    val files = lines.filterNot(_.startsWith("#"))
    // counts from the immutable files' footers — no scan job (r20)
    val perFile: Map[String, Long] =
      files.map(f => f -> footerRowCount(spark, s"$table/$f")).toMap
    val rows = files.groupBy(f => tupleOf.getOrElse(f, ""))
      .map { case (t, fs) =>
        Row(t, fs.size.toLong, fs.map(f => perFile.getOrElse(f, 0L)).sum)
      }.toSeq
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("partition",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  private def horizonPath(table: String): Path = Paths.get(table, "_horizon")

  /** Oldest version still readable (0 if never vacuumed). */
  def horizon(table: String): Long = {
    val p = horizonPath(table)
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong
    else 0L
  }

  /** Retention GC — Delta `VACUUM` / Iceberg `expireSnapshots`: keep the
    * last `keep` versions, physically delete every data file referenced
    * ONLY by expired versions, drop their manifests, and advance the
    * horizon marker (so an expired time travel fails loudly, never
    * half-reads). Order matters for crash safety: horizon first (stop new
    * readers), then manifests, then data — a crash mid-vacuum leaves
    * unreferenced garbage, never a readable-but-missing-files version.
    * Live-reader grace periods (Delta's retention-duration check) are the
    * production extra, out of scope. Returns the deleted file paths. */
  def vacuum(table: String, keep: Int, graceMs: Long = 0L): Seq[String] = withWriterLock(table) {
    require(keep >= 1, "vacuum: keep must be >= 1")
    val cur = currentVersion(table).getOrElse(
      sys.error(s"Acid.vacuum: no committed version at $table"))
    val newHorizon = math.max(horizon(table), cur - keep + 1)
    if (newHorizon == 0) Seq.empty
    else {
      // table-relative live set across every retained manifest, every
      // TAGGED manifest (a named ref pins its snapshot past the horizon —
      // Iceberg's expireSnapshots keeps tagged refs), plus every
      // staged-but-unpublished WAP batch (a pending audit is live by
      // definition — abortWap is the only way to drop one)
      val tagged = tags(table).values.toSet
      // a branch pins its fork base (its head manifest may be the base's)
      // and every file its head references — same liveness rule as tags/WAP
      val branchMap = branches(table)
      val branchBases = branchMap.values.map(_._1).toSet
      val live: Set[String] = (((newHorizon to cur) ++
        (tagged ++ branchBases).filter(_ < newHorizon))
        .flatMap { v =>
          val lines = manifestLines(table, v)
          val rootRel = lines.contains("# base:.")
          lines.filter(_.startsWith("# delete:")).map(_.stripPrefix("# delete:").trim) ++
            // positional vectors are live by reference exactly like
            // equality vectors — GC'ing one silently resurrects rows
            lines.filter(_.startsWith("# pdel:")).map(_.stripPrefix("# pdel:").trim) ++
            // materialized CDC preimage files stay readable as long as
            // their manifest does (the feed reads them per version)
            lines.filter(_.startsWith("# cdc:"))
              .map(_.stripPrefix("# cdc:").dropWhile(_ != '|').drop(1).trim) ++
            lines.filterNot(_.startsWith("#"))
              .map(f => if (rootRel) f else s"v=$v/$f")
        } ++ stagedWapIds(table).flatMap(id => wapFiles(table, id)) ++
        branchMap.keys.flatMap { n =>
          val ls = branchLines(table, n)
          ls.filter(_.startsWith("# delete:")).map(_.stripPrefix("# delete:").trim) ++
            ls.filter(_.startsWith("# pdel:")).map(_.stripPrefix("# pdel:").trim) ++
            // op-log inputs are live as long as the branch is: the frozen
            // change frames under chg=<txn>/ are referenced ONLY by
            // '# dml:' lines, and GC'ing one would destroy the branch's
            // rebaseBranchDml replay capability (r18)
            branchOpLog(ls).flatMap(_.files) ++
            ls.filterNot(_.startsWith("#"))
        }).toSet
      val tmp = Paths.get(table, "_horizon.tmp")
      Files.write(tmp, newHorizon.toString.getBytes("UTF-8"))
      Files.move(tmp, horizonPath(table),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      (0L until newHorizon).foreach { v =>
        // a tagged or branch-base manifest outlives the horizon
        if (!tagged.contains(v) && !branchBases.contains(v))
          Files.deleteIfExists(Paths.get(table, s"manifest-$v.txt"))
        Files.deleteIfExists(Paths.get(table, s"claim-$v")) // expired claim GC
      }
      // reclaimed-stale-claim tombstones (expireStaleClaim's renamed-aside
      // files) are never load-bearing — GC them all
      Option(new java.io.File(table).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("claim-") && f.getName.contains(".stale."))
        .foreach(f => Files.deleteIfExists(f.toPath))
      val root = Paths.get(table)
      val walk = Files.walk(root)
      val dead =
        try walk.filter(p => p.toString.endsWith(".parquet"))
          .map[String](p => root.relativize(p).toString)
          .toArray.map(_.toString).toSeq.filterNot(live)
        finally walk.close()
      // grace window (Delta's retention-duration check): an unreferenced
      // file younger than `graceMs` may be a concurrent CAS writer's
      // in-flight data, landed before its manifest commit — spare it. The
      // default 0 keeps single-writer vacuums deterministic.
      val cutoff = System.currentTimeMillis() - graceMs
      val deletable = dead.filter { f =>
        graceMs == 0L ||
          Files.getLastModifiedTime(root.resolve(f)).toMillis < cutoff
      }
      deletable.foreach(f => Files.deleteIfExists(root.resolve(f)))
      deletable.sorted
    }
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

/** A batch violated the table's CHECK constraints — the commit did not
  * happen and the table did not advance (Delta's InvariantViolationException
  * shape). The message carries per-constraint violation counts. */
final class ConstraintViolationException(msg: String) extends RuntimeException(msg)
