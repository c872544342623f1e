package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated key subset for fast local iteration
    // (mirrors scripts/check.py's 3rd arg; driver always passes 2)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // ANSI mode: decimal/cast overflow fails loudly instead of silently
      // returning NULL — matches DuckDB's behavior (ADVICE r1).
      .config("spark.sql.ansi.enabled", "true")
      // production-shaped streaming state: disk-backed RocksDB provider for
      // every StreamingQuery (r12; see StreamOps.ensureRocksDb)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing: per-batch incremental changelog upload
      // instead of full RocksDB snapshots (the production setting; at
      // fixture scale it removes most per-micro-batch provider overhead)
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      // see Bench: metric-only row tracking costs a RocksDB get per put
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // print the CAUSE chain: scala futures box fatal errors as
        // ExecutionException("Boxed Exception", t) — the message alone
        // hides the OOM/SO underneath (r16 diagnosis cost a 40-min rerun)
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .take(5).map(t => s"${t.getClass.getSimpleName}: ${t.getMessage}")
          .mkString(" <- ")
        System.err.println(s"[verify] $name failed: $chain")
      }
      // release per-key session residue (r16: a 14-streaming-key sf10 run
      // OOM'd because each memory sink's rows stay pinned by its temp
      // view until the session dies): drop the sinks' temp views and the
      // SQL entry path's manifest-resolved views — never the fixture
      // table views, which SqlEntry's per-sfDir registration cache owns
      spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && (t.name.startsWith("graft_sink_") ||
          t.name.startsWith("graft_fanout_") || t.name.startsWith("__graft_acid_")))
        .foreach(t => spark.catalog.dropTempView(t.name))
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
