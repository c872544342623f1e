package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-SQL entry path (SURVEY §3.2; r11 verdict item 8): the non-Scala
  * user's door into the engine. Every fixture table is registered as a
  * temp view and the query is submitted as SQL TEXT — the same string the
  * DuckDB oracle runs, so for the routed keys ONE dialect-shared statement
  * drives both engines end-to-end: Spark parses/plans/executes it through
  * the catalog, DuckDB independently evaluates it, and the driver's
  * hash-compare proves the two engines agree on the text's semantics (not
  * merely on two hand-kept translations).
  *
  * Catalyst guarantees SQL text and the equivalent DataFrame construction
  * converge on the same optimized plan space (SurfaceDocSpec pins plan-
  * shape equality for routed keys), so routing costs nothing at 100 TB —
  * same scan pruning, same join strategies, same codegen.
  */
object SqlEntry {

  // last directory registered PER SESSION: re-registration is metadata-only
  // but not free (10 view analyses), so skip it while the target fixture
  // dir is unchanged. Re-registering on a dir SWITCH is the correctness
  // half — bench runs alternate SFs within one session. Keyed by session
  // (ADVICE r12: temp views are session-scoped, so a JVM-global cache made
  // a SECOND SparkSession on the same dir skip registration entirely).
  // WeakHashMap (ADVICE r13): a strong-keyed map retained every session
  // ever passed through here for the JVM lifetime, pinning its
  // SessionState — weak keys let retired sessions collect. All access goes
  // through the lock (WeakHashMap is not thread-safe).
  private val lastDir = new java.util.WeakHashMap[SparkSession, String]()

  /** Register fixture views (idempotent, metadata-only) and run `text`. */
  def sql(spark: SparkSession, sfDir: String, text: String): DataFrame = {
    lastDir.synchronized {
      if (lastDir.get(spark) != sfDir) {
        Tables.registerAll(spark, sfDir); lastDir.put(spark, sfDir)
      }
    }
    spark.sql(text)
  }
}
