package graft

/** Per-JVM-scoped /tmp staging paths for operators that write before they
  * read (format round-trips, sink rewrites, bucketed warehouses).
  *
  * Paths previously derived only from the fixture dir, so two concurrent
  * runs (driver Verify + a local bench, or two bench JVMs) on the same
  * fixture clobbered each other's staging mid-read (ADVICE r10). The token
  * is the JVM's pid@host: stable within a JVM (re-running a key in-session
  * reuses its dir — overwrite semantics unchanged), unique across
  * concurrent JVMs on one box. Staging is small (fixture-scale) and /tmp
  * is session-lifetime scratch, so no reaper is needed.
  */
object Tmp {
  private val token: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^a-zA-Z0-9]", "")

  def dir(prefix: String, sfDir: String): String =
    s"/tmp/graft_${prefix}_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_") + s"_$token"
}
