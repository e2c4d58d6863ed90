package graft

/** Temp directories for the get-or-build persisted warehouses
  * (sketch/IVF/IVFPQ index tables), registered for deletion at JVM
  * exit. Before r14 each builder called Files.createTempDirectory and
  * never cleaned up — and since in-memory-catalog sessions rebuild per
  * JVM, every Verify/Bench/smoke invocation leaked its full index
  * bytes into /tmp forever (243 orphaned dirs / ~20 GB found when this
  * was fixed). A real warehouse deployment points these at managed
  * storage instead; the exit hook is the correct lifetime for a
  * session-scoped catalog.
  */
object TempWarehouse {
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  sys.addShutdownHook {
    dirs.forEach { d =>
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(d))
    }
  }

  /** Create a fresh temp dir under the given prefix and register it for
    * deletion at JVM exit.
    */
  def dir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p.toString): Unit
    p
  }
}
