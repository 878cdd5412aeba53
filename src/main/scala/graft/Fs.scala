package graft

/** Local-filesystem helpers for the harness mains and the catalog /
  * bucketing round-trip queries (driver-side utility paths only — never
  * in a distributed hot path).
  */
object Fs {
  /** Recursive delete. `listFiles()` returns null on I/O or permission
    * error — guard so a cleanup hiccup degrades to a leftover file
    * instead of an NPE that aborts the whole run.
    */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }
}
