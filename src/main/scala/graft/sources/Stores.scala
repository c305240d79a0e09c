package graft.sources

import org.apache.spark.sql.SparkSession

/** Versioned PATH-store commit protocol (round 16) — the shared
  * build-once/serve-many discipline behind
  * `Dedup.saveSemanticStore` and `TextPipeline.saveBoilerplateStore`:
  * each rebuild lands complete content under a fresh `<path>/v<N>/`
  * directory, then commits by atomically pointing the marker file's
  * CONTENT at it (tmp + rename-with-overwrite — one filesystem
  * operation). Readers resolve the version at marker-read time, so a
  * concurrent rebuild is invisible until its single commit point and
  * never torn; the committed version's predecessor survives one
  * generation as grace for readers that resolved just before the
  * swap, and older versions are reaped. [[Lake]]'s `publishVersioned`
  * is the catalog-table twin (versioned `saveAsTable` + one
  * `CREATE OR REPLACE VIEW` swap). */
object Stores {

  /** Build-and-commit one version: `write` receives the fresh version
    * directory and must land COMPLETE store content under it; the
    * marker swap afterwards is the only visible mutation. */
  def commitVersioned(spark: SparkSession, path: String, marker: String)
                     (write: String => Unit): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val markerPath = new org.apache.hadoop.fs.Path(root, marker)
    val prev = committedVersion(fs, markerPath)
    val next = prev.map(_.stripPrefix("v").toLong + 1).getOrElse(1L)
    val ver = s"v$next"
    write(s"$path/$ver")
    val tmp = new org.apache.hadoop.fs.Path(root, marker + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(ver.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
      .rename(tmp, markerPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // reap everything older than the one-generation grace window
    val keep = Set(ver) ++ prev
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.matches("v\\d+") && !keep(p.getName))
      .foreach(p => fs.delete(p, true))
  }

  /** The committed version DIRECTORY (`<path>/v<N>`), or None when the
    * store is mid-build, torn, or absent. */
  def resolveCommitted(spark: SparkSession, path: String,
                       marker: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersion(fs, new org.apache.hadoop.fs.Path(root, marker))
      .map(v => s"$path/$v")
  }

  /** Paths built in THIS JVM — the pay-once memo for query faces over
    * [[commitVersioned]] stores ([[Lake]]'s `ensureTable` stance: a
    * store left on disk by a previous process may hold stale data, so
    * a fresh JVM always rebuilds; within one JVM the build runs once,
    * re-validated against the commit marker on every call). */
  private val builtOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Session conf opting into TRUST-COMMITTED serving (round 17, r16
    * verdict #6): when `true`, [[ensureCommitted]] serves directly
    * from an existing commit marker WITHOUT rebuilding — even in a
    * fresh JVM. The hermetic default (`false`) rebuilds per process
    * because a store left on disk may be stale; in production the
    * economics invert — the store exists precisely so a new serving
    * process never pays the corpus pass, and STALENESS IS THE
    * PUBLISHER'S CONTRACT (the publisher re-runs the build; readers
    * resolve whatever generation the marker points at, exactly the
    * [[commitVersioned]] swap semantics). With trust on, a serving
    * process runs ZERO corpus-scanning jobs — `StoresTrustSpec` proves
    * it from a forked JVM against a DELETED corpus. */
  val TrustConf = "spark.graft.stores.trustCommitted"

  private def trusted(spark: SparkSession): Boolean =
    spark.conf.getOption(TrustConf).exists(_.trim.equalsIgnoreCase("true"))

  def ensureCommitted(spark: SparkSession, path: String, marker: String)
                     (build: => Unit): Unit = {
    val lock = buildLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      if (trusted(spark) &&
          resolveCommitted(spark, path, marker).nonEmpty) {
        builtOnce.add(path)
      } else if (!builtOnce.contains(path) ||
          resolveCommitted(spark, path, marker).isEmpty) {
        build
        builtOnce.add(path)
      }
    }
    ()
  }

  /** The committed markers under `path` (`_graft_*_committed` files)
    * with the version each points at — the `Catalog store_status`
    * CLI's body. */
  def status(spark: SparkSession, path: String): Seq[(String, String)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("_graft_") && n.endsWith("_committed"))
      .sorted.toSeq
      .map(m => m -> committedVersion(fs,
        new org.apache.hadoop.fs.Path(root, m)).getOrElse("UNCOMMITTED"))
  }

  /** The version name the marker currently points at, if committed. */
  private def committedVersion(fs: org.apache.hadoop.fs.FileSystem,
                               marker: org.apache.hadoop.fs.Path)
      : Option[String] = {
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      val txt =
        try {
          val buf = new Array[Byte](64)
          val n = math.max(in.read(buf), 0)
          new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
            .trim
        } finally in.close()
      Some(txt).filter(_.matches("v\\d+"))
    }
  }
}
