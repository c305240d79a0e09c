package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Sessions, Tables}

/** Persistent SQL catalog face (reference `README.md:21` — the declared
  * analyst surface is an ALWAYS-ON warehouse: Athena/Redshift tables
  * that exist before the analyst connects and survive them
  * disconnecting). [[Tables.registerViews]] is the session-temp face;
  * this one is metastore-backed: [[publish]] registers every lake
  * table as an EXTERNAL parquet table (plus the events normalization
  * as a persistent VIEW) in a Hive-compatible catalog whose metadata
  * lives in an embedded Derby database under the warehouse home — so a
  * FRESH JVM that opens a [[session]] on the same home sees every
  * table by name with zero re-registration (CatalogSpec proves it by
  * forking two processes).
  *
  * External tables are zero-copy: registration records the parquet
  * LOCATION, reads stay lazy, pushdown/pruning work exactly as through
  * the loaders. At 100 TB this is the only sane shape — publishing is
  * a metadata-only operation, repointable in O(tables), and the data
  * files stay wherever the lake wrote them.
  */
object Catalog {

  /** Builder for a catalog-backed session. `home` owns BOTH halves of
    * the persistent state: the Derby metastore (`<home>/metastore_db`)
    * and the managed warehouse dir (`<home>/warehouse`). Must be the
    * FIRST session of its JVM: `spark.sql.catalogImplementation` is a
    * static conf, so a JVM that already built an in-memory-catalog
    * session cannot be upgraded (getOrCreate would silently hand back
    * the catalog-less session — callers in mixed JVMs should treat
    * that as a bug, not a fallback). */
  def session(home: String, cpus: Int = 4): SparkSession = {
    // Derby writes its lock + error log under derby.system.home; pin it
    // inside `home` so concurrent catalogs on one box cannot collide
    System.setProperty("derby.system.home", home)
    Sessions.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-catalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$home/warehouse")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$home/metastore_db;create=true")
      .enableHiveSupport())
      .getOrCreate()
  }

  /** Point database `db` at the lake under `sfDir`: one external
    * parquet table per [[Tables.all]] entry, except `events`, which
    * needs the nanos→micros TIMESTAMP_NTZ normalization the loader
    * applies — that becomes `events_raw` (external) + a persistent
    * view `events` holding the cast, so SQL-face reads and loader
    * reads stay bit-identical. Declarative, not additive: an existing
    * table is dropped (external — metadata only, data untouched) and
    * re-created, so re-publishing against a different sfDir repoints
    * the whole database atomically-per-table. */
  def publish(spark: SparkSession, sfDir: String, db: String = "graft"): Unit = {
    require(!db.contains("`"), s"invalid database name: $db")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    def external(table: String, location: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
      spark.sql(
        s"CREATE TABLE `$db`.`$table` USING parquet LOCATION '$location'")
    }
    Tables.all.collect { case (name, _) if name != "events" =>
      external(name, s"$sfDir/$name.parquet")
    }
    // events: the raw scan needs nanosAsLong (Sessions.configure sets it
    // on every in-repo session; the loader back-fills for foreign ones)
    external("events_raw", s"$sfDir/events.parquet")
    val cols = spark.table(s"`$db`.`events_raw`").columns.map {
      case "ts" =>
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz) as ts"
      case c => s"`$c`"
    }
    spark.sql(s"DROP VIEW IF EXISTS `$db`.`events`")
    spark.sql(s"CREATE VIEW `$db`.`events` AS SELECT ${cols.mkString(", ")}" +
      s" FROM `$db`.`events_raw`")
  }

  /** The reconnect experience under test: every published table,
    * readable by bare name after `USE db`. */
  def table(spark: SparkSession, db: String, name: String): DataFrame =
    spark.table(s"`$db`.`$name`")

  /** CLI face — two verbs so CatalogSpec can drive publish and query
    * from SEPARATE JVMs (persistence across a restart is the claim):
    * {{{
    * runMain graft.sources.Catalog publish <home> <sfDir> [db]
    * runMain graft.sources.Catalog sql <home> <query>
    * }}}
    * `sql` prints each result row as a `CATALOG_ROW|v1|v2|...` line. */
  def main(args: Array[String]): Unit = args.toList match {
    case "publish" :: home :: sfDir :: rest =>
      val spark = session(home)
      try publish(spark, sfDir, rest.headOption.getOrElse("graft"))
      finally spark.stop()
    case "sql" :: home :: query :: Nil =>
      val spark = session(home)
      try spark.sql(query).collect().foreach { r =>
        println((0 until r.length).map(r.get(_).toString)
          .mkString("CATALOG_ROW|", "|", ""))
      } finally spark.stop()
    case _ => sys.error(
      "usage: Catalog publish <home> <sfDir> [db] | Catalog sql <home> <query>")
  }
}
