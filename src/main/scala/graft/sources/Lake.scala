package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Lake-format source/sink surface (SURVEY.md §2.3 scans/sinks: the
  * reference's declared warehouse reads Parquet/CSV/JSON off S3 —
  * reference `README.md:21`; its own sink is CSV-to-object-store,
  * `etls/aws_etl.py:42-57`). Paths are format-agnostic (`s3a://` at
  * scale, local files here — the Hadoop FileSystem layer is the same
  * code path, SURVEY §2.1 A6).
  *
  * Scale posture:
  *  - always explicit schemas on read (`inferSchema` double-scans the
  *    data and guesses types — never at 100 TB);
  *  - writes partition by a date-derived column so downstream queries
  *    prune partitions at the directory level before any IO;
  *  - `maxRecordsPerFile` bounds file sizes so a 1000-executor scan gets
  *    even splits.
  */
object Lake {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read a [[mergeInto]] table whose history includes SCHEMA DRIFT
    * (merges that introduced new columns): buckets untouched since the
    * drift still hold the narrow schema, and the default reader infers
    * from ONE arbitrary file — this face merges footers so every column
    * that ever landed is present, with old rows null-filled. Footer
    * merging reads per-file metadata only (not data); tables without
    * drift can keep the plain reader. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC sink — the other columnar lake format Spark writes natively
    * (same predicate-pushdown/column-pruning scan path as parquet). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Range-clustered parquet write (z-order-lite): range-partition and
    * sort the layout on `cols` so every file covers a narrow value range
    * and parquet row-group min/max statistics become selective — a
    * point/range predicate then skips whole row groups (and therefore
    * whole files) at footer-read time, before any data IO. The unsorted
    * layout reads EVERY row group for the same predicate because each
    * one spans the full key range. `LakeSpec` measures the difference. */
  def writeClustered(df: DataFrame, path: String, cols: Seq[String],
                     targetFiles: Int = 0): Unit = {
    val n = if (targetFiles > 0) targetFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-ordered parquet write: the TWO-dimensional clustering layout.
    * Range-clustering on one key ([[writeClustered]]) makes predicates
    * on THAT key prune row groups but leaves the other dimension
    * scattered; interleaving the bits of both keys' normalized values
    * (the Z-order / Morton curve) gives every row group a narrow
    * min/max envelope in BOTH dimensions, so point/range predicates on
    * EITHER column skip row groups at footer-read time. The layout of
    * choice when two independent predicates recur over the same 100-TB
    * table (e.g. user_id and event day).
    *
    * Both columns must be numeric. Normalization is min/max-linear into
    * `bits` bits (one broadcast of a 1-row bounds aggregate — no
    * collect); skewed data degrades cell uniformity but never
    * correctness, since z-value only DRIVES the layout and is dropped
    * before writing. */
  def writeZordered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int = 16, targetFiles: Int = 0): Unit = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val n = if (targetFiles > 0) targetFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = broadcast(df.agg(
      min(col(colA)).cast("double").as("__a0"),
      max(col(colA)).cast("double").as("__a1"),
      min(col(colB)).cast("double").as("__b0"),
      max(col(colB)).cast("double").as("__b1")))
    val top = (1L << bits) - 1
    def norm(c: String, lo: String, hi: String) =
      least(lit(top), greatest(lit(0L), floor(
        (col(c).cast("double") - col(lo)) /
          (col(hi) - col(lo)) * top).cast("long")))
    def interleave(c: org.apache.spark.sql.Column, offset: Int) =
      (0 until bits).map(i =>
        shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), 2 * i + offset))
        .reduce(_ + _)
    df.crossJoin(bounds)
      .withColumn("__xa", norm(colA, "__a0", "__a1"))
      .withColumn("__xb", norm(colB, "__b0", "__b1"))
      .withColumn("__zv",
        interleave(col("__xa"), 0) + interleave(col("__xb"), 1))
      .repartitionByRange(n, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      // narrow projection preserves the sorted row order
      .drop("__zv", "__xa", "__xb", "__a0", "__a1", "__b0", "__b1")
      .write.mode("overwrite").parquet(path)
  }

  /** CSV ingest with a dead-letter quarantine: schema-conforming rows
    * come back typed; malformed rows land under `quarantinePath` (as
    * JSON: the raw line plus whatever fields DID parse) for later
    * inspection instead of failing the job or silently nulling out (the
    * PERMISSIVE-mode default).
    *
    * Parses through the `from_csv` EXPRESSION over a text scan rather
    * than the CSV file source: the file source disallows queries
    * referencing only `_corrupt_record`, and its corrupt-flag semantics
    * shift under column pruning / scan filter pushdown — the expression
    * form evaluates the whole-row parse exactly once per row with no
    * pushdown interaction. Two filtered passes rather than a cache — at
    * 100 TB caching the raw frame is not an option, two cheap
    * line-oriented scans are. Header lines (one per file) are dropped by
    * literal match against the schema's field-name header. */
  def readCsvWithQuarantine(spark: SparkSession, path: String,
                            schema: StructType,
                            quarantinePath: String): DataFrame = {
    val corrupt = "_corrupt_record"
    val withCorrupt = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val header = schema.fieldNames.mkString(",")
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> corrupt)
    def parsed = spark.read.text(path)
      .filter(col("value") =!= header)
      .select(col("value").as("raw_line"),
        from_csv(col("value"), withCorrupt, opts).as("r"))
    parsed.filter(col(s"r.$corrupt").isNotNull)
      .select(col("raw_line") +:
        schema.fieldNames.map(f => col(s"r.$f").as(f)): _*)
      .write.mode("overwrite").json(quarantinePath)
    parsed.filter(col(s"r.$corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"r.$f").as(f)): _*)
  }

  /** Date-partitioned parquet write — the lake layout the reference's
    * daily `reddit_{ds_nodash}` files imply (`dags/reddit_dag.py:37`):
    * one directory per day, so time-ranged queries prune at the
    * directory level (PartitionFilters in the scan, zero IO for pruned
    * days). */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String,
                           maxRecordsPerFile: Int = 1000000): Unit =
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("p_date")
      .parquet(path)

  /** Read back a date-partitioned lake table; `p_date` comes from the
    * directory structure, not file contents. */
  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed catalog table: pre-shuffle the data once at write time so
    * every later equi-join/aggregation on `bucketCol` is exchange-free —
    * the co-located-join layout for fact⋈fact joins that recur at 100 TB
    * (a sort-merge join of two tables bucketed on the key needs zero
    * shuffle; the exchange happens once, at ingest).
    *
    * Uses the session catalog (`saveAsTable` — bucketing metadata lives
    * in the catalog, not the files). Idempotent across SESSIONS, not just
    * within one: the in-memory catalog forgets the table when the JVM
    * exits but the managed warehouse directory survives on disk, and a
    * fresh session's CTAS then fails with LOCATION_ALREADY_EXISTS even
    * in overwrite mode — so the stale registration AND any orphaned
    * location are reaped before writing. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // drops the managed location too when the table IS registered
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // orphaned location from a previous session (dir without catalog
    // entry): Spark derives managed locations as <warehouse>/<lowername>
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // sortCols extends the per-bucket-file sort beyond the bucket key
    // (e.g. (bkey, __id) for the dedup signature index, whose serving
    // window orders by id within a band key) — default keeps the
    // original bucket-key sort
    val sorted = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Versioned-name + pointer-swap publish for CATALOG-TABLE stores
    * (round 16, r15 verdict #4 — the catalog twin of
    * `Dedup.saveSemanticStore`'s path-based protocol): the previous
    * drop + delete + `saveAsTable` left a window where a concurrent
    * cross-JVM reader mid-republish saw the table ABSENT. Here each
    * publish lands a complete `<base>__v<N>` table under a FRESH
    * version name, then commits by `CREATE OR REPLACE VIEW <base>` —
    * one metastore operation, so a reader resolving the bare name sees
    * either the old or the new store, never nothing and never a torn
    * mix. The committed version's predecessor survives one generation
    * as grace for readers that resolved just before the swap; older
    * versions (tables AND any orphaned managed locations — crash
    * debris) are reaped. A legacy bare-name TABLE from the
    * pre-versioning layout is dropped once so the view can take the
    * name. `write` receives the versioned table name and must
    * `saveAsTable` it. */
  private def publishVersioned(spark: SparkSession, base: String)
                              (write: String => Unit): Unit = {
    val baseLc = base.toLowerCase(java.util.Locale.ROOT)
    val pat = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(baseLc) + "__v(\\d+)")
    def versions(): Seq[(Long, String)] =
      spark.catalog.listTables().collect().toSeq.flatMap { t =>
        val m = pat.matcher(t.name)
        if (m.matches()) Some(m.group(1).toLong -> t.name) else None
      }
    val before = versions()
    val next = (before.map(_._1) :+ 0L).max + 1
    val vName = s"${baseLc}__v$next"
    def reap(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS `$name`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        name.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    // crash debris under the target name (a publish that died between
    // saveAsTable and the view swap never advanced the version counter)
    reap(vName)
    write(vName)
    // a legacy pre-versioning TABLE blocks the view pointer: reap once
    if (spark.catalog.tableExists(base) &&
        spark.catalog.getTable(base).tableType != "VIEW")
      spark.sql(s"DROP TABLE IF EXISTS `$base`")
    // the single atomic commit point
    spark.sql(s"CREATE OR REPLACE VIEW `$base` AS SELECT * FROM `$vName`")
    versions().filter(_._1 < next - 1).foreach(v => reap(v._2))
  }

  /** Persist a learned BPE merge table (round 15, r14 verdict #2 —
    * `Dedup.writeSigIndex`'s discipline: the committed artifact IS the
    * serving contract). The table is K rows of (step, lhs, rhs, freq)
    * metadata — a tokenizer is trained ONCE and served many times, so
    * the production shape is this write at train time plus
    * [[readBpeTable]] in every encoder, never an inline re-train
    * (q186/q193 stay self-contained by their own contract; q198 is the
    * store-backed face). Plain managed parquet — at K ≤ a few tens of
    * thousands of merges there is nothing to bucket. Published under
    * [[publishVersioned]]'s commit discipline (round 16): the bare
    * name is a view over the committed version, so republish is
    * invisible-or-complete to concurrent readers. */
  def writeBpeTable(mergeTable: DataFrame, table: String): Unit = {
    val spark = mergeTable.sparkSession
    val data = mergeTable
      .select(col("step").cast("long").as("step"), col("lhs"),
        col("rhs"), col("freq").cast("long").as("freq"))
    publishVersioned(spark, table)(v =>
      data.write.mode("overwrite").format("parquet").saveAsTable(v))
  }

  /** Load a persisted BPE merge table in merge order — the form
    * `TextPipeline.bpeSegment`/`bpeEncode` consume. Resolves through
    * the [[publishVersioned]] view at analysis time. */
  def readBpeTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
      .select(col("step"), col("lhs"), col("rhs"), col("freq"))
      .orderBy(col("step"))

  /** Persist a COMPLETE BPE serving store — merge table + symbol-id
    * vocabulary — as ONE versioned artifact (round 16, r15 verdict
    * #2): q199 derives ids from (merges, vocab) TOGETHER, so a store
    * that versioned them separately could serve a torn
    * new-merges/old-vocab pair between two swaps. Both parts land in a
    * single `<base>__v<N>` table (a `part` discriminator column;
    * K + |alphabet| + K rows — metadata) and commit under
    * [[publishVersioned]]'s one view swap, so readers get both halves
    * from the same committed version always. */
  def writeBpeStore(mergeTable: DataFrame, vocab: DataFrame,
                    base: String): Unit = {
    val spark = mergeTable.sparkSession
    val m = mergeTable.select(lit("merge").as("part"),
      col("step").cast("long").as("step"), col("lhs"), col("rhs"),
      col("freq").cast("long").as("freq"),
      lit(null).cast("string").as("symbol"),
      lit(null).cast("long").as("sym_id"))
    val v = vocab.select(lit("vocab").as("part"),
      lit(null).cast("long").as("step"),
      lit(null).cast("string").as("lhs"),
      lit(null).cast("string").as("rhs"),
      lit(null).cast("long").as("freq"),
      col("symbol"), col("sym_id").cast("long").as("sym_id"))
    val data = m.unionByName(v)
    publishVersioned(spark, base)(vn =>
      data.write.mode("overwrite").format("parquet").saveAsTable(vn))
  }

  /** Load a [[writeBpeStore]] artifact: (merge table in step order,
    * (symbol, sym_id) vocab). The view resolves ONCE — both halves
    * filter the same analysis-time resolution, so a republish landing
    * between the two reads cannot hand back a mixed-version pair. */
  def readBpeStore(spark: SparkSession, base: String)
      : (DataFrame, DataFrame) = {
    val t = spark.table(base)
    (t.filter(col("part") === "merge")
      .select(col("step"), col("lhs"), col("rhs"), col("freq"))
      .orderBy(col("step")),
      t.filter(col("part") === "vocab")
        .select(col("symbol"), col("sym_id")))
  }

  /** Names bucketed in THIS JVM — [[ensureBucketed]]'s memo. In-process
    * only on purpose: a table left in the warehouse by a previous process
    * may hold stale data, so a fresh JVM always rewrites. */
  private val bucketedOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Per-table-name write locks for [[ensureBucketed]] — a Lake-wide
    * lock would serialize bucketed writes of UNRELATED tables behind
    * one monitor. */
  private val bucketedLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Bucketing is a pay-ONCE-at-ingest layout: every subsequent join on
    * the bucket key is exchange-free precisely because the shuffle was
    * amortized into the write. Re-materializing identical buckets on
    * every call (as a repeated query invocation would) re-pays the cost
    * the layout exists to delete, so this face memoizes per (JVM, table):
    * first call writes, later calls are a catalog lookup. The memo is
    * re-validated against the catalog on every call — a table dropped
    * (or a switched warehouse) mid-JVM triggers a rewrite instead of a
    * later readTable failure. Callers whose input for `table` can
    * change within one JVM must use [[writeBucketed]] directly. */
  def ensureBucketed(df: DataFrame, table: String, bucketCol: String,
                     buckets: Int, sortCols: Seq[String] = Nil): Unit =
    ensureTable(df.sparkSession, table) {
      writeBucketed(df, table, bucketCol, buckets, sortCols)
    }

  /** [[ensureBucketed]]'s pay-once memo generalized to CUSTOM bucketed
    * writers (e.g. `Dedup.writeSigIndex`, whose layout derivation lives
    * with the dedup operator, not here): run `write` once per
    * (JVM, table), re-validated against the catalog on every call. */
  def ensureTable(spark: SparkSession, table: String)(write: => Unit): Unit = {
    val lock = bucketedLocks.computeIfAbsent(table, _ => new Object)
    lock.synchronized {
      if (!bucketedOnce.contains(table)
          || !spark.catalog.tableExists(table)) {
        write
        bucketedOnce.add(table)
      }
    }
  }

  /** Plain (unbucketed) managed catalog table with [[writeBucketed]]'s
    * cross-session idempotence (stale-registration + orphaned-location
    * reap before the write) — for the tiny PARAMS companions a
    * bucketed artifact carries (e.g. the substring gate's pinned
    * minRun): one row of metadata has nothing to bucket, but the
    * rewrite discipline must match its bucketed sibling's. */
  def writeSmallTable(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Small-file compaction: rewrite a parquet directory's files into
    * ~`targetBytes` outputs. Streaming upserts and incremental batch
    * appends accrete thousands of tiny files per partition; at 100 TB
    * the resulting task explosion (one scan task per file) and
    * NameNode/listing pressure dominate read cost, so compaction is a
    * standing maintenance job. `coalesce` (narrow, no shuffle) folds
    * existing files into the target count — the data is NOT re-sorted
    * or re-partitioned, just re-packed.
    *
    * Crash-safe swap: the compacted copy is fully written to
    * `<path>__compact` first, then the live dir parks under
    * `<path>__old`, the copy renames in, and the parked original is
    * reaped. A crash between the two renames leaves the table absent
    * but the ORIGINAL parked — the recovery at the next call's entry
    * restores it (restoring beats adopting the copy: it is always
    * correct, and the redone compaction is idempotent work, not data
    * loss). Returns the resulting file count (unchanged when the
    * directory is already compact enough). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (dir, fs) = fsOf(spark, path)
    val park = new org.apache.hadoop.fs.Path(path + "__old")
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact")
    // recovery: a crash between park and rename-in left no live dir —
    // the parked original is the authoritative state; put it back
    if (!fs.exists(dir) && fs.exists(park)) renameOrFail(fs, park, dir)
    // stale debris from any earlier crash is dead weight either way
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(park)) fs.delete(park, true)
    def parquetFiles() = fs.listStatus(dir)
      .filter(_.getPath.getName.endsWith(".parquet"))
    val files = parquetFiles()
    val total = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    if (nOut >= files.length) return files.length
    spark.read.parquet(path).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    renameOrFail(fs, dir, park)
    renameOrFail(fs, tmp, dir)
    fs.delete(park, true)
    parquetFiles().length
  }

  // ---- key-hash-bucketed table + batch MERGE -------------------------

  private val BucketMarker = "_graft_buckets"

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def readBucketCount(spark: SparkSession, path: String): Option[Int] = {
    val (p, fs) = fsOf(spark, path)
    val m = new org.apache.hadoop.fs.Path(p, BucketMarker)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
      finally in.close()
    }
  }

  private def writeBucketCount(spark: SparkSession, path: String,
                               numBuckets: Int): Unit = {
    val (p, fs) = fsOf(spark, path)
    val out = fs.create(new org.apache.hadoop.fs.Path(p, BucketMarker), true)
    try out.write(numBuckets.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Fail fast if `path` carries a `_graft_buckets` marker for a
    * DIFFERENT bucket count — shared by [[mergeInto]] and the streaming
    * partitioned upsert so both faces of the layout agree before any
    * key is routed. */
  private[graft] def validateBucketCount(spark: SparkSession, path: String,
                                         numBuckets: Int): Unit =
    readBucketCount(spark, path).foreach(d => require(d == numBuckets,
      s"table at $path was bucketed with $d buckets, caller requested " +
        s"$numBuckets — keys would route to wrong partitions"))

  /** Write the bucket-count marker if absent (call AFTER a successful
    * first write — a marker-only directory would read as a corrupt
    * table). */
  private[graft] def ensureBucketMarker(spark: SparkSession, path: String,
                                        numBuckets: Int): Unit =
    if (readBucketCount(spark, path).isEmpty)
      writeBucketCount(spark, path, numBuckets)

  /** Create a key-hash-bucketed parquet table: `__bucket=N` directories
    * on `pmod(hash(key), numBuckets)`. This is the layout
    * [[mergeInto]] (batch) and `StreamingOps.upsertStreamPartitioned`
    * (streaming) merge into by rewriting only touched buckets.
    * `numBuckets` sizes the merge granularity — pick so one bucket is a
    * comfortable executor rewrite unit (e.g. 4096 at 100 TB); the count
    * is pinned in a `_graft_buckets` marker so a later merge can't
    * silently route keys with a different modulus. */
  def writeKeyBucketed(df: DataFrame, path: String, keyCol: String,
                       numBuckets: Int = 64): Unit = {
    df.withColumn("__bucket", pmod(hash(col(keyCol)), lit(numBuckets)))
      .write.partitionBy("__bucket").mode("overwrite").parquet(path)
    writeBucketCount(df.sparkSession, path, numBuckets)
  }

  /** The table without the layout column. */
  def readKeyBucketed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")

  private val StagingDir = "_graft_staging"
  private val OldDir = "_graft_old"
  private val Manifest = "_graft_touched"

  /** Batch MERGE (latest-wins upsert) into a key-hash-bucketed table —
    * the batch twin of the streaming partition-pruned upsert, and the
    * Spark-native face of a warehouse `MERGE INTO` (reference
    * `README.md:13`). Per merge:
    *
    *  1. the updates' touched bucket ids are collected (≤ numBuckets
    *     ints — pruning METADATA, not data);
    *  2. ONLY those partitions are read back (partition-column filter →
    *     directory pruning);
    *  3. latest-wins on (`keyCol`, newest `tsCol`) within them;
    *  4. the merge result is STAGED under `_graft_staging` (invisible
    *     to readers — underscore-prefixed paths are filtered by Spark's
    *     file listing) and a touched-bucket manifest is written only
    *     after the staging job completes;
    *  5. [[commitStagedMerge]] swaps each touched bucket directory for
    *     its staged replacement (rename pairs through `_graft_old`),
    *     which also reaps buckets the merge emptied, then clears the
    *     scaffolding.
    *
    * Crash safety: the manifest gates the swap, so a crash anywhere
    * before it leaves the table byte-identical and the next merge
    * discards the partial staging; a crash DURING the swap leaves a
    * mixed-but-readable table (every visible bucket directory is a
    * complete write) and the next merge first resumes the interrupted
    * commit from the manifest — every per-bucket state (parked /
    * swapped / dead) is re-entrant, and latest-wins determinism makes
    * re-running the same updates converge (asserted in LakeSpec's
    * injected-crash cases). Single writer assumed; a reader racing the
    * swap instant can miss a bucket mid-rename — full snapshot
    * isolation needs a manifest-reading table format, which a plain
    * directory layout cannot provide.
    *
    * Untouched buckets are never read or written (byte-identical —
    * asserted in LakeSpec). Cost is O(updates + touched buckets), not
    * O(table). A missing table is created (the marker is written), so
    * bootstrap and steady state share one code path.
    *
    * CDC deletes: pass `deleteCol` naming a boolean column on `updates`
    * — a row whose marker is true acts as a tombstone: if it is the
    * key's LATEST version by `tsCol`, the key is removed (an older
    * tombstone loses to a newer insert, standard latest-wins CDC). The
    * marker column is never persisted, and a bucket whose keys are all
    * deleted has its directory removed at swap time (nothing staged for
    * it — the reap IS the swap, no separate post-write delete window).
    * An insert and a tombstone carrying the SAME timestamp resolve
    * deterministically: the insert wins. (For determinism of plain
    * upserts, (key, ts) should be unique across existing ∪ updates —
    * standard CDC feed discipline.) */
  def mergeInto(updates: DataFrame, path: String, keyCol: String,
                tsCol: String = "ts", numBuckets: Int = 64,
                deleteCol: Option[String] = None): Unit = {
    val spark = updates.sparkSession
    validateBucketCount(spark, path, numBuckets)
    recoverStagedMerge(spark, path)
    if (stageMerge(updates, path, keyCol, tsCol, numBuckets, deleteCol)) {
      commitStagedMerge(spark, path)
      ensureBucketMarker(spark, path, numBuckets)
    }
  }

  /** Steps 1–4 of [[mergeInto]]: compute the merge and land it under
    * `_graft_staging`, manifest last. The table is untouched. Returns
    * false when the update batch is empty (nothing staged). */
  private[graft] def stageMerge(updates: DataFrame, path: String,
                                keyCol: String, tsCol: String,
                                numBuckets: Int,
                                deleteCol: Option[String]): Boolean = {
    val spark = updates.sparkSession
    val incoming = updates
      .withColumn("__bucket", pmod(hash(col(keyCol)), lit(numBuckets)))
    val touched = incoming.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return false
    val (p, fs) = fsOf(spark, path)
    val staging = new org.apache.hadoop.fs.Path(p, StagingDir)
    if (fs.exists(staging)) fs.delete(staging, true)
    // only a genuinely absent or empty-layout table means "empty" (an
    // existing dir with no __bucket= partitions is a fresh mkdir'd
    // target, not data) — any other read failure aborts rather than
    // letting the swap replace touched buckets with just this batch
    val hasLayout = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("__bucket="))
    // the empty bootstrap frame is ALL-NULLABLE, exactly like a
    // read-back parquet table: union nullability (and therefore the
    // written parquet schema + definition levels) must not depend on
    // whether the target existed, or the first merge and every later
    // rerun write byte-DIFFERENT files for identical content and
    // idempotency audits (graft.Daily) can't use content hashes
    val existing =
      if (!hasLayout)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            incoming.schema.fields.map(_.copy(nullable = true))))
      // mergeSchema: after a SCHEMA-DRIFT merge (a batch arrived with a
      // new column) only the touched buckets carry the wider schema —
      // default parquet inference picks one file's schema arbitrarily,
      // so a later merge could silently DROP the new column from its
      // union. Footer merging is per-file metadata cost, bounded here
      // by the touched buckets.
      else spark.read.option("mergeSchema", "true").parquet(path)
        .filter(col("__bucket").isin(touched: _*))
    // latest-wins ordering: ts desc, then (with CDC) the tombstone flag
    // asc so an insert BEATS a tombstone carrying the same timestamp —
    // without the tiebreaker a same-ts delete+reinsert pair (common at
    // second-granularity source clocks) would win arbitrarily and two
    // runs of the same merge could produce different tables
    val ord = col(tsCol).desc +: deleteCol.toSeq.map(dc =>
      coalesce(col(dc).cast("boolean"), lit(false)).asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ord: _*)
    // existing rows have no tombstone column — allowMissingColumns nulls
    // it in, and null coalesces to "not deleted"
    val merged = existing
      .unionByName(incoming, allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val survivors = deleteCol match {
      case Some(dc) =>
        merged.filter(!coalesce(col(dc).cast("boolean"), lit(false))).drop(dc)
      case None => merged
    }
    // the staging write reads the table's PRE-merge files (the swap
    // hasn't started), so no persist/two-phase execution is needed; a
    // fully-deleted bucket simply stages no directory
    survivors.write.partitionBy("__bucket").mode("overwrite")
      .parquet(staging.toString)
    // manifest LAST: its presence is the commit gate — staging without
    // it is garbage to be discarded, never swapped. Each touched bucket
    // is recorded alive (staged replacement exists) or dead (the merge
    // emptied it) — without the flag, a resumed commit could not tell
    // an already-swapped bucket from a dead one awaiting its reap.
    // Written to a temp name and RENAMED into place: the gate file must
    // appear atomically — a crash mid-write would otherwise leave a
    // well-formed prefix that recovery would happily commit (a torn,
    // half-applied merge)
    val stagedSet = fs.listStatus(staging).map(_.getPath.getName)
      .filter(_.startsWith("__bucket="))
      .map(_.stripPrefix("__bucket=").toInt).toSet
    val lines = touched.map(b => s"$b:${if (stagedSet(b)) "a" else "d"}")
    val tmp = new org.apache.hadoop.fs.Path(staging, Manifest + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    renameOrFail(fs, tmp, new org.apache.hadoop.fs.Path(staging, Manifest))
    true
  }

  /** Hadoop rename reports several failure modes by RETURNING FALSE
    * (missing source, existing destination, object-store copy failure)
    * — treating that as success would let the commit's teardown delete
    * the only remaining copy of a bucket. Every swap rename must
    * either succeed or abort the commit (the manifest and staging
    * survive, so the next merge resumes exactly where this one died). */
  private def renameOrFail(fs: org.apache.hadoop.fs.FileSystem,
                           src: org.apache.hadoop.fs.Path,
                           dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"rename $src -> $dst failed — merge commit aborted (staging kept; " +
          "rerun the merge to resume)")

  /** Step 5 of [[mergeInto]]: swap every manifest bucket to its staged
    * state, then clear `_graft_old` and the staging dir. Re-entrant —
    * callable on a fresh staging or to RESUME after a crash at any
    * point of a previous commit:
    *
    *  - ALIVE bucket, staged dir present → park the live dir (if any)
    *    under `_graft_old`, rename the staged dir in;
    *  - ALIVE bucket, staged dir absent → its swap already completed
    *    (parking precedes the rename-in, and only the rename-in
    *    consumes the staged dir): nothing to do;
    *  - DEAD bucket (the merge emptied it), live dir present → park it
    *    (a rename is atomic where a recursive delete is not — a crash
    *    mid-delete would leave readers a half-deleted parquet dir);
    *  - DEAD bucket, live dir absent → already reaped: nothing to do.
    *
    * Parked copies are dropped with the scaffolding at the end. */
  private[graft] def commitStagedMerge(spark: SparkSession,
                                       path: String): Unit = {
    val (p, fs) = fsOf(spark, path)
    val staging = new org.apache.hadoop.fs.Path(p, StagingDir)
    val manifest = new org.apache.hadoop.fs.Path(staging, Manifest)
    if (!fs.exists(manifest)) return
    val in = fs.open(manifest)
    val entries =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").filter(_.nonEmpty).map { l =>
          val Array(b, flag) = l.trim.split(":")
          b.toInt -> (flag == "a")
        }.toSeq
      finally in.close()
    val old = new org.apache.hadoop.fs.Path(p, OldDir)
    if (!fs.exists(old)) { fs.mkdirs(old); () }
    entries.foreach { case (b, alive) =>
      val live = new org.apache.hadoop.fs.Path(p, s"__bucket=$b")
      val staged = new org.apache.hadoop.fs.Path(staging, s"__bucket=$b")
      val parked = new org.apache.hadoop.fs.Path(old, s"__bucket=$b")
      def park(): Unit = {
        if (fs.exists(parked)) fs.delete(parked, true)
        renameOrFail(fs, live, parked)
      }
      if (alive) {
        if (fs.exists(staged)) {
          if (fs.exists(live)) park()
          renameOrFail(fs, staged, live)
        }
      } else if (fs.exists(live)) park()
    }
    // scaffolding teardown order matters: parked copies first, staging
    // (with the manifest) last — a crash in between resumes above with
    // every bucket already in its final state
    fs.delete(old, true)
    fs.delete(staging, true)
    ()
  }

  /** Resume or discard whatever a previous merge left behind: a
    * manifest means a completed staging whose swap may be mid-flight —
    * finish it; staging without a manifest is a partial write —
    * discard. Called at the top of every [[mergeInto]]. */
  private[graft] def recoverStagedMerge(spark: SparkSession,
                                        path: String): Unit = {
    val (p, fs) = fsOf(spark, path)
    val staging = new org.apache.hadoop.fs.Path(p, StagingDir)
    if (!fs.exists(staging)) return
    if (fs.exists(new org.apache.hadoop.fs.Path(staging, Manifest)))
      commitStagedMerge(spark, path)
    else {
      fs.delete(staging, true)
      ()
    }
  }
}
