package graft.sources.paged

import java.util
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-paged`: an offline DataSourceV2 modelling the reference's lazy
  * paged API pull (reference `etls/reddit_etl.py:43-59` — a generator
  * that requests one page after another and stops when the consumer
  * stops asking). Here the "API" is a landed directory: each page the
  * extractor fetched is one file, lexicographic order = fetch order.
  *
  * Output schema: `page BIGINT, value STRING` — one row per line, the
  * payload stays a string for downstream `from_json`/CSV parsing (the
  * idiomatic Spark split between transport and parsing).
  *
  *  - **Batch** reads page files as one InputPartition each — pages
  *    stream through `BufferedReader`s, never materialized whole.
  *  - **Limit pushdown** (`SupportsPushDownLimit`): a pushed LIMIT n
  *    caps every partition reader at n rows, and — when the landing
  *    contract's `pageSize` option is set — plans only the
  *    `ceil(n / pageSize)` first pages, the exact "stop asking the API"
  *    behavior of the reference generator. Visible in `explain` via the
  *    scan description. `pageSize` declares the GUARANTEED MINIMUM
  *    lines per non-final page: landing shorter pages under a larger
  *    declared size under-delivers LIMIT results (the pruned pages are
  *    rows Spark's retained global limit can never recover) — size it
  *    from the extractor's actual batch size, never larger.
  *  - **Micro-batch streaming**: the offset is the number of pages
  *    consumed; newly landed pages are picked up incrementally, in
  *    order, exactly once per page. Offsets are POSITIONAL in the
  *    sorted listing, so the landing contract requires new files to
  *    sort AFTER all previously landed ones (zero-padded counters, as
  *    `page-%05d`): a late file sorting before consumed pages would
  *    shift indexes and break exactly-once.
  */
class PagedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-paged"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(properties.get("path"),
      Option(properties.get("pageSize")).map(_.toInt))
}

object PagedSource {
  val schema: StructType = StructType(Seq(
    StructField("page", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  /** Test instrumentation (local mode): pages actually opened. */
  val pagesOpened = new AtomicLong(0)

  val log: java.util.logging.Logger =
    java.util.logging.Logger.getLogger("graft.sources.paged")

  /** Driver-side line count of one landed page (limit-pruning
    * validation only — bounded by the pages a LIMIT reads anyway). */
  def countLines(path: String): Long = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.io.FileInputStream(path),
      java.nio.charset.StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).size.toLong
    finally in.close()
  }

  /** Landed pages, fetch order (lexicographic). */
  def listPages(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".")
        && !f.getName.startsWith("_"))
      .map(_.getAbsolutePath).sorted.toSeq
  }
}

class PagedTable(dir: String, pageSize: Option[Int])
    extends Table with SupportsRead {
  override def name(): String = s"graft-paged($dir)"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(dir, pageSize)
}

class PagedScanBuilder(dir: String, pageSize: Option[Int])
    extends ScanBuilder with SupportsPushDownLimit {
  private var limit: Option[Int] = None
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def build(): Scan = new PagedScan(dir, pageSize, limit)
}

class PagedScan(dir: String, pageSize: Option[Int], limit: Option[Int])
    extends Scan {
  override def readSchema(): StructType = PagedSource.schema
  override def description(): String =
    s"graft-paged dir=$dir pushedLimit=${limit.getOrElse(-1)} " +
      s"pageSize=${pageSize.getOrElse(-1)}"
  override def toBatch: Batch = new PagedBatch(dir, pageSize, limit)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagedMicroBatchStream(dir)
}

case class PagePartition(page: Long, path: String) extends InputPartition

class PagedBatch(dir: String, pageSize: Option[Int], limit: Option[Int])
    extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val pages = PagedSource.listPages(dir)
    // the reference generator stops requesting once the consumer has
    // enough: with a full-page landing contract, LIMIT n needs at most
    // ceil(n / pageSize) pages (only the final page may be short, and a
    // prefix that would include it includes every page anyway).
    //
    // The contract is VALIDATED here, not trusted: if the extractor
    // landed shorter pages than the declared pageSize (a batch_size
    // mismatch), a blind prefix would silently under-deliver LIMIT n —
    // the pruned-away rows are ones Spark's retained global limit can
    // never recover. Planning counts lines over the prefix (bounded by
    // what the limit reads anyway) and keeps extending until n rows are
    // covered or pages run out.
    val pruned = (limit, pageSize) match {
      case (Some(n), Some(ps)) if ps > 0 =>
        val guess = ((n + ps - 1) / ps).max(1)
        var covered = 0L
        var k = 0
        while (covered < n && k < pages.length) {
          covered += PagedSource.countLines(pages(k))
          k += 1
        }
        if (k > guess)
          PagedSource.log.warning(
            s"graft-paged: declared pageSize=$ps overstates landed page " +
              s"sizes — LIMIT $n needed $k pages, not $guess; size " +
              "pageSize from the extractor's real batch size")
        pages.take(k.max(1))
      case _ => pages
    }
    pruned.zipWithIndex
      .map { case (p, i) => PagePartition(i.toLong, p): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(limit)
}

class PagedReaderFactory(limit: Option[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagedReader(partition.asInstanceOf[PagePartition], limit)
}

/** Streams one page file line-by-line; a pushed limit caps the rows this
  * reader emits (the global LIMIT stays with Spark). */
class PagedReader(p: PagePartition, limit: Option[Int])
    extends PartitionReader[InternalRow] {
  PagedSource.pagesOpened.incrementAndGet()
  private val in = new java.io.BufferedReader(new java.io.InputStreamReader(
    new java.io.FileInputStream(p.path), java.nio.charset.StandardCharsets.UTF_8))
  private var line: String = _
  private var emitted = 0
  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    line = in.readLine()
    line != null
  }
  override def get(): InternalRow = {
    emitted += 1
    InternalRow(p.page, UTF8String.fromString(line))
  }
  override def close(): Unit = in.close()
}

/** Offset = number of pages fully consumed, plus the NAME of the last
  * consumed page: offsets are positional in the sorted listing, so the
  * name lets every later planning call verify nothing was inserted
  * before already-consumed pages (which would shift indexes and
  * silently re-deliver/skip pages). */
case class PagedOffset(pages: Long, lastPage: String = "") extends Offset {
  override def json(): String =
    if (lastPage.isEmpty) pages.toString else s"$pages:$lastPage"
}

class PagedMicroBatchStream(dir: String) extends MicroBatchStream {
  override def initialOffset(): Offset = PagedOffset(0L)
  override def latestOffset(): Offset = {
    val pages = PagedSource.listPages(dir)
    PagedOffset(pages.length.toLong,
      pages.lastOption.map(new java.io.File(_).getName).getOrElse(""))
  }
  override def deserializeOffset(json: String): Offset =
    json.split(":", 2) match {
      case Array(n, last) => PagedOffset(n.toLong, last)
      case Array(n)       => PagedOffset(n.toLong)
    }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PagedOffset]
    val e = end.asInstanceOf[PagedOffset]
    val pages = PagedSource.listPages(dir)
    // enforce the landing contract at runtime, on BOTH boundaries: the
    // page each offset recorded must still sit at its index — a late
    // file sorting before either boundary means shifted indexes, and
    // checking only the start would let THIS batch deliver a wrong page
    // under an already-committed end offset
    def check(off: PagedOffset, what: String): Unit =
      if (off.pages > 0 && off.lastPage.nonEmpty && off.pages <= pages.length) {
        val atBoundary = new java.io.File(pages(off.pages.toInt - 1)).getName
        if (atBoundary != off.lastPage)
          throw new IllegalStateException(
            s"graft-paged: landing-order violation — page '$atBoundary' now sorts " +
              s"at $what position ${off.pages - 1} where '${off.lastPage}' was read; " +
              "new files must sort after all consumed pages (use zero-padded names)")
      }
    check(s, "consumed")
    check(e, "planned-end")
    (s.pages until e.pages).filter(i => i < pages.length)
      .map(i => PagePartition(i, pages(i.toInt)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(None)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
