package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ingest.{Fixtures, PayloadReader}

/** DataSource V2 `TableProvider` over the Alpha-Vantage payload schema
  * (`PayloadReader.payloadSchema`) — the "real engine" source surface for
  * the reference's A1 HTTP ingest (SURVEY §7: the reference's own fetch
  * is a driver-side `requests.get` loop; here the fetch — when enabled —
  * runs per-partition on the EXECUTORS).
  *
  *   spark.read.format("graft-payloads").load("/dir/of/payload/json")
  *   spark.read.format("graft-payloads").option("endpoint", "daily").load()
  *   spark.read.format("graft-payloads")
  *     .option("urlTemplate", "https://host/query?symbol={symbol}")
  *     .option("symbols", "AAPL,MSFT").load()
  *
  * Source semantics:
  *   - `path`: a directory of payload files, ONE (possibly
  *     pretty-printed) JSON document per file — exactly the shape the
  *     reference persists per symbol×endpoint fetch. One input partition
  *     per file: a 10 000-payload directory scans on 10 000 tasks.
  *   - `urlTemplate` + `symbols`: the LIVE mode — one input partition
  *     per symbol; each task fetches `urlTemplate` with `{symbol}`
  *     substituted, on the executor (the reference's
  *     `main_parallel.py:230-251` fetch loop, distributed). Any scheme
  *     `java.net.URL` opens works — `https://` against a real API,
  *     `file://` in this zero-egress sandbox (how the spec drives it).
  *     `fetchTimeoutMs` (default 30000, the reference's
  *     `main_parallel.py:246` timeout) bounds connect+read;
  *     `onError=fail` (default) lets the task fail and retry, while
  *     `onError=envelope` degrades a failed fetch — timeout, HTTP
  *     4xx/5xx, refused connection — to an A14 error envelope
  *     (`{"Error Message": …}`) so downstream dispatch treats network
  *     failures exactly like API error payloads.
  *     `maxRequestsPerMinute` paces request starts per executor JVM
  *     ([[FetchRateLimiter]]) for rate-capped APIs — the reference
  *     lives under a 5 req/min free tier (`main_parallel.py:469-470`).
  *   - no `path`/`urlTemplate`: the embedded fixture payloads;
  *     `endpoint` picks the `daily` / `daily2` (second-run) /
  *     `intraday` / `sma` set.
  *   - Column pruning IS pushed down ([[SupportsPushDownRequiredColumns]]):
  *     a query touching only the error-envelope columns parses only
  *     those two fields per document — at 100 TB of payloads the Jackson
  *     parse of the big per-bar maps is the scan cost, so pruning cuts
  *     the dominant term, same as parquet column pruning would.
  *   - Parsing uses the identical permissive JacksonParser stack
  *     `spark.read.json` uses (via [[Bridge.jsonDocParser]]), so
  *     malformed documents degrade to all-NULL rows (A6/A14 handling
  *     downstream stays byte-identical to the DataFrame-reader path).
  */
class PayloadSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-payloads"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PayloadReader.payloadSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path"))
    val fetch = FetchConfig.from(properties)
    require(path.isEmpty || fetch.isEmpty,
      "graft-payloads: 'urlTemplate' and a load path are mutually exclusive — " +
        "fetch mode would silently ignore the path")
    new PayloadTable(path,
      Option(properties.get("endpoint")).getOrElse("daily"), fetch)
  }
}

/** Live-fetch configuration (None when the source is offline). */
final case class FetchConfig(
    urlTemplate: String,
    symbols: Seq[String],
    timeoutMs: Int,
    envelopeOnError: Boolean,
    maxPerMinute: Option[Int])

object FetchConfig {
  def from(properties: JMap[String, String]): Option[FetchConfig] = {
    // getTable receives the case-SENSITIVE option map; normalize
    val opts = new CaseInsensitiveStringMap(properties)
    Option(opts.get("urlTemplate")).map { tpl =>
      val symbols = Option(opts.get("symbols")).getOrElse(
        throw new IllegalArgumentException(
          "graft-payloads: urlTemplate requires a comma-separated 'symbols' option"))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      FetchConfig(tpl, symbols,
        Option(opts.get("fetchTimeoutMs")).map(_.toInt).getOrElse(30000),
        Option(opts.get("onError")).contains("envelope"),
        Option(opts.get("maxRequestsPerMinute")).map(_.toInt))
    }
  }
}

/** Per-executor request pacing for the live mode — the reference's
  * operating reality is a 5 req/min free-tier ceiling
  * (`main_parallel.py:469-470`, reference `README.md:56`); without a
  * throttle a multi-symbol read hits the limiter on the second task.
  * A process-wide monotone schedule spaces request STARTS at
  * 60s/maxPerMinute apart across ALL fetch tasks in the executor JVM
  * (local mode = the whole job, matching the reference's single-node
  * budget; on a multi-executor cluster the effective rate is
  * perExecutor × executors — size the option accordingly, exactly like
  * any per-executor connection budget).
  */
object FetchRateLimiter {
  private var nextFreeNanos = 0L

  /** Blocks until this request's scheduled slot; first caller is
    * immediate, each subsequent start is ≥ 60s/perMinute after the
    * previous one.
    */
  def acquire(perMinute: Int): Unit = {
    require(perMinute > 0, s"maxRequestsPerMinute must be positive: $perMinute")
    val intervalNs = 60000000000L / perMinute
    val waitNs = synchronized {
      val now = System.nanoTime()
      val at = math.max(now, nextFreeNanos)
      nextFreeNanos = at + intervalNs
      at - now
    }
    if (waitNs > 0)
      Thread.sleep(waitNs / 1000000L, (waitNs % 1000000L).toInt)
  }

  /** Test seam: forget the schedule so specs measure from a cold bucket. */
  private[graft] def reset(): Unit = synchronized { nextFreeNanos = 0L }
}

final class PayloadTable(
    path: Option[String], endpoint: String, fetch: Option[FetchConfig])
    extends Table with SupportsRead {

  override def name(): String =
    s"graft_payloads(${fetch.map(f => s"fetch:${f.symbols.mkString("|")}")
      .orElse(path).getOrElse(s"fixtures:$endpoint")})"

  override def schema(): StructType = PayloadReader.payloadSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PayloadScanBuilder(path, endpoint, fetch)
}

final class PayloadScanBuilder(
    path: Option[String], endpoint: String, fetch: Option[FetchConfig])
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = PayloadReader.payloadSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PayloadScan(path, endpoint, fetch, required)
}

/** One partition per payload document (fixture mode) or per payload file
  * (path mode) — the parse work distributes over the cluster; nothing is
  * read on the driver beyond the file listing.
  */
final class PayloadScan(
    path: Option[String], endpoint: String, fetch: Option[FetchConfig],
    required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-payloads ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = (fetch, path) match {
    case (Some(f), _) =>
      // live mode: one fetch task per symbol — the driver plans only
      // the symbol list; every byte moves executor-side
      f.symbols.map(sym => PayloadUrlPartition(
        f.urlTemplate.replace("{symbol}", sym), f.timeoutMs, f.envelopeOnError,
        f.maxPerMinute): InputPartition).toArray
    case (None, Some(dir)) =>
      val files = new java.io.File(dir).listFiles()
      require(files != null, s"not a readable payload directory: $dir")
      files.filter(f => f.isFile && f.getName.endsWith(".json"))
        .sortBy(_.getName)
        .map(f => PayloadFilePartition(f.getAbsolutePath): InputPartition)
    case (None, None) =>
      val docs = endpoint match {
        case "daily" =>
          Seq(Fixtures.dailyAapl, Fixtures.dailyMsft,
            Fixtures.errorPayload, Fixtures.ratelimitPayload)
        case "daily2"   => Seq(Fixtures.dailyAaplNextRun, Fixtures.dailyMsft)
        case "intraday" => Seq(Fixtures.intradayAapl)
        case "sma"      => Seq(Fixtures.smaAapl)
        case other =>
          throw new IllegalArgumentException(s"unknown endpoint: $other")
      }
      docs.map(d => PayloadDocPartition(d): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PayloadReaderFactory(required)
}

final case class PayloadDocPartition(doc: String) extends InputPartition
final case class PayloadFilePartition(file: String) extends InputPartition
final case class PayloadUrlPartition(
    url: String, timeoutMs: Int, envelopeOnError: Boolean,
    maxPerMinute: Option[Int] = None) extends InputPartition

final class PayloadReaderFactory(required: StructType)
    extends PartitionReaderFactory {

  /** Executor-side fetch: any `java.net.URL`-openable scheme (https in
    * production, file:// under test). Bounded by connect+read timeouts;
    * a failure either propagates (task retry semantics — the default)
    * or degrades to the A14 error envelope.
    */
  private def fetched(p: PayloadUrlPartition): String =
    try {
      p.maxPerMinute.foreach(FetchRateLimiter.acquire)
      val conn = java.net.URI.create(p.url).toURL.openConnection()
      conn.setConnectTimeout(p.timeoutMs)
      conn.setReadTimeout(p.timeoutMs)
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } catch {
      case e: Exception if p.envelopeOnError =>
        // JSON-escape the message into the reference's error envelope —
        // including control characters (multi-line exception messages
        // would otherwise make the envelope itself unparseable)
        val msg = s"fetch failed: ${e.toString}".flatMap {
          case '"'          => "\\\""
          case '\\'         => "\\\\"
          case '\n'         => "\\n"
          case '\r'         => "\\r"
          case '\t'         => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c            => c.toString
        }
        s"""{"Error Message": "$msg"}"""
    }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val doc = p match {
      case PayloadDocPartition(d) => d
      case PayloadFilePartition(f) =>
        new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
          java.nio.charset.StandardCharsets.UTF_8)
      case u: PayloadUrlPartition => fetched(u)
      case other =>
        throw new IllegalArgumentException(s"unexpected partition: $other")
    }
    val rows = Bridge.jsonDocParser(required)(doc)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
