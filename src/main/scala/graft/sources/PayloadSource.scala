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
  * the reference's A1 HTTP ingest, kept offline-by-design (SURVEY §7:
  * the reference's own fetch is a driver-side `requests.get` loop;
  * sandbox fixtures replace the network).
  *
  *   spark.read.format("graft-payloads").load("/dir/of/payload/json")
  *   spark.read.format("graft-payloads").option("endpoint", "daily").load()
  *
  * Source semantics:
  *   - `path`: a directory of payload files, ONE (possibly
  *     pretty-printed) JSON document per file — exactly the shape the
  *     reference persists per symbol×endpoint fetch. One input partition
  *     per file: a 10 000-payload directory scans on 10 000 tasks.
  *   - no `path`: the embedded fixture payloads; `endpoint` picks the
  *     `daily` / `daily2` (second-run) / `intraday` / `sma` set.
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
      properties: JMap[String, String]): Table =
    new PayloadTable(
      Option(properties.get("path")),
      Option(properties.get("endpoint")).getOrElse("daily"))
}

final class PayloadTable(path: Option[String], endpoint: String)
    extends Table with SupportsRead {

  override def name(): String =
    s"graft_payloads(${path.getOrElse(s"fixtures:$endpoint")})"

  override def schema(): StructType = PayloadReader.payloadSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PayloadScanBuilder(path, endpoint)
}

final class PayloadScanBuilder(path: Option[String], endpoint: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = PayloadReader.payloadSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PayloadScan(path, endpoint, required)
}

/** One partition per payload document (fixture mode) or per payload file
  * (path mode) — the parse work distributes over the cluster; nothing is
  * read on the driver beyond the file listing.
  */
final class PayloadScan(
    path: Option[String], endpoint: String, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-payloads ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = path match {
    case Some(dir) =>
      val files = new java.io.File(dir).listFiles()
      require(files != null, s"not a readable payload directory: $dir")
      files.filter(f => f.isFile && f.getName.endsWith(".json"))
        .sortBy(_.getName)
        .map(f => PayloadFilePartition(f.getAbsolutePath): InputPartition)
    case None =>
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

final class PayloadReaderFactory(required: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val doc = p match {
      case PayloadDocPartition(d) => d
      case PayloadFilePartition(f) =>
        new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
          java.nio.charset.StandardCharsets.UTF_8)
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
