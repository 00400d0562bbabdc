package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Avro container-file source/sink over the Hadoop filesystem API —
  * the remaining common interchange format after parquet / CSV / ORC /
  * JSON-lines / JDBC / DSv2 (q84/q115/q116). Spark's distribution
  * does not bundle the `spark-avro` connector, but the Avro CORE
  * library ships on every Spark classpath (avro + avro-mapred jars),
  * so the engine owns the container-file framing directly:
  *
  *  - WRITE is partition-parallel `mapPartitions`: each task streams
  *    its rows through a `DataFileWriter` into one `part-N.avro`
  *    object under the target directory, via `FileSystem` (works
  *    against local disk here and HDFS/S3A on a cluster — no
  *    driver-side funnel, no local-path assumption).
  *  - READ lists the directory driver-side (bounded: file names
  *    only), then each task streams its files through
  *    `DataFileReader` over [[FsInput]] — one pass, no buffering of
  *    whole files, explicit schema (never inference).
  *
  * The row codec is deliberately explicit (schema declared as a
  * literal, one put/get per field) rather than a reflective generic
  * bridge: the five-column order projection is the q115 round-trip
  * shape — long/long/string/double/timestamp-micros — and every type
  * is bit-exact through Avro's binary encoding (IEEE doubles verbatim,
  * micros as long), so a round-trip hash certifies the framing.
  */
object AvroTables {

  val OrdersSchemaJson: String =
    """{"type":"record","name":"order_row","fields":[
      |  {"name":"o_orderkey","type":"long"},
      |  {"name":"o_custkey","type":"long"},
      |  {"name":"o_orderstatus","type":"string"},
      |  {"name":"o_totalprice","type":"double"},
      |  {"name":"o_orderdate_us","type":
      |    {"type":"long","logicalType":"timestamp-micros"}}
      |]}""".stripMargin

  val OrdersSparkSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType, nullable = false),
    StructField("o_custkey", LongType, nullable = false),
    StructField("o_orderstatus", StringType, nullable = false),
    StructField("o_totalprice", DoubleType, nullable = false),
    StructField("o_orderdate_us", LongType, nullable = false)))

  /** Partition-parallel write of a (o_orderkey, o_custkey,
    * o_orderstatus, o_totalprice, o_orderdate_us) frame; replaces the
    * target directory (idempotent re-run). Returns files written.
    */
  def writeOrders(df: DataFrame, dir: String): Seq[String] = {
    val sc = df.sparkSession.sparkContext
    val conf = sc.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    // the driver's live Configuration is not Serializable, but its
    // contents are: ship them via SerializableConfiguration so executor
    // tasks see the session's fs settings (S3A credentials, defaultFS)
    // instead of a blank default conf
    val bconf = new SerializableConfiguration(conf)
    df.selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate_us")
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val schema = new Schema.Parser().parse(OrdersSchemaJson)
          val out = new Path(root, f"part-$pid%05d.avro")
          // task-commit protocol: stream into a per-attempt temp name,
          // rename to the final name only on success — a failed or
          // speculative attempt can never leave a truncated part file
          // under the final name, and the last successful rename wins
          val attempt = Option(TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmp = new Path(root, f".part-$pid%05d.avro.$attempt%d.tmp")
          val efs = out.getFileSystem(bconf.value)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          w.create(schema, efs.create(tmp, true))
          var n = 0L
          it.foreach { r =>
            val rec = new GenericData.Record(schema)
            rec.put("o_orderkey", r.getLong(0))
            rec.put("o_custkey", r.getLong(1))
            rec.put("o_orderstatus", r.getString(2))
            rec.put("o_totalprice", r.getDouble(3))
            rec.put("o_orderdate_us", r.getLong(4))
            w.append(rec)
            n += 1
          }
          w.close()
          if (efs.exists(out)) efs.delete(out, false)
          if (!efs.rename(tmp, out))
            throw new java.io.IOException(s"avro commit rename failed: $tmp -> $out")
          Iterator(out.toString)
        }
      }.collect().toSeq
  }

  /** Read every `part-*.avro` under `dir` back into a DataFrame with
    * [[OrdersSparkSchema]] — one task per file, streaming iterator.
    */
  def readOrders(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    // Hadoop globStatus returns null (not empty) when the parent dir
    // does not exist — a never-written path reads as an empty frame
    val files = Option(fs.globStatus(new Path(root, "part-*.avro")))
      .getOrElse(Array.empty)
      .map(_.getPath.toString).sorted.toSeq
    val bconf = new SerializableConfiguration(conf)
    val rows = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val schema = new Schema.Parser().parse(OrdersSchemaJson)
        val p = new Path(f)
        val in = new FsInput(p, bconf.value)
        val rd = new DataFileReader[GenericRecord](in,
          new GenericDatumReader[GenericRecord](schema))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = rd.hasNext
            if (!h) { rd.close() }
            h
          }
          def next(): Row = {
            val rec = rd.next()
            Row(
              rec.get("o_orderkey").asInstanceOf[Long],
              rec.get("o_custkey").asInstanceOf[Long],
              rec.get("o_orderstatus").toString,
              rec.get("o_totalprice").asInstanceOf[Double],
              rec.get("o_orderdate_us").asInstanceOf[Long])
          }
        }
      }
    spark.createDataFrame(rows, OrdersSparkSchema)
  }
}
