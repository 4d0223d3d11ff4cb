package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.config.HttpRequestDef
import graft.util.Json

/** DataSource V2 HTTP connector — `spark.read.format("graft-http")`
  * ergonomics over the same semantics as the imperative Http source
  * (S1-S3: array → rows, object → wrapped under "response", method
  * dispatch, headers/params/payload).
  *
  * Design: one HTTP request parameterizes the whole scan, so the fetch
  * happens ONCE on the driver at schema-inference time; the body rides
  * into the executors inside the InputPartition (records are typically
  * small API payloads — the fan-out path for per-record calls remains
  * `Http.fanOut`). Schema is inferred from the records with the
  * reference's scalar universe (string/long/double/bool; nested values
  * carried as JSON strings).
  *
  * Options: endpoint (required), method, payload, timeout_seconds,
  * header.<Name>, param.<name>.
  */
class HttpTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-http"

  override def supportsExternalMetadata(): Boolean = true

  private def fetch(options: CaseInsensitiveStringMap): Seq[String] = {
    val endpoint = Option(options.get("endpoint")).getOrElse(
      throw new IllegalArgumentException("graft-http requires an 'endpoint' option"))
    val opts = options.asCaseSensitiveMap().asScala
    val req = HttpRequestDef(
      endpoint = endpoint,
      method = Option(options.get("method")).getOrElse("GET"),
      headers = opts.collect {
        case (k, v) if k.toLowerCase.startsWith("header.") => k.drop(7) -> v
      }.toMap,
      queryParams = opts.collect {
        case (k, v) if k.toLowerCase.startsWith("param.") => k.drop(6) -> v
      }.toMap,
      payload = Option(options.get("payload")),
      timeoutSeconds = Option(options.get("timeout_seconds")).map(_.toInt).getOrElse(30))
    Json.bodyToRecords(Http.call(req))
  }

  /** Body fetched at inferSchema time, handed to getTable so one read
    * hits the endpoint once. An INSTANCE field, not a global map: Spark
    * instantiates a fresh provider per read, so concurrent identical
    * reads can't steal each other's entry, and an aborted planning
    * (inferSchema without getTable) is reclaimed with the provider
    * instead of leaking in a process-wide cache. */
  @volatile private var prefetched: Option[(Map[String, String], Seq[String])] = None

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val records = fetch(options)
    prefetched = Some(options.asCaseSensitiveMap().asScala.toMap -> records)
    HttpDataSource.inferSchema(records)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val key = properties.asScala.toMap
    val records = prefetched match {
      case Some((k, r)) if k == key =>
        prefetched = None
        r
      case _ => // user-supplied schema path: planning never fetched
        fetch(new CaseInsensitiveStringMap(properties))
    }
    new HttpTable(schema, records)
  }
}

private[sources] class HttpTable(schema: StructType, records: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = "graft_http"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(HttpPartition(records.toArray))
      override def createReaderFactory(): PartitionReaderFactory =
        new HttpReaderFactory(schema)
    }
}

private[sources] final case class HttpPartition(records: Array[String])
    extends InputPartition

private[sources] class HttpReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val records = partition.asInstanceOf[HttpPartition].records
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < records.length }
      override def get(): InternalRow =
        HttpDataSource.toRow(Json.parse(records(i)), schema)
      override def close(): Unit = ()
    }
  }
}

object HttpDataSource {
  /** Widest-type schema inference over the reference's scalar universe:
    * bool < long < double < string; arrays/objects → JSON string. */
  def inferSchema(records: Seq[String]): StructType = {
    def typeOf(n: JsonNode): DataType = n match {
      case x if x.isNull => NullType
      case x if x.isBoolean => BooleanType
      case x if x.isIntegralNumber => LongType
      case x if x.isNumber => DoubleType
      case _ => StringType
    }
    def widen(a: DataType, b: DataType): DataType = (a, b) match {
      case (x, y) if x == y => x
      case (NullType, x) => x
      case (x, NullType) => x
      case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
      case _ => StringType
    }
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    records.foreach { r =>
      Json.parse(r).properties().asScala.foreach { e =>
        val t = typeOf(e.getValue)
        fields(e.getKey) = fields.get(e.getKey).map(widen(_, t)).getOrElse(t)
      }
    }
    StructType(fields.map { case (name, t) =>
      StructField(name, if (t == NullType) StringType else t, nullable = true)
    }.toSeq)
  }

  /** One JSON object → InternalRow under the inferred schema. */
  def toRow(node: JsonNode, schema: StructType): InternalRow = {
    val values = schema.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case BooleanType => v.asBoolean()
        case LongType => v.asLong()
        case DoubleType => v.asDouble()
        case _ =>
          UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }
}
