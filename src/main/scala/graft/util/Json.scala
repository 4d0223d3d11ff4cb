package graft.util

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Minimal JSON utilities over Jackson (ships in /opt/spark/jars — no new
  * dependency). Used for config parsing and for record-to-map conversion
  * in the HTTP fan-out; row data otherwise stays in Catalyst. */
object Json {
  private def mapper = new ObjectMapper()

  def parse(text: String): JsonNode = mapper.readTree(text)

  /** JsonNode → plain Scala value (String/Long/Double/Boolean/null/
    * Seq/Map), the same scalar universe as the reference's
    * serde_json::Value (SURVEY §1.2). */
  def toScala(node: JsonNode): Any = node match {
    case n if n.isNull => null
    case n if n.isTextual => n.asText()
    case n if n.isIntegralNumber => n.asLong()
    case n if n.isNumber => n.asDouble()
    case n if n.isBoolean => n.asBoolean()
    case a: ArrayNode => a.elements().asScala.map(toScala).toVector
    case o: ObjectNode =>
      o.properties().asScala.map(e => e.getKey -> toScala(e.getValue)).toMap
    case other => other.toString
  }

  /** Top-level fields of a JSON object as a Scala map. */
  def objectToMap(text: String): Map[String, Any] =
    toScala(parse(text)) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }

  /** Normalize an HTTP JSON body to one JSON object string per record:
    * array-of-objects → elements; single object → wrapped under
    * "response" (reference: simple_pipeline.rs:49-54). */
  def bodyToRecords(body: String): Seq[String] = {
    val root = parse(body)
    if (root.isArray) root.elements().asScala.map(_.toString).toVector
    else {
      val wrapper = mapper.createObjectNode()
      wrapper.set[ObjectNode]("response", root)
      Vector(wrapper.toString)
    }
  }
}
