package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.operators.MapRule
import scala.jdk.CollectionConverters._

/** One sub-source entry of a multi-source config
  * (/root/reference/src/Service/Config/SubSource.php).
  */
final case class SubSourceConfig(
    typeId: Int,
    filename: String,
    key: String = "upc",
    fields: Seq[String] = Nil,
    range: Option[String] = None
)

/** The control-plane message that drives one aggregation run — the same JSON
  * the reference consumes from Kafka
  * (/root/reference/src/Service/Config/InputConfig.php). Config parsing is
  * driver-side (one small message per pipeline run); only the data plane is
  * distributed.
  *
  * `columnMapRules` entries mirror the reference's two forms:
  * `"target": "source"` and `"target": ["source", "merge_rule"]`.
  */
final case class InputConfig(
    supplierId: Long,
    name: String,
    typeId: Option[Int],
    source: String,
    range: Option[String],
    rules: Seq[MapRule],
    version: Long,
    subSources: Seq[SubSourceConfig]
) {
  def isMultiSource: Boolean = typeId.isEmpty
}

object InputConfig {
  private val mapper = new ObjectMapper()

  /** Parse the reference's message format; throws on missing required fields
    * (InputConfig.php:19-22).
    */
  def fromJson(json: String): InputConfig = {
    val n = mapper.readTree(json)
    def req(field: String): JsonNode = {
      val v = n.get(field)
      require(v != null && !v.isNull, s"Required fields are missing in input config: $field")
      v
    }
    val rulesNode = req("column_map_rules")
    val rules = rulesNode.properties().asScala.toSeq.map { e =>
      val (target, v) = (e.getKey, e.getValue)
      if (v.isArray) {
        require(v.size >= 2, s"Invalid mapping configuration for field '$target'")
        MapRule(target, v.get(0).asText, Some(v.get(1).asText))
      } else MapRule(target, v.asText)
    }
    val typeId = Option(n.get("type_id")).filterNot(_.isNull).map(_.asInt)
    val sourceNode = req("source")
    val subs =
      if (typeId.isEmpty && sourceNode.isArray)
        sourceNode.elements().asScala.toSeq.map { s =>
          SubSourceConfig(
            typeId = s.get("type_id").asInt,
            filename = s.get("filename").asText,
            key = Option(s.get("key")).filterNot(_.isNull).map(_.asText).getOrElse("upc"),
            fields = Option(s.get("fields")).filterNot(_.isNull)
              .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
            range = Option(s.get("range")).filterNot(_.isNull).map(_.asText)
          )
        }
      else Nil
    InputConfig(
      supplierId = req("supplier_id").asLong,
      name = Option(n.get("name")).filterNot(_.isNull).map(_.asText).getOrElse(""),
      typeId = typeId,
      source = if (sourceNode.isTextual) sourceNode.asText else sourceNode.toString,
      range = Option(n.get("range")).filterNot(_.isNull).map(_.asText),
      rules = rules,
      version = req("version").asLong,
      subSources = subs
    )
  }
}

/** Routing table type_id → source kind, mirroring
  * /root/reference/src/Service/Aggregator/Aggregator.php:92-104.
  */
object SourceRouter {
  val handlers: Map[Int, String] = Map(
    1 -> "google_sheets",
    2 -> "csv_http",
    3 -> "google_drive_folder",
    4 -> "excel_http",
    5 -> "morris_xml_sftp",
    6 -> "excel_sftp",
    7 -> "csv_sftp",
    8 -> "rest_api"
  )

  def handlerFor(typeId: Int): String =
    handlers.getOrElse(typeId, throw new IllegalArgumentException(s"""No handler found for type "$typeId"."""))
}
