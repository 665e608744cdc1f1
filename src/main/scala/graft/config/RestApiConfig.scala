package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Per-supplier REST source settings
  * (/root/reference/src/Service/Config/RestApiConfig.php): base URI, auth
  * material, item-endpoint settings (uri, page_size, page_param,
  * size_param), TLS verify flag and transport tuning. Auth/transport values
  * are carried opaquely — the network hop is out of scope (zero egress),
  * the config surface is what a reference user's files must keep parsing.
  */
final case class RestApiConfig(
    baseUri: String,
    auth: Map[String, String],
    items: Map[String, String],
    verifySsl: Boolean,
    transport: Map[String, String]
) {
  def pageSize: Int = items.get("page_size").map(_.toInt).getOrElse(100)
  def pageParam: String = items.getOrElse("page_param", "page")
  def sizeParam: String = items.getOrElse("size_param", "per_page")
}

/** Per-supplier lookup from one JSON config document, with the reference
  * provider's exact failure modes
  * (/root/reference/src/Service/Config/RestApiConfigProvider.php:13-37).
  */
object RestApiConfigProvider {

  private val mapper = new ObjectMapper()

  private def strMap(n: JsonNode): Map[String, String] =
    if (n == null || !n.isObject) Map.empty
    else n.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap

  def fromJson(json: String, supplierId: String): RestApiConfig = {
    val all =
      try mapper.readTree(json)
      catch { case _: Exception => throw new RuntimeException(s"Invalid REST config JSON") }
    if (all == null || !all.isObject)
      throw new RuntimeException("Invalid REST config JSON")
    val cfg = all.get(supplierId)
    if (cfg == null || !cfg.isObject)
      throw new RuntimeException(s"REST config not found for supplier: $supplierId")
    RestApiConfig(
      baseUri = Option(cfg.get("base_uri")).map(_.asText("")).getOrElse("").reverse.dropWhile(_ == '/').reverse,
      auth = strMap(cfg.get("auth")),
      items = strMap(cfg.get("items")),
      verifySsl = Option(cfg.get("verify_ssl")).forall(_.asBoolean(true)),
      transport = strMap(cfg.get("transport"))
    )
  }

  def fromFile(path: String, supplierId: String): RestApiConfig = {
    val f = new java.io.File(path)
    if (!f.isFile) throw new RuntimeException(s"REST config file not found: $path")
    fromJson(java.nio.file.Files.readString(f.toPath), supplierId)
  }
}
