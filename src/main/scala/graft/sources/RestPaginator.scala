package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Path}

/** The reference's REST pagination driver loop
  * (/root/reference/src/Service/InputHandler/RestApiInputHandler.php:46-67)
  * re-expressed for a zero-egress environment: the page-chase WALK — page/
  * size query params, `meta.last_page` / `links.next` stop conditions, and
  * every fetch failure mode (network error, 404, ≥400, invalid JSON,
  * non-array body → stop) — is driver-side control flow exactly as in the
  * reference, with the transport abstracted to a `fetch` function. Fetched
  * page bodies spool to one file per page ([[spool]]), which
  * [[RestJsonSource.read]] then ingests with executor parallelism: at scale
  * the walk only chases URLs (cheap, sequential by protocol necessity —
  * page N+1's existence is only knowable from page N), while all parsing
  * stays distributed.
  */
object RestPaginator {

  /** status + raw body; a `fetch` returning None models a network error. */
  final case class FetchResult(status: Int, body: String)

  private val mapper = new ObjectMapper()

  /** PHP `empty()` over a JSON node: null, missing, false, 0, "", "0" are
    * all empty (RestApiInputHandler.php:64 uses `!empty($json['links']
    * ['next'])`).
    */
  private[sources] def phpNonEmpty(n: JsonNode): Boolean =
    !(n.isMissingNode || n.isNull ||
      (n.isBoolean && !n.asBoolean()) ||
      (n.isNumber && n.asDouble() == 0.0) ||
      (n.isTextual && (n.asText().isEmpty || n.asText() == "0")))

  /** PHP `is_numeric` as used on `meta.last_page` (RestApiInputHandler
    * .php:61): numbers, or numeric strings, cast with `(int)`.
    */
  private[sources] def numericInt(n: JsonNode): Option[Int] =
    if (n.isNumber) Some(n.asInt())
    else if (n.isTextual && n.asText().matches("""\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*"""))
      Some(n.asText().trim.toDouble.toInt)
    else None

  /** Append/merge query params (reference `withQuery`,
    * RestApiInputHandler.php:135-159 — later params override existing).
    * Existing values DECODE before the rebuild re-encodes, exactly like
    * the reference's parse_str + http_build_query round trip — otherwise a
    * base URL carrying `filter=a%20b` would reach the server
    * double-encoded as `a%2520b`.
    */
  def withQuery(url: String, params: Seq[(String, String)]): String = {
    val (base, query) = url.split("\\?", 2) match {
      case Array(b, q) => (b, q)
      case _           => (url, "")
    }
    def dec(s: String): String =
      try java.net.URLDecoder.decode(s, "UTF-8") catch { case _: IllegalArgumentException => s }
    val existing = query.split("&").filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => dec(k) -> dec(v)
        case Array(k)    => dec(k) -> ""
      }
    }.toSeq
    val merged = (existing.filterNot(e => params.exists(_._1 == e._1)) ++ params)
      .map { case (k, v) =>
        s"${java.net.URLEncoder.encode(k, "UTF-8")}=${java.net.URLEncoder.encode(v, "UTF-8")}"
      }
    base + (if (merged.nonEmpty) "?" + merged.mkString("&") else "")
  }

  /** Walk pages 1..N, returning each VALID page's raw body in order. Stops
    * exactly where the reference's `paginate` stops:
    *  - fetch failure / 404 / status ≥ 400 / invalid JSON / non-object-or-
    *    array body → stop (reference breaks out of the loop),
    *  - otherwise continue while `links.next` is php-non-empty OR
    *    `meta.last_page` says more pages remain.
    */
  def walk(baseUrl: String, pageSize: Int = 100,
           pageParam: String = "page", sizeParam: String = "per_page",
           fetch: String => Option[FetchResult]): Vector[String] = {
    val out = Vector.newBuilder[String]
    var currentPage = 1
    var hasNextPage = true
    var lastPageNumber: Option[Int] = None
    while (hasNextPage && lastPageNumber.forall(currentPage <= _)) {
      val url = withQuery(baseUrl,
        Seq(pageParam -> currentPage.toString, sizeParam -> pageSize.toString))
      val parsed: Option[(String, JsonNode)] = fetch(url) match {
        case Some(FetchResult(status, body)) if status != 404 && status < 400 =>
          try {
            val node = mapper.readTree(body)
            // PHP is_array(json_decode(...,true)) accepts JSON objects AND
            // top-level arrays; scalars/invalid → null → break
            if (node != null && (node.isObject || node.isArray)) Some((body, node))
            else None
          } catch { case _: Exception => None }
        case _ => None
      }
      parsed match {
        case None => hasNextPage = false
        case Some((body, node)) =>
          out += body
          numericInt(node.path("meta").path("last_page"))
            .foreach(lp => lastPageNumber = Some(lp))
          hasNextPage = phpNonEmpty(node.path("links").path("next")) ||
            lastPageNumber.exists(currentPage < _)
          currentPage += 1
      }
    }
    out.result()
  }

  /** Materialize walked page bodies as a page-file directory (one file per
    * page) — the layout [[RestJsonSource.read]] consumes.
    */
  def spool(dir: Path, pages: Seq[String]): Path = {
    Files.createDirectories(dir)
    pages.zipWithIndex.foreach { case (body, i) =>
      // one page = one LINE for the line-based distributed reader; \r must
      // flatten too (Hadoop's line reader treats a bare CR as a delimiter,
      // so CRLF-pretty-printed responses would shatter into fragments)
      Files.write(dir.resolve(f"page-${i + 1}%05d.json"),
        body.replace("\r", " ").replace("\n", " ").getBytes("UTF-8"))
    }
    dir
  }
}
