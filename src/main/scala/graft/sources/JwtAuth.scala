package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.sources.RestPaginator.FetchResult
import java.nio.file.{Files, Path}

/** The reference's REST auth chain re-expressed with the transport
  * abstracted (zero-egress):
  *
  *  - [[FileTokenStore]] — `FileTokenPersistence`
  *    (/root/reference/src/Service/Auth/FileTokenPersistence.php): one JSON
  *    file holding `{supplierId: {token, expiresAt}}`, per-supplier slots
  *    merged on save/delete, malformed file → no token.
  *  - [[Manager]] — `PlainStringJwtManager.getJwtToken`
  *    (/root/reference/src/Service/Auth/PlainStringJwtManager.php:23-50)
  *    + `SafeJwtManagerWrapper`: restore cached token, use while valid,
  *    else delete + POST the token endpoint — raw trimmed body IS the
  *    token (or, with `tokenKey`, the named field of a JSON body, as the
  *    base manager does when `token_key` is configured) — stamp a 24 h
  *    expiry, persist, return; transport failure → RuntimeException
  *    ("server unavailable"), the wrapper's contract.
  *  - [[bearerHeaders]] — the JWT middleware + `buildDefaultHeaders`
  *    (RestApiHandlerFactory.php:103, RestApiInputHandler.php:161-169):
  *    `Authorization: Bearer <token>`, `Accept: application/json`, plus
  *    `Company` when the config carries a company id.
  *
  * The driver-side walk ([[RestPaginator.walk]]) passes these headers with
  * every page fetch; token acquisition is one tiny control-plane POST per
  * supplier per day, never per-executor work.
  */
object JwtAuth {

  final case class Token(token: String, expiresAt: Option[Long]) {
    def isValid(nowMs: Long): Boolean = expiresAt.forall(nowMs < _)
  }

  private val mapper = new ObjectMapper()

  /** Per-supplier token slots in one shared JSON file. */
  final class FileTokenStore(file: Path, supplierId: String) {

    private def readAll(): Option[ObjectNode] =
      if (!Files.isRegularFile(file)) None
      else
        try {
          val n = mapper.readTree(Files.readString(file))
          if (n != null && n.isObject) Some(n.asInstanceOf[ObjectNode]) else None
        } catch { case _: Exception => None }

    def save(t: Token): Unit = {
      val all = readAll().getOrElse(mapper.createObjectNode())
      val entry = mapper.createObjectNode()
      entry.put("token", t.token)
      t.expiresAt match {
        case Some(e) => entry.put("expiresAt", e)
        case None    => entry.putNull("expiresAt")
      }
      all.set(supplierId, entry)
      Files.createDirectories(file.toAbsolutePath.getParent)
      Files.writeString(file, all.toPrettyString)
    }

    def restore(): Option[Token] =
      readAll().flatMap { all =>
        val e = all.path(supplierId)
        val tok = e.path("token")
        if (!tok.isTextual || tok.asText.isEmpty) None
        else {
          val exp = e.path("expiresAt")
          Some(Token(tok.asText, if (exp.canConvertToLong) Some(exp.asLong) else None))
        }
      }

    def delete(): Unit =
      readAll().foreach { all =>
        all.remove(supplierId)
        Files.writeString(file, all.toPrettyString)
      }

    def has: Boolean = restore().isDefined
  }

  /** @param post transport: POST `tokenUrl` → response (None = network
    *             error); absent in this container, injected in production
    * @param tokenKey None = the raw trimmed body is the token (the
    *                 reference's plain-string mode); Some(k) = read field
    *                 k of a JSON body
    * @param nowMs injectable clock so expiry is testable
    */
  final class Manager(store: FileTokenStore, tokenUrl: String,
                      tokenKey: Option[String] = None,
                      post: String => Option[FetchResult],
                      nowMs: () => Long = () => System.currentTimeMillis(),
                      ttlMs: Long = 24L * 3600 * 1000) {
    private var cached: Option[Token] = None

    def token(): Token = {
      if (cached.isEmpty) cached = store.restore()
      cached.filter(_.isValid(nowMs())) match {
        case Some(t) => t
        case None =>
          store.delete()
          cached = None
          val fresh = fetchToken()
          store.save(fresh)
          cached = Some(fresh)
          fresh
      }
    }

    private def fetchToken(): Token = {
      val body = post(tokenUrl) match {
        case Some(FetchResult(status, b)) if status < 400 => b
        case _ => throw new RuntimeException("Failed to obtain JWT token: server unavailable")
      }
      val raw = tokenKey match {
        case None => body.trim
        case Some(k) =>
          try {
            val f = mapper.readTree(body).path(k)
            if (f.isTextual && f.asText.nonEmpty) f.asText
            else throw new RuntimeException(s"Failed to obtain JWT token: no '$k' in response")
          } catch {
            case e: RuntimeException => throw e
            case _: Exception =>
              throw new RuntimeException("Failed to obtain JWT token: invalid JSON response")
          }
      }
      if (raw.isEmpty) throw new RuntimeException("Failed to obtain JWT token: empty response")
      Token(raw, Some(nowMs() + ttlMs))
    }
  }

  /** The per-request header set the reference sends on every page fetch. */
  def bearerHeaders(token: Token, companyId: Option[String] = None): Map[String, String] =
    Map("Accept" -> "application/json", "Authorization" -> s"Bearer ${token.token}") ++
      companyId.map("Company" -> _)
}
