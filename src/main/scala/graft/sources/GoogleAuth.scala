package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.RestPaginator.FetchResult
import java.nio.file.{Files, Path}

/** The reference's Google API auth lifecycle
  * (/root/reference/src/Service/InputHandler/GoogleApiInputHandler.php:38-65)
  * with the OAuth transport abstracted (zero-egress): a token FILE holds
  * the current access token; a missing file fails fast ("Token file not
  * found"), an expired token refreshes through the refresh_token grant and
  * the refreshed token is written back, and a token that is expired with
  * no refresh_token fails ("No refresh token available.").
  *
  * Expiry follows the Google client's convention: a token is treated as
  * expired `EXPIRY_SKEW` seconds before `created + expires_in`, so a
  * request never rides a token about to lapse mid-flight. On refresh the
  * prior refresh_token carries over when the response omits one (refresh
  * responses usually do).
  *
  * Driver-side control plane, like [[JwtAuth]]: one tiny token exchange
  * per expiry window; the fetched sheet/drive content then flows into the
  * distributed parsers ([[SheetsSource]], [[DriveFolderSource]]).
  */
object GoogleAuth {

  val ExpirySkewSec = 30L

  final case class GToken(accessToken: String, expiresIn: Long, created: Long,
                          refreshToken: Option[String]) {
    def isExpired(nowSec: Long): Boolean = nowSec >= created + expiresIn - ExpirySkewSec
  }

  private val mapper = new ObjectMapper()

  final class TokenClient(tokenPath: Path,
                          refreshPost: String => Option[FetchResult],
                          nowSec: () => Long = () => System.currentTimeMillis() / 1000) {

    private def parse(json: String): GToken = {
      val n = mapper.readTree(json)
      GToken(
        accessToken = n.path("access_token").asText(""),
        expiresIn = n.path("expires_in").asLong(0L),
        created = n.path("created").asLong(0L),
        refreshToken = Option(n.path("refresh_token").asText(null)).filter(_.nonEmpty))
    }

    def load(): GToken = {
      if (!Files.isRegularFile(tokenPath))
        throw new IllegalStateException(s"Token file not found: $tokenPath")
      parse(Files.readString(tokenPath))
    }

    private def save(t: GToken): Unit = {
      val n = mapper.createObjectNode()
      n.put("access_token", t.accessToken)
      n.put("expires_in", t.expiresIn)
      n.put("created", t.created)
      t.refreshToken.foreach(n.put("refresh_token", _))
      Files.writeString(tokenPath, n.toPrettyString)
    }

    /** A guaranteed-fresh access token — refreshing and persisting exactly
      * when the reference would.
      */
    def accessToken(): String = {
      val t = load()
      if (!t.isExpired(nowSec())) t.accessToken
      else {
        val rt = t.refreshToken.getOrElse(
          throw new IllegalStateException("No refresh token available."))
        val body = refreshPost(rt) match {
          case Some(FetchResult(status, b)) if status < 400 => b
          case _ => throw new IllegalStateException("Token refresh failed: server unavailable")
        }
        val fresh0 = parse(body)
        require(fresh0.accessToken.nonEmpty, "Token refresh failed: no access_token in response")
        // refresh responses usually omit the refresh_token — carry it over
        val fresh = fresh0.copy(created = nowSec(),
          refreshToken = fresh0.refreshToken.orElse(t.refreshToken))
        save(fresh)
        fresh.accessToken
      }
    }
  }
}
