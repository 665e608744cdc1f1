package graft

import graft.sources.JwtAuth
import graft.sources.JwtAuth.{FileTokenStore, Manager, Token}
import graft.sources.RestPaginator.FetchResult
import java.nio.file.Files

/** The REST auth chain: file-persisted per-supplier tokens, plain-string
  * and token_key acquisition, 24 h expiry + refresh, failure contract,
  * Bearer headers — mirroring PlainStringJwtManager / FileTokenPersistence
  * / SafeJwtManagerWrapper.
  */
class JwtAuthSpec extends SparkSpec {

  private def tmpFile = Files.createTempDirectory("jwt").resolve("rest.tokens.json")

  test("file store: per-supplier slots merge; malformed file reads as no token") {
    val f = tmpFile
    val a = new FileTokenStore(f, "7")
    val b = new FileTokenStore(f, "8")
    a.save(Token("tok-a", Some(1000L)))
    b.save(Token("tok-b", None))
    assert(a.restore().contains(Token("tok-a", Some(1000L))))
    assert(b.restore().contains(Token("tok-b", None)))
    a.delete()
    assert(a.restore().isEmpty && b.has)
    Files.writeString(f, "not json at all")
    assert(new FileTokenStore(f, "7").restore().isEmpty)
  }

  test("plain-string mode: raw trimmed body is the token, stamped +24h, cached until expiry") {
    var clock = 1000000L
    var posts = 0
    val mgr = new Manager(new FileTokenStore(tmpFile, "7"), "https://api/auth/init",
      post = _ => { posts += 1; Some(FetchResult(200, s"  raw-token-$posts\n")) },
      nowMs = () => clock)
    val t1 = mgr.token()
    assert(t1.token == "raw-token-1" && t1.expiresAt.contains(clock + 24L * 3600 * 1000))
    assert(mgr.token() == t1 && posts == 1, "valid token must be reused, not re-fetched")
    clock += 25L * 3600 * 1000 // past expiry
    val t2 = mgr.token()
    assert(t2.token == "raw-token-2" && posts == 2, "expired token must refresh")
  }

  test("token survives across manager instances via the file (restart persistence)") {
    val f = tmpFile
    var posts = 0
    def mk() = new Manager(new FileTokenStore(f, "7"), "u",
      post = _ => { posts += 1; Some(FetchResult(200, "tok")) }, nowMs = () => 0L)
    mk().token()
    mk().token() // second instance restores from file
    assert(posts == 1)
  }

  test("token_key mode reads the named JSON field; bad shapes raise the reference's errors") {
    def mgr(body: FetchResult, key: Option[String] = Some("access_token")) =
      new Manager(new FileTokenStore(tmpFile, "7"), "u", tokenKey = key,
        post = _ => Some(body), nowMs = () => 0L)
    assert(mgr(FetchResult(200, """{"access_token":"jwt-x","ttl":99}""")).token().token == "jwt-x")
    intercept[RuntimeException](mgr(FetchResult(200, """{"other":"y"}""")).token())
    intercept[RuntimeException](mgr(FetchResult(200, "not json")).token())
    intercept[RuntimeException](mgr(FetchResult(500, "boom")).token())
    intercept[RuntimeException](
      new Manager(new FileTokenStore(tmpFile, "7"), "u", post = _ => None, nowMs = () => 0L).token())
  }

  test("bearer headers: Accept + Authorization (+ Company when configured)") {
    val t = Token("jwt-7", None)
    assert(JwtAuth.bearerHeaders(t) ==
      Map("Accept" -> "application/json", "Authorization" -> "Bearer jwt-7"))
    assert(JwtAuth.bearerHeaders(t, Some("c-12"))("Company") == "c-12")
  }
}
