package graft

import graft.sources.GoogleAuth
import graft.sources.GoogleAuth.TokenClient
import graft.sources.RestPaginator.FetchResult
import java.nio.file.Files

/** Google API token lifecycle: fresh reuse, skewed expiry, refresh +
  * persistence + refresh_token carry-over, and the reference's two failure
  * modes (missing file, expired without refresh_token).
  */
class GoogleAuthSpec extends SparkSpec {

  private def tokenFile(json: String) = {
    val p = Files.createTempDirectory("gauth").resolve("token.json")
    Files.writeString(p, json)
    p
  }

  test("fresh token is used without refreshing; skew expires it 30s early") {
    var posts = 0
    val p = tokenFile("""{"access_token":"live","expires_in":3600,"created":1000,"refresh_token":"r1"}""")
    def client(now: Long) = new TokenClient(p, _ => { posts += 1; None }, () => now)
    assert(client(1000 + 3600 - 31).accessToken() == "live" && posts == 0)
    // inside the 30s skew window the token already counts as expired
    intercept[IllegalStateException](client(1000 + 3600 - 30).accessToken())
    assert(posts == 1, "skew-expired token must attempt a refresh")
  }

  test("expired token refreshes, persists, and carries the refresh_token over") {
    val p = tokenFile("""{"access_token":"old","expires_in":10,"created":1000,"refresh_token":"r1"}""")
    var sentRefresh: String = null
    val client = new TokenClient(p,
      rt => { sentRefresh = rt; Some(FetchResult(200, """{"access_token":"new","expires_in":3600}""")) },
      () => 5000L)
    assert(client.accessToken() == "new" && sentRefresh == "r1")
    // persisted: a second client with a DEAD transport reuses the file
    val again = new TokenClient(p, _ => None, () => 5001L)
    assert(again.accessToken() == "new")
    val saved = Files.readString(p)
    assert(saved.contains("\"refresh_token\" : \"r1\"") || saved.contains("\"refresh_token\":\"r1\""),
      s"refresh_token must carry over: $saved")
  }

  test("reference failure modes: missing file; expired with no refresh token") {
    val missing = new TokenClient(
      Files.createTempDirectory("gauth").resolve("absent.json"), _ => None, () => 0L)
    val e1 = intercept[IllegalStateException](missing.accessToken())
    assert(e1.getMessage.startsWith("Token file not found"))
    val p = tokenFile("""{"access_token":"old","expires_in":10,"created":1000}""")
    val e2 = intercept[IllegalStateException](
      new TokenClient(p, _ => None, () => 5000L).accessToken())
    assert(e2.getMessage == "No refresh token available.")
  }

  test("GToken expiry math matches the Google client convention") {
    val t = GoogleAuth.GToken("a", 3600, 1000, None)
    assert(!t.isExpired(1000 + 3600 - 31))
    assert(t.isExpired(1000 + 3600 - 30))
  }
}
