package graft

import graft.sources.{RestPaginator, RestJsonSource}
import graft.sources.RestPaginator.FetchResult
import org.apache.spark.sql.types._
import scala.collection.mutable

/** The REST pagination walk: stop conditions and failure modes mirroring
  * RestApiInputHandler::paginate/fetchJson (reference file:46-120), plus
  * the end-to-end walk → spool → RestJsonSource.read ingest.
  */
class RestPaginatorSpec extends SparkSpec {

  /** In-memory "server": page number → canned response. Records every URL. */
  private def server(pages: Map[Int, Option[FetchResult]]): (mutable.Buffer[String], String => Option[FetchResult]) = {
    val seen = mutable.Buffer[String]()
    val fetch = (url: String) => {
      seen += url
      val page = "[?&]page=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toInt).getOrElse(-1)
      pages.getOrElse(page, Some(FetchResult(404, "")))
    }
    (seen, fetch)
  }

  private def page(rows: Seq[Int], lastPage: Option[Int] = None, next: Option[String] = None): FetchResult = {
    val data = rows.map(i => s"""{"k":$i}""").mkString("[", ",", "]")
    val meta = lastPage.map(lp => s""","meta":{"last_page":$lp}""").getOrElse("")
    val links = next.map(n => s""","links":{"next":"$n"}""").getOrElse("")
    FetchResult(200, s"""{"data":$data$meta$links}""")
  }

  test("meta.last_page drives the walk: exactly last_page fetches, page/size params on every URL") {
    val (seen, fetch) = server(Map(
      1 -> Some(page(Seq(1, 2), lastPage = Some(3))),
      2 -> Some(page(Seq(3), lastPage = Some(3))),
      3 -> Some(page(Seq(4), lastPage = Some(3))),
      4 -> Some(page(Seq(99)))))
    val pages = RestPaginator.walk("https://api.example.test/items", pageSize = 2, fetch = fetch)
    assert(pages.size == 3)
    assert(seen.size == 3, s"must stop AT last_page, fetched: $seen")
    assert(seen.forall(u => u.contains("page=") && u.contains("per_page=2")))
    assert(seen.head.endsWith("items?page=1&per_page=2"))
  }

  test("links.next chases until php-empty; '0' counts as empty like PHP") {
    val (seen, fetch) = server(Map(
      1 -> Some(page(Seq(1), next = Some("https://api/items?page=2"))),
      2 -> Some(page(Seq(2), next = Some("0"))), // php empty("0") == true → stop
      3 -> Some(page(Seq(3)))))
    val pages = RestPaginator.walk("https://api/items", fetch = fetch)
    assert(pages.size == 2 && seen.size == 2)
  }

  test("numeric-string last_page parses like PHP is_numeric + (int) cast") {
    val (_, fetch) = server(Map(
      1 -> Some(FetchResult(200, """{"data":[{"k":1}],"meta":{"last_page":"2"}}""")),
      2 -> Some(page(Seq(2), lastPage = Some(2)))))
    assert(RestPaginator.walk("https://api/items", fetch = fetch).size == 2)
  }

  test("404, error status, invalid JSON, scalar body, network error all stop the walk") {
    val failures = Seq[Option[FetchResult]](
      Some(FetchResult(404, "irrelevant")),
      Some(FetchResult(500, """{"data":[{"k":9}]}""")),
      Some(FetchResult(200, """{"data": not json""")),
      Some(FetchResult(200, """"just a string"""")),
      None)
    for (f <- failures) {
      val (seen, fetch) = server(Map(
        1 -> Some(page(Seq(1), next = Some("u"))),
        2 -> f,
        3 -> Some(page(Seq(3)))))
      val pages = RestPaginator.walk("https://api/items", fetch = fetch)
      assert(pages.size == 1, s"failure $f must break after page 1")
      assert(seen.size == 2, s"failure $f must not fetch page 3")
    }
  }

  test("pages without data[] still count as walked pages (rows surface empty downstream)") {
    val (_, fetch) = server(Map(
      1 -> Some(FetchResult(200, """{"results":[1],"links":{"next":"u"}}""")),
      2 -> Some(page(Seq(7)))))
    val pages = RestPaginator.walk("https://api/items", fetch = fetch)
    assert(pages.size == 2)
  }

  test("withQuery merges params over an existing query string (reference withQuery)") {
    assert(RestPaginator.withQuery("https://h/p?a=1&page=9", Seq("page" -> "2", "per_page" -> "5"))
      == "https://h/p?a=1&page=2&per_page=5")
    assert(RestPaginator.withQuery("https://h/p", Nil) == "https://h/p")
    // pre-encoded existing values must NOT double-encode (parse_str +
    // http_build_query round-trip parity): %20 stays %20, not %2520
    assert(RestPaginator.withQuery("https://h/p?filter=a%20b", Seq("page" -> "1"))
      == "https://h/p?filter=a+b&page=1" ||
      RestPaginator.withQuery("https://h/p?filter=a%20b", Seq("page" -> "1"))
      == "https://h/p?filter=a%20b&page=1")
    assert(!RestPaginator.withQuery("https://h/p?filter=a%20b", Seq("page" -> "1")).contains("%25"))
  }

  test("spool flattens CR and LF so each page is exactly one line for the distributed reader") {
    val dir = RestPaginator.spool(
      java.nio.file.Files.createTempDirectory("rest_crlf"),
      Seq("{\r\n  \"data\": [{\"k\": 1}],\r\n  \"meta\": {}\r\n}"))
    val rows = RestJsonSource.read(spark, dir.toString,
        new StructType().add("k", IntegerType))
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1))
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Files.list(dir).iterator().next()), "UTF-8")
    assert(!raw.contains("\r") && !raw.contains("\n"))
  }

  test("walk → spool → RestJsonSource.read: distributed ingest of the walked pages") {
    val (_, fetch) = server(Map(
      1 -> Some(page(Seq(1, 2), lastPage = Some(3))),
      2 -> Some(page(Seq(3, 4), lastPage = Some(3))),
      3 -> Some(page(Seq(5), lastPage = Some(3)))))
    val pages = RestPaginator.walk("https://api/items", fetch = fetch)
    val dir = RestPaginator.spool(
      java.nio.file.Files.createTempDirectory("rest_spool"), pages)
    val rows = RestJsonSource.read(spark, dir.toString,
        new StructType().add("k", IntegerType))
      .orderBy("k").collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 2, 3, 4, 5))
  }
}
