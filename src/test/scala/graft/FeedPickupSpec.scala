package graft

import graft.sources.FeedPickup
import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

/** The SFTP feed-pickup protocol: prefix match, mtime ordering, archive-
  * older-to-history, newest returned in place — SftpTransport.php parity.
  */
class FeedPickupSpec extends SparkSpec {

  private def landing(): Path = Files.createTempDirectory("feeds")

  private def drop(dir: Path, name: String, content: String, mtimeSec: Long): Path = {
    val p = dir.resolve(name)
    Files.createDirectories(p.getParent match { case null => dir; case parent => parent })
    Files.writeString(p, content)
    Files.setLastModifiedTime(p, FileTime.fromMillis(mtimeSec * 1000))
    p
  }

  test("newest prefix-match returned, older matches archived to history/, others untouched") {
    val dir = landing()
    drop(dir, "prices_jan.csv", "old", 100)
    drop(dir, "prices_feb.csv", "mid", 200)
    drop(dir, "prices_mar.csv", "new", 300)
    drop(dir, "stock_mar.csv", "other-feed", 400)
    val got = FeedPickup.fetchLatest(dir, "prices.csv")
    assert(got.keySet == Set("prices_mar.csv"))
    assert(new String(got("prices_mar.csv")) == "new")
    // newest stays in place; older two moved; other feed untouched
    assert(Files.exists(dir.resolve("prices_mar.csv")))
    assert(!Files.exists(dir.resolve("prices_jan.csv")) && !Files.exists(dir.resolve("prices_feb.csv")))
    assert(Files.exists(dir.resolve("history/prices_jan.csv")))
    assert(Files.exists(dir.resolve("history/prices_feb.csv")))
    assert(Files.exists(dir.resolve("stock_mar.csv")))
  }

  test("source with a directory component scopes the pickup to that subdir") {
    val dir = landing()
    drop(dir, "acme/feed_a.xlsx", "a", 100)
    drop(dir, "acme/feed_b.xlsx", "b", 200)
    drop(dir, "feed_root.xlsx", "root", 300)
    val got = FeedPickup.fetchLatest(dir, "acme/feed.xlsx")
    assert(got.keySet == Set("feed_b.xlsx"))
    assert(Files.exists(dir.resolve("acme/history/feed_a.xlsx")))
    assert(Files.exists(dir.resolve("feed_root.xlsx")), "root files are out of scope")
  }

  test("no directory or no prefix match → empty; single match archives nothing") {
    val dir = landing()
    assert(FeedPickup.fetchLatest(dir.resolve("missing"), "x.csv").isEmpty)
    drop(dir, "other.csv", "o", 100)
    assert(FeedPickup.fetchLatest(dir, "prices.csv").isEmpty)
    drop(dir, "prices_only.csv", "solo", 200)
    val got = FeedPickup.fetchLatest(dir, "prices.csv")
    assert(got.keySet == Set("prices_only.csv"))
    assert(Files.list(dir.resolve("history")).count() == 0)
  }

  test("picked feed flows into the distributed CSV parser end to end") {
    val dir = landing()
    drop(dir, "prices_old.csv", "upc,price\n111,1.0\n", 100)
    drop(dir, "prices_new.csv", "upc,price\n111,9.9\n222,5.0\n", 200)
    val got = FeedPickup.fetchLatest(dir, "prices.csv")
    val feedDir = Files.createTempDirectory("picked")
    got.foreach { case (name, bytes) => Files.write(feedDir.resolve(name), bytes) }
    val df = graft.sources.CsvSource.read(spark, feedDir.toString)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("upc", "price"))
  }
}
