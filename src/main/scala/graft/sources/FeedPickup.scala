package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The reference SFTP transport's feed-file pickup protocol
  * (/root/reference/src/Service/Transport/SftpTransport.php:22-57,171-190)
  * over an abstract landing directory. The socket/SOCKS5/login plumbing is
  * zero-egress-excluded; what remains is the part that decides WHICH feed
  * file a pipeline run consumes:
  *
  *  1. `source` splits into directory + prefix (basename minus its last
  *     extension) — `feeds/prices.csv` means "the prices* files under
  *     feeds/".
  *  2. Every regular file with that prefix is a candidate; candidates sort
  *     by mtime ascending.
  *  3. All but the NEWEST move into `history/` (created on demand) —
  *     copy + delete, like the reference's download/put/delete.
  *  4. The newest file's content is returned `{filename → bytes}` and the
  *     file itself stays in place (the reference leaves it too).
  *  5. No directory / no matching files → empty result (the reference
  *     logs and returns null).
  *
  * At scale the landing directory is the mounted/synced drop zone feeds
  * land on; this is driver-side control-plane work — one file decision per
  * pipeline run — after which the content flows into the distributed
  * parsers (CsvSource / ExcelSource / MorrisXmlSource).
  */
object FeedPickup {

  val HistoryDir = "history"

  /** dir + source name → content of the newest prefix-matched file, older
    * matches archived to history/.
    */
  def fetchLatest(dir: Path, source: String): Map[String, Array[Byte]] = {
    val sourceName = Path.of(source).getFileName.toString
    val prefix = sourceName.lastIndexOf('.') match {
      case -1 => sourceName
      case i  => sourceName.substring(0, i)
    }
    val subDir = Option(Path.of(source).getParent)
      .map(p => dir.resolve(p)).getOrElse(dir)
    if (!Files.isDirectory(subDir)) return Map.empty

    // Files.list holds an open DirectoryStream — close it or a long-running
    // consumer leaks one fd per pickup
    val listing = Files.list(subDir)
    val candidates =
      try listing.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.getFileName.toString.startsWith(prefix))
        .toSeq
      finally listing.close()
    val ordered = candidates
      .sortBy(p => (Files.getLastModifiedTime(p).toMillis, p.getFileName.toString))
    if (ordered.isEmpty) return Map.empty

    val history = subDir.resolve(HistoryDir)
    if (!Files.exists(history)) Files.createDirectories(history)

    val latest = ordered.last
    ordered.init.foreach { p =>
      Files.move(p, history.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
    }
    Map(latest.getFileName.toString -> Files.readAllBytes(latest))
  }
}
