package graft.multimodal

/** Deterministic media-file fixtures: the minimal valid byte layout of each
  * container format ([[MediaHeaders]]' public specs), with dimensions /
  * duration derived arithmetically from a document id. This is what puts
  * the REAL header parsing under the DuckDB oracle gate: `q_media_probe`
  * writes these files once, ingests them through `binaryFile`, probes the
  * headers back, and the oracle recomputes the same arithmetic from the
  * documents table — a probe that misreads any offset/endianness breaks the
  * hash match. (The builders are also the test harness a media pipeline
  * needs: byte-exact format fixtures with no codec library.)
  *
  * Derivations (all BIGINT-arithmetic so the oracle can replay them):
  *  - format  = doc_id % 5 → png, jpeg, gif, bmp, wav
  *  - width   = doc_id % 1897 + 16   (fits JPEG/GIF u16)
  *  - height  = doc_id % 1013 + 16
  *  - wav     = ((doc_id % 977) + 1) · 4410 data bytes at 176 400 B/s
  *              → duration_ms = dataBytes · 1000 / 176400 (floor)
  */
object MediaFixtures {

  val WavByteRate = 176400L // 44.1 kHz · 16-bit · stereo

  def widthOf(id: Long): Long = id % 1897 + 16
  def heightOf(id: Long): Long = id % 1013 + 16
  def wavDataBytes(id: Long): Long = (id % 977 + 1) * 4410L

  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def be32(v: Long) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le32(v: Long) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  def pngBytes(w: Long, h: Long): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h)

  def jpegBytes(w: Long, h: Long): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc0.toByte, 0x00, 0x0b, 0x08) ++
      be16(h.toInt) ++ be16(w.toInt) ++ Array[Byte](0x01)

  def gifBytes(w: Long, h: Long): Array[Byte] =
    "GIF89a".getBytes ++ le16(w.toInt) ++ le16(h.toInt)

  def bmpBytes(w: Long, h: Long): Array[Byte] =
    "BM".getBytes ++ new Array[Byte](16) ++ le32(w) ++ le32(h)

  def wavBytes(dataBytes: Long): Array[Byte] =
    "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(WavByteRate) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(dataBytes) // header-only: the probe reads the size field

  /** The fixture file for one id: format by `id % 5`, named so the ingest
    * can recover the id from the path.
    */
  def fileFor(id: Long): (String, Array[Byte]) = (id % 5) match {
    case 0 => (f"m$id%09d.png", pngBytes(widthOf(id), heightOf(id)))
    case 1 => (f"m$id%09d.jpg", jpegBytes(widthOf(id), heightOf(id)))
    case 2 => (f"m$id%09d.gif", gifBytes(widthOf(id), heightOf(id)))
    case 3 => (f"m$id%09d.bmp", bmpBytes(widthOf(id), heightOf(id)))
    case _ => (f"m$id%09d.wav", wavBytes(wavDataBytes(id)))
  }

  private val pinned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Write-once fixture directory for an id set (same pin protocol as the
    * BPE/IVF fixtures: deterministic path keyed by content, build to a temp
    * dir, atomic rename — concurrent writers produce identical bytes, so
    * losing the race is winning). Files are tiny (≤ ~60 B each); the id set
    * is a bounded sample, control-plane-sized by construction.
    */
  def ensureDir(ids: Seq[Long], tag: String): String = {
    val key = {
      val md = java.security.MessageDigest.getInstance("MD5")
      ids.foreach(i => md.update(i.toString.getBytes)); md.update(tag.getBytes)
      md.digest().map("%02x".format(_)).mkString.take(12)
    }
    val dst = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_fixtures", s"media_$key")
    val dstS = dst.toString
    if (pinned.contains(dstS)) return dstS
    val marker = dst.resolve("_COMPLETE")
    if (!java.nio.file.Files.exists(marker)) {
      val tmp = java.nio.file.Paths.get(
        dstS + ".tmp-" + java.util.UUID.randomUUID.toString.take(8))
      java.nio.file.Files.createDirectories(tmp)
      ids.foreach { id =>
        val (name, bytes) = fileFor(id)
        java.nio.file.Files.write(tmp.resolve(name), bytes)
      }
      java.nio.file.Files.write(tmp.resolve("_COMPLETE"), key.getBytes)
      try java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { // lost the race or stale partial dir: a complete dir must exist
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.AccessDeniedException |
             _: java.nio.file.DirectoryNotEmptyException =>
          require(java.nio.file.Files.exists(marker),
            s"fixture rename to $dstS failed and no complete fixture exists")
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    pinned.add(dstS)
    dstS
  }
}
