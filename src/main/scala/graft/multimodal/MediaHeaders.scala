package graft.multimodal

/** REAL media header parsing — pure byte arithmetic over the container
  * formats' public layouts, no codec library involved. This moves the stub
  * boundary inward: dimension/duration METADATA (what the Spark-side
  * pipeline actually routes, filters and joins on) parses for real from
  * PNG / JPEG / GIF / BMP / WAV bytes; only pixel/sample DECODING remains
  * behind the deterministic stubs in [[Multimodal]].
  *
  * Formats (public specifications):
  *  - PNG: 8-byte signature, IHDR chunk at offset 8 — width/height are
  *    big-endian u32 at offsets 16/20.
  *  - JPEG: FF D8 then marker segments; any SOFn frame header (C0–CF minus
  *    C4/C8/CC) carries height/width as big-endian u16 at +5/+7 inside the
  *    segment.
  *  - GIF: "GIF87a"/"GIF89a", logical screen width/height little-endian
  *    u16 at 6/8.
  *  - BMP: "BM", BITMAPINFOHEADER width/height little-endian i32 at 18/22
  *    (height may be negative = top-down rows).
  *  - WAV: RIFF/WAVE chunk walk — "fmt " gives channels/sample-rate/
  *    byte-rate, "data" gives payload size; duration_ms = data·1000/byteRate.
  */
object MediaHeaders {

  /** (width, height, duration_ms) — (0, 0, 0) when the format is not
    * recognized or the header is truncated. Images report duration 0;
    * audio reports 0×0.
    */
  def probe(bytes: Array[Byte]): (Int, Int, Long) = {
    if (bytes == null) (0, 0, 0L)
    else if (isPng(bytes)) pngDims(bytes)
    else if (isJpeg(bytes)) jpegDims(bytes)
    else if (isGif(bytes)) gifDims(bytes)
    else if (isBmp(bytes)) bmpDims(bytes)
    else if (isWav(bytes)) wavDuration(bytes)
    else (0, 0, 0L)
  }

  private def u8(b: Byte): Int = b & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b(i)) << 8) | u8(b(i + 1))
  private def le16(b: Array[Byte], i: Int): Int = (u8(b(i + 1)) << 8) | u8(b(i))
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b(i)).toLong << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b(i + 3)).toLong << 24) | (u8(b(i + 2)) << 16) | (u8(b(i + 1)) << 8) | u8(b(i))

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && u8(b(0)) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b(4)) == 0x0d && u8(b(5)) == 0x0a && u8(b(6)) == 0x1a && u8(b(7)) == 0x0a

  private def pngDims(b: Array[Byte]): (Int, Int, Long) =
    // bytes 12..15 must name IHDR (always the first chunk in a valid file)
    if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      (be32(b, 16).toInt, be32(b, 20).toInt, 0L)
    else (0, 0, 0L)

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b(0)) == 0xff && u8(b(1)) == 0xd8

  private def jpegDims(b: Array[Byte]): (Int, Int, Long) = {
    var i = 2
    while (i + 9 < b.length) {
      if (u8(b(i)) != 0xff) return (0, 0, 0L) // lost marker sync
      val marker = u8(b(i + 1))
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) i += 2 // no payload
      else {
        val len = be16(b, i + 2)
        if (len < 2) return (0, 0, 0L)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 9 > b.length) return (0, 0, 0L)
          return (be16(b, i + 7), be16(b, i + 5), 0L) // width, height
        }
        if (marker == 0xd9 || marker == 0xda) return (0, 0, 0L) // EOI/SOS before any SOF
        i += 2 + len
      }
    }
    (0, 0, 0L)
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def gifDims(b: Array[Byte]): (Int, Int, Long) =
    (le16(b, 6), le16(b, 8), 0L)

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  private def bmpDims(b: Array[Byte]): (Int, Int, Long) =
    (le32(b, 18).toInt, math.abs(le32(b, 22).toInt), 0L)

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def wavDuration(b: Array[Byte]): (Int, Int, Long) = {
    var i = 12
    var byteRate = 0L
    var dataBytes = -1L
    while (i + 8 <= b.length && (byteRate == 0L || dataBytes < 0L)) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, i + 4) // unsigned u32 from untrusted bytes
      if (id == "fmt " && i + 8 + 16 <= b.length) byteRate = le32(b, i + 16)
      if (id == "data") dataBytes = size
      // advance in Long: a corrupt size near 2^32 truncated to Int goes
      // zero/negative and the walk would loop forever or run off the front
      val next = i.toLong + 8L + size + (size & 1L) // chunks are word-aligned
      if (next <= i || next > Int.MaxValue)
        return if (byteRate > 0 && dataBytes >= 0) (0, 0, dataBytes * 1000L / byteRate)
               else (0, 0, 0L)
      i = next.toInt
    }
    if (byteRate > 0 && dataBytes >= 0) (0, 0, dataBytes * 1000L / byteRate)
    else (0, 0, 0L)
  }
}
