package graft

import graft.multimodal.MediaHeaders
import org.scalatest.funsuite.AnyFunSuite

/** Real container-header parsing over hand-crafted byte fixtures — each
  * fixture is the minimal prefix of a valid file per the public format
  * layout (no codec library involved on either side).
  */
class MediaHeadersSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("PNG: IHDR big-endian dimensions") {
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ // signature
      bytes(0, 0, 0, 13) ++ "IHDR".getBytes ++                      // IHDR length+type
      bytes(0, 0, 0x04, 0x38) ++                                    // width 1080
      bytes(0, 0, 0x07, 0x80)                                       // height 1920
    assert(MediaHeaders.probe(png) == ((1080, 1920, 0L)))
  }

  test("JPEG: SOF0 after skippable segments, big-endian height/width") {
    val jpeg = bytes(0xff, 0xd8) ++                       // SOI
      bytes(0xff, 0xe0, 0x00, 0x04, 0x00, 0x00) ++        // APP0, len 4 (2 payload bytes)
      bytes(0xff, 0xc0, 0x00, 0x0b,                       // SOF0, len 11
        0x08,                                             // precision
        0x01, 0xe0,                                       // height 480
        0x02, 0x80,                                       // width 640
        0x03, 0, 0)                                       // components (truncated fine)
    assert(MediaHeaders.probe(jpeg) == ((640, 480, 0L)))
  }

  test("JPEG: progressive SOF2 is a frame header too; C4/C8/CC are not") {
    val sof2 = bytes(0xff, 0xd8) ++
      bytes(0xff, 0xc4, 0x00, 0x03, 0x00) ++              // DHT (C4) must be skipped
      bytes(0xff, 0xc2, 0x00, 0x0b, 0x08, 0x00, 0x64, 0x00, 0xc8, 0x01, 0, 0)
    assert(MediaHeaders.probe(sof2) == ((200, 100, 0L)))
  }

  test("GIF: little-endian logical screen size") {
    val gif = "GIF89a".getBytes ++ bytes(0x40, 0x01) ++ bytes(0xf0, 0x00) // 320 x 240
    assert(MediaHeaders.probe(gif) == ((320, 240, 0L)))
  }

  test("BMP: little-endian dims, negative (top-down) height normalized") {
    val bmp = "BM".getBytes ++ new Array[Byte](16) ++
      bytes(0x80, 0x02, 0, 0) ++                           // width 640
      bytes(0x20, 0xfe, 0xff, 0xff)                        // height -480
    assert(MediaHeaders.probe(bmp) == ((640, 480, 0L)))
  }

  test("WAV: duration from fmt byte-rate and data size, word-aligned chunk walk") {
    // 44.1 kHz, 16-bit stereo => byteRate 176400; 352800 data bytes = 2000 ms
    val fmt = "fmt ".getBytes ++ bytes(16, 0, 0, 0) ++
      bytes(1, 0) ++ bytes(2, 0) ++                        // PCM, 2 channels
      bytes(0x44, 0xac, 0x00, 0x00) ++                     // sample rate 44100
      bytes(0x10, 0xb1, 0x02, 0x00) ++                     // byte rate 176400
      bytes(4, 0) ++ bytes(16, 0)                          // block align, bits
    // an odd-sized chunk before data exercises word alignment
    val junk = "LIST".getBytes ++ bytes(3, 0, 0, 0) ++ bytes(1, 2, 3, 0)
    val data = "data".getBytes ++ bytes(0x10, 0x62, 0x05, 0x00) // 352784 bytes... use exact
    val wav = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++ fmt ++ junk ++ data
    val (_, _, ms) = MediaHeaders.probe(wav)
    assert(ms == 352784L * 1000 / 176400) // 1999 ms (floor division)
  }

  test("WAV: corrupt huge/zero chunk sizes terminate the walk instead of hanging") {
    // size 0xFFFFFFF8 truncated to Int is -8 => pre-fix advance of 0 (an
    // infinite loop pinning an executor task); the Long-advance guard must
    // return the documented fallback instead
    val huge = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ bytes(0xf8, 0xff, 0xff, 0xff) ++ bytes(0, 0, 0, 0)
    assert(MediaHeaders.probe(huge) == ((0, 0, 0L)))
    // a size that makes the advance negative (walk backwards) must also bail
    val neg = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ bytes(0x00, 0x00, 0x00, 0x80) ++ bytes(0, 0, 0, 0)
    assert(MediaHeaders.probe(neg) == ((0, 0, 0L)))
    // fmt already parsed + corrupt later chunk: keeps what it learned only
    // when data was also seen — here data never arrives, so (0,0,0)
    val fmt = "fmt ".getBytes ++ bytes(16, 0, 0, 0) ++
      bytes(1, 0) ++ bytes(2, 0) ++
      bytes(0x44, 0xac, 0x00, 0x00) ++
      bytes(0x10, 0xb1, 0x02, 0x00) ++
      bytes(4, 0) ++ bytes(16, 0)
    val fmtThenHuge = "RIFF".getBytes ++ bytes(0, 0, 0, 0) ++ "WAVE".getBytes ++
      fmt ++ "JUNK".getBytes ++ bytes(0xff, 0xff, 0xff, 0xff)
    assert(MediaHeaders.probe(fmtThenHuge) == ((0, 0, 0L)))
  }

  test("unknown formats and truncated headers return (0, 0, 0)") {
    assert(MediaHeaders.probe("not a media file".getBytes) == ((0, 0, 0L)))
    assert(MediaHeaders.probe(bytes(0x89, 'P')) == ((0, 0, 0L)))          // truncated PNG
    assert(MediaHeaders.probe(bytes(0xff, 0xd8, 0xff, 0xd9)) == ((0, 0, 0L))) // SOI+EOI only
    assert(MediaHeaders.probe(null) == ((0, 0, 0L)))
  }
}
